"""Subquery operators (SURVEY.md §2.B "Subqueries").

Scale notes: each subquery is expressed in the decorrelated/join form Catalyst
would rewrite it to anyway — the scalar subquery becomes a pre-aggregated
broadcast join (one pass over lineitem for the aggregate, one for the probe);
IN / correlated EXISTS become left-semi joins (shuffle on the key only).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t


@query(
    "q_sub_scalar",
    oracle="""
    SELECT l.l_partkey, count(*) AS n_small,
           round(sum(l.l_extendedprice), 4) AS small_revenue
    FROM lineitem l
    WHERE l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
)
def q_sub_scalar(spark, sf_dir):
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems under half the
    part's average quantity. Decorrelated: aggregate once per part, broadcast,
    probe."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    avg_per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(
            F.broadcast(avg_per_part.withColumnRenamed("l_partkey", "p_key")),
            li.l_partkey == F.col("p_key"),
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            r4(F.sum("l_extendedprice")).alias("small_revenue"),
        )
    )


@query(
    "q_sub_in",
    oracle="""
    SELECT s_suppkey, s_name, round(s_acctbal, 4) AS s_acctbal
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                WHERE r_name = 'EUROPE'))
    """,
)
def q_sub_in(spark, sf_dir):
    """IN (subquery) — nested uncorrelated INs become left-semi joins."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    s = t(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name", r4("s_acctbal").alias("s_acctbal"))


@query(
    "q_sub_exists_corr",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 250000.0)
    """,
)
def q_sub_exists_corr(spark, sf_dir):
    """Correlated EXISTS — left-semi join on the correlation key."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000.0)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_NOT_IN_SQL = """
  SELECT 'poisoned' AS variant, c_custkey, c_name
  FROM {c}
  WHERE c_custkey NOT IN (
    SELECT CASE WHEN o_totalprice > 400000.0 THEN NULL ELSE o_custkey END
    FROM {o} WHERE o_orderkey <= 500
  )
  UNION ALL
  SELECT 'null_free', c_custkey, c_name
  FROM {c}
  WHERE c_custkey NOT IN (
    SELECT o_custkey FROM {o}
    WHERE o_orderkey <= 500 AND o_custkey IS NOT NULL
  )
"""


@query(
    "q_sub_not_in_null",
    oracle=_NOT_IN_SQL.format(c="customer", o="orders"),
)
def q_sub_not_in_null(spark, sf_dir):
    """NOT IN under three-valued logic, both ways: the 'poisoned' branch
    has a NULL in the subquery list, so `x NOT IN (...)` is never TRUE and
    the branch MUST be empty; the 'null_free' branch is the same predicate
    with NULLs filtered, returning the real anti set. Expressed through
    Spark SQL so Catalyst plans the null-aware anti join — a hand-rolled
    left-anti join gets the poisoned case silently wrong."""
    spark.sql("SET spark.sql.legacy.parquet.nanosAsLong=true")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(_NOT_IN_SQL.format(c="v_customer", o="v_orders"))
