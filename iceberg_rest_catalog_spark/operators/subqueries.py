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


@query(
    "q_sub_all",
    oracle="""
    SELECT 'gt_all' AS branch, p_partkey, p_brand,
           round(p_retailprice, 4) AS price
    FROM part
    WHERE p_retailprice > ALL (
      SELECT p_retailprice FROM part WHERE p_brand = 'Brand#21')
    UNION ALL
    SELECT 'lt_any', p_partkey, p_brand, round(p_retailprice, 4)
    FROM part
    WHERE p_brand <> 'Brand#21' AND p_retailprice < ANY (
      SELECT p_retailprice FROM part WHERE p_brand = 'Brand#21')
    ORDER BY branch, p_partkey
    """,
)
def q_sub_all(spark, sf_dir):
    """Quantified comparison subqueries — `> ALL` and `< ANY` — the last
    uncovered corner of the subquery surface (q_sub_in covers membership,
    q_sub_exists_corr correlation, q_sub_not_in_null 3-valued logic).
    Spark has no ALL/ANY syntax, so the registered plan is the standard
    aggregate rewrite — `x > ALL (S)` == `x > (SELECT max(S))`,
    `x < ANY (S)` == `x < (SELECT max(S))` — each a 1-row scalar
    subquery BROADCAST against the scan (no shuffle of the outer table);
    the oracle runs the literal quantifiers, pinning the rewrite's
    equivalence.  The inner set is kept NULL-free and non-empty by
    construction (every part has a price), so the rewrite is exact; the
    NULL/empty divergences of quantified comparisons live in
    q_sub_not_in_null's territory.

    Reference scope: no expression surface in the reference (Go metadata
    facade, api/router/router.go:9-55); [CAP] row with the subquery
    family."""
    spark.sql("SET spark.sql.legacy.parquet.nanosAsLong=true")
    part = t(spark, sf_dir, "part")
    part.createOrReplaceTempView("v_part")
    # Regen guard (the seq_patterns pattern): over an EMPTY inner set the
    # aggregate rewrite (NULL max -> no rows) and literal ALL (vacuously
    # TRUE -> all rows) diverge — fail loudly on a degraded fixture
    # instead of letting the value-hash gate catch it cryptically.
    assert (
        part.filter(F.col("p_brand") == "Brand#21").limit(1).count() == 1
    ), "q_sub_all needs a non-empty Brand#21 inner set"
    return spark.sql(
        """
        WITH b AS (SELECT max(p_retailprice) AS mx
                   FROM v_part WHERE p_brand = 'Brand#21')
        SELECT 'gt_all' AS branch, p_partkey, p_brand,
               round(p_retailprice, 4) AS price
        FROM v_part, b WHERE p_retailprice > b.mx
        UNION ALL
        SELECT 'lt_any', p_partkey, p_brand, round(p_retailprice, 4)
        FROM v_part, b
        WHERE p_brand <> 'Brand#21' AND p_retailprice < b.mx
        ORDER BY branch, p_partkey
        """
    )
