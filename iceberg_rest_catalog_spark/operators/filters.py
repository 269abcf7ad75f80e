"""Filter / predicate operators (SURVEY.md §2.B "Filters / predicates")."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import t


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice,
           o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' AND o_totalprice > 200000.0)
       OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'F')
    """,
)
def q_filter_compound(spark, sf_dir):
    """AND / OR / NOT predicate combination."""
    o = t(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000.0)) | (
        (F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_orderstatus") == "F")
    )
    return o.filter(cond).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderpriority",
    )


@query(
    "q_filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, round(p_retailprice, 4) AS p_retailprice
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#14', 'Brand#23')
      AND p_size BETWEEN 10 AND 40
      AND p_name LIKE '%widget%'
    """,
)
def q_filter_in_between_like(spark, sf_dir):
    """IN, BETWEEN and LIKE predicates.

    The fixture's p_name values are "<color> <noun>" with 'widget' among the
    nouns (~10% of parts; 18 rows survive all three predicates at sf0.01),
    so the LIKE is exercised on real rows."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#11", "Brand#14", "Brand#23")
        & F.col("p_size").between(10, 40)
        & F.col("p_name").like("%widget%")
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.round("p_retailprice", 4).alias("p_retailprice"),
    )


@query(
    "q_filter_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 4) END AS bal,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 4) END
              IS NOT DISTINCT FROM NULL) AS is_null_safe_eq_null
    FROM customer
    WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL
       OR c_acctbal > 9000.0
    """,
)
def q_filter_null(spark, sf_dir):
    """IS NULL / IS NOT NULL / null-safe equality (<=>).

    The fixtures carry no physical NULLs, so NULLs are introduced via CASE —
    the predicate semantics (three-valued logic, null-safe eq) are what's
    under test.
    """
    c = t(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, None).otherwise(F.round("c_acctbal", 4))
    return (
        c.withColumn("bal", bal)
        .withColumn("is_null_safe_eq_null", F.col("bal").eqNullSafe(F.lit(None)))
        .filter(F.col("bal").isNull() | (F.col("c_acctbal") > 9000.0))
        .select("c_custkey", "bal", "is_null_safe_eq_null")
    )
