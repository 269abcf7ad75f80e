"""Sort / limit / top-k operators (SURVEY.md §2.B "Sorts / limits / top-k").

Scale notes: a global ORDER BY is a range-partitioned sort (sampling pass +
shuffle) — fine, but ORDER BY + LIMIT k compiles to TakeOrderedAndProject,
which keeps only k rows per partition and merges on the driver: O(k) memory,
no global sort. That plan difference is why q_topk exists separately.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t


@query(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_acctbal < 500.0 THEN NULL ELSE round(c_acctbal, 4) END AS bal
    FROM customer
    ORDER BY c_mktsegment ASC,
             bal DESC NULLS LAST,
             c_custkey ASC
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key sort with NULLS LAST (NULLs injected via CASE — the fixtures
    carry none). The driver's hash compare is order-insensitive; ordering
    correctness is additionally asserted in tests/test_plans.py."""
    c = t(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 500.0, None).otherwise(r4("c_acctbal"))
    return (
        c.select("c_custkey", "c_mktsegment", bal.alias("bal"))
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("bal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark, sf_dir):
    """ORDER BY + LIMIT → TakeOrderedAndProject (no global sort)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", r4("o_totalprice").alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate
    FROM orders
    ORDER BY o_orderkey
    LIMIT 10 OFFSET 5
    """,
)
def q_limit_offset(spark, sf_dir):
    """LIMIT/OFFSET over a total order (unique key ⇒ deterministic page)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey")
        .offset(5)
        .limit(10)
    )
