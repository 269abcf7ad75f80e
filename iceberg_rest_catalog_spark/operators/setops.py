"""Set operations (SURVEY.md §2.B "Set operations").

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
UNION DISTINCT / INTERSECT / EXCEPT each shuffle once on the full row value
(hash-based dedup/semi/anti under the hood) — at 100 TB prefer keyed
dropDuplicates over whole-row DISTINCT where semantics allow.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import t


def _seg(spark, sf_dir, segments, lo):
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin(*segments) & (F.col("c_acctbal") > lo))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_A = ("BUILDING", "AUTOMOBILE")
_B = ("AUTOMOBILE", "MACHINERY")

_A_SQL = """SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_acctbal > 1000.0"""
_B_SQL = """SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_mktsegment IN ('AUTOMOBILE','MACHINERY') AND c_acctbal > 5000.0"""


@query("q_union_all", oracle=f"{_A_SQL} UNION ALL {_B_SQL}")
def q_union_all(spark, sf_dir):
    """UNION ALL — keeps duplicates, no shuffle."""
    return _seg(spark, sf_dir, _A, 1000.0).unionByName(_seg(spark, sf_dir, _B, 5000.0))


@query("q_union_distinct", oracle=f"{_A_SQL} UNION {_B_SQL}")
def q_union_distinct(spark, sf_dir):
    """UNION (distinct) — one whole-row dedup shuffle."""
    return (
        _seg(spark, sf_dir, _A, 1000.0)
        .unionByName(_seg(spark, sf_dir, _B, 5000.0))
        .distinct()
    )


@query("q_intersect", oracle=f"{_A_SQL} INTERSECT {_B_SQL}")
def q_intersect(spark, sf_dir):
    """INTERSECT — rows in both (AUTOMOBILE customers with acctbal > 5000)."""
    return _seg(spark, sf_dir, _A, 1000.0).intersect(_seg(spark, sf_dir, _B, 5000.0))


@query("q_except", oracle=f"{_A_SQL} EXCEPT ALL {_B_SQL}")
def q_except(spark, sf_dir):
    """EXCEPT ALL — rows in A not matched in B (multiset semantics)."""
    return _seg(spark, sf_dir, _A, 1000.0).exceptAll(_seg(spark, sf_dir, _B, 5000.0))
