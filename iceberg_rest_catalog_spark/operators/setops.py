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


_IA_A = """SELECT l_suppkey, l_returnflag FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'"""
_IA_B = """SELECT l_suppkey, l_returnflag FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"""


@query(
    "q_intersect_all",
    oracle=f"""
    SELECT l_suppkey, l_returnflag, count(*) AS n
    FROM (({_IA_A}) INTERSECT ALL ({_IA_B}))
    GROUP BY l_suppkey, l_returnflag ORDER BY l_suppkey, l_returnflag
    """,
)
def q_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection (each row kept
    min(multiplicity_A, multiplicity_B) times), the bag-semantics twin of
    q_intersect.  Inputs are deliberately non-unique ((suppkey, returnflag)
    projections of two ship-years) so ALL differs from DISTINCT.

    Scale shape: Catalyst plans intersectAll as one hash aggregate per
    side (counting multiplicities map-combined) + a key-equi join — never
    a row-by-row match — so the shuffle carries |distinct| rows, not
    |rows|.  The result is re-aggregated to (key, n) so the comparison
    frame is deterministic without a full-column sort.

    Reference scope: no set-operation surface in the reference (Go
    metadata facade, api/router/router.go:9-55); completes the set-ops
    family (q_union_all/q_union_distinct/q_intersect/q_except)."""

    def year(lo, hi):
        return (
            t(spark, sf_dir, "lineitem")
            .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
            .select("l_suppkey", "l_returnflag")
        )

    a = year("1995-01-01", "1996-01-01")
    b = year("1996-01-01", "1997-01-01")
    return (
        a.intersectAll(b)
        .groupBy("l_suppkey", "l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_suppkey", "l_returnflag")
    )
