"""The r17 engine-invariant 4-dp rounding used by q_graph_modularity.

round(CAST(num AS DOUBLE)/den, 4) left one engine-dependent step in the
modularity output: Spark rounds the double's SHORTEST DECIMAL representation
(BigDecimal HALF_UP) while DuckDB rounds the binary value, so an integer
ratio on (or within an ulp of) a .00005 boundary can round differently per
engine/version — the suspected mechanism of the three-round driver-only
q_graph_modularity hash divergence (CORRECTNESS_r14..r16: every INTEGER
stage digest in q_graph_edge_audit green, modularity's hash red).

_ROUND4_SQL replaces it with integer arithmetic — half-away-from-zero via
one integer division — leaving a single exact int64->double conversion and
one IEEE division by 10^4.  These tests pin BOTH engines' expressions to the
exact-rational Decimal HALF_UP result, ties and negatives included.
"""

from decimal import ROUND_HALF_UP, Decimal

import pytest

from iceberg_rest_catalog_spark.operators.graph import (
    _round4_duck,
    _round4_spark,
)

# (num, den) cases: boundaries/ties at the 4th decimal, negatives, zero,
# and values where double(num/den) straddles the decimal boundary.
CASES = [
    (0, 7),
    (1, 3),
    (-1, 3),
    (2, 3),
    (1, 20000),     # exactly  .00005 -> tie, half-away -> 0.0001
    (-1, 20000),    # exactly -.00005 -> tie, half-away -> -0.0001
    (3, 20000),     # exactly  .00015 -> 0.0002
    (-3, 20000),    # -0.0002
    (7, 20000),
    (12345, 200000),
    (99999, 200000),  # 0.499995 -> tie at 4dp -> 0.5
    (-99999, 200000),
    (649, 1300000),   # 0.000499230... -> 0.0005
    (131071, 262144), # dyadic, near .5 -> exact binary representable
    (1048575, 1048576),
    (-7, 9),
    (123456789, 987654321),
]


def _want(num: int, den: int) -> float:
    """Exact-rational 4-dp HALF_UP (== half away from zero), then the
    nearest double — the value both engines must emit."""
    k = (Decimal(num) * 10000 / Decimal(den)).quantize(
        Decimal("1"), rounding=ROUND_HALF_UP
    )
    return float(k) / 10000.0


def test_round4_pure_python_formula():
    """The integer formula itself (independent of any engine)."""
    for num, den in CASES:
        s = -1 if num < 0 else 1
        k = s * ((2 * abs(num) * 10000 + den) // (2 * den))
        assert float(k) / 10000.0 == _want(num, den), (num, den)


def test_round4_duckdb_matches_exact_rational():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for num, den in CASES:
        # literals cast to BIGINT: bare DuckDB int literals are INT32 and
        # overflow in the *10000 step; the production oracle's operands
        # are BIGINT (count) / HUGEINT (sum) columns, never INT32
        expr = _round4_duck(f"{num}::BIGINT", f"{den}::BIGINT")
        (got,) = con.execute(f"SELECT {expr}").fetchone()
        assert got == _want(num, den), (num, den, got)


def test_round4_spark_matches_exact_rational(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(n, d) for n, d in CASES], "num long, den long"
    ).select(
        "num",
        "den",
        _round4_spark("num", "den").alias("r"),
    )
    for row in df.collect():
        assert row.r == _want(row.num, row.den), (row.num, row.den, row.r)


def test_round4_spark_column_type_is_double(spark):
    df = spark.range(1).select(_round4_spark("1", "3").alias("r"))
    assert dict(df.dtypes)["r"] == "double"
