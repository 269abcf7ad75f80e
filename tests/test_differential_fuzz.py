"""Property-based DIFFERENTIAL query testing (SURVEY §5 extension, round 5).

The per-operator oracles pin each registered query to one hand-written SQL
mirror; this fuzzer instead samples the COMPOSITIONAL space around them —
random conjunctive filters, grouping sets and aggregate bundles over
``lineitem`` — compiles each spec twice (PySpark DataFrame ops and DuckDB
SQL), and requires bit-identical canonical results. It guards the
translation conventions every oracle in the registry relies on (alias
discipline, 4-decimal float rounding, NULL semantics, date handling)
against drift that a fixed oracle set cannot see.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

# (name, spark predicate builder, sql snippet) — predicates chosen to hit
# numerics, strings, dates, IN-lists and nullable-free columns alike.
_PREDICATES = [
    ("qty_lo", lambda F: F.col("l_quantity") > 25, "l_quantity > 25"),
    ("qty_hi", lambda F: F.col("l_quantity") <= 10, "l_quantity <= 10"),
    (
        "disc_band",
        lambda F: F.col("l_discount").between(0.02, 0.06),
        "l_discount BETWEEN 0.02 AND 0.06",
    ),
    ("flag_r", lambda F: F.col("l_returnflag") == "R", "l_returnflag = 'R'"),
    (
        "flag_in",
        lambda F: F.col("l_returnflag").isin("A", "N"),
        "l_returnflag IN ('A','N')",
    ),
    (
        "date_lo",
        lambda F: F.col("l_shipdate") >= "1995-01-01",
        "l_shipdate >= TIMESTAMP '1995-01-01'",
    ),
    (
        "date_hi",
        lambda F: F.col("l_shipdate") < "1997-06-01",
        "l_shipdate < TIMESTAMP '1997-06-01'",
    ),
    ("tax_zero", lambda F: F.col("l_tax") != 0.0, "l_tax <> 0.0"),
    (
        "key_mod",
        lambda F: F.col("l_orderkey") % 7 == 0,
        "l_orderkey % 7 = 0",
    ),
]

_GROUPS = ["l_returnflag", "l_linestatus", "l_linenumber"]

# (alias, spark agg builder, sql expression). Floats rounded to 4 decimals
# on both engines — the registry-wide convention under test.
_AGGS = [
    ("n_rows", lambda F: F.count("*"), "CAST(count(*) AS BIGINT)"),
    (
        "sum_qty",
        lambda F: F.round(F.sum("l_quantity"), 4),
        "round(sum(l_quantity), 4)",
    ),
    (
        "avg_price",
        lambda F: F.round(F.avg("l_extendedprice"), 4),
        "round(avg(l_extendedprice), 4)",
    ),
    ("min_disc", lambda F: F.min("l_discount"), "min(l_discount)"),
    ("max_tax", lambda F: F.max("l_tax"), "max(l_tax)"),
    (
        "sum_rev",
        lambda F: F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4),
        "round(sum(l_extendedprice * (1 - l_discount)), 4)",
    ),
    (
        "n_orders",
        lambda F: F.countDistinct("l_orderkey"),
        "CAST(count(DISTINCT l_orderkey) AS BIGINT)",
    ),
]


@pytest.fixture(scope="module")
def lineitem(spark):
    from iceberg_rest_catalog_spark.operators.common import t

    return t(spark, SF, "lineitem")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    return con


def _canon(rows):
    """Engine-neutral canonical form: column-name-sorted tuples, floats to
    4 decimals, NULL marker — the same normalization the grading harness
    applies."""

    def c(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.4f}"
        return str(v)

    return sorted("|".join(c(v) for v in row) for row in rows)


spec = st.tuples(
    st.lists(st.sampled_from(range(len(_PREDICATES))), unique=True, max_size=3),
    st.lists(st.sampled_from(range(len(_GROUPS))), unique=True, max_size=2),
    st.lists(
        st.sampled_from(range(len(_AGGS))), unique=True, min_size=1, max_size=3
    ),
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec)
def test_random_filter_group_agg_matches_duckdb(lineitem, ddb, spec):
    from pyspark.sql import functions as F

    pred_ix, grp_ix, agg_ix = spec
    preds = [_PREDICATES[i] for i in pred_ix]
    groups = [_GROUPS[i] for i in grp_ix]
    aggs = [_AGGS[i] for i in agg_ix]

    df = lineitem
    for _, build, _sql in preds:
        df = df.filter(build(F))
    sp_aggs = [build(F).alias(name) for name, build, _ in aggs]
    df = df.groupBy(*groups).agg(*sp_aggs) if groups else df.agg(*sp_aggs)
    # sort columns by name — mirror of the grading harness compare
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    where = " AND ".join(s for _, _, s in preds) or "TRUE"
    sel = ", ".join(
        [*groups, *[f"{s} AS {name}" for name, _, s in aggs]]
    )
    group_by = f"GROUP BY {', '.join(groups)}" if groups else ""
    q = f"SELECT {sel} FROM lineitem WHERE {where} {group_by}"
    pdf = ddb.execute(q).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (spec, q, got[:3], want[:3])
