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


# ---------------------------------------------------------------------------
# Join fuzz (round 6): two-table equi joins with NULL-key injection.
#
# The base tables have no NULL keys, so NULLs are injected via a CASE over a
# modulus — this is exactly the surface where Spark and DuckDB could diverge
# silently: standard `=` never matches NULL, null-safe (`<=>` / IS NOT
# DISTINCT FROM) matches NULL=NULL, and outer-join padding interacts with
# both. The joined frame is reduced by a deterministic aggregate over
# left-table columns so the compare stays small and canonical.
# ---------------------------------------------------------------------------

_JOIN_TYPES = [
    # (spark how, sql template kind)
    ("inner", "inner"),
    ("left", "left"),
    ("right", "right"),
    ("full", "full"),
    ("left_semi", "semi"),
    ("left_anti", "anti"),
]
_NULL_MODS = [7, 13]  # o_orderkey % m == 0 → NULL left key
_RIGHT_NULL_MODS = [None, 11]  # c_custkey % m == 0 → NULL right key


@pytest.fixture(scope="module")
def join_tables(spark):
    from iceberg_rest_catalog_spark.operators.common import t

    return t(spark, SF, "orders"), t(spark, SF, "customer")


@pytest.fixture(scope="module")
def ddb_join():
    con = duckdb.connect()
    for name in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    return con


join_spec = st.tuples(
    st.sampled_from(range(len(_JOIN_TYPES))),
    st.sampled_from(_NULL_MODS),
    st.sampled_from(_RIGHT_NULL_MODS),
    st.booleans(),  # null-safe equality?
)


@settings(
    max_examples=24,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(join_spec)
def test_random_null_key_join_matches_duckdb(join_tables, ddb_join, spec):
    from pyspark.sql import functions as F

    jt_ix, lmod, rmod, null_safe = spec
    how, kind = _JOIN_TYPES[jt_ix]

    orders, customer = join_tables
    lkey = F.when(F.col("o_orderkey") % lmod == 0, F.lit(None)).otherwise(
        F.col("o_custkey")
    )
    left = orders.select(
        lkey.cast("long").alias("jk"), "o_orderpriority", "o_totalprice"
    )
    rkey = F.col("c_custkey")
    if rmod is not None:
        rkey = F.when(F.col("c_custkey") % rmod == 0, F.lit(None)).otherwise(
            F.col("c_custkey")
        )
    right = customer.select(rkey.cast("long").alias("ck"), "c_mktsegment")

    cond = left["jk"].eqNullSafe(right["ck"]) if null_safe else left["jk"] == right["ck"]
    joined = left.join(right, cond, how)
    # semi/anti expose only left columns; outer joins may NULL-pad either side
    df = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    )
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    lkey_sql = f"CASE WHEN o_orderkey % {lmod} = 0 THEN NULL ELSE o_custkey END"
    rkey_sql = (
        f"CASE WHEN c_custkey % {rmod} = 0 THEN NULL ELSE c_custkey END"
        if rmod is not None
        else "c_custkey"
    )
    eq = "IS NOT DISTINCT FROM" if null_safe else "="
    lsub = f"(SELECT {lkey_sql} AS jk, o_orderpriority, o_totalprice FROM orders) l"
    rsub = f"(SELECT {rkey_sql} AS ck, c_mktsegment FROM customer) r"
    if kind == "semi":
        frm = f"{lsub} WHERE EXISTS (SELECT 1 FROM {rsub} WHERE l.jk {eq} r.ck)"
    elif kind == "anti":
        frm = f"{lsub} WHERE NOT EXISTS (SELECT 1 FROM {rsub} WHERE l.jk {eq} r.ck)"
    else:
        jw = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
              "full": "FULL JOIN"}[kind]
        frm = f"{lsub} {jw} {rsub} ON l.jk {eq} r.ck"
    q = (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows, "
        f"round(sum(o_totalprice), 4) AS sum_price FROM {frm} "
        "GROUP BY o_orderpriority"
    )
    pdf = ddb_join.execute(q).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (spec, q, got[:3], want[:3])


# ---------------------------------------------------------------------------
# Window fuzz (round 6): rank / value / frame-agg specs with explicit null
# ordering.
#
# Spark's ASC default is NULLS FIRST; DuckDB's is NULLS LAST — every oracle
# in the registry therefore spells null placement out. The grammar samples
# (partition, nullable order expr, direction, null placement, function,
# frame) and requires bit-identical rows; the unique o_orderkey tiebreak in
# every ORDER BY keeps peer groups singleton so RANGE/ROWS defaults agree.
# ---------------------------------------------------------------------------

_WIN_PARTITIONS = [None, "o_orderpriority", "o_orderstatus"]
_WIN_ORDER_NULL_MODS = [None, 7]  # o_orderkey % m == 0 → NULL order value


@pytest.fixture(scope="module")
def win_orders(spark):
    from iceberg_rest_catalog_spark.operators.common import t

    return t(spark, SF, "orders")


win_spec = st.tuples(
    st.sampled_from(range(len(_WIN_PARTITIONS))),
    st.sampled_from(_WIN_ORDER_NULL_MODS),
    st.booleans(),  # descending?
    st.booleans(),  # nulls first?
    st.sampled_from(["row_number", "rank", "dense_rank", "lag", "sum_default",
                     "sum_rows2", "sum_unbounded", "first_value"]),
)


@settings(
    max_examples=24,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(win_spec)
def test_random_window_spec_matches_duckdb(win_orders, ddb_join, spec):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    part_ix, nmod, desc, nulls_first, fn = spec
    part = _WIN_PARTITIONS[part_ix]

    order_col = F.col("o_totalprice")
    order_sql = "o_totalprice"
    if nmod is not None:
        order_col = F.when(F.col("o_orderkey") % nmod == 0, F.lit(None)).otherwise(
            F.col("o_totalprice")
        )
        order_sql = f"CASE WHEN o_orderkey % {nmod} = 0 THEN NULL ELSE o_totalprice END"
    if desc:
        ordered = order_col.desc_nulls_first() if nulls_first else order_col.desc_nulls_last()
        dir_sql = "DESC NULLS FIRST" if nulls_first else "DESC NULLS LAST"
    else:
        ordered = order_col.asc_nulls_first() if nulls_first else order_col.asc_nulls_last()
        dir_sql = "ASC NULLS FIRST" if nulls_first else "ASC NULLS LAST"

    w = Window.partitionBy(*( [part] if part else [] )).orderBy(
        ordered, F.col("o_orderkey").asc()
    )
    over_sql = (
        (f"PARTITION BY {part} " if part else "")
        + f"ORDER BY {order_sql} {dir_sql}, o_orderkey ASC"
    )
    if fn == "row_number":
        val, vsql = F.row_number().over(w), f"row_number() OVER ({over_sql})"
    elif fn == "rank":
        val, vsql = F.rank().over(w), f"rank() OVER ({over_sql})"
    elif fn == "dense_rank":
        val, vsql = F.dense_rank().over(w), f"dense_rank() OVER ({over_sql})"
    elif fn == "lag":
        val = F.round(F.lag("o_totalprice", 1).over(w), 4)
        vsql = f"round(lag(o_totalprice, 1) OVER ({over_sql}), 4)"
    elif fn == "first_value":
        val = F.round(F.first("o_totalprice").over(w), 4)
        vsql = f"round(first_value(o_totalprice) OVER ({over_sql}), 4)"
    elif fn == "sum_rows2":
        val = F.round(F.sum("o_totalprice").over(w.rowsBetween(-2, 0)), 4)
        vsql = (
            f"round(sum(o_totalprice) OVER ({over_sql} "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)"
        )
    elif fn == "sum_unbounded":
        val = F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        )
        vsql = (
            f"round(sum(o_totalprice) OVER ({over_sql} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)"
        )
    else:  # sum_default: RANGE UNBOUNDED PRECEDING..CURRENT ROW in both engines
        val = F.round(F.sum("o_totalprice").over(w), 4)
        vsql = f"round(sum(o_totalprice) OVER ({over_sql}), 4)"

    df = win_orders.select("o_orderkey", val.alias("win_val"))
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    q = f"SELECT o_orderkey, {vsql} AS win_val FROM orders"
    pdf = ddb_join.execute(q).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (spec, q, got[:3], want[:3])


# -- family 4 (round 6): set operations over projected/filtered branches ----
#
# UNION/INTERSECT/EXCEPT each carry TWO cross-engine traps the fixed
# oracles only sample: bag-vs-set semantics (Spark's unionByName is UNION
# ALL, intersect/subtract are DISTINCT, intersectAll/exceptAll are the bag
# forms) and NULL equality (set ops treat NULL = NULL as a match, unlike
# join keys). Branch projections include a nullif-derived column so every
# sampled spec exercises NULL-bearing rows through the dedup machinery.

_PROJ = [
    ("flag", lambda F: F.col("l_returnflag"), "l_returnflag"),
    ("status", lambda F: F.col("l_linestatus"), "l_linestatus"),
    ("ln", lambda F: F.col("l_linenumber"), "l_linenumber"),
    (
        "tax_n",
        lambda F: F.when(F.col("l_tax") != 0.0, F.col("l_tax")),
        "nullif(l_tax, 0.0)",
    ),
    ("k5", lambda F: F.col("l_orderkey") % 5, "l_orderkey % 5"),
]

_SETOPS = [
    ("union_all", lambda a, b: a.unionByName(b), "UNION ALL"),
    ("union", lambda a, b: a.unionByName(b).distinct(), "UNION"),
    ("intersect", lambda a, b: a.intersect(b), "INTERSECT"),
    ("intersect_all", lambda a, b: a.intersectAll(b), "INTERSECT ALL"),
    ("except_d", lambda a, b: a.subtract(b), "EXCEPT"),
    ("except_all", lambda a, b: a.exceptAll(b), "EXCEPT ALL"),
]

setop_spec = st.tuples(
    st.lists(
        st.sampled_from(range(len(_PROJ))), unique=True, min_size=1, max_size=3
    ),
    st.sampled_from(range(len(_PREDICATES))),
    st.sampled_from(range(len(_PREDICATES))),
    st.sampled_from(range(len(_SETOPS))),
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(setop_spec)
def test_random_setop_matches_duckdb(lineitem, ddb, spec):
    from pyspark.sql import functions as F

    proj_ix, pa_ix, pb_ix, op_ix = spec
    projs = [_PROJ[i] for i in proj_ix]
    _, pa_build, pa_sql = _PREDICATES[pa_ix]
    _, pb_build, pb_sql = _PREDICATES[pb_ix]
    _, op_build, op_sql = _SETOPS[op_ix]

    cols = [build(F).alias(name) for name, build, _ in projs]
    a = lineitem.filter(pa_build(F)).select(*cols)
    b = lineitem.filter(pb_build(F)).select(*cols)
    got = _canon([tuple(r) for r in op_build(a, b).collect()])

    sel = ", ".join(f"{sql} AS {name}" for name, _, sql in projs)
    want = _canon(
        ddb.execute(
            f"SELECT {sel} FROM lineitem WHERE {pa_sql} "
            f"{op_sql} SELECT {sel} FROM lineitem WHERE {pb_sql}"
        ).fetchall()
    )
    assert got == want


# -- family 5 (round 7): subquery predicates under three-valued logic --------
#
# Correlated EXISTS / NOT EXISTS and (NOT) IN subqueries with NULLs injected
# into the outer key, the inner key, or both — exactly the corner
# (q_sub_not_in_null) where hand-written oracles go subtly wrong: `x NOT IN
# (list containing NULL)` is never TRUE, NULL outer keys fail both IN and
# NOT IN, while EXISTS is immune to key NULLs on the inner side it never
# compares. One SQL text is built per spec and executed on BOTH engines
# (Spark over temp views, so Catalyst plans the real null-aware anti join —
# a hand-rolled left-anti would silently get the poisoned cases wrong).

_SUB_KINDS = ["in", "not_in", "exists", "not_exists"]
_SUB_KEY_MODS = [None, 7, 13]  # o_custkey % m == 0 -> NULL outer key
_SUB_INNER_MODS = [None, 11]  # c_custkey % m == 0 -> NULL inner key
_SUB_INNER_PREDS = [
    "TRUE",
    "c_acctbal > 5000.0",
    "c_mktsegment = 'BUILDING'",
    "c_acctbal < 0.0",  # near-empty inner set: (NOT) IN against {} / {NULL}
]


@pytest.fixture(scope="module")
def sub_views(spark):
    from iceberg_rest_catalog_spark.operators.common import t

    t(spark, SF, "orders").createOrReplaceTempView("fz_orders")
    t(spark, SF, "customer").createOrReplaceTempView("fz_customer")
    return spark


sub_spec = st.tuples(
    st.sampled_from(range(len(_SUB_KINDS))),
    st.sampled_from(_SUB_KEY_MODS),
    st.sampled_from(_SUB_INNER_MODS),
    st.sampled_from(range(len(_SUB_INNER_PREDS))),
)


def _sub_sql(kind: str, kmod, imod, ipred: str, orders: str, customer: str) -> str:
    okey = (
        f"CASE WHEN o_orderkey % {kmod} = 0 THEN NULL ELSE o_custkey END"
        if kmod is not None
        else "o_custkey"
    )
    ikey = (
        f"CASE WHEN c_custkey % {imod} = 0 THEN NULL ELSE c_custkey END"
        if imod is not None
        else "c_custkey"
    )
    outer = f"(SELECT {okey} AS jk, o_orderpriority, o_totalprice FROM {orders}) o"
    if kind in ("in", "not_in"):
        neg = "NOT " if kind == "not_in" else ""
        where = f"o.jk {neg}IN (SELECT {ikey} FROM {customer} WHERE {ipred})"
    else:
        neg = "NOT " if kind == "not_exists" else ""
        where = (
            f"{neg}EXISTS (SELECT 1 FROM {customer} c"
            f" WHERE {ikey} = o.jk AND {ipred})"
        )
    return (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows, "
        f"round(sum(o_totalprice), 4) AS sum_price FROM {outer} "
        f"WHERE {where} GROUP BY o_orderpriority"
    )


@settings(
    max_examples=24,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sub_spec)
def test_random_subquery_predicate_matches_duckdb(sub_views, ddb_join, spec):
    kind_ix, kmod, imod, ipred_ix = spec
    kind = _SUB_KINDS[kind_ix]
    ipred = _SUB_INNER_PREDS[ipred_ix]

    spark = sub_views
    sq = _sub_sql(kind, kmod, imod, ipred, "fz_orders", "fz_customer")
    df = spark.sql(sq)
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    dq = _sub_sql(kind, kmod, imod, ipred, "orders", "customer")
    pdf = ddb_join.execute(dq).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (spec, sq, got[:3], want[:3])


# -- family 6 (round 8): random ROWS/RANGE frame specs -----------------------
#
# The 7 q_win_* oracles rest on hand-written frame + tiebreak discipline;
# this family fuzzes the frame grammar itself (VERDICT r7 item 5): mode
# (ROWS/RANGE), random preceding/following bounds, direction, NULL
# placement, and five frame aggregates, requiring bit-identical rows.
# Both engines execute the SAME SQL text, so any divergence is engine
# semantics, not query-translation skew.
#
# Convention notes the family enforces:
# - ROWS frames depend on the total order -> o_orderkey tiebreak is always
#   present (with optional NULL injection into the leading order expr);
# - RANGE frames with numeric offsets require exactly ONE order expression
#   in Spark -> single non-null order column; frame membership is by value
#   distance, so peers make the result deterministic without a tiebreak.

# Aggregate in exact integer CENTS: windowed float sums diverge between
# engines in the last ulp (DuckDB aggregates frames via segment trees,
# Spark sequentially — different FP association), and the fuzzer WILL find
# a value sitting on a 4-dp rounding boundary.  Frame SEMANTICS — what this
# family tests — are unaffected; integer math makes the comparison exact.
_PRICE_C = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
_F6_FNS = {
    "sum": f"CAST(sum({_PRICE_C}) OVER ({{w}}) AS DOUBLE)",  # duckdb sum->hugeint
    # explicit half-away-from-zero at 4 dp (repo oracle convention): the
    # engines' native round() disagree on ...X.Y5-boundary doubles (Spark
    # rounds the exact binary expansion via BigDecimal HALF_UP, DuckDB a
    # scaled nearbyint); floor(x*1e4 + 0.5) is the same double ops on both.
    # Prices are positive, so no sign branch needed.
    "avg": (
        f"floor(CAST(sum({_PRICE_C}) OVER ({{w}}) AS DOUBLE)"
        " / count(*) OVER ({w}) / 100 * 10000 + 0.5) / 10000"
    ),
    "min": f"min({_PRICE_C}) OVER ({{w}})",
    "max": f"max({_PRICE_C}) OVER ({{w}})",
    "count": "CAST(count(*) OVER ({w}) AS BIGINT)",
}
_F6_STARTS = ["ub", 2, 0]  # UNBOUNDED PRECEDING | k PRECEDING | CURRENT ROW
_F6_ENDS = [0, 3, "ub"]    # CURRENT ROW | k FOLLOWING | UNBOUNDED FOLLOWING


def _f6_frame(mode: str, start, end) -> str:
    scale = 1000 if mode == "range" else 1  # o_totalprice spans ~1e3..5e5
    lo = (
        "UNBOUNDED PRECEDING"
        if start == "ub"
        else ("CURRENT ROW" if start == 0 else f"{start * scale} PRECEDING")
    )
    hi = (
        "UNBOUNDED FOLLOWING"
        if end == "ub"
        else ("CURRENT ROW" if end == 0 else f"{end * scale} FOLLOWING")
    )
    return f"{mode.upper()} BETWEEN {lo} AND {hi}"


frame_spec = st.tuples(
    st.sampled_from(range(len(_WIN_PARTITIONS))),
    st.booleans(),  # descending?
    st.booleans(),  # nulls first?
    st.sampled_from(["rows", "range"]),
    st.sampled_from(range(len(_F6_STARTS))),
    st.sampled_from(range(len(_F6_ENDS))),
    st.sampled_from(sorted(_F6_FNS)),
    st.sampled_from([None, 7]),  # NULL-inject order expr (ROWS mode only)
)


@settings(
    max_examples=32,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frame_spec)
def test_random_frame_spec_matches_duckdb(win_orders, ddb_join, spec):
    part_ix, desc, nulls_first, mode, s_ix, e_ix, fn, nmod = spec
    part = _WIN_PARTITIONS[part_ix]
    start, end = _F6_STARTS[s_ix], _F6_ENDS[e_ix]

    dir_sql = ("DESC" if desc else "ASC") + (
        " NULLS FIRST" if nulls_first else " NULLS LAST"
    )
    if mode == "range":
        # single numeric order expression (Spark's rangeBetween contract)
        order_sql = f"o_totalprice {dir_sql}"
    else:
        lead = "o_totalprice"
        if nmod is not None:
            lead = f"CASE WHEN o_orderkey % {nmod} = 0 THEN NULL ELSE o_totalprice END"
        order_sql = f"{lead} {dir_sql}, o_orderkey ASC"

    over = (
        (f"PARTITION BY {part} " if part else "")
        + f"ORDER BY {order_sql} {_f6_frame(mode, start, end)}"
    )
    sql = f"SELECT o_orderkey, {_F6_FNS[fn].format(w=over)} AS win_val FROM {{tbl}}"

    spark = win_orders.sparkSession
    win_orders.createOrReplaceTempView("f6_orders")
    df = spark.sql(sql.format(tbl="f6_orders"))
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    pdf = ddb_join.execute(sql.format(tbl="orders")).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (spec, sql, got[:3], want[:3])


# -- family 7 (round 8): grouping sets / rollup / cube -----------------------
#
# The Expand-operator surface: random grouping-set combinations over two
# grouping columns + a filter, with the NULL group markers and the
# grouping-set duplicate semantics (a set listed twice emits its rows
# twice in BOTH engines).  Identical SQL text on both engines; aggregates
# follow the family-6 exact-integer convention.

# Every set list references BOTH columns somewhere: Spark rejects
# grouping(c) when c appears in no grouping set (GROUPING_COLUMN_MISMATCH),
# where DuckDB would permit it — a grammar constraint, not a semantics gap.
_F7_SETS = [
    "((o_orderstatus), (o_orderpriority))",
    "((o_orderstatus, o_orderpriority), (o_orderstatus), ())",
    "((o_orderpriority), (o_orderstatus, o_orderpriority))",
    "((o_orderstatus, o_orderpriority), ())",
    "ROLLUP (o_orderstatus, o_orderpriority)",
    "CUBE (o_orderstatus, o_orderpriority)",
    # duplicate set listed twice: its rows emit twice in both engines
    "((o_orderstatus, o_orderpriority), (o_orderstatus, o_orderpriority))",
]
_F7_FILTERS = [None, "o_totalprice > 150000", "o_orderkey % 3 = 0"]


def _f7_sql(set_ix: int, filt_ix: int, tbl: str) -> str:
    gs = _F7_SETS[set_ix]
    clause = gs if gs.startswith(("ROLLUP", "CUBE")) else f"GROUPING SETS {gs}"
    where = f"WHERE {_F7_FILTERS[filt_ix]} " if _F7_FILTERS[filt_ix] else ""
    return (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sum_c, "
        "CAST(grouping(o_orderstatus) AS BIGINT) AS g_status, "
        "CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio "
        f"FROM {tbl} {where}GROUP BY {clause}"
    )


@settings(
    max_examples=21,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.sampled_from(range(len(_F7_SETS))),
    st.sampled_from(range(len(_F7_FILTERS))),
)
def test_random_grouping_sets_match_duckdb(win_orders, ddb_join, set_ix, filt_ix):
    spark = win_orders.sparkSession
    win_orders.createOrReplaceTempView("f7_orders")
    df = spark.sql(_f7_sql(set_ix, filt_ix, "f7_orders"))
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    pdf = ddb_join.execute(_f7_sql(set_ix, filt_ix, "orders")).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (set_ix, filt_ix, got[:3], want[:3])


# -- family 8 (round 8): as-of joins vs DuckDB's native ASOF JOIN ------------
#
# q_join_asof / q_join_asof_tolerance implement as-of via the union+window
# carry-forward composition (one user_id shuffle, no range-join blowup).
# Their fixed oracles pin ONE instance; this family fuzzes the semantic
# grid around the composition — direction (backward/forward), strictness
# (inclusive/strict at equal timestamps), join type (left/inner), key
# granularity (raw user_id or a modulus that piles users onto shared
# keys), and timestamp QUANTIZATION (coarser buckets manufacture the
# equal-ts ties where inclusive/strict conventions actually bite) — and
# requires bit-identical rows against DuckDB's engine-native ASOF JOIN,
# which shares none of the composition's machinery.
#
# Conventions the family enforces (and documents):
# - the right side is deduped to one row per (key, ts) with max(value),
#   making the as-of pick deterministic under right-side ties (the
#   q_join_asof GROUP BY convention);
# - at equal quantized ts the right row sorts BEFORE the left row for
#   inclusive semantics and AFTER it for strict — the is_l tiebreak IS
#   the strictness switch;
# - keys are non-null by construction: the union+window composition would
#   happily carry values across a NULL-key partition (window PARTITION BY
#   groups NULLs) where a relational join matches nothing, so production
#   callers must pre-filter NULL keys — both texts filter them here.

_F8_TYPES = ["click", "view", "purchase", "error", "signup"]


@pytest.fixture(scope="module")
def f8_events(spark):
    from iceberg_rest_catalog_spark.operators.common import t

    return t(spark, SF, "events")


@pytest.fixture(scope="module")
def f8_ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


asof_spec = st.tuples(
    st.sampled_from(range(len(_F8_TYPES))),   # left event type
    st.sampled_from(range(len(_F8_TYPES))),   # right event type
    st.sampled_from([None, 3, 17]),           # key modulus (None = raw user)
    st.sampled_from([1, 60, 3600, 86400]),    # ts quantum (seconds)
    st.booleans(),                            # forward?
    st.booleans(),                            # strict?
    st.booleans(),                            # inner?
    st.sampled_from([None, 3600, 86400]),     # tolerance (seconds)
)


@settings(
    max_examples=32,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_spec)
def test_random_asof_join_matches_duckdb(f8_events, f8_ddb, spec):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    l_ix, r_ix, kmod, q, fwd, strict, inner, tol = spec
    lt, rt = _F8_TYPES[l_ix], _F8_TYPES[r_ix % len(_F8_TYPES)]
    if lt == rt:
        rt = _F8_TYPES[(r_ix + 1) % len(_F8_TYPES)]
    key_sql = f"user_id % {kmod}" if kmod else "user_id"

    # ---- DuckDB: native ASOF JOIN over the same quantized frame ----
    op = {
        (False, False): ">=",  # backward inclusive: latest right at/before
        (False, True): ">",
        (True, False): "<=",   # forward: earliest right at/after
        (True, True): "<",
    }[(fwd, strict)]
    jt = "ASOF JOIN" if inner else "ASOF LEFT JOIN"
    sql = f"""
    WITH lhs AS (
      SELECT event_id, {key_sql} AS k,
             CAST(floor(epoch_us(ts) / ({q} * 1000000.0)) * {q} AS BIGINT) AS tsq
      FROM events WHERE event_type = '{lt}' AND user_id IS NOT NULL
    ), rhs AS (
      SELECT {key_sql} AS k,
             CAST(floor(epoch_us(ts) / ({q} * 1000000.0)) * {q} AS BIGINT) AS tsq,
             max(value) AS rv
      FROM events WHERE event_type = '{rt}' AND user_id IS NOT NULL
      GROUP BY k, tsq
    )
    SELECT lhs.event_id, lhs.k, lhs.tsq,
           round(rhs.rv, 4) AS rv, rhs.tsq AS r_tsq
    FROM lhs {jt} rhs ON lhs.k = rhs.k AND lhs.tsq {op} rhs.tsq
    """
    # bounded staleness: the as-of match is unique, so a tolerance is a
    # POST-filter on the match gap (the q_join_asof_tolerance convention)
    # -- too-stale matches null out (left) or drop the row (inner)
    if tol is not None:
        gap = "(q.r_tsq - q.tsq)" if fwd else "(q.tsq - q.r_tsq)"
        keep = f"{gap} <= {tol}"
        if inner:
            sql = f"SELECT * FROM ({sql}) q WHERE {keep}"
        else:
            sql = (
                f"SELECT q.event_id, q.k, q.tsq, "
                f"CASE WHEN {keep} THEN q.rv END AS rv, "
                f"CASE WHEN {keep} THEN q.r_tsq END AS r_tsq "
                f"FROM ({sql}) q"
            )
    pdf = f8_ddb.execute(sql).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    # ---- Spark: union + window carry-forward composition ----
    ev = f8_events.filter(F.col("user_id").isNotNull())
    key = (F.col("user_id") % kmod) if kmod else F.col("user_id")
    # fixture ts is TIMESTAMP_NTZ; session tz is UTC so the cast is the
    # identity epoch — single double division, identical operands to the
    # oracle's epoch_us path
    tsq = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / (q * 1e6)) * q
    ).cast("bigint")
    lhs = ev.filter(F.col("event_type") == lt).select(
        "event_id", key.alias("k"), tsq.alias("tsq")
    )
    rhs = (
        ev.filter(F.col("event_type") == rt)
        .select(key.alias("k"), tsq.alias("tsq"), "value")
        .groupBy("k", "tsq")
        .agg(F.max("value").alias("rv"))
    )
    tagged = lhs.select(
        "k",
        "tsq",
        F.lit(1).alias("is_l"),
        "event_id",
        F.lit(None).cast("double").alias("rv"),
    ).unionByName(
        rhs.select(
            "k",
            "tsq",
            F.lit(0).alias("is_l"),
            F.lit(None).cast("long").alias("event_id"),
            "rv",
        )
    )
    ts_ord = F.col("tsq").desc() if fwd else F.col("tsq").asc()
    # inclusive: right (is_l=0) first at equal ts; strict: left first
    tie_ord = F.col("is_l").desc() if strict else F.col("is_l").asc()
    w = (
        Window.partitionBy("k")
        .orderBy(ts_ord, tie_ord)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "rv_c", F.last("rv", ignorenulls=True).over(w)
    ).withColumn(
        "r_tsq",
        F.last(
            F.when(F.col("is_l") == 0, F.col("tsq")), ignorenulls=True
        ).over(w),
    )
    out = carried.filter(F.col("is_l") == 1).select(
        "event_id", "k", "tsq", F.round("rv_c", 4).alias("rv"), "r_tsq"
    )
    if tol is not None:
        gap = (
            (F.col("r_tsq") - F.col("tsq"))
            if fwd
            else (F.col("tsq") - F.col("r_tsq"))
        )
        keep = gap <= tol
        out = out.select(
            "event_id",
            "k",
            "tsq",
            F.when(keep, F.col("rv")).alias("rv"),
            F.when(keep, F.col("r_tsq")).alias("r_tsq"),
        )
    if inner:
        out = out.filter(F.col("rv").isNotNull())
    out = out.select(*sorted(out.columns))
    got = _canon([tuple(r) for r in out.collect()])

    assert got == want, (spec, len(got), len(want), got[:3], want[:3])


# -- family 9 (round 8): outer joins feeding grouped aggregates --------------
#
# Families 2 and 1 cover joins and filter/group/agg separately; their
# COMPOSITION is where three NULL regimes interact: injected NULL join
# keys (never match), outer-join padding (whole right/left rows become
# NULL), and aggregate NULL discipline (count(*) counts padded rows,
# count(col) skips them, sum/min ignore them, count(DISTINCT) collapses
# them). Grouping on the padded side puts every unmatched row in the
# NULL group — the exact surface where an oracle translation silently
# drifts (Spark groups NULL keys together, as does SQL GROUP BY, but a
# writer who filters "key IS NOT NULL" on one side only diverges).

_F9_JOINS = ["inner", "left", "right", "full"]
_F9_GROUPS = [
    ("c_mktsegment",),            # right-table key: padded rows -> NULL group
    ("o_orderpriority",),         # left-table key
    ("o_orderpriority", "c_mktsegment"),
]
_F9_AGGS = [
    ("n_rows", "CAST(count(*) AS BIGINT)"),
    ("n_bal", "CAST(count(c_acctbal) AS BIGINT)"),       # skips padded rows
    ("sum_price", "round(sum(o_totalprice), 4)"),
    ("min_name", "min(c_name)"),
    ("n_cust", "CAST(count(DISTINCT c_custkey) AS BIGINT)"),
]

f9_spec = st.tuples(
    st.sampled_from(range(len(_F9_JOINS))),
    st.sampled_from(range(len(_F9_GROUPS))),
    st.lists(
        st.sampled_from(range(len(_F9_AGGS))), unique=True, min_size=1,
        max_size=3,
    ),
    st.sampled_from([None, 7, 13]),   # NULL-inject left key mod
    st.sampled_from([None, 11]),      # NULL-inject right key mod
)


@settings(
    max_examples=28,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(f9_spec)
def test_random_join_agg_composition_matches_duckdb(join_tables, ddb_join, spec):
    from pyspark.sql import functions as F

    j_ix, g_ix, agg_ix, lmod, rmod = spec
    how = _F9_JOINS[j_ix]
    groups = list(_F9_GROUPS[g_ix])
    aggs = [_F9_AGGS[i] for i in agg_ix]

    orders, customer = join_tables
    lkey_sql = (
        f"CASE WHEN o_orderkey % {lmod} = 0 THEN NULL ELSE o_custkey END"
        if lmod
        else "o_custkey"
    )
    rkey_sql = (
        f"CASE WHEN c_custkey % {rmod} = 0 THEN NULL ELSE c_custkey END"
        if rmod
        else "c_custkey"
    )
    sel = ", ".join([*groups, *[f"{s} AS {n}" for n, s in aggs]])
    sql = f"""
    SELECT {sel} FROM
      (SELECT *, {lkey_sql} AS lk FROM orders) o
      {how.upper()} JOIN
      (SELECT *, {rkey_sql} AS rk FROM customer) c
      ON o.lk = c.rk
    GROUP BY {', '.join(groups)}
    """
    pdf = ddb_join.execute(sql).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    o = orders.withColumn(
        "lk",
        F.when(F.col("o_orderkey") % lmod == 0, None).otherwise(
            F.col("o_custkey")
        )
        if lmod
        else F.col("o_custkey"),
    )
    c = customer.withColumn(
        "rk",
        F.when(F.col("c_custkey") % rmod == 0, None).otherwise(
            F.col("c_custkey")
        )
        if rmod
        else F.col("c_custkey"),
    )
    joined = o.join(c, o.lk == c.rk, how)
    sp_aggs = {
        "n_rows": F.count("*").cast("bigint"),
        "n_bal": F.count("c_acctbal").cast("bigint"),
        "sum_price": F.round(F.sum("o_totalprice"), 4),
        "min_name": F.min("c_name"),
        "n_cust": F.countDistinct("c_custkey").cast("bigint"),
    }
    df = joined.groupBy(*groups).agg(
        *[sp_aggs[n].alias(n) for n, _ in aggs]
    )
    df = df.select(*sorted(df.columns))
    got = _canon([tuple(r) for r in df.collect()])

    assert got == want, (spec, sql, got[:3], want[:3])


# -- family 10 (round 9): window-width explode rolling recurrences -----------
#
# q_evt_rolling_dau / q_evt_stickiness / q_ts_ewma share a house pattern
# no prior family touches: pre-aggregate to per-day rows, EXPLODE each day
# onto the <= W trailing target days it serves (sequence + explode), weight
# by the day gap, and finish with one grouped aggregate per target day —
# the only distributed shape for rolling COUNT(DISTINCT) / distance-
# weighted smoothing, which window frames cannot express.  Their fixed
# oracles pin W=7/28/14 with one weight function each; this family fuzzes
# the width, the weight curve, the pre-aggregate metric, and a row
# predicate, and checks the EXPLODED formulation against DuckDB's
# DEFINITIONAL range self-join (s.d BETWEEN t.d - (W-1) AND t.d) — two
# genuinely different formulations that must agree pair-for-pair.
#
# Conventions the family enforces (family-6 exact-integer discipline):
# weights are INTEGERS (flat 1 / linear W-gap / geometric 1<<gap), so
# sums compare bit-exactly with no rounding convention in play; the
# partial-window head is honest (only observed days contribute, targets
# are semi-joined back to observed days).

_F10_PREDS = [
    ("all", None, "TRUE"),
    ("click", "event_type = 'click'", "event_type = 'click'"),
    ("uid_mod", "user_id % 3 = 0", "user_id % 3 = 0"),
    ("val_hi", "value > 50.0", "value > 50.0"),
]
_F10_WEIGHTS = ["flat", "linear", "geom"]
_F10_METRICS = ["events", "users"]  # per-day n = count(*) vs count(DISTINCT user)


@pytest.fixture(scope="module")
def events_df(spark):
    from iceberg_rest_catalog_spark.operators.common import t

    return t(spark, SF, "events")


@pytest.fixture(scope="module")
def ddb_events(events_df):
    # Route the SQL side through the SPARK-read frame (ts already
    # nanos-decoded) so both engines see identical timestamps; the frame
    # is |events|-small at sf0.001.
    con = duckdb.connect()
    pdf = events_df.select("event_id", "ts", "user_id", "event_type", "value").toPandas()
    con.register("events", pdf)
    return con


f10_spec = st.tuples(
    st.integers(min_value=1, max_value=35),               # window width W
    st.sampled_from(range(len(_F10_WEIGHTS))),
    st.sampled_from(range(len(_F10_METRICS))),
    st.sampled_from(range(len(_F10_PREDS))),
)


@settings(
    max_examples=24,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(f10_spec)
def test_window_width_explode_matches_range_self_join(events_df, ddb_events, spec):
    from pyspark.sql import functions as F

    W, w_ix, m_ix, p_ix = spec
    weight = _F10_WEIGHTS[w_ix]
    metric = _F10_METRICS[m_ix]
    _, sp_pred, sql_pred = _F10_PREDS[p_ix]

    # --- per-day pre-aggregate (the big shrink) ---
    base = events_df.filter(sp_pred) if sp_pred else events_df
    if metric == "events":
        dc = base.groupBy(F.to_date("ts").alias("d")).agg(
            F.count("*").cast("long").alias("n")
        )
        n_sql = "CAST(count(*) AS BIGINT)"
    else:
        dc = base.groupBy(F.to_date("ts").alias("d")).agg(
            F.countDistinct("user_id").cast("long").alias("n")
        )
        n_sql = "CAST(count(DISTINCT user_id) AS BIGINT)"

    # --- Spark: the house explode pattern ---
    days = dc.select("d").distinct()
    gap = F.datediff("target", "d")
    w_expr = {
        "flat": F.lit(1).cast("long"),
        "linear": (F.lit(W) - gap).cast("long"),
        # F.shiftleft needs a literal bit count; the SQL form takes a column
        "geom": F.expr("shiftleft(CAST(1 AS BIGINT), datediff(target, d))"),
    }[weight]
    contrib = dc.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), W - 1))).alias(
            "target"
        ),
        "d",
        "n",
    ).withColumn("w", w_expr).drop("d")
    roll = (
        contrib.join(F.broadcast(days), contrib.target == days.d)
        .groupBy("target")
        .agg(F.sum(F.col("w") * F.col("n")).cast("long").alias("wsum"))
        .select(
            F.date_format("target", "yyyy-MM-dd").alias("day"), "wsum"
        )
    )
    got = _canon([tuple(r) for r in roll.collect()])

    # --- DuckDB: the definitional range self-join ---
    w_sql = {
        "flat": "1::BIGINT",
        "linear": f"({W} - datediff('day', s.d, t.d))::BIGINT",
        "geom": "(1::BIGINT << datediff('day', s.d, t.d))",
    }[weight]
    sql = f"""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS d, {n_sql} AS n
      FROM events WHERE {sql_pred} GROUP BY 1
    ), days AS (SELECT DISTINCT d FROM dc)
    SELECT strftime(t.d, '%Y-%m-%d') AS day,
           CAST(sum({w_sql} * s.n) AS BIGINT) AS wsum
    FROM days t
    JOIN dc s ON s.d BETWEEN t.d - INTERVAL {W - 1} DAY AND t.d
    GROUP BY t.d
    """
    pdf = ddb_events.execute(sql).fetchdf()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    want = _canon([tuple(r) for r in pdf.itertuples(index=False, name=None)])

    assert got == want, (spec, sql, got[:3], want[:3])


# -- family 11 (round 9): sequential coupled recurrences ----------------------
#
# q_ts_holt introduces a pattern no prior family touches: a recurrence with
# INFINITE memory through two coupled states (level, trend), which the
# window-width explode (family 10) cannot express.  The repo computes it as
# a single-group applyInPandas Python loop; the oracle technique unrolls
# the SAME recurrence as a DuckDB RECURSIVE CTE.  The fixed oracle pins one
# (alpha, beta) pair over one metric; this family fuzzes the smoothing
# constants, the per-day metric and a row predicate, and checks loop vs
# recursive-CTE agreement at the house 4-dp canonicalization.
#
# Conventions the family enforces:
# - alpha/beta are DYADIC rationals (k/8) so the decimal literal the SQL
#   side parses is the exact double the Python side computes with;
# - every SQL operand is CAST to DOUBLE (DuckDB parses bare numeric
#   literals as DECIMAL, whose arithmetic is not IEEE double — the
#   q_ts_holt oracle's documented gotcha, here fuzz-guarded);
# - operation ORDER is textually identical on both sides, so the raw
#   trajectories are bit-equal and the 4-dp rounding is cosmetic;
# - beta=0 is generated (trend frozen at its init y2-y1) — the edge where
#   a wrong init propagates forever.

_F11_METRICS = ["events", "users"]


f11_spec = st.tuples(
    st.integers(min_value=1, max_value=7),   # alpha = a8/8
    st.integers(min_value=0, max_value=7),   # beta  = b8/8
    st.sampled_from(range(len(_F11_METRICS))),
    st.sampled_from(range(len(_F10_PREDS))),
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(f11_spec)
def test_sequential_recurrence_loop_matches_recursive_cte(
    events_df, ddb_events, spec
):
    import pandas as pd
    from pyspark.sql import functions as F

    a8, b8, m_ix, p_ix = spec
    alpha, beta = a8 / 8, b8 / 8
    metric = _F11_METRICS[m_ix]
    _, sp_pred, sql_pred = _F10_PREDS[p_ix]

    base = events_df.filter(sp_pred) if sp_pred else events_df
    if metric == "events":
        dc = base.groupBy(F.to_date("ts").alias("d")).agg(
            F.count("*").cast("long").alias("n")
        )
        n_sql = "CAST(count(*) AS BIGINT)"
    else:
        dc = base.groupBy(F.to_date("ts").alias("d")).agg(
            F.countDistinct("user_id").cast("long").alias("n")
        )
        n_sql = "CAST(count(DISTINCT user_id) AS BIGINT)"

    # --- Spark: the registered query's single-group loop shape.  Rounding
    # uses the multiply-floor convention (= DuckDB round() bit-for-bit) —
    # the q_ts_holt perturbed-fixture finding: F.round is exact-value
    # HALF_UP and disagrees one ulp below a decimal midpoint. ---
    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        r = lambda x: math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)
        pdf = pdf.sort_values("d").reset_index(drop=True)
        ys = pdf["n"].tolist()
        lvl = float(ys[0])
        tr = float(ys[1] - ys[0]) if len(ys) > 1 else 0.0
        levels, trends = [r(lvl)], [r(tr)]
        for y in ys[1:]:
            new_l = alpha * y + (1 - alpha) * (lvl + tr)
            new_t = beta * (new_l - lvl) + (1 - beta) * tr
            lvl, tr = new_l, new_t
            levels.append(r(lvl))
            trends.append(r(tr))
        pdf["lvl"] = pd.Series(levels, dtype="float64")
        pdf["tr"] = pd.Series(trends, dtype="float64")
        return pdf[["g", "d", "n", "lvl", "tr"]]

    out = (
        dc.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(holt, "g int, d date, n long, lvl double, tr double")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            "lvl",
            "tr",
        )
    )
    got = _canon([tuple(r) for r in out.collect()])

    # --- DuckDB: the recursive-CTE unroll of the same recurrence ---
    A, B = f"CAST({alpha} AS DOUBLE)", f"CAST({beta} AS DOUBLE)"
    A1, B1 = f"CAST({1 - alpha} AS DOUBLE)", f"CAST({1 - beta} AS DOUBLE)"
    sql = f"""
    WITH RECURSIVE dc AS (
      SELECT CAST(ts AS DATE) AS d, {n_sql} AS n FROM events
      WHERE {sql_pred} GROUP BY 1
    ), idx AS (
      SELECT d, n, row_number() OVER (ORDER BY d) AS i FROM dc
    ), h(i, lvl, tr) AS (
      SELECT 1, CAST(n AS DOUBLE),
             CAST(coalesce((SELECT n FROM idx WHERE i = 2) - n, 0) AS DOUBLE)
      FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i,
             {A} * idx.n + {A1} * (h.lvl + h.tr),
             {B} * (({A} * idx.n + {A1} * (h.lvl + h.tr)) - h.lvl)
               + {B1} * h.tr
      FROM h JOIN idx ON idx.i = h.i + 1
    )
    SELECT strftime(idx.d, '%Y-%m-%d') AS day, idx.n,
           round(h.lvl, 4) AS lvl, round(h.tr, 4) AS tr
    FROM idx JOIN h ON h.i = idx.i
    """
    want = _canon([tuple(r) for r in ddb_events.execute(sql).fetchall()])
    assert got == want


# -- family 12 (round 9): Kaplan-Meier composition vs definitional SQL --------
#
# q_evt_survival composes the KM estimator distributively: sessions
# collapse to per-duration (count, ended) rows, the at-risk counts come
# from ONE descending cumulative-sum window over that tiny frame, and the
# survival product is a windowed product over death rows.  The
# DEFINITIONAL formulation computes each at-risk count as a correlated
# count over the raw duration table (n_t = COUNT(*) WHERE dur >= t) — a
# per-row rescan that is exactly what the composition exists to avoid at
# scale.  This family fuzzes the session gap, the censoring horizon, the
# duration unit and a row predicate, and requires the two formulations to
# agree row-for-row.
#
# Conventions the family enforces:
# - durations and censor flags are exact integer microsecond arithmetic
#   (DIV / //), never float division of timestamps;
# - at-risk/death counts are exact integers — the descending cumsum must
#   equal the correlated count at EVERY death time;
# - the survival product uses DuckDB's windowed product() on both sides
#   (same left-to-right multiply), rounded by the multiply-floor
#   convention the recurrence family standardized.

_F12_PREDS = [
    ("all", None, "TRUE"),
    ("click", "event_type = 'click'", "event_type = 'click'"),
    ("uid_mod", "user_id % 2 = 0", "user_id % 2 = 0"),
]


f12_spec = st.tuples(
    st.sampled_from([5, 10, 30, 60, 120]),   # session gap, minutes
    st.sampled_from([0, 5, 30, 240]),        # censor horizon, minutes
    st.sampled_from([60_000_000, 1_000_000]),  # duration unit (min / sec)
    st.sampled_from(range(len(_F12_PREDS))),
)


@settings(
    max_examples=16,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(f12_spec)
def test_km_composition_matches_definitional_sql(events_df, ddb_events, spec):
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_min, horizon_min, unit_us, p_ix = spec
    gap_us = gap_min * 60_000_000
    horizon_us = horizon_min * 60_000_000
    _, sp_pred, sql_pred = _F12_PREDS[p_ix]

    # --- Spark: the q_evt_survival composition ---
    ev = events_df.filter(sp_pred) if sp_pred else events_df
    ev = ev.select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull()
            | (prev < F.col("ts") - F.expr(f"INTERVAL {gap_min} MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    s = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("smin"), F.max("ts").alias("smax")
    )
    mx = ev.agg(F.max("ts").alias("tmax"))
    u = s.join(F.broadcast(mx)).select(
        F.expr(
            "(unix_micros(CAST(smax AS TIMESTAMP))"
            f" - unix_micros(CAST(smin AS TIMESTAMP))) DIV {unit_us}"
        ).alias("t"),
        F.when(
            F.unix_micros(F.col("tmax").cast("timestamp"))
            - F.unix_micros(F.col("smax").cast("timestamp"))
            > horizon_us,
            1,
        )
        .otherwise(0)
        .alias("ended"),
    )
    lc = u.groupBy("t").agg(F.count("*").alias("c"), F.sum("ended").alias("d"))
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dt = (
        lc.withColumn("n_risk", F.sum("c").over(wdesc))
        .filter(F.col("d") > 0)
        .select("t", "n_risk", "d")
        .collect()
    )
    r4_ = lambda x: math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)
    got, srv = [], 1.0
    for r in sorted(dt, key=lambda r: r.t):
        srv = srv * ((r.n_risk - r.d) / r.n_risk)
        got.append((int(r.t), int(r.n_risk), int(r.d), r4_(srv)))

    # --- DuckDB: the definitional correlated-count formulation ---
    sql = f"""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL {gap_min} MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE {sql_pred}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    s AS (SELECT user_id, sid, min(ts) AS smin, max(ts) AS smax
          FROM sess GROUP BY user_id, sid),
    mx AS (SELECT max(ts) AS tmax FROM events WHERE {sql_pred}),
    u AS (
      SELECT (epoch_us(smax) - epoch_us(smin)) // {unit_us} AS t,
             CASE WHEN epoch_us(tmax) - epoch_us(smax) > {horizon_us}
                  THEN 1 ELSE 0 END AS ended
      FROM s, mx),
    dt AS (
      SELECT t,
             (SELECT count(*) FROM u u2 WHERE u2.t >= u1.t) AS n_risk,
             sum(ended) AS d
      FROM u u1 GROUP BY t HAVING sum(ended) > 0)
    SELECT CAST(t AS BIGINT), CAST(n_risk AS BIGINT), CAST(d AS BIGINT),
           round(product(CAST(n_risk - d AS DOUBLE) / n_risk)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 4)
    FROM dt ORDER BY t
    """
    want = [
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in ddb_events.execute(sql).fetchall()
    ]
    assert got == want
