"""Property-based checks for the round-5 statistical operators.

The DuckDB oracles pin exact values on the fixtures; these hypothesis
tests re-derive the same statistics with independent pure-Python
reference implementations over RANDOM small inputs, so the algebra
(not just the fixture constants) is what's verified. Sessions are
reused and example counts kept small — each example round-trips a tiny
DataFrame through the real Spark plans.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _gini_ref(values):
    xs = sorted(values)
    n = len(xs)
    total = sum(xs)
    if n == 0 or total == 0:
        return None
    s = sum((i + 1) * x for i, x in enumerate(xs))
    return 2.0 * s / (n * total) - (n + 1.0) / n


def _entropy_ref(counts):
    total = sum(counts)
    return -sum((c / total) * math.log(c / total) for c in counts if c)


def _ks_ref(a, b):
    grid = sorted(set(a) | set(b))
    best = 0.0
    for v in grid:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


@SLOW
@given(
    st.lists(
        st.integers(min_value=1, max_value=500_000), min_size=2, max_size=40
    )
)
def test_gini_matches_reference(spark, spends):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(spends)], "k long, spend double"
    )
    w = Window.orderBy("spend", "k")
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    got = (
        df.select(
            "spend",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(whole).alias("n"),
            F.sum("spend").over(whole).alias("total"),
        )
        .agg(
            (
                2.0 * F.sum(F.col("rk") * F.col("spend"))
                / (F.max("n") * F.max("total"))
                - (F.max("n") + 1.0) / F.max("n")
            ).alias("gini")
        )
        .collect()[0]
        .gini
    )
    assert abs(got - _gini_ref(spends)) < 1e-9
    assert -1e-9 <= got < 1.0


@SLOW
@given(
    st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=8)
)
def test_entropy_matches_reference(spark, counts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "t long, n long"
    )
    tot = float(sum(counts))
    p = F.col("n") / F.lit(tot)
    got = df.agg((-F.sum(p * F.log(p))).alias("h")).collect()[0].h
    assert abs(got - _entropy_ref(counts)) < 1e-9
    assert -1e-9 <= got <= math.log(len(counts)) + 1e-9


@SLOW
@given(
    st.lists(
        st.floats(
            min_value=0.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2,
        max_size=25,
    ),
    st.lists(
        st.floats(
            min_value=0.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2,
        max_size=25,
    ),
)
def test_ks_running_sum_shape_matches_reference(spark, a, b):
    """The one-sort running-CDF formulation (q_evt_drift_ks's plan shape)
    equals the brute-force max-gap definition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = [round(x, 4) for x in a]
    b = [round(x, 4) for x in b]
    rows = [(x, 0) for x in a] + [(x, 1) for x in b]
    df = spark.createDataFrame(rows, "v double, g int")
    cnt = df.groupBy("v").agg(
        F.count(F.when(F.col("g") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("g") == 1, 1)).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    got = (
        cnt.select(
            (
                F.sum("c0").over(w).cast("double") / F.sum("c0").over(whole)
                - F.sum("c1").over(w).cast("double") / F.sum("c1").over(whole)
            ).alias("gap")
        )
        .agg(F.max(F.abs(F.col("gap"))).alias("ks"))
        .collect()[0]
        .ks
    )
    assert abs(got - _ks_ref(a, b)) < 1e-9


@SLOW
@given(
    st.lists(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=60
    )
)
def test_countmin_never_underestimates_on_random_keys(spark, keys):
    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.operators.aggregates import (
        CM_D,
        _cm_bucket_dyn,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    idx = F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias("i")
    ev = df.select("k", idx).select(
        "i", _cm_bucket_dyn(F.col("i"), F.col("k")).alias("bucket")
    )
    counters = ev.groupBy("i", "bucket").agg(F.count("*").alias("cnt"))
    truth = df.groupBy("k").agg(F.count("*").alias("true_cnt"))
    probes = truth.select("k", idx).select(
        "k", "i", _cm_bucket_dyn(F.col("i"), F.col("k")).alias("bucket")
    )
    est = (
        probes.join(counters, ["i", "bucket"])
        .groupBy("k")
        .agg(F.min("cnt").alias("cm_est"))
    )
    rows = truth.join(est, "k").collect()
    assert len(rows) == len(set(keys))
    for r in rows:
        assert r.cm_est >= r.true_cnt


@SLOW
@given(
    st.lists(
        st.floats(min_value=1.0, max_value=100.0, allow_nan=False),
        min_size=3,
        max_size=20,
    ),
    st.lists(
        st.floats(min_value=1.0, max_value=100.0, allow_nan=False),
        min_size=3,
        max_size=20,
    ),
)
def test_welch_z_matches_reference(spark, a, b):
    """The q_evt_ab_test plan shape (conditional-max pivot + Welch z)
    equals the direct python computation."""
    import statistics

    from pyspark.sql import functions as F

    va, vb = statistics.variance(a), statistics.variance(b)
    if va == 0 or vb == 0:
        return  # degenerate groups: z undefined, op never sees them
    expected = (statistics.mean(a) - statistics.mean(b)) / math.sqrt(
        va / len(a) + vb / len(b)
    )
    rows = [(x, 0) for x in a] + [(x, 1) for x in b]
    df = spark.createDataFrame(rows, "v double, g int")
    c = df.groupBy("g").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.var_samp("v").alias("s2"),
    )
    wide = c.agg(
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("g") == 0, F.col("m"))).alias("m_a"),
        F.max(F.when(F.col("g") == 0, F.col("s2"))).alias("v_a"),
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("g") == 1, F.col("m"))).alias("m_b"),
        F.max(F.when(F.col("g") == 1, F.col("s2"))).alias("v_b"),
    )
    z = wide.select(
        (
            (F.col("m_a") - F.col("m_b"))
            / F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
        ).alias("z")
    ).collect()[0].z
    assert abs(z - expected) < 1e-7

@SLOW
@given(
    st.sets(
        st.tuples(
            # 0-130 spans three 64-bit bitset words, so dense batches cross
            # word boundaries and exercise the full-words-above-wb /
            # partial-word-at-wb / wb>=n_words branches of _triangles_dense
            # (ADVICE r7: a 0-14 cap kept n_words == 1 forever).
            st.integers(min_value=0, max_value=130),
            st.integers(min_value=0, max_value=130),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_triangle_orientations_agree(spark, raw_pairs):
    """Triangle count is orientation-invariant: the dense bitset path
    (id-ordered masks), the degree-ordered sparse wedge join, and a naive
    pure-Python triple loop must agree on random graphs — this is the
    property that lets q_graph_triangles swap id-ordering for
    degree-ordering on big sparse graphs without touching the id-ordered
    DuckDB oracle."""
    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.operators.graph import (
        _triangles_dense,
        _triangles_sparse,
    )

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_pairs if a != b})
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    # naive reference: count node triples with all three edges present
    eset = set(edges)
    expected = sum(
        1
        for i, x in enumerate(nodes)
        for j in range(i + 1, len(nodes))
        for k in range(j + 1, len(nodes))
        if (x, nodes[j]) in eset
        and (x, nodes[k]) in eset
        and (nodes[j], nodes[k]) in eset
    )
    ei = spark.createDataFrame(edges, "ui int, vi int")
    n = max(x for e in edges for x in e) + 1
    got_dense = _triangles_dense(spark, ei, n).collect()[0].n
    got_sparse = _triangles_sparse(
        ei.select(F.col("ui").cast("long"), F.col("vi").cast("long"))
    ).collect()[0].n
    assert got_dense == expected
    assert got_sparse == expected


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
