"""Aggregation operators (SURVEY.md §2.B "Aggregations").

Scale notes: every groupBy here compiles to partial (map-side) + final hash
aggregation — the shuffle carries one row per (partition, group), not raw
data. ROLLUP/CUBE expand grouping sets *after* partial aggregation in
Spark's Expand operator; approx_count_distinct ships HLL sketches, not values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t, widen


@query(
    "q_agg_group",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS sum_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q_agg_group(spark, sf_dir):
    """Two-key hash aggregation (partial + final auto)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("sum_price"),
            r4(F.avg("o_totalprice")).alias("avg_price"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark, sf_dir):
    """COUNT(DISTINCT) — Spark plans a two-phase distinct aggregate."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           count(*) AS n_orders,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++). Sketches merge associatively —
    the shuffle carries fixed-size sketches regardless of data volume, which
    is the whole point at 100 TB.

    Oracle strategy: HLL estimates differ between engines, so the sketch
    itself can't hash-compare. Instead the query CHECKS ITS OWN estimate —
    it also computes the exact distinct count and emits a boolean asserting
    the rsd=0.02 sketch landed within 5%; the oracle computes the exact
    count and a literal TRUE. Hash equality therefore verifies both the
    exact values and that the sketch met its accuracy contract — a real
    value check, upgraded from the previous rows-only entry."""
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    exact = F.count_distinct("o_custkey")
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            exact.alias("exact_customers"),
            F.count("*").alias("n_orders"),
            (
                F.abs(approx - exact) <= F.lit(0.05) * exact
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "q_agg_hll_merge",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE AS merged_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_hll_merge(spark, sf_dir):
    """Two-level mergeable HLL rollup (DataSketches ``hll_sketch_agg`` /
    ``hll_union_agg`` / ``hll_sketch_estimate``, Spark 4).

    The 100 TB pattern this models: persist one fixed-size sketch per
    (group, partition) — e.g. distinct users per day — then answer any
    coarser rollup (per month, all time) by UNIONING the stored sketches,
    never rescanning raw data. Stage 1 builds a sketch per
    (o_orderstatus, order month); stage 2 merges the monthly sketches per
    status with ``hll_union_agg``. The shuffle between the stages carries
    ~1 KB binary sketches per group regardless of row count.

    Oracle strategy: sketch estimates aren't cross-engine-reproducible, so
    (as q_agg_approx_distinct) the query self-asserts — it computes the
    exact distinct count and a boolean that the MERGED estimate landed
    within 5%; the oracle emits the exact count and a literal TRUE.
    """
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderstatus", F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sketch"))
    merged = monthly.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_estimate")
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return exact.join(merged, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("merged_estimate") - F.col("exact_customers"))
            <= F.lit(0.05) * F.col("exact_customers")
        ).alias("merged_within_5pct"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15 AND sum(o_totalprice) > 2000000.0
    """,
)
def q_agg_having(spark, sf_dir):
    """Post-aggregation filter (HAVING)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("raw_sum"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("raw_sum") > 2000000.0))
        .select("o_custkey", "n_orders", r4("raw_sum").alias("sum_price"))
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy: (flag,status) → (flag) → ()."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), r4(F.sum("l_quantity")).alias("sum_qty"))
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark, sf_dir):
    """CUBE: all 4 grouping-set combinations."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), r4(F.sum("l_quantity")).alias("sum_qty"))
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via SQL (no DataFrame-API equivalent)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
           count(*) AS n_lines
    FROM lineitem WHERE l_orderkey <= 200
    GROUP BY l_orderkey
    """,
)
def q_agg_collect(spark, sf_dir):
    """collect_list, order-normalized via sort_array then stringified so the
    hash compare is array-representation-agnostic."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("l_linenumber")), ",").alias(
                "linenumbers"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_agg_mode_median",
    oracle="""
    SELECT o_orderstatus,
           min(o_orderpriority)            AS first_priority,
           median(o_totalprice)            AS median_price,
           bool_and(o_totalprice > 0)      AS all_positive,
           bool_or(o_totalprice > 400000)  AS any_large
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_mode_median(spark, sf_dir):
    """Order statistics + boolean aggregates: median, bool_and/bool_or
    (min() stands in for a deterministic mode on the synthetic uniform
    priorities, where mode tie-breaking differs across engines)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_orderpriority").alias("first_priority"),
        F.median("o_totalprice").alias("median_price"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_large"),
    )


@query(
    "q_agg_filtered",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05)      AS n_discounted,
           CAST(round(sum(l_quantity) FILTER (WHERE l_tax > 0.04), 4) AS DOUBLE)
               AS qty_taxed,
           bool_and(l_quantity <= 50)                     AS all_small,
           bool_or(l_discount >= 0.09)                    AS any_deep_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_filtered(spark, sf_dir):
    """Conditional aggregates: FILTER-clause counts/sums and boolean
    every/any per group — one hash aggregate, the conditions evaluate
    map-side inside the partial agg (no extra pass, no shuffle beyond the
    group-by's)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_quantity"))), 4
        ).cast("double").alias("qty_taxed"),
        F.bool_and(F.col("l_quantity") <= 50).alias("all_small"),
        F.bool_or(F.col("l_discount") >= 0.09).alias("any_deep_discount"),
    )


@query(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)        AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4)  AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark, sf_dir):
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, and least-squares regression (price ~ quantity).

    All five are single-pass algebraic aggregates (sums of x, y, x*y, x2,
    y2): one hash aggregate with map-side partials, exactly the cost of a
    sum — no second pass, no sort, scales like q_agg_group at 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        r4(F.corr(q, p)).alias("corr_qty_price"),
        r4(F.covar_samp(q, p)).alias("covar_qty_price"),
        r4(F.regr_slope(p, q)).alias("slope"),
        r4(F.regr_intercept(p, q)).alias("intercept"),
        F.regr_count(p, q).alias("n_pairs"),
    )


# Registered last: q_agg_global was driver-confirmed in round 2, so it
# yields its slot in the 50-entry verification window to never-checked ops.
@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 4) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(sum(l_extendedprice * l_discount), 4) AS sum_disc_amount
    FROM lineitem
    """,
)
def q_agg_global(spark, sf_dir):
    """Ungrouped global aggregate over lineitem."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.min("l_extendedprice")).alias("min_price"),
        r4(F.max("l_extendedprice")).alias("max_price"),
        r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("sum_disc_amount"),
    )


# Count-min sketch geometry: CM_D hash rows x CM_W buckets.  Small enough
# that the counter table always broadcasts (CM_D*CM_W counters regardless
# of data size), big enough that collisions are real at sf0.01 (~1k
# distinct custkeys over 256 buckets), so the estimate-vs-truth comparison
# actually exercises the min-over-rows bound.
CM_D, CM_W = 4, 256


def _cm_bucket_sql(i_sql: str, key: str) -> str:
    """Portable bucket hash: ('0x'||substr(md5(i:key),1,8)) % CM_W — the
    same md5 hex-parse family every LSH oracle uses (llm/dedup.py:_lsh_ctes),
    so DuckDB computes bit-identical buckets to :func:`_cm_bucket_dyn`."""
    return (
        f"('0x' || substr(md5({i_sql} || ':' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {CM_W}"
    )


@query(
    "q_agg_countmin",
    oracle=f"""
    WITH ev AS (
      SELECT o_custkey, i,
             {_cm_bucket_sql("CAST(i AS VARCHAR)", "o_custkey")} AS bucket
      FROM orders, (SELECT unnest(generate_series(0, {CM_D - 1})) AS i)
    ), counters AS (
      SELECT i, bucket, count(*) AS cnt FROM ev GROUP BY i, bucket
    ), truth AS (
      SELECT o_custkey, count(*) AS true_cnt FROM orders GROUP BY o_custkey
    ), probes AS (
      SELECT o_custkey, i,
             {_cm_bucket_sql("CAST(i AS VARCHAR)", "o_custkey")} AS bucket
      FROM truth, (SELECT unnest(generate_series(0, {CM_D - 1})) AS i)
    ), est AS (
      SELECT p.o_custkey, min(c.cnt) AS cm_est
      FROM probes p JOIN counters c ON p.i = c.i AND p.bucket = c.bucket
      GROUP BY p.o_custkey
    )
    SELECT t.o_custkey, t.true_cnt, e.cm_est,
           e.cm_est - t.true_cnt AS overcount
    FROM truth t JOIN est e ON t.o_custkey = e.o_custkey
    ORDER BY t.true_cnt DESC, t.o_custkey LIMIT 20
    """,
)
def q_agg_countmin(spark, sf_dir):
    """Count-min sketch heavy hitters: estimate per-customer order counts
    from a {CM_D}x{CM_W} counter grid and report the top-20 against truth
    (overcount >= 0 always — CM can only overestimate).

    The sketch family member HLL (q_agg_approx_distinct) can't cover:
    per-key FREQUENCY estimates from O(d*w) space. At 100 TB the counter
    build is one map-combined aggregate whose shuffle carries at most
    d*w pre-merged rows per map partition (the sketch IS the partial
    state, exactly how a CM UDAF would merge); the probe side joins
    against the d*w-row counter table by BROADCAST, so no data-sized
    shuffle exists anywhere. Truth (for the report) is one more hash agg.
    """
    # widen(): the sketch build is a CM_D-way explode + md5 bucket hash per
    # row — fan-out map work that serializes on a few-split scan (see
    # operators/common.py widen; no-op at real scale).
    orders = widen(t(spark, sf_dir, "orders").select("o_custkey"), "o_custkey")
    idx = F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias("i")
    ev = orders.select("o_custkey", idx).select(
        "i", _cm_bucket_dyn(F.col("i"), F.col("o_custkey")).alias("bucket")
    )
    counters = ev.groupBy("i", "bucket").agg(F.count("*").alias("cnt"))
    truth = orders.groupBy("o_custkey").agg(F.count("*").alias("true_cnt"))
    probes = truth.select("o_custkey", idx).select(
        "o_custkey",
        "i",
        _cm_bucket_dyn(F.col("i"), F.col("o_custkey")).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(counters), ["i", "bucket"])
        .groupBy("o_custkey")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return (
        truth.join(est, "o_custkey")
        .select(
            "o_custkey",
            "true_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.desc("true_cnt"), "o_custkey")
        .limit(20)
    )


def _cm_bucket_dyn(i_col, key_col):
    """Bucket hash with a dynamic row index column (explode output)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", i_col.cast("string"), key_col.cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CM_W
    )


HIST_BUCKETS = 20


@query(
    "q_agg_histogram",
    oracle=f"""
    WITH mm AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    ), b AS (
      SELECT least(CAST(floor((o_totalprice - mm.lo) * {HIST_BUCKETS}
                               / (mm.hi - mm.lo)) AS BIGINT),
                   {HIST_BUCKETS - 1}) AS bucket,
             mm.lo, mm.hi
      FROM orders, mm
    )
    SELECT bucket,
           round(lo + bucket * (hi - lo) / {HIST_BUCKETS}, 4) AS bucket_lo,
           round(lo + (bucket + 1) * (hi - lo) / {HIST_BUCKETS}, 4) AS bucket_hi,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bucket, lo, hi
    """,
)
def q_agg_histogram(spark, sf_dir):
    """Equi-width histogram of order totals ({HIST_BUCKETS} buckets between
    the global min and max) — the statistics-building primitive behind
    optimizer column histograms, data-profiling dashboards and drift
    monitors.

    Scale shape: pass 1 is a 1-ROW min/max aggregate; that row BROADCASTS
    into pass 2 (a BNLJ with a single build row — the scale-safe scalar
    distribution shape, see q_tpch_q22), where bucketing is map-only
    arithmetic and the count is a {HIST_BUCKETS}-group map-combined
    aggregate. Two scans, no data-sized shuffle anywhere. Bucket edges are
    computed with the identical expression order on both engines, so IEEE
    doubles agree bit-for-bit."""
    orders = t(spark, sf_dir, "orders").select("o_totalprice")
    mm = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    b = orders.join(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * HIST_BUCKETS
                / (F.col("hi") - F.col("lo"))
            ).cast("long"),
            F.lit(HIST_BUCKETS - 1),
        ).alias("bucket"),
        "lo",
        "hi",
    )
    return b.groupBy("bucket", "lo", "hi").agg(
        F.count("*").alias("n")
    ).select(
        "bucket",
        r4(F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / HIST_BUCKETS).alias("bucket_lo"),
        r4(F.col("lo") + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / HIST_BUCKETS).alias("bucket_hi"),
        "n",
    )


@query(
    "q_agg_entropy",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY d, event_type
    ), tot AS (
      SELECT d, sum(n) AS total FROM c GROUP BY d
    )
    SELECT strftime(c.d, '%Y-%m-%d') AS day,
           CAST(max(tot.total) AS BIGINT) AS n_events,
           round(-sum((n * 1.0 / tot.total) * ln(n * 1.0 / tot.total)), 4)
             AS entropy
    FROM c JOIN tot ON c.d = tot.d
    GROUP BY c.d
    """,
)
def q_agg_entropy(spark, sf_dir):
    """Shannon entropy of the daily event-type mix — the
    behavior-diversity metric monitoring pipelines track (a sudden
    entropy drop means one event type is flooding, a spike means new
    noise). Natural-log p*ln(p) over at most |event_types| terms per day.

    Scale shape: the corpus collapses to a (day, type) count aggregate
    first; totals join back on day (both sides |days|x|types| at most);
    the entropy sum is a |types|-term aggregate per day. Output is one
    row per day regardless of data size."""
    c = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("d").agg(F.sum("n").alias("total"))
    p = F.col("n") * 1.0 / F.col("total")
    return (
        c.join(tot, "d")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.max("total").cast("long").alias("n_events"),
            r4(-F.sum(p * F.log(p))).alias("entropy"),
        )
    )


@query(
    "q_agg_gini",
    oracle="""
    WITH x AS (
      SELECT o_custkey, sum(o_totalprice) AS spend FROM orders
      GROUP BY o_custkey
    ), ranked AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend, o_custkey) AS rk,
             count(*) OVER () AS n,
             sum(spend) OVER () AS total
      FROM x
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           round(max(total), 4) AS total_spend,
           round(2.0 * sum(rk * spend) / (max(n) * max(total))
                 - (max(n) + 1.0) / max(n), 4) AS gini
    FROM ranked
    """,
)
def q_agg_gini(spark, sf_dir):
    """Gini coefficient of customer spend — the inequality metric behind
    "what share of revenue comes from the top X%" dashboards (and the
    skew indicator that warns when a single hot key will dominate a
    downstream join). Exact rank formulation:
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending spend.

    Scale shape: the corpus collapses to one |customers|-row aggregate;
    the rank is ONE sort over that aggregate (with key tiebreak so both
    engines rank ties identically — ties change sum(i*x_i) otherwise);
    output is a single row. At extreme |customers| swap the exact rank
    for a quantile-bucketed approximation over the same aggregate."""
    x = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("spend", "o_custkey")
    whole = Window.orderBy("spend", "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = x.select(
        "spend",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(whole).alias("n"),
        F.sum("spend").over(whole).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        r4(F.max("total")).alias("total_spend"),
        r4(
            2.0 * F.sum(F.col("rk") * F.col("spend"))
            / (F.max("n") * F.max("total"))
            - (F.max("n") + 1.0) / F.max("n")
        ).alias("gini"),
    )


K_ANON = 5


@query(
    "q_agg_kanon",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
             round(avg(n_chars), 4) AS avg_chars
      FROM documents WHERE text IS NOT NULL
      GROUP BY lang, source
    )
    SELECT CASE WHEN n >= {K_ANON} THEN lang ELSE '*' END AS lang,
           CASE WHEN n >= {K_ANON} THEN source ELSE '*' END AS source,
           CAST(sum(n) AS BIGINT) AS n,
           round(sum(avg_chars * n) / sum(n), 4) AS avg_chars,
           CAST(count(*) AS BIGINT) AS n_merged_groups
    FROM g
    GROUP BY 1, 2
    """,
)
def q_agg_kanon(spark, sf_dir):
    """K-anonymous aggregate release: (lang, source) groups smaller than
    k={K_ANON} are generalized into one '*' bucket before publication —
    the suppression rule that keeps small-group aggregates from
    identifying individual documents/users in a shared data product.
    Merged groups re-aggregate exactly (counts add; means recombine
    weighted), and the release records how many raw groups each row
    absorbed.

    Scale shape: one grouped aggregate, then a second aggregate over the
    |groups|-sized result — the privacy pass costs nothing beyond the
    report it guards. The same shape generalizes to hierarchies (city →
    region → country) by cascading the CASE."""
    g = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"), r4(F.avg("n_chars")).alias("avg_chars"))
    )
    anon = F.col("n") >= K_ANON
    return (
        g.select(
            F.when(anon, F.col("lang")).otherwise("*").alias("lang"),
            F.when(anon, F.col("source")).otherwise("*").alias("source"),
            "n",
            "avg_chars",
        )
        .groupBy("lang", "source")
        .agg(
            F.sum("n").cast("long").alias("n"),
            r4(
                F.sum(F.col("avg_chars") * F.col("n")) / F.sum("n")
            ).alias("avg_chars"),
            F.count("*").alias("n_merged_groups"),
        )
    )


# -- Bloom-filter membership sketch ------------------------------------------

BLOOM_M = 256  # bits — sized so the fixture's fill ratio yields real FPs
BLOOM_K = 3    # hash functions
_BLOOM_MEMBER_SOURCE = "src1"  # the held-out "benchmark" corpus


def _bloom_oracle() -> str:
    h = (
        "CAST(('0x' || substr(md5({t} || '|' || i), 1, 8)) AS BIGINT) "
        f"% {BLOOM_M}"
    )
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    m AS (SELECT DISTINCT text FROM d_src WHERE TRUE),
    d_src AS (SELECT text FROM documents
              WHERE text IS NOT NULL AND source = '{_BLOOM_MEMBER_SOURCE}'),
    keys AS (SELECT unnest(range(0, {BLOOM_K})) AS i),
    mb AS (SELECT {h.format(t='m.text')} AS h FROM m, keys),
    bloom AS (
      SELECT h // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(h % 32 AS INT)) AS bits
      FROM mb GROUP BY h // 32),
    probe AS (SELECT d.doc_id, d.text, {h.format(t='d.text')} AS h
              FROM d, keys),
    pj AS (
      SELECT p.doc_id, p.text,
             CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (CAST(1 AS BIGINT)
                                  << CAST(p.h % 32 AS INT))) <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM probe p LEFT JOIN bloom b ON b.word = p.h // 32),
    fl AS (SELECT doc_id, text, min(hit) AS flagged FROM pj
           GROUP BY doc_id, text)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(flagged) AS BIGINT) AS n_flagged,
           CAST(sum(CASE WHEN text IN (SELECT text FROM m)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_member_text,
           CAST(sum(CASE WHEN flagged = 1
                          AND text NOT IN (SELECT text FROM m)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM fl
    """


@query("q_agg_bloom", oracle=_bloom_oracle())
def q_agg_bloom(spark, sf_dir):
    """Bloom-filter membership audit — the decontamination primitive at
    corpus scale: build a {BLOOM_M}-bit, k={BLOOM_K} Bloom filter over a
    held-out "benchmark" text set (source=src1), probe EVERY document
    against it, and report (n_docs, n_flagged, n_member_text,
    n_false_pos). No false negatives by construction (every member text is
    flagged); false positives are exactly counted against the true text
    set, so the row doubles as an FP-rate calibration for the chosen
    m/k.

    Scale shape: the filter itself is m/8 bytes — built with the
    q_join_bloom_prune one-hot bit_or aggregate (m/32 words) and BROADCAST
    to the probe scan, which stays map-side however large the corpus; at
    100 TB you size m to the benchmark (1.44 * n * log2(1/fp) bits) and the
    probe still ships only the tiny word table. The engine-portable hash
    family is the md5-prefix idiom (q_shard_assign), one md5 per (text,
    i) with 32-bit word packing so the shifted bit stays in positive
    BIGINT range on both engines. Completes the sketch family:
    HLL (distinct), count-min (frequency), histogram (density), Bloom
    (membership).

    Reference scope: no sketch surface in the reference facade; sibling
    of q_agg_countmin / q_agg_hll_merge on the engine side.
    """
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    m_texts = (
        t(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull() & (F.col("source") == _BLOOM_MEMBER_SOURCE)
        )
        .select("text")
        .distinct()
    )
    keys = spark.range(BLOOM_K).select(F.col("id").cast("int").alias("i"))

    def h_expr(tcol):
        return (
            F.conv(F.substring(F.md5(F.concat_ws("|", F.col(tcol), F.col("i"))), 1, 8), 16, 10)
            .cast("bigint")
            % BLOOM_M
        )

    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT))")
    bloom = (
        m_texts.join(F.broadcast(keys))
        .select(h_expr("text").alias("h"))
        .select(F.expr("h DIV 32").alias("word"), bit.alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    probe = d.join(F.broadcast(keys)).select(
        "doc_id", "text", h_expr("text").alias("h")
    )
    pj = (
        probe.withColumn("word", F.expr("h DIV 32"))
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id",
            "text",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(bit) != 0),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
    )
    fl = pj.groupBy("doc_id", "text").agg(F.min("hit").alias("flagged"))
    is_member = F.when(F.col("mtext").isNotNull(), 1).otherwise(0)
    fl = fl.join(
        F.broadcast(m_texts.select(F.col("text").alias("mtext"))),
        fl.text == F.col("mtext"),
        "left",
    )
    return fl.agg(
        F.count("*").alias("n_docs"),
        F.sum("flagged").alias("n_flagged"),
        F.sum(is_member).alias("n_member_text"),
        F.sum(
            F.when((F.col("flagged") == 1) & F.col("mtext").isNull(), 1).otherwise(0)
        ).alias("n_false_pos"),
    )


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v, l_quantity AS wt
      FROM lineitem
    ), c AS (
      SELECT flag, v, wt,
             sum(wt) OVER (PARTITION BY flag ORDER BY v, wt
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY flag) AS tw
      FROM w
    )
    SELECT flag, CAST(sum(wt) AS BIGINT) AS total_weight,
           round(min(CASE WHEN cw * 4 >= tw THEN v END), 4) AS wq25,
           round(min(CASE WHEN cw * 2 >= tw THEN v END), 4) AS wmedian,
           round(min(CASE WHEN cw * 4 >= tw * 3 THEN v END), 4) AS wq75
    FROM c GROUP BY flag ORDER BY flag
    """,
)
def q_agg_weighted_median(spark, sf_dir):
    """WEIGHTED quantiles (q25/median/q75 of price, weighted by
    quantity): each row counts with its weight, the statistic every
    mixture/pricing analysis actually needs and the unweighted
    percentile family (q_agg_percentile / q_agg_approx_percentile)
    cannot express.  Lower weighted quantile rule: the smallest value
    whose cumulative weight reaches the quantile of total weight —
    computed as one cumulative-sum window per group plus a conditional
    min, no collect, no iteration.

    Determinism: the window orders (value, weight); rows tied on both
    are interchangeable (same value either way), and integral-valued
    double weights sum exactly in binary64, so the >= boundary test is
    order-independent across engines.  All comparisons are on exact
    sums; the single rounding site is the output.

    Scale shape: one shuffle on the group key; the cumulative window is
    the standard sorted scan per group (at cluster scale, range-
    partitioned quantile summaries replace the exact scan — the
    q_agg_approx_percentile escape hatch — but the EXACT weighted
    answer is this plan).  Output is |groups| rows.

    Reference scope: no aggregate surface in the reference (Go metadata
    facade, api/router/router.go:9-55); weighted sibling of
    q_agg_percentile (exact unweighted) and q_agg_approx_percentile
    (sketched)."""
    from pyspark.sql import Window

    w = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("wt"),
    )
    cum = Window.partitionBy("flag").orderBy("v", "wt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("flag")
    c = w.withColumn("cw", F.sum("wt").over(cum)).withColumn(
        "tw", F.sum("wt").over(tot)
    )
    pick = lambda cond: F.round(F.min(F.when(cond, F.col("v"))), 4)  # noqa: E731
    return (
        c.groupBy("flag")
        .agg(
            F.sum("wt").cast("bigint").alias("total_weight"),
            pick(F.col("cw") * 4 >= F.col("tw")).alias("wq25"),
            pick(F.col("cw") * 2 >= F.col("tw")).alias("wmedian"),
            pick(F.col("cw") * 4 >= F.col("tw") * 3).alias("wq75"),
        )
        .orderBy("flag")
    )


@query(
    "q_agg_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag, count(*) AS n,
             sum(l_quantity) AS s1,
             sum(l_quantity*l_quantity) AS s2,
             sum(l_quantity*l_quantity*l_quantity) AS s3,
             sum(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
      FROM lineitem GROUP BY 1)
    SELECT flag, CAST(n AS BIGINT) AS n,
           round(s1/n, 4) AS mean,
           round(s2/n - (s1/n)*(s1/n), 4) AS var_pop,
           round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 1.5), 4) AS skewness,
           round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 2) - 3, 4) AS kurtosis
    FROM m ORDER BY flag
    """,
)
def q_agg_moments(spark, sf_dir):
    """Higher distribution moments per group — population mean/variance,
    skewness, excess kurtosis — computed from RAW POWER SUMS with the
    moment formulas spelled out on BOTH engines, NOT from the built-in
    skewness()/kurtosis() aggregates: the built-ins disagree across
    engines on sample-vs-population convention and excess offset, the
    classic silent cross-engine trap.  The quantity column is
    integral-valued, so every x^k and every partial sum is an exact
    binary64 integer (max ~1.2e11 << 2^53) — summation ORDER cannot
    change a bit, and the final expressions are the same arithmetic on
    identical doubles.  One map-combined aggregate (the four power sums
    combine associatively), |groups| rows out, arithmetic after the
    shuffle is constant-size.

    Reference scope: no aggregate surface in the reference (Go metadata
    facade, api/router/router.go:9-55); moment sibling of q_agg_stats
    (avg/stddev) and q_agg_corr."""
    q = F.col("l_quantity")
    m = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").alias("n"),
            F.sum(q).alias("s1"),
            F.sum(q * q).alias("s2"),
            F.sum(q * q * q).alias("s3"),
            F.sum(q * q * q * q).alias("s4"),
        )
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = F.col("s3") / F.col("n") - 3 * mean * (F.col("s2") / F.col("n")) + 2 * mean * mean * mean
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * mean * mean * (F.col("s2") / F.col("n"))
        - 3 * mean * mean * mean * mean
    )
    return m.select(
        "flag",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 4).alias("mean"),
        F.round(m2, 4).alias("var_pop"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 4).alias("skewness"),
        F.round(m4 / F.pow(m2, F.lit(2)) - 3, 4).alias("kurtosis"),
    ).orderBy("flag")


KMV_K = 64  # sketch size: k minimum hash values per group


@query(
    "q_agg_kmv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 11))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h),
    sk AS (SELECT event_type, h FROM rk WHERE rn <= {KMV_K}),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type),
    per AS (
      SELECT s.event_type, ex.n_exact, max(s.h) AS hk, count(*) AS m
      FROM sk s JOIN ex ON ex.event_type = s.event_type
      GROUP BY s.event_type, ex.n_exact),
    -- union-merge: the k smallest over the UNION of the per-group
    -- sketches (never the raw hashes) -- the mergeability being tested
    u AS (
      SELECT h FROM (SELECT DISTINCT h FROM sk) ORDER BY h LIMIT {KMV_K}),
    uper AS (
      SELECT '(all)' AS event_type,
             (SELECT count(DISTINCT user_id) FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL) AS n_exact,
             max(h) AS hk, count(*) AS m
      FROM u),
    allrows AS (SELECT * FROM per UNION ALL SELECT * FROM uper)
    SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
           round(CASE WHEN m < {KMV_K} THEN m * 1.0
                      ELSE ({KMV_K} - 1) * 17592186044416.0 / hk END, 4)
             AS kmv_est
    FROM allrows ORDER BY event_type
    """,
)
def q_agg_kmv(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) DISTINCT sketch per event type,
    plus the union-merged corpus sketch — the mergeable
    distinct-counting primitive behind theta sketches: keep the
    {KMV_K} smallest hash values of the key set; the k-th smallest
    normalized hash h_k estimates the cardinality as (k-1)/h_k, and two
    sketches merge by taking the k smallest of their union — the
    property that lets per-partition / per-day sketches roll up without
    re-reading data (q_agg_hll_merge's mergeability, but with an
    EXACTLY value-checkable sketch).

    Determinism: the hash is the portable md5 family (first 11 hex
    chars -> 44-bit integer, the q_dedup_fuzzy convention), identical
    on both engines, so sketch CONTENTS — not just estimates — agree;
    the one division happens on the same (integer-valued) binary64 on
    both sides, rounded 4dp.  Groups with fewer than {KMV_K} distinct
    keys are exact by the KMV rule (the sketch holds the whole set).
    2^44 = 17592186044416 is the hash-space size the normalization
    divides by.

    Scale shape: one DISTINCT (type, hash) shuffle (map-side combined),
    then a per-group top-{KMV_K} window over |distinct| rows; the merge
    runs over |groups| x {KMV_K} rows — driver-free, broadcast-sized.
    At 100 TB the same sketch frame is what you'd persist per
    partition/day and fold associatively.

    Reference scope: no aggregate surface in the reference (Go metadata
    facade, api/router/router.go:9-55); sketch sibling of
    q_agg_hll_merge (HLL) and q_agg_countmin (frequency)."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 11), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    sk = (
        h.withColumn(
            "rn", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    per = (
        sk.groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count("*").alias("m"))
        .join(ex, "event_type")
    )
    # union-merge: k smallest of the union of per-group sketches
    u = sk.select("h").distinct().orderBy("h").limit(KMV_K)
    uper = u.agg(F.max("h").alias("hk"), F.count("*").alias("m")).select(
        F.lit("(all)").alias("event_type"),
        "hk",
        "m",
    )
    uex = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    uper = uper.crossJoin(uex)
    allrows = per.select("event_type", "n_exact", "hk", "m").unionByName(
        uper.select("event_type", "n_exact", "hk", "m")
    )
    est = F.when(F.col("m") < KMV_K, F.col("m").cast("double")).otherwise(
        (KMV_K - 1) * F.lit(17592186044416.0) / F.col("hk")
    )
    return allrows.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(est, 4).alias("kmv_est"),
    ).orderBy("event_type")


THETA_PAIRS = (("purchase", "click"), ("purchase", "error"), ("signup", "view"))

_THETA_PAIR_SQL = " UNION ALL ".join(
    f"SELECT '{a}' AS ta, '{b}' AS tb" for a, b in THETA_PAIRS
)


@query(
    "q_agg_theta_intersect",
    oracle=f"""
    WITH pairs AS ({_THETA_PAIR_SQL}),
    h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 11))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h) WHERE rn <= {KMV_K}),
    uni AS (
      SELECT ta, tb, h FROM (
        SELECT ta, tb, h,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM (SELECT DISTINCT p.ta, p.tb, s.h
              FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb))
        ) WHERE rn <= {KMV_K}),
    uagg AS (
      SELECT ta, tb, max(h) AS theta, count(*) AS m_u FROM uni GROUP BY ta, tb),
    common AS (
      SELECT p.ta, p.tb, a.h
      FROM pairs p
      JOIN sk a ON a.event_type = p.ta
      JOIN sk b ON b.event_type = p.tb AND b.h = a.h),
    pc AS (
      SELECT u.ta, u.tb, u.theta, u.m_u,
             count(CASE WHEN c.h IS NOT NULL
                         AND (u.m_u < {KMV_K} OR c.h < u.theta)
                        THEN 1 END) AS p
      FROM uagg u LEFT JOIN common c ON c.ta = u.ta AND c.tb = u.tb
      GROUP BY u.ta, u.tb, u.theta, u.m_u),
    us AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    sizes AS (SELECT event_type, count(*) AS nu FROM us GROUP BY 1),
    inter AS (
      SELECT p.ta, p.tb, count(*) AS n
      FROM pairs p
      JOIN us a ON a.event_type = p.ta
      JOIN us b ON b.event_type = p.tb AND b.user_id = a.user_id
      GROUP BY p.ta, p.tb),
    ex AS (
      SELECT p.ta, p.tb,
             sa.nu + sb.nu - coalesce(i.n, 0) AS exact_union,
             coalesce(i.n, 0) AS exact_inter
      FROM pairs p
      JOIN sizes sa ON sa.event_type = p.ta
      JOIN sizes sb ON sb.event_type = p.tb
      LEFT JOIN inter i ON i.ta = p.ta AND i.tb = p.tb)
    SELECT pc.ta, pc.tb,
           CAST(ex.exact_union AS BIGINT) AS exact_union,
           CAST(ex.exact_inter AS BIGINT) AS exact_inter,
           round(CASE WHEN pc.m_u < {KMV_K} THEN pc.m_u * 1.0
                      ELSE ({KMV_K} - 1) * 17592186044416.0 / pc.theta END, 4)
             AS est_union,
           round(CASE WHEN pc.m_u < {KMV_K} THEN pc.p * 1.0
                      ELSE pc.p * (({KMV_K} - 1) * 17592186044416.0 / pc.theta)
                           / {KMV_K} END, 4) AS est_inter,
           round(pc.p * 1.0 / CASE WHEN pc.m_u < {KMV_K} THEN pc.m_u
                                   ELSE {KMV_K} END, 4) AS est_jaccard
    FROM pc JOIN ex ON ex.ta = pc.ta AND ex.tb = pc.tb
    ORDER BY pc.ta, pc.tb
    """,
)
def q_agg_theta_intersect(spark, sf_dir):
    """Theta-sketch SET OPERATIONS: audience union / intersection /
    Jaccard estimates between event-type user sets from their bottom-k
    (KMV) sketches alone — never rescanning the raw data.  The sketched
    twin of q_evt_user_overlap (exact Jaccard matrix): at 100 TB you
    persist one 64-hash sketch per audience per day and answer ANY pair's
    overlap from |sketch| rows, where the exact answer costs a
    user-universe shuffle per pair.

    Estimators (both engines compute the identical integers, then the
    identical binary64 expression, rounded 4dp): theta = max of the
    k-smallest-of-union sketch; union_est = (k-1) * 2^44 / theta when
    saturated (m_u = k), exact count otherwise; p = |A_k intersect B_k
    below theta|; inter_est = p * union_est / k; jaccard_est = p / k.
    Exact counts are emitted alongside so the error envelope is visible
    in the result frame itself.

    Determinism: the portable md5 44-bit hash family (q_agg_kmv), sketch
    CONTENTS agree cross-engine, so estimates are value-hash-checkable —
    not just rows-only.

    Scale shape: one DISTINCT (type, hash) shuffle over the data (the
    only data-sized pass, shared with q_agg_kmv's sketch build); all set
    arithmetic runs on |pairs| x {KMV_K} broadcast-sized frames.

    Reference scope: no sketch surface in the reference (Go metadata
    facade, api/router/router.go:9-55); composes the q_agg_kmv primitive
    into the set-operation algebra theta sketches exist for."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 11), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    sk = (
        h.withColumn(
            "rn", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
    )
    pairs = spark.createDataFrame(list(THETA_PAIRS), ["ta", "tb"])
    # union sketch per pair: k smallest of A_k U B_k (distinct h).  The
    # pair fan-out is a 3-row broadcast against the |types| x k sketch
    # frame — nested-loop is fine HERE because both sides are sketch-sized.
    uni = (
        F.broadcast(pairs)
        .join(
            sk,
            (sk.event_type == F.col("ta")) | (sk.event_type == F.col("tb")),
        )
        .select("ta", "tb", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(W.partitionBy("ta", "tb").orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
    )
    uagg = uni.groupBy("ta", "tb").agg(
        F.max("h").alias("theta"), F.count("*").alias("m_u")
    )
    ska = sk.select(F.col("event_type").alias("ta"), "h")
    skb = sk.select(F.col("event_type").alias("tb"), "h")
    common = (
        F.broadcast(pairs).join(ska, "ta").join(skb, ["tb", "h"]).select("ta", "tb", "h")
    )
    pc = (
        uagg.join(common, ["ta", "tb"], "left")
        .groupBy("ta", "tb", "theta", "m_u")
        .agg(
            F.count(
                F.when(
                    F.col("h").isNotNull()
                    & ((F.col("m_u") < KMV_K) | (F.col("h") < F.col("theta"))),
                    F.lit(1),
                )
            ).alias("p")
        )
    )
    users = ev.select("event_type", "user_id").distinct()
    ua = users.select(F.col("event_type").alias("ta"), "user_id")
    ub = users.select(F.col("event_type").alias("tb"), "user_id")
    inter = (
        F.broadcast(pairs)
        .join(ua, "ta")
        .join(ub, ["tb", "user_id"])
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("exact_inter"))
    )
    # exact_union = |A| + |B| - |A n B|
    sizes = users.groupBy("event_type").agg(F.count("*").alias("nu"))
    ex2 = (
        F.broadcast(pairs)
        .join(sizes.select(F.col("event_type").alias("ta"), F.col("nu").alias("na")), "ta")
        .join(sizes.select(F.col("event_type").alias("tb"), F.col("nu").alias("nb")), "tb")
        .join(inter, ["ta", "tb"], "left")
        .withColumn("exact_inter", F.coalesce("exact_inter", F.lit(0)))
        .withColumn("exact_union", F.col("na") + F.col("nb") - F.col("exact_inter"))
    )
    two44 = F.lit(17592186044416.0)
    sat = F.col("m_u") >= KMV_K
    u_est = F.when(sat, (KMV_K - 1) * two44 / F.col("theta")).otherwise(
        F.col("m_u").cast("double")
    )
    i_est = F.when(sat, F.col("p") * ((KMV_K - 1) * two44 / F.col("theta")) / KMV_K).otherwise(
        F.col("p").cast("double")
    )
    j_est = F.col("p") / F.when(sat, F.lit(KMV_K)).otherwise(F.col("m_u"))
    return (
        pc.join(ex2, ["ta", "tb"])
        .select(
            "ta",
            "tb",
            F.col("exact_union").cast("long").alias("exact_union"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
            F.round(u_est, 4).alias("est_union"),
            F.round(i_est, 4).alias("est_inter"),
            F.round(j_est, 4).alias("est_jaccard"),
        )
        .orderBy("ta", "tb")
    )


DECAY_SCALE = 256  # 2^8: the dyadic weight scale (8 half-life horizon)


@query(
    "q_agg_time_decay",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    anchor AS (SELECT CAST(max(ts) AS DATE) AS a FROM p),
    k AS (
      SELECT user_id, cents,
             date_diff('day', CAST(ts AS DATE), an.a) // 7 AS wk
      FROM p CROSS JOIN anchor an
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(cents) / 100.0, 4) AS raw_value,
           CAST((50 * CAST(sum(cents * (CASE WHEN wk >= 9 THEN 0
                                             ELSE {DECAY_SCALE} // (2 ** wk)
                                        END)) AS BIGINT)
                 + 64) // 128 AS DOUBLE) / 10000 AS decayed_value
    FROM k GROUP BY user_id ORDER BY user_id
    """,
)
def q_agg_time_decay(spark, sf_dir):
    """TIME-DECAYED aggregate: recency-weighted purchase value per user
    with a 1-week half-life anchored at the corpus's newest purchase day
    — the recency signal behind engagement scores and decayed LTV, where
    a purchase 3 weeks ago counts 1/8 of one today.

    EXACT despite the exponential: weights are DYADIC (2^-k for integer
    week-age k, zeroed past 8 half-lives where the weight is < 0.4%), so
    every contribution is cents * 2^(8-k) — pure INTEGER arithmetic end
    to end, summed as LONG.  No exp()/pow() ever runs (no libm ulp risk,
    no float-summation-order risk), and even the FINAL 4-dp rounding is
    integer: scaled/25600 sits EXACTLY on 4-dp midpoints (25N/64 is
    dyadic), the one place Spark's BigDecimal half-up and DuckDB's
    x*1e4 rounding disagree by an ulp — so both engines compute
    round_half_up as (50N + 64) DIV 128 in LONGs and divide by 1e4 once
    (the q_stream_dim_join integer-cents discipline, extended through
    the output rounding).

    Scale shape: one map-combined aggregate over purchases keyed on
    user_id; the anchor is a 1-row broadcast.  At 100 TB this is the
    cheapest aggregate shape there is.

    Reference scope: no aggregate surface in the reference (Go metadata
    facade, api/router/router.go:9-55); recency sibling of q_evt_rfm
    (recency buckets) and q_ts_ewma (float recurrence, pandas-rounded)."""
    p = (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    anchor = p.agg(F.max("d").alias("a"))
    k = p.join(F.broadcast(anchor)).withColumn(
        "wk", F.floor(F.datediff("a", "d") / 7)
    )
    w = F.when(F.col("wk") >= 9, F.lit(0)).otherwise(
        (F.lit(DECAY_SCALE) / F.pow(F.lit(2), F.col("wk"))).cast("long")
    )
    return (
        k.withColumn("w", w)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(F.sum("cents") / 100.0, 4).alias("raw_value"),
            (
                F.expr("CAST((50 * sum(cents * w) + 64) DIV 128 AS DOUBLE)")
                / 10000
            ).alias("decayed_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct count via 64-bit adjacency bitmaps — the roaring-
    bitmap pattern for dense integer key spaces: group the ids into
    64-wide words, OR each id's bit into its word (one codegen'd bit_or
    aggregate), then popcount-sum the words.  Against count(DISTINCT)
    this replaces the full id shuffle with a words shuffle of at most
    |id_space|/64 pre-combined rows per group — on a 100 TB events table
    with a dense user space that is a 64x shuffle-volume cut with NO
    approximation (the exact companion to q_agg_approx_distinct/HLL,
    and the scalar cousin of q_join_bloom_prune's one-hot build).

    The oracle is the plain count(DISTINCT) — proving the bitmap path
    value-exact, not just plausible.

    Reference scope: no aggregate surface in the reference facade
    (api/router/router.go:9-55)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    words = (
        ev.select(
            "event_type",
            F.expr("user_id DIV 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return (
        words.groupBy("event_type")
        .agg(F.sum(F.bit_count("bits")).alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "q_agg_argmax",
    oracle="""
    WITH r AS (
      SELECT event_type, user_id, event_id, value,
             CAST(round(value * 100) AS BIGINT) * 1000000000000 + event_id
               AS rk
      FROM events WHERE event_type IS NOT NULL)
    SELECT event_type,
           CAST(arg_max(event_id, rk) AS BIGINT) AS peak_event_id,
           round(arg_max(value, rk), 4) AS peak_value,
           CAST(arg_max(user_id, rk) AS BIGINT) AS peak_user,
           CAST(arg_min(event_id, rk) AS BIGINT) AS trough_event_id,
           round(arg_min(value, rk), 4) AS trough_value
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_argmax(spark, sf_dir):
    """ARGMAX/ARGMIN aggregates (max_by/min_by): per event type, the full
    identity of the highest- and lowest-value event — the "which row set
    the extreme" question that a plain max() cannot answer without a
    second self-join pass.

    Determinism: arg_max over ties is engine-defined, so the ranking key
    is the exact composite integer round(value*100) * 1e12 + event_id —
    value-major with the unique event_id as tiebreak (event_id < 1e12 at
    any realistic scale; both engines order the identical BIGINT).  One
    map-combined aggregate, |types| output rows.

    Reference scope: no aggregate surface in the reference facade
    (api/router/router.go:9-55); sibling of q_agg_mode_median."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    rk = (
        F.round(F.col("value") * 100).cast("long") * F.lit(1_000_000_000_000)
        + F.col("event_id")
    ).alias("rk")
    r = ev.select("event_type", "user_id", "event_id", "value", rk)
    return (
        r.groupBy("event_type")
        .agg(
            F.expr("max_by(event_id, rk)").alias("peak_event_id"),
            F.round(F.expr("max_by(value, rk)"), 4).alias("peak_value"),
            F.expr("max_by(user_id, rk)").alias("peak_user"),
            F.expr("min_by(event_id, rk)").alias("trough_event_id"),
            F.round(F.expr("min_by(value, rk)"), 4).alias("trough_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q_agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
             AS sum_price,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
                 / count(*), 4) AS avg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_agg_decimal_exact(spark, sf_dir):
    """EXACT DECIMAL aggregation: monetary sums in DECIMAL(18,2) — the
    numeric type whose addition is associative, so the result is
    independent of partition order and partial-aggregation tree shape.
    A float sum of the same column is order-DEPENDENT (the q_sample_
    neyman wtot lesson); at 100 TB with thousands of partials, decimal
    is how a finance-grade pipeline gets the same ledger total on every
    run.  The exact decimal total is cast to DOUBLE only at the output
    boundary; the average divides the exact total by the exact count.

    Scale shape: one map-combined aggregate; decimal partials are 128-bit
    integers under the hood — same shuffle shape as a long sum.

    Reference scope: no aggregate surface in the reference facade
    (api/router/router.go:9-55); numeric-type sibling of q_fn_cast."""
    li = t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).cast("double").alias("sum_price"),
            F.round(
                F.sum(dec).cast("double") / F.count("*"), 4
            ).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_grouping_id",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS rflag,
           coalesce(l_linestatus, '<all>') AS lstatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           GROUPING(l_returnflag) = 1 AS is_flag_total,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY gid, rflag, lstatus
    """,
)
def q_agg_grouping_id(spark, sf_dir):
    """GROUPING_ID / GROUPING functions over a rollup: distinguish a
    REAL NULL group from a subtotal row — the metadata every BI layer
    needs to render rollup output (q_agg_rollup shows the totals;
    without grouping_id a NULL key is ambiguous).  Both engines emit
    the same bit encoding (left key = high bit), asserted per row.

    Scale shape: same map-combined rollup aggregate as q_agg_rollup —
    grouping_id is free plan metadata, no extra pass.

    Reference scope: no aggregate surface in the reference facade
    (api/router/router.go:9-55); metadata sibling of q_agg_rollup /
    q_agg_grouping_sets."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            (F.grouping("l_returnflag") == 1).alias("is_flag_total"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("lstatus"),
            "gid",
            "is_flag_total",
            "n",
            "qty",
        )
        .orderBy("gid", "rflag", "lstatus")
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)
def q_agg_listagg(spark, sf_dir):
    """Ordered LISTAGG / string_agg: the export-layer aggregate that
    folds a group's members into one delimited string — report cells,
    audit trails, "which items" columns.  collect_list order is
    partition-dependent (the classic nondeterminism trap), so the array
    is SORTED before joining — bit-identical to DuckDB's
    ``string_agg(... ORDER BY ...)`` and safe under any partitioning.

    Scale warning (docstring is the contract): the aggregate is
    output-UNBOUNDED per group — a hot key folds its whole group into
    one string, so production callers cap members (slice after
    sort_array) or route hot keys to q_agg_collect's array form.

    Reference scope: no aggregate surface in the reference facade
    (api/router/router.go:9-55); export sibling of q_agg_collect."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


# -- market-concentration index (r16) -----------------------------------------


@query(
    "q_agg_hhi",
    oracle="""
    WITH x AS (
      SELECT c.c_nationkey, o.o_custkey, sum(o.o_totalprice) AS spend
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ), agg AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_customers,
             sum(spend) AS total,
             sum(spend * spend) AS ss,
             max(spend) AS top
      FROM x GROUP BY c_nationkey)
    SELECT n.n_name AS nation, a.n_customers,
           round(a.total, 4) AS total_spend,
           round(a.ss / (a.total * a.total), 4) AS hhi,
           round(a.top / a.total, 4) AS top_share
    FROM agg a JOIN nation n ON n.n_nationkey = a.c_nationkey
    ORDER BY nation
    """,
)
def q_agg_hhi(spark, sf_dir):
    """HERFINDAHL-HIRSCHMAN concentration index of customer revenue per
    nation — the market-concentration readout (sum of squared revenue
    shares, 1/n = perfectly even, 1.0 = single buyer) plus the top-1
    share.  The skew-planning companion of q_agg_gini: gini says how
    UNEQUAL the distribution is, HHI says how DOMINATED it is — the
    number that predicts whether one hot customer key will swamp a
    downstream shuffle partition.

    Algebra: sum((x_i/T)^2) = sum(x_i^2)/T^2, so the per-nation state is
    three map-combined aggregates (sum, sum of squares, max) — no
    per-row division, no second pass.

    Scale shape: orders ⋈ customer is a key-partitioned equi-join, then
    one two-level aggregate (custkey, then nationkey); the 25-row nation
    dim broadcasts.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); concentration sibling of q_agg_gini
    (operators/aggregates.py)."""
    x = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    agg = x.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("spend").alias("total"),
        F.sum(F.col("spend") * F.col("spend")).alias("ss"),
        F.max("spend").alias("top"),
    )
    return (
        agg.join(
            F.broadcast(
                t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            F.round(F.col("total"), 4).alias("total_spend"),
            F.round(F.col("ss") / (F.col("total") * F.col("total")), 4).alias(
                "hhi"
            ),
            F.round(F.col("top") / F.col("total"), 4).alias("top_share"),
        )
        .orderBy("nation")
    )

# -- exact-rank trimmed/winsorized mean (r16 wave 3) --------------------------

TRIM_PCT = 10  # percent trimmed from EACH tail


@query(
    "q_agg_trimmed_mean",
    oracle=f"""
    WITH v AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    k AS (SELECT event_type, value, rk, n, n * {TRIM_PCT} // 100 AS cut
          FROM r),
    lims AS (
      SELECT event_type,
             max(CASE WHEN rk = cut + 1 THEN value END) AS lo,
             max(CASE WHEN rk = n - cut THEN value END) AS hi
      FROM k GROUP BY event_type)
    SELECT k.event_type, CAST(max(k.n) AS BIGINT) AS n_values,
           CAST(max(k.cut) AS BIGINT) AS n_cut_each,
           round(avg(k.value) FILTER (k.rk > k.cut AND k.rk <= k.n - k.cut),
                 4) AS trimmed_mean,
           round(avg(CASE WHEN k.value < l.lo THEN l.lo
                          WHEN k.value > l.hi THEN l.hi
                          ELSE k.value END), 4) AS winsorized_mean
    FROM k JOIN lims l USING (event_type)
    GROUP BY k.event_type ORDER BY k.event_type
    """,
)
def q_agg_trimmed_mean(spark, sf_dir):
    """TRIMMED and WINSORIZED means of events.value per type ({TRIM_PCT}%
    each tail) — the robust centers that survive the heavy-tail values
    q_dq_anomaly_iqr flags (trim drops the tails, winsorize clamps them
    to the exact-rank cut values).  Rank-based: cut = n*{TRIM_PCT}//100
    rows per tail by exact integer arithmetic, and with tied boundary
    values the KEPT MULTISET is identical whichever tied copies are
    dropped — so the engines agree without any tie-break column.

    Scale shape: one partitioned sort per type (shared shape with
    q_dq_anomaly_iqr — at extreme cardinality the same
    approx_percentile swap applies), a \\|types\\|-row limit frame, one
    broadcast-back join.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); robust sibling of q_agg_mode_median
    and q_ts_anomaly_mad."""
    from pyspark.sql import Window as W

    v = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "value")
    )
    pw = W.partitionBy("event_type")
    k = v.select(
        "event_type",
        "value",
        F.row_number().over(pw.orderBy("value")).alias("rk"),
        F.count("*").over(pw).alias("n"),
    ).withColumn("cut", F.expr(f"n * {TRIM_PCT} div 100"))
    lims = k.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rk") == F.col("cut") + 1, F.col("value"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rk") == F.col("n") - F.col("cut"), F.col("value"))
        ).alias("hi"),
    )
    return (
        k.join(lims, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_values"),
            F.max("cut").cast("long").alias("n_cut_each"),
            F.round(
                F.avg(
                    F.when(
                        (F.col("rk") > F.col("cut"))
                        & (F.col("rk") <= F.col("n") - F.col("cut")),
                        F.col("value"),
                    )
                ),
                4,
            ).alias("trimmed_mean"),
            F.round(
                F.avg(
                    F.when(F.col("value") < F.col("lo"), F.col("lo"))
                    .when(F.col("value") > F.col("hi"), F.col("hi"))
                    .otherwise(F.col("value"))
                ),
                4,
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


# -- exact-moment skewness / kurtosis (r16 wave 3) ----------------------------


@query(
    "q_agg_skewkurt",
    oracle="""
    WITH v AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             sum(value * value * value) AS s3,
             sum(value * value * value * value) AS s4
      FROM v GROUP BY event_type),
    m AS (
      SELECT event_type, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s)
    SELECT event_type, n, round(mu, 4) AS mean,
           round(m3 / (m2 * sqrt(m2)), 4) AS skewness,
           round(m4 / (m2 * m2) - 3, 4) AS excess_kurtosis
    FROM m ORDER BY event_type
    """,
)
def q_agg_skewkurt(spark, sf_dir):
    """Moment-based SKEWNESS and EXCESS KURTOSIS of events.value per
    type — the shape diagnostics that say whether a mean/stddev summary
    is even meaningful (heavy right tail => positive skew; fat tails =>
    positive excess kurtosis), and the distribution fingerprint that
    complements q_evt_drift_ks (location drift) with SHAPE drift.

    Computed from raw power sums s1..s4 in one map-combined pass — no
    second centering pass over the data — with the central-moment
    algebra written as the IDENTICAL pow-free expression on both
    engines (mu*mu*mu, never pow(mu,3): libm pow carries per-platform
    1-ulp slack — the q_evt_power r16 lesson).  The float sums carry
    ~1e-12 order noise under a 4-dp round; midpoint-audited at birth.

    Scale shape: one map-combined aggregate per type; output
    \\|types\\| rows.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); shape sibling of q_agg_corr and
    q_evt_drift_ks."""
    v = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "value")
    )
    s = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.sum(F.col("value") * F.col("value") * F.col("value")).alias("s3"),
        F.sum(
            F.col("value") * F.col("value") * F.col("value") * F.col("value")
        ).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "event_type",
        "n",
        F.round(mu, 4).alias("mean"),
        F.round(m3 / (m2 * F.sqrt(m2)), 4).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 4).alias("excess_kurtosis"),
    ).orderBy("event_type")
