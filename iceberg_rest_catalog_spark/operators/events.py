"""Event-analytics composites over the ``events`` table.

The reference catalogs tables; the tables a production catalog serves are
overwhelmingly event logs, and these three shapes — conversion funnel,
sessionization, and sequence mining — are the queries a training-data /
product-analytics pipeline runs on them daily (SURVEY.md §2.C north-star:
large-scale pipeline operators beyond the reference's own surface).

Scale notes: every operator here aggregates or windows BY user_id, so the
single shuffle partitions on the user key and all per-user work is local to
one partition. Nothing materializes per-event output: funnel returns 3 rows,
sessionization one row per user, bigrams ≤ |event_types|² rows. At 100 TB the
only concern is user-key skew (bot users); the funnel path pre-aggregates to
per-user firsts before any join, so even a hot user contributes one row per
stage.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t


@query(
    "q_evt_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
                AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
                AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT stage, users FROM (
      SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
      UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p) x
    ORDER BY stage
    """,
)
def q_evt_funnel(spark, sf_dir):
    """Ordered conversion funnel view →(≤24h)→ click →(≤24h)→ purchase.

    Each stage reduces to one row per user (min ts) BEFORE the next stage's
    join, so the join inputs are |users|-sized, never |events|-sized, and
    every join/aggregate shares the user_id shuffle key."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 24 HOURS")

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = lambda df, label: df.agg(  # noqa: E731
        F.lit(label).alias("stage"), F.count("*").alias("users")
    )
    return (
        stage(v, "1_view")
        .unionAll(stage(c, "2_click"))
        .unionAll(stage(p, "3_purchase"))
        .select("stage", "users")
        .orderBy("stage")
    )


@query(
    "q_evt_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id ORDER BY user_id
    """,
)
def q_evt_sessionize(spark, sf_dir):
    """Batch sessionization, 30-minute inactivity gap (gaps-and-islands).

    The lag + running-sum windows and the final aggregate all partition by
    user_id: one shuffle, then purely partition-local window evaluation.
    (The streaming twin is q_stream_session via session_window.)"""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id")
        .agg(F.max("sid").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


@query(
    "q_evt_bigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type ORDER BY n DESC, event_type, next_type
    """,
)
def q_evt_bigrams(spark, sf_dir):
    """Consecutive event-type pair frequencies per user timeline (sequence
    2-grams — the first step of behavioral path mining / Markov-chain
    transition estimation).

    lead() partitions by user_id; output cardinality is at most
    |event_types|², so the final sort is trivial."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type", "next_type")
    )


@query(
    "q_evt_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           datediff('day', f.cohort, a.d) AS day_offset,
           CAST(count(*) AS BIGINT) AS users
    FROM first f JOIN act a USING (user_id)
    WHERE datediff('day', f.cohort, a.d) BETWEEN 0 AND 7
    GROUP BY cohort_day, day_offset
    """,
)
def q_evt_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity day, one
    row per (cohort day, day offset 0-7) counting users active that many
    days later — the standard product-analytics retention triangle.

    Scale: both sides reduce to |users|-sized tables BEFORE the join
    (per-user first day; distinct user-days), every aggregate and the join
    key on user_id, so one shuffle family serves the whole plan; output is
    |cohorts| x 8 rows."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    act = ev.distinct()
    off = F.datediff(F.col("d"), F.col("cohort"))
    return (
        first.join(act, "user_id")
        .filter((off >= 0) & (off <= 7))
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            off.alias("day_offset"),
        )
        .agg(F.count("*").alias("users"))
    )


@query(
    "q_evt_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), stats AS (
      SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
      FROM daily GROUP BY event_type
    )
    SELECT daily.event_type, strftime(d, '%Y-%m-%d') AS day, n,
           round((n - mu) / sd, 4) AS z,
           abs(n - mu) > 2 * sd AS is_anomaly
    FROM daily JOIN stats ON daily.event_type = stats.event_type
    WHERE sd > 0
    """,
)
def q_evt_anomaly(spark, sf_dir):
    """Time-series anomaly detection: z-score each (event type, day) count
    against that type's daily mean/stddev, flagging |z| > 2 outliers — the
    standard volume-monitoring query over an event log.

    Two aggregates and a join, but all three group on event_type (the
    second agg collapses |types|x|days| rows, the stats side is |types|
    rows and broadcasts), so the only data-sized shuffle is the first
    count's — and its key space (type x day) is dense and unskewed."""
    ev = t(spark, sf_dir, "events").select("event_type", F.to_date("ts").alias("d"))
    daily = ev.groupBy("event_type", "d").agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    n, mu, sd = F.col("n"), F.col("mu"), F.col("sd")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(sd > 0)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            F.round((n - mu) / sd, 4).alias("z"),
            (F.abs(n - mu) > 2 * sd).alias("is_anomaly"),
        )
    )


@query(
    "q_evt_attribution",
    oracle="""
    WITH touched AS (
      SELECT event_type, ts, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER w AS touch_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS) OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT coalesce(CASE WHEN touch_ts >= ts - INTERVAL 72 HOUR
                         THEN touch_type END, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY channel
    """,
)
def q_evt_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase's value is credited to the
    user's most recent click/view within a 72-hour lookback, else to
    'direct' — the standard marketing-attribution rollup.

    One window over (user_id ORDER BY ts) carries the last-touch type and
    time to every row (`last(..., ignoreNulls)` — no self-join against the
    touch stream, which at 100 TB would be a second data-sized shuffle);
    the purchase filter then reduces to a |channels|-row aggregate. Revenue
    sums in integer cents, so the cross-engine hash is exact (fixture
    values carry 2 decimals; double-sum order would differ in the last ulp).
    """
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touched = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.col("touch_ts") >= F.col("ts") - F.expr("INTERVAL 72 HOURS"),
                    F.col("touch_type"),
                ),
                F.lit("direct"),
            ).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("revenue_cents"),
        )
    )


@query(
    "q_ts_interpolate",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(d) AS d0, max(d) AS d1 FROM p GROUP BY user_id
    ), spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ), joined AS (
      SELECT spine.user_id, spine.d, p.n FROM spine
      LEFT JOIN p ON p.user_id = spine.user_id AND p.d = spine.d
    ), ctx AS (
      SELECT user_id, d, n,
             last_value(CASE WHEN n IS NOT NULL THEN d END IGNORE NULLS) OVER wp AS pd,
             last_value(n IGNORE NULLS) OVER wp AS pn,
             first_value(CASE WHEN n IS NOT NULL THEN d END IGNORE NULLS) OVER wf AS nd,
             first_value(n IGNORE NULLS) OVER wf AS nn
      FROM joined
      WINDOW wp AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
           n IS NOT NULL AS observed,
           round(CASE WHEN n IS NOT NULL THEN n * 1.0
                      ELSE pn + (nn - pn) * date_diff('day', pd, d) * 1.0
                                          / date_diff('day', pd, nd) END,
                 4) AS filled
    FROM ctx
    """,
)
def q_ts_interpolate(spark, sf_dir):
    """Sparse-series gap fill with LINEAR INTERPOLATION: each user's daily
    purchase counts between their first and last purchase day, missing days
    interpolated between the surrounding observed points — the resampling
    step before any per-entity time-series model.

    The spine is per-user `sequence(first, last day)` (O(series length),
    never a global calendar cross join); carrying the previous/next
    observed point uses the two classic `last/first(..., ignoreNulls)`
    windows over the SAME user-day ordering, so the whole fill is two
    window passes over one shuffle by user_id. Interior days always have
    both neighbours because the series endpoints are observed by
    construction."""
    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    spine = (
        p.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
        )
    )
    joined = spine.join(p, ["user_id", "d"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("n").isNotNull(), F.col("d"))
    ctx = joined.select(
        "user_id",
        "d",
        "n",
        F.last(obs_d, ignorenulls=True).over(wp).alias("pd"),
        F.last("n", ignorenulls=True).over(wp).alias("pn"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("nd"),
        F.first("n", ignorenulls=True).over(wf).alias("nn"),
    )
    interp = F.col("pn") + (F.col("nn") - F.col("pn")) * F.datediff(
        "d", "pd"
    ) * 1.0 / F.datediff("nd", "pd")
    return ctx.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").isNotNull().alias("observed"),
        F.round(
            F.when(F.col("n").isNotNull(), F.col("n") * 1.0).otherwise(interp), 4
        ).alias("filled"),
    )


@query(
    "q_evt_rolling_dau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (
      SELECT DISTINCT d FROM du
    ), contrib AS (
      SELECT y.d AS target, du.user_id
      FROM du, LATERAL (
        SELECT unnest(generate_series(du.d, du.d + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY))::DATE AS d) y
    ), roll AS (
      SELECT c.target AS d, count(DISTINCT c.user_id) AS rolling_7d_users
      FROM contrib c JOIN days ON days.d = c.target
      GROUP BY c.target
    ), dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau,
           CAST(roll.rolling_7d_users AS BIGINT) AS rolling_7d_users
    FROM dau JOIN roll ON dau.d = roll.d
    """,
)
def q_evt_rolling_dau(spark, sf_dir):
    """Daily active users + trailing-7-day distinct users per day — the
    dashboard query every event pipeline serves, and the canonical
    rolling-DISTINCT problem: COUNT(DISTINCT) is not decomposable over a
    sliding frame, so a window function cannot compute it.

    The scale technique is WINDOW-WIDTH EXPLODE: the corpus first
    collapses to distinct (day, user) pairs (one hash agg — the big
    shrink happens before anything else), then each pair fans out to the
    <=7 target days it can contribute to, and one countDistinct per
    target day finishes. Work is bounded at 7x|user-days| exploded rows —
    linear in data, NEVER the day-range self-join (whose cost is
    |days| x |user-days|). Target days are semi-joined back to observed
    days so sparse calendars don't emit phantom rows."""
    du = (
        t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = du.select("d").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("target"),
        "user_id",
    )
    roll = (
        contrib.join(F.broadcast(days), contrib.target == days.d)
        .groupBy("target")
        .agg(F.countDistinct("user_id").alias("rolling_7d_users"))
    )
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    return dau.join(roll, dau.d == roll.target).select(
        F.date_format(dau.d, "yyyy-MM-dd").alias("day"),
        "dau",
        "rolling_7d_users",
    )


@query(
    "q_evt_rfm",
    oracle="""
    WITH mx AS (SELECT max(ts) AS now FROM events),
    u AS (
      SELECT user_id,
             datediff('day', max(ts), (SELECT now FROM mx)) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             round(coalesce(sum(value), 0), 4) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
           ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
           ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
    FROM u
    """,
)
def q_evt_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary): the classic
    customer-value quartiling — days since last event, event count, and
    value sum per user, each scored 1-4 by ntile with a user_id tiebreak
    so both engines quartile identically (monetary is coalesced to 0:
    engines disagree on NULL placement under DESC).

    Scale shape: the corpus collapses to ONE |users|-row aggregate before
    anything else; the three ntiles are whole-frame windows over that
    aggregate — fine while |users| fits a single sort (ntile needs global
    rank; at extreme user counts swap ntile for a quantile-threshold join
    against approx_percentile bounds, same outputs up to tie handling).
    The reference-corpus max(ts) is a 1-row broadcast."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            r4(F.coalesce(F.sum("value"), F.lit(0.0))).alias("monetary"),
        )
        .join(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff(F.to_date("now"), F.to_date("last_ts")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    wa = Window.orderBy(F.asc("recency_days"), "user_id")
    wf = Window.orderBy(F.desc("frequency"), "user_id")
    wm = Window.orderBy(F.desc("monetary"), "user_id")
    return u.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(wa).alias("r_score"),
        F.ntile(4).over(wf).alias("f_score"),
        F.ntile(4).over(wm).alias("m_score"),
    )


@query(
    "q_evt_drift_ks",
    oracle="""
    WITH pts AS (
      SELECT round(value, 4) AS v,
             CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS g
      FROM events WHERE value IS NOT NULL
    ), cnt AS (
      SELECT v,
             count(*) FILTER (g = 0) AS c0,
             count(*) FILTER (g = 1) AS c1
      FROM pts GROUP BY v
    ), cdf AS (
      SELECT v,
             CAST(sum(c0) OVER (ORDER BY v) AS DOUBLE)
               / (SELECT count(*) FROM pts WHERE g = 0) AS f0,
             CAST(sum(c1) OVER (ORDER BY v) AS DOUBLE)
               / (SELECT count(*) FROM pts WHERE g = 1) AS f1
      FROM cnt
    )
    SELECT round(max(abs(f0 - f1)), 4) AS ks_stat,
           (SELECT CAST(count(*) AS BIGINT) FROM pts WHERE g = 0) AS n_a,
           (SELECT CAST(count(*) AS BIGINT) FROM pts WHERE g = 1) AS n_b
    FROM cdf
    """,
)
def q_evt_drift_ks(spark, sf_dir):
    """Two-sample distribution-drift check: the Kolmogorov-Smirnov
    statistic (max CDF gap) between event values from the first vs second
    half of the month — the data-quality gate that catches a silently
    shifted metric before it trains into a model. Values quantize to 4
    decimals first, so the comparison grid is bounded and both engines
    walk identical points.

    Scale shape: one hash agg collapses the corpus to |distinct quantized
    values| rows with BOTH sides' counts; the two CDFs come from ONE
    running-sum sort over that collapsed grid (totals are whole-frame
    window sums — no extra pass); output is a single row. At 100 TB the
    quantization bounds the sort; coarser bins or a t-digest sketch are
    the documented swaps if even that grid grows hot."""
    pts = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round("value", 4).alias("v"),
            F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("g"),
        )
    )
    cnt = pts.groupBy("v").agg(
        F.count(F.when(F.col("g") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("g") == 1, 1)).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = cnt.select(
        (F.sum("c0").over(w).cast("double") / F.sum("c0").over(whole)).alias("f0"),
        (F.sum("c1").over(w).cast("double") / F.sum("c1").over(whole)).alias("f1"),
        F.sum("c0").over(whole).alias("n_a"),
        F.sum("c1").over(whole).alias("n_b"),
    )
    return cdf.agg(
        r4(F.max(F.abs(F.col("f0") - F.col("f1")))).alias("ks_stat"),
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
    )


@query(
    "q_evt_forecast_eval",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, d
    ), scored AS (
      SELECT a.event_type, a.n AS actual, f.n AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type AND f.d = a.d - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           round(avg(abs(actual - forecast)), 4) AS mae,
           round(avg(actual - forecast), 4) AS bias
    FROM scored GROUP BY event_type
    """,
)
def q_evt_forecast_eval(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's event count
    with the same weekday last week (the baseline every real forecasting
    model must beat) and score per event type with MAE and signed bias —
    the capacity-planning sanity check a metrics pipeline runs daily.

    Scale shape: the corpus collapses to a (type, day) count aggregate
    FIRST (|types| x |days| rows — tiny at any data size), and the
    forecast join is an equi-join on (type, day-7) over that aggregate,
    robust to missing days (a lag-7-ROWS window would silently misalign
    across gaps). Everything after the first aggregate is
    metadata-sized."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    a = daily.alias("a")
    f = daily.alias("f")
    scored = a.join(
        f,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.d") == F.date_sub(F.col("a.d"), 7)),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("actual"),
        F.col("f.n").alias("forecast"),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_days_scored"),
        r4(F.avg(F.abs(F.col("actual") - F.col("forecast")))).alias("mae"),
        r4(F.avg(F.col("actual") - F.col("forecast"))).alias("bias"),
    )


PATTERN = "view>click>purchase"


@query(
    "q_evt_pattern_match",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(seq, '{PATTERN}')) AS BIGINT)
             AS n_matches
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{PATTERN}')) >= 1
    """,
)
def q_evt_pattern_match(spark, sf_dir):
    """Sequence-pattern matching (the MATCH_RECOGNIZE shape Spark SQL
    lacks): count, per user, occurrences of the consecutive event pattern
    view -> click -> purchase in their exact event timeline — behavioral
    path mining beyond what per-stage funnels (q_evt_funnel allows gaps)
    can express.

    Implementation: each user's timeline folds to ONE delimited string
    (deterministic (ts, event_id) order) and the pattern is a literal
    substring scan — no per-event joins, no self-join chains (the naive
    3-way consecutive-event join shuffles the corpus twice and breaks at
    k-step patterns). One user_id shuffle; per-user work is linear in
    their history; fixture event types share no token suffixes, so the
    unanchored scan cannot false-positive across delimiters (asserted in
    tests). Hot users (bots) bound the per-row cost — cap timeline length
    at ingest if that's a concern."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("seq"),
        F.count("*").alias("n_events"),
    )
    n_matches = F.size(F.regexp_extract_all("seq", F.lit(PATTERN), F.lit(0)))
    return (
        seqs.select("user_id", "n_events", n_matches.alias("n_matches"))
        .filter(F.col("n_matches") >= 1)
    )


@query(
    "q_evt_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS cohort, avg(value) AS user_mean
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    ), c AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_users,
             avg(user_mean) AS m, var_samp(user_mean) AS v
      FROM u GROUP BY cohort
    ), wide AS (
      SELECT max(CASE WHEN cohort = 0 THEN n_users END) AS n_a,
             max(CASE WHEN cohort = 0 THEN m END) AS m_a,
             max(CASE WHEN cohort = 0 THEN v END) AS v_a,
             max(CASE WHEN cohort = 1 THEN n_users END) AS n_b,
             max(CASE WHEN cohort = 1 THEN m END) AS m_b,
             max(CASE WHEN cohort = 1 THEN v END) AS v_b
      FROM c
    )
    SELECT n_a, n_b,
           round(m_a, 4) AS mean_a,
           round(m_b, 4) AS mean_b,
           round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS z_stat
    FROM wide
    """,
)
def q_evt_ab_test(spark, sf_dir):
    """A/B experiment readout: Welch z on per-user mean purchase value
    between two cohorts split by the deterministic id-parity hash — here
    a null A/A test (parity is independent of behavior), the calibration
    run experimenters do before trusting a pipeline: |z| should be small.

    Per-user means first (not raw events) — the unit of randomization is
    the USER, and computing the statistic over raw events would understate
    variance via within-user correlation (the classic A/B mistake).

    Scale shape: corpus -> one row per user (map-combined), -> 2 cohort
    rows, -> 1. All post-aggregate arithmetic stays in the plan (no
    collect); expression order matches the oracle so IEEE doubles agree
    at 4dp."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    u = ev.groupBy("user_id").agg(F.avg("value").alias("user_mean")).withColumn(
        "cohort", F.col("user_id") % 2
    )
    c = u.groupBy("cohort").agg(
        F.count("*").alias("n_users"),
        F.avg("user_mean").alias("m"),
        F.var_samp("user_mean").alias("v"),
    )
    wide = c.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("cohort") == 0, F.col("m"))).alias("m_a"),
        F.max(F.when(F.col("cohort") == 0, F.col("v"))).alias("v_a"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("cohort") == 1, F.col("m"))).alias("m_b"),
        F.max(F.when(F.col("cohort") == 1, F.col("v"))).alias("v_b"),
    )
    z = (F.col("m_a") - F.col("m_b")) / F.sqrt(
        F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        r4("m_a").alias("mean_a"),
        r4("m_b").alias("mean_b"),
        r4(z).alias("z_stat"),
    )


@query(
    "q_evt_heatmap",
    oracle="""
    WITH c AS (
      SELECT isodow(ts) AS dow, hour(ts) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY dow, hod
    )
    SELECT dow, hod, n,
           round(n * 1.0 / sum(n) OVER (), 4) AS share
    FROM c
    """,
)
def q_evt_heatmap(spark, sf_dir):
    """Activity heatmap: events per (ISO weekday, hour-of-day) cell with
    each cell's share of total traffic — the capacity-planning /
    anomaly-context matrix every event dashboard renders first.

    Scale shape: one map-combined aggregate to at most 7x24 cells; the
    share is a whole-frame window over those 168 rows. ISO weekday is
    used because the engines' default DAYOFWEEK origins differ (Spark
    Sunday=1, DuckDB Sunday=0) while isodow/weekday+1 agree."""
    c = (
        t(spark, sf_dir, "events")
        .groupBy(
            (F.weekday("ts") + 1).alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    whole = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return c.select(
        "dow", "hod", "n", r4(F.col("n") * 1.0 / F.sum("n").over(whole)).alias("share")
    )


@query(
    "q_ts_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, d
    ), ma AS (
      SELECT event_type, d, n,
             avg(n) OVER w AS trend,
             count(*) OVER w AS w_n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           round(trend, 4) AS trend,
           round(n - trend, 4) AS residual
    FROM ma WHERE w_n = 7
    """,
)
def q_ts_decompose(spark, sf_dir):
    """Trend/residual decomposition of the daily count series (STL-lite):
    trend = 7-day centered moving average per event type, residual = the
    de-trended remainder — the first step of seasonality analysis and the
    input a robust anomaly detector actually scores (raw counts confound
    trend shifts with outliers; q_evt_anomaly on residuals is the
    composed production shape).

    Edge rows without a full 7-day window are excluded (their "trend"
    would mix window sizes) via the frame's own row count — no date
    arithmetic, so calendar gaps degrade gracefully.

    Scale shape: corpus → (type, day) counts first; the centered frame is
    a per-type window over that tiny series; output <= |types|x|days|."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "event_type",
        "d",
        "n",
        F.avg("n").over(w).alias("trend"),
        F.count("*").over(w).alias("w_n"),
    )
    return ma.filter(F.col("w_n") == 7).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        r4("trend").alias("trend"),
        r4(F.col("n") - F.col("trend")).alias("residual"),
    )


@query(
    "q_ts_autocorr",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, d
    ), lagged AS (
      SELECT event_type, n,
             lag(n, 1) OVER (PARTITION BY event_type ORDER BY d) AS n_1,
             lag(n, 7) OVER (PARTITION BY event_type ORDER BY d) AS n_7
      FROM daily
    )
    SELECT event_type,
           round(corr(n, n_1), 4) AS acf_1,
           round(corr(n, n_7), 4) AS acf_7
    FROM lagged GROUP BY event_type
    """,
)
def q_ts_autocorr(spark, sf_dir):
    """Lag-1 and lag-7 autocorrelation of the daily count series per
    event type — the two numbers that justify (or kill) the seasonal-naive
    forecast (q_evt_forecast_eval): a high acf_7 says same-weekday
    history predicts; acf_1 near zero says yesterday doesn't.

    corr() skips rows with a NULL lag on both engines, so the first
    1 / 7 days drop out of each estimate identically. Corpus collapses to
    the (type, day) aggregate before any window; output is |types| rows."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("n_1"),
        F.lag("n", 7).over(w).alias("n_7"),
    )
    return lagged.groupBy("event_type").agg(
        r4(F.corr("n", "n_1")).alias("acf_1"),
        r4(F.corr("n", "n_7")).alias("acf_7"),
    )


@query(
    "q_evt_conversion_lag",
    oracle="""
    WITH touch AS (
      SELECT user_id, event_type AS touch_type, ts AS t_touch FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type IN ('view', 'click'))
      WHERE rn = 1),
    conv AS (
      SELECT t.user_id, t.touch_type,
             min(epoch_us(p.ts) - epoch_us(t.t_touch)) AS lag_us
      FROM touch t
      JOIN events p ON p.user_id = t.user_id
                   AND p.event_type = 'purchase' AND p.ts >= t.t_touch
      GROUP BY t.user_id, t.touch_type)
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(quantile_cont(lag_us, 0.5) / 60000000.0, 4) AS p50_minutes,
           round(quantile_cont(lag_us, 0.9) / 60000000.0, 4) AS p90_minutes,
           round(avg(lag_us) / 60000000.0, 4) AS avg_minutes
    FROM conv GROUP BY touch_type
    """,
)
def q_evt_conversion_lag(spark, sf_dir):
    """Time-to-convert distribution: per user, the FIRST view-or-click
    (ts + event_id tiebreak) is the acquisition touch; the first purchase
    at-or-after it converts, and the lag is measured exactly in
    microseconds (unix_micros/epoch_us on both engines — no truncated
    second casts to diverge on sub-second fixtures). Reported per touch
    type: conversion count, p50/p90/mean latency in minutes — the
    measurement behind attribution-window tuning (q_evt_attribution picks
    72h; THIS op is where that number comes from) and funnel-latency SLAs.

    Scale shape: first-touch is one user-keyed window over the filtered
    touch stream; conversion is a user-keyed join against purchases
    reduced BEFORE the percentile (one row per converting user), so the
    percentile aggregate sees |users| rows, never |events|. All three
    stages share the user_id shuffle key — one shuffle end to end, then a
    |touch_types|-row result.

    Reference scope: no event analytics in the reference facade; sibling
    of q_evt_funnel / q_evt_attribution / q_evt_retention."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    touch = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("touch_type"),
            F.col("ts").alias("t_touch"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        touch.join(purchases, "user_id")
        .filter(F.col("p_ts") >= F.col("t_touch"))
        .groupBy("user_id", "touch_type")
        .agg(
            F.min(
                # fixture ts is TIMESTAMP_NTZ; unix_micros needs LTZ — the
                # UTC session (ENGINE_OVERRIDES) makes the cast shift-free,
                # and only the DIFFERENCE matters anyway
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("t_touch").cast("timestamp"))
            ).alias("lag_us")
        )
    )
    m = 60_000_000.0
    return conv.groupBy("touch_type").agg(
        F.count("*").alias("n_conversions"),
        r4(F.expr("percentile(lag_us, 0.5)") / m).alias("p50_minutes"),
        r4(F.expr("percentile(lag_us, 0.9)") / m).alias("p90_minutes"),
        r4(F.avg("lag_us") / m).alias("avg_minutes"),
    )


EWMA_ALPHA = 0.3
EWMA_WINDOW = 14  # lookback days; 0.7^14 ~ 0.7% residual weight


@query(
    "q_ts_ewma",
    oracle=f"""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
    ), contrib AS (
      SELECT y.target, dc.d, dc.n,
             {EWMA_ALPHA} * power({1 - EWMA_ALPHA}, datediff('day', dc.d, y.target)) AS w
      FROM dc, LATERAL (
        SELECT unnest(generate_series(dc.d, dc.d + INTERVAL {EWMA_WINDOW - 1} DAY,
                                      INTERVAL 1 DAY))::DATE AS target) y
    ), sm AS (
      SELECT c.target AS d, round(sum(c.w * c.n) / sum(c.w), 4) AS ewma
      FROM contrib c JOIN (SELECT DISTINCT d FROM dc) days ON days.d = c.target
      GROUP BY c.target
    )
    SELECT strftime(dc.d, '%Y-%m-%d') AS day, CAST(dc.n AS BIGINT) AS n,
           sm.ewma,
           round(dc.n / sm.ewma, 4) AS ratio,
           CAST(CASE WHEN dc.n > 1.5 * sm.ewma THEN 1 ELSE 0 END AS INTEGER) AS is_spike
    FROM dc JOIN sm ON dc.d = sm.d
    ORDER BY day
    """,
)
def q_ts_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of the daily event count with
    a spike flag — the smoothing/alerting primitive behind ingest-volume
    monitors (EWMA reacts faster than a plain rolling mean and needs no
    model fit; a day running >1.5x its own smoothed history is flagged).

    Window frames cannot weight rows by their distance from the frame
    head, so the EWMA uses the same WINDOW-WIDTH EXPLODE technique as
    q_evt_rolling_dau: the corpus first collapses to |days| count rows
    (the big shrink), each day then fans out to the <=14 future days it
    contributes to, carrying weight alpha*(1-alpha)^gap, and one grouped
    sum(w*n)/sum(w) per target day finishes.  Work is 14x|days| rows —
    trivial after the pre-aggregate whatever the event volume.  The
    normalizing sum(w) denominator makes the head of the series
    well-defined (weights renormalize over the days actually present).

    Cross-engine determinism: the spike comparison uses the 4dp-ROUNDED
    ewma (identical double bits on both engines), never the raw float
    sum, so ulp-level summation-order differences cannot flip the flag."""
    dc = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )
    days = dc.select("d").distinct()
    contrib = (
        dc.select(
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), EWMA_WINDOW - 1))
            ).alias("target"),
            "d",
            "n",
        )
        .withColumn(
            "w",
            F.lit(EWMA_ALPHA)
            * F.pow(F.lit(1 - EWMA_ALPHA), F.datediff("target", "d")),
        )
        .drop("d")  # drop the source day before re-joining frames derived
        # from dc — keeps the self-join lineage unambiguous
    )
    sm = (
        contrib.join(F.broadcast(days), contrib.target == days.d)
        .groupBy("target")
        .agg(F.round(F.sum(F.col("w") * F.col("n")) / F.sum("w"), 4).alias("ewma"))
    )
    return (
        dc.alias("dc")
        .join(sm.alias("sm"), F.col("dc.d") == F.col("sm.target"))
        .select(
            F.date_format(F.col("dc.d"), "yyyy-MM-dd").alias("day"),
            F.col("n").cast("bigint").alias("n"),
            "ewma",
            F.round(F.col("n") / F.col("ewma"), 4).alias("ratio"),
            F.when(F.col("n") > 1.5 * F.col("ewma"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_spike"),
        )
        .orderBy("day")
    )


@query(
    "q_evt_markov",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ), tr AS (
      SELECT src, dst, count(*) AS n FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    ), tot AS (SELECT sum(n) AS total FROM tr)
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY src), 4) AS prob,
           round((n * 1.0 * (SELECT total FROM tot))
                 / (sum(n) OVER (PARTITION BY src)
                    * sum(n) OVER (PARTITION BY dst)), 4) AS lift
    FROM tr ORDER BY src, dst
    """,
)
def q_evt_markov(spark, sf_dir):
    """First-order Markov transition model over user event sequences:
    per-(src,dst) transition count, conditional probability P(dst|src),
    and lift vs the unconditional destination rate — lift > 1 marks
    transitions that happen MORE than the base rate predicts (the signal
    q_evt_bigrams' raw counts can't show, since frequent event types
    dominate every bigram list).

    Scale shape: one user_id shuffle for the lead() window, then the
    corpus collapses to <=|types|^2 transition rows; the per-src and
    per-dst normalizers are windows over that tiny frame and the grand
    total is a 1-row broadcast.  Lift is computed as one fused expression
    (n*total)/(src_tot*dst_tot) of exact integer counts — a single
    rounding site, bit-identical across engines."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .select(F.col("event_type").alias("src"), "dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    tot = tr.agg(F.sum("n").alias("total"))
    ws = Window.partitionBy("src")
    wd = Window.partitionBy("dst")
    return (
        tr.join(F.broadcast(tot))
        .select(
            "src",
            "dst",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.sum("n").over(ws), 4).alias("prob"),
            F.round(
                (F.col("n") * 1.0 * F.col("total"))
                / (F.sum("n").over(ws) * F.sum("n").over(wd)),
                4,
            ).alias("lift"),
        )
        .orderBy("src", "dst")
    )


@query(
    "q_evt_lifecycle",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events WHERE event_type = 'purchase'
    ), cls AS (
      SELECT user_id, wk,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             row_number() OVER (PARTITION BY user_id ORDER BY wk) AS rn
      FROM uw
    ), wkly AS (
      SELECT wk,
             CAST(count(*) AS BIGINT) AS active,
             CAST(count(*) FILTER (rn = 1) AS BIGINT) AS new_users,
             CAST(count(*) FILTER (rn > 1 AND datediff('day', prev_wk, wk) = 7)
                  AS BIGINT) AS retained,
             CAST(count(*) FILTER (rn > 1 AND datediff('day', prev_wk, wk) > 7)
                  AS BIGINT) AS resurrected
      FROM cls GROUP BY wk
    )
    SELECT strftime(wk, '%Y-%m-%d') AS week, active, new_users, retained,
           resurrected,
           CAST(coalesce(lag(active) OVER (ORDER BY wk), 0) - retained
                AS BIGINT) AS churned_from_prev
    FROM wkly ORDER BY week
    """,
)
def q_evt_lifecycle(spark, sf_dir):
    """Weekly growth accounting over PURCHASE activity: every buyer
    classified as NEW (first-ever purchase week), RETAINED (also bought
    the immediately preceding week), or RESURRECTED (buying again after a
    lapsed week), plus churn pressure
    (previous observed week's actives who did not retain) — the
    new/retained/resurrected/churned ledger every growth team runs, and
    the decomposition a bare DAU/WAU curve can't show (flat WAU can hide
    high churn masked by acquisition).

    Scale shape: the corpus collapses to DISTINCT (user, week) in one
    map-side-combined pass, the lifecycle classification is one
    user_id-partitioned window over that |users x weeks| frame, and the
    weekly ledger is <=|weeks| rows; the final churn lag is a window over
    that tiny frame (the |days|-frame convention of q_ts_ewma).  Weeks
    are ISO Monday-start on both engines (date_trunc('week')); the churn
    row for the first observed week is 0 by the coalesce convention."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("week", "ts").cast("date").alias("wk"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    cls = ev.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.row_number().over(w).alias("rn"),
    )
    gap = F.datediff("wk", "prev_wk")
    wkly = cls.groupBy("wk").agg(
        F.count("*").cast("bigint").alias("active"),
        F.count(F.when(F.col("rn") == 1, 1)).cast("bigint").alias("new_users"),
        F.count(F.when((F.col("rn") > 1) & (gap == 7), 1))
        .cast("bigint")
        .alias("retained"),
        F.count(F.when((F.col("rn") > 1) & (gap > 7), 1))
        .cast("bigint")
        .alias("resurrected"),
    )
    ww = Window.orderBy("wk")
    return (
        wkly.select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "active",
            "new_users",
            "retained",
            "resurrected",
            (F.coalesce(F.lag("active").over(ww), F.lit(0)) - F.col("retained"))
            .cast("bigint")
            .alias("churned_from_prev"),
        )
        .orderBy("week")
    )


@query(
    "q_evt_cohort_ltv",
    oracle="""
    WITH ev AS (
      SELECT user_id, value,
             CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(min(date_trunc('week', ts)) OVER (PARTITION BY user_id)
                  AS DATE) AS cohort
      FROM events
    ), cell AS (
      SELECT cohort,
             CAST(datediff('day', cohort, wk) / 7 AS INT) AS week_offset,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             round(sum(value), 4) AS revenue
      FROM ev GROUP BY cohort, week_offset
    ), sized AS (
      SELECT *,
             first(users) OVER (PARTITION BY cohort ORDER BY week_offset)
               AS cohort_size,
             round(sum(revenue) OVER (PARTITION BY cohort
                                      ORDER BY week_offset), 4) AS cum_revenue
      FROM cell
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_offset, users,
           revenue, cum_revenue,
           round(cum_revenue / cohort_size, 4) AS ltv_per_user
    FROM sized ORDER BY cohort_week, week_offset
    """,
)
def q_evt_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: users grouped by first-activity week,
    one row per (cohort week, week offset) with active users, period
    revenue, cumulative revenue, and cumulative LTV per cohort member —
    the payback-curve view that prices acquisition (q_evt_retention counts
    WHO comes back; this prices WHAT they bring when they do).

    Scale shape: the cohort label is a min() window over the single
    user_id shuffle (no self-join back to the corpus), the matrix
    aggregate collapses to |cohorts| x |offsets| rows, and the cumulative
    windows run over that tiny frame.  The LTV denominator is the
    offset-0 user count (every cohort has offset 0 by construction —
    the cohort week itself is active).  Revenue is rounded to 4 dp per
    cell BEFORE the cumulative sum, so the running total adds identical
    4-dp values in identical offset order on both engines."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "value", F.date_trunc("week", "ts").cast("date").alias("wk")
    )
    wu = Window.partitionBy("user_id")
    ev = ev.withColumn("cohort", F.min("wk").over(wu))
    cell = (
        ev.select(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
            "user_id",
            "value",
        )
        .groupBy("cohort", "week_offset")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("users"),
            F.round(F.sum("value"), 4).alias("revenue"),
        )
    )
    wc = Window.partitionBy("cohort").orderBy("week_offset")
    sized = cell.select(
        "*",
        F.first("users").over(wc).alias("cohort_size"),
        F.round(F.sum("revenue").over(wc), 4).alias("cum_revenue"),
    )
    return (
        sized.select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "users",
            "revenue",
            "cum_revenue",
            F.round(F.col("cum_revenue") / F.col("cohort_size"), 4).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "q_evt_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events WHERE event_type = 'purchase'
    ), isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM ud
    ), runs AS (
      SELECT user_id, island,
             CAST(count(*) AS BIGINT) AS len,
             min(d) AS start_d
      FROM isl GROUP BY user_id, island
    ), best AS (
      SELECT user_id, len, start_d,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, start_d ASC) AS rn
      FROM runs
    ), stats AS (
      SELECT user_id,
             CAST(sum(len) AS BIGINT) AS active_days,
             CAST(count(*) AS BIGINT) AS n_streaks
      FROM runs GROUP BY user_id
    )
    SELECT s.user_id, s.active_days, s.n_streaks,
           b.len AS longest_streak,
           strftime(b.start_d, '%Y-%m-%d') AS longest_start
    FROM stats s JOIN best b ON s.user_id = b.user_id AND b.rn = 1
    ORDER BY s.user_id
    """,
)
def q_evt_streaks(spark, sf_dir):
    """Gaps-and-islands per user over purchase days: total active days,
    number of distinct consecutive-day streaks, and the longest streak
    with its start date — the engagement-continuity measure (habit
    formation, streak features for churn models) that per-week ledgers
    (q_evt_lifecycle) can't resolve.  The island key is the classic
    ``day - row_number() days`` trick: consecutive days share it, any
    gap starts a new one.

    Scale shape: the corpus collapses to DISTINCT (user, day) in one
    map-combined pass and EVERYTHING after — the island window, the run
    aggregate, the per-user best-streak window, the stats aggregate and
    the final join — is keyed on user_id, so one shuffle family serves
    the whole plan; output is |users| rows.  Longest-streak ties break
    on earliest start (deterministic on both engines)."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    wi = Window.partitionBy("user_id").orderBy("d")
    isl = ev.withColumn(
        "island", F.date_sub("d", F.row_number().over(wi))
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count("*").cast("bigint").alias("len"),
        F.min("d").alias("start_d"),
    )
    wb = Window.partitionBy("user_id").orderBy(F.desc("len"), "start_d")
    best = (
        runs.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("user_id", "len", "start_d")
    )
    stats = runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("active_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )
    return (
        stats.join(best, "user_id")
        .select(
            "user_id",
            "active_days",
            "n_streaks",
            F.col("len").alias("longest_streak"),
            F.date_format("start_d", "yyyy-MM-dd").alias("longest_start"),
        )
        .orderBy("user_id")
    )


@query(
    "q_evt_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (
      SELECT DISTINCT d FROM du
    ), contrib AS (
      SELECT y.d AS target, du.user_id
      FROM du, LATERAL (
        SELECT unnest(generate_series(du.d, du.d + INTERVAL 27 DAY,
                                      INTERVAL 1 DAY))::DATE AS d) y
    ), mau AS (
      SELECT c.target AS d, count(DISTINCT c.user_id) AS mau_28d
      FROM contrib c JOIN days ON days.d = c.target
      GROUP BY c.target
    ), dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau,
           CAST(mau.mau_28d AS BIGINT) AS mau_28d,
           round(dau.dau * 1.0 / mau.mau_28d, 4) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    ORDER BY day
    """,
)
def q_evt_stickiness(spark, sf_dir):
    """DAU / trailing-28-day-MAU stickiness per day — the engagement
    ratio every growth dashboard tracks (stickiness ~1 = the same users
    daily; low = broad-but-shallow reach), and a second instance of the
    canonical rolling-DISTINCT problem: COUNT(DISTINCT) over a sliding
    frame is not window-decomposable.

    Scale shape: the q_evt_rolling_dau WINDOW-WIDTH EXPLODE — corpus
    collapses to distinct (day, user) FIRST, each pair fans out to the
    <=28 target days it can serve, one countDistinct per target day;
    work bounded at 28x|user-days| rows, never the |days| x |user-days|
    range self-join. The early-calendar head is an honest PARTIAL-window
    MAU (days with <28 days of history count what exists — the dashboard
    convention), so the ratio is defined from day one."""
    du = (
        t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = du.select("d").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 27))).alias(
            "target"
        ),
        "user_id",
    )
    mau = (
        contrib.join(F.broadcast(days), contrib.target == days.d)
        .groupBy("target")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau_28d"))
    )
    dau = du.groupBy("d").agg(F.count("*").cast("bigint").alias("dau"))
    return (
        dau.join(mau, dau.d == mau.target)
        .select(
            F.date_format(dau.d, "yyyy-MM-dd").alias("day"),
            "dau",
            "mau_28d",
            F.round(F.col("dau") * 1.0 / F.col("mau_28d"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# -- survival / forecasting recurrences ---------------------------------------

SURV_GAP_US = 30 * 60 * 1_000_000  # session gap / censoring horizon (30 min)
HOLT_ALPHA = 0.5  # level smoothing (exact binary fraction)
HOLT_BETA = 0.3  # trend smoothing


@query(
    "q_evt_survival",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    s AS (
      SELECT user_id, sid, min(ts) AS smin, max(ts) AS smax
      FROM sess GROUP BY user_id, sid),
    mx AS (SELECT max(ts) AS tmax FROM events),
    u AS (
      SELECT (epoch_us(smax) - epoch_us(smin)) // 60000000 AS t,
             CASE WHEN epoch_us(tmax) - epoch_us(smax) > {SURV_GAP_US}
                  THEN 1 ELSE 0 END AS ended
      FROM s, mx),
    lc AS (
      SELECT t, count(*) AS c, sum(ended) AS d FROM u GROUP BY t),
    risk AS (
      SELECT t, d,
             sum(c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_risk
      FROM lc),
    dt AS (SELECT t, n_risk, d FROM risk WHERE d > 0)
    SELECT CAST(t AS INT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d,
           round(product(CAST(n_risk - d AS DOUBLE) / n_risk)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 4) AS surv
    FROM dt ORDER BY t
    """,
)
def q_evt_survival(spark, sf_dir):
    """Kaplan-Meier survival curve over SESSION durations — the
    estimator that handles CENSORING correctly: a session still running
    at the corpus's observation edge hasn't ended, it's right-censored,
    and either dropping it or counting it as ended biases every naive
    mean-session-length number.  Sessions are the canonical 30-minute-gap
    islands (the q_evt_sessionize relation); duration t = whole minutes
    between a session's first and last event; the end is OBSERVED iff the
    last event is STRICTLY more than 30 minutes before the corpus's final
    timestamp — the same strict-> predicate that breaks sessions, so
    "ended" means the closing gap has strictly elapsed (a session whose
    gap is exactly 30 min would still be in-session by the break rule and
    is censored, not dead).  One row per death time t: at-risk count n_t (sessions with
    duration >= t), ended count d_t, and the KM estimate
    S(t) = prod_{{t' <= t}} (n_t' - d_t')/n_t'.

    Scale shape: sessionization is one user_id-keyed shuffle (the family
    pattern), sessions collapse to <=|distinct minute durations| rows
    (calendar-bounded) before any sequential work; the at-risk counts
    are a DESCENDING cumulative sum over that tiny frame, never a rescan
    of sessions.  The KM cumulative product is inherently sequential, so
    it runs as a single-group applyInPandas over the bounded death table
    — the q_sim_mmr bounded-frame pattern.  Cross-engine determinism:
    durations are exact integer microsecond arithmetic (unix_micros /
    epoch_us — no truncated-seconds drift), each KM factor is one exact
    IEEE division of integer counts, and both engines multiply
    LEFT-TO-RIGHT in t order (DuckDB windowed product(), a Python loop
    here — not exp(sum(log)), whose summation order is
    partition-dependent), so the rounded S(t) is bit-stable.

    Reference scope: no analytics surface in the reference (Go facade
    handlers only, api/router/router.go:9-55); sibling of
    q_evt_sessionize / q_evt_lifecycle — this one estimates the duration
    curve those report points on."""
    import pandas as pd

    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
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
        # DIV, not "/ then cast": double division can round up across an
        # integer boundary just below a multiple of the divisor.  The NTZ
        # -> LTZ cast is shift-free under the UTC session and only
        # differences matter anyway (q_evt_conversion_lag precedent).
        F.expr(
            "(unix_micros(CAST(smax AS TIMESTAMP))"
            " - unix_micros(CAST(smin AS TIMESTAMP))) DIV 60000000"
        ).alias("t"),
        F.when(
            F.unix_micros(F.col("tmax").cast("timestamp"))
            - F.unix_micros(F.col("smax").cast("timestamp"))
            > SURV_GAP_US,
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
    )

    def km(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        # multiply-floor rounding = DuckDB round() bit-for-bit (q_ts_holt's
        # perturbed-fixture finding: F.round is exact-value HALF_UP and can
        # disagree one ulp below a decimal midpoint)
        r = lambda x: math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)
        pdf = pdf.sort_values("t").reset_index(drop=True)
        srv, out = 1.0, []
        for n_risk, d in zip(pdf["n_risk"], pdf["d"]):
            srv = srv * ((n_risk - d) / n_risk)  # left-to-right IEEE product
            out.append(r(srv))
        pdf["surv"] = out
        return pdf[["g", "t", "n_risk", "d", "surv"]]

    return (
        dt.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(km, "g int, t int, n_risk long, d long, surv double")
        .select(
            F.col("t").cast("int").alias("t"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("d"),
            F.col("surv"),
        )
        .orderBy("t")
    )


@query(
    "q_ts_holt",
    oracle=f"""
    WITH RECURSIVE dc AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
    ), idx AS (
      SELECT d, n, row_number() OVER (ORDER BY d) AS i FROM dc
    ), h(i, lvl, tr) AS (
      SELECT 1, CAST(n AS DOUBLE),
             CAST(coalesce((SELECT n FROM idx WHERE i = 2) - n, 0) AS DOUBLE)
      FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i,
             CAST({HOLT_ALPHA} AS DOUBLE) * idx.n
               + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (h.lvl + h.tr),
             CAST({HOLT_BETA} AS DOUBLE)
               * ((CAST({HOLT_ALPHA} AS DOUBLE) * idx.n
                   + CAST({1 - HOLT_ALPHA} AS DOUBLE) * (h.lvl + h.tr))
                  - h.lvl)
               + CAST({1 - HOLT_BETA} AS DOUBLE) * h.tr
      FROM h JOIN idx ON idx.i = h.i + 1
    )
    SELECT strftime(idx.d, '%Y-%m-%d') AS day, CAST(idx.n AS BIGINT) AS n,
           round(h.lvl, 4) AS level, round(h.tr, 4) AS trend,
           CASE WHEN idx.i > 1
                THEN round(lag(h.lvl + h.tr) OVER (ORDER BY idx.i), 4)
           END AS forecast
    FROM idx JOIN h ON h.i = idx.i ORDER BY day
    """,
)
def q_ts_holt(spark, sf_dir):
    """Holt's linear-trend (double exponential) smoothing of the daily
    event count, with the one-step-ahead forecast each day's actual is
    judged against — the trend-aware upgrade of q_ts_ewma (a plain EWMA
    lags a trending series by design; Holt's trend term removes that
    systematic lag, which is why capacity planning and ingest forecasting
    default to it).  level_i = alpha*y_i + (1-alpha)*(level+trend)_{{i-1}},
    trend_i = beta*(level_i - level_{{i-1}}) + (1-beta)*trend_{{i-1}},
    initialized level_1 = y_1, trend_1 = y_2 - y_1.

    Unlike the EWMA, Holt's recurrence has INFINITE memory through two
    coupled states, so the window-width-explode trick does not apply; the
    corpus first collapses to |days| count rows (the big shrink — one
    date-keyed partial agg whatever the event volume), and the sequential
    recurrence then runs over that calendar-bounded frame in a
    single-group applyInPandas (the q_sim_mmr pattern).  The DuckDB
    oracle unrolls the SAME recurrence as a recursive CTE joining the
    indexed day series — the q_graph_cc fixed-iteration twin technique —
    with every operand cast to DOUBLE (DuckDB parses bare numeric
    literals as DECIMAL, whose arithmetic diverges from Spark's doubles)
    and the operation order textually identical, so the raw state stays
    bit-equal — verified bit-for-bit on the perturbed fixture.

    The FINAL rounding is the subtle site (perturbed-fixture catch,
    round 9): the raw states are bit-equal, but Spark's F.round is
    BigDecimal HALF_UP on the EXACT binary value while DuckDB's round()
    rounds the x*1e4 product — and the product multiply can land exactly
    ON .5 when the true value is just below the decimal midpoint
    (30.840249999999997 * 1e4 == 308402.5 in IEEE: F.round says .8402,
    DuckDB says .8403).  The loop therefore rounds its own outputs with
    the multiply-floor convention (sign * floor(|x|*1e4 + 0.5) / 1e4 —
    the same one every numpy hot path in this repo uses to match
    engine-side round()), which IS DuckDB's convention: same multiply,
    same floor, bit-identical.

    Reference scope: none (analytics beyond the Go facade); sibling of
    q_ts_ewma / q_evt_forecast_eval."""
    import pandas as pd

    dc = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        r = lambda x: math.copysign(
            math.floor(abs(x) * 1e4 + 0.5) / 1e4, x
        )  # DuckDB round(): round the x*1e4 product, half away from zero
        pdf = pdf.sort_values("d").reset_index(drop=True)
        ys = pdf["n"].tolist()
        lvl = float(ys[0])
        tr = float(ys[1] - ys[0]) if len(ys) > 1 else 0.0
        levels, trends, fcs = [r(lvl)], [r(tr)], [None]
        for y in ys[1:]:
            fc = lvl + tr
            new_l = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (lvl + tr)
            new_t = HOLT_BETA * (new_l - lvl) + (1 - HOLT_BETA) * tr
            lvl, tr = new_l, new_t
            levels.append(r(lvl))
            trends.append(r(tr))
            fcs.append(r(fc))
        pdf["level"] = pd.Series(levels, dtype="float64")
        pdf["trend"] = pd.Series(trends, dtype="float64")
        pdf["forecast"] = pd.Series(fcs, dtype="float64")  # None -> null
        return pdf[["g", "d", "n", "level", "trend", "forecast"]]

    return (
        dc.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            holt, "g int, d date, n long, level double, trend double, forecast double"
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("bigint").alias("n"),
            F.col("level"),
            F.col("trend"),
            F.col("forecast"),
        )
        .orderBy("day")
    )


@query(
    "q_evt_session_features",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, ts, event_type, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, CAST(sid AS BIGINT) AS sid,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000
                AS BIGINT) AS dur_min,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 4)
             AS revenue,
           CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS INTEGER) AS had_error
    FROM sess GROUP BY user_id, sid ORDER BY user_id, sid
    """,
)
def q_evt_session_features(spark, sf_dir):
    """Per-session feature vector: start, whole-minute duration, event
    count, distinct-type count, purchase revenue, error flag — the
    featurization step that turns a raw event log into the training table
    for session-level models (conversion propensity, abandonment, fraud).
    One row PER SESSION (the 30-min-gap islands of q_evt_sessionize);
    where q_evt_sessionize reports per-user counts and q_evt_survival the
    duration distribution, this materializes the sessions themselves as
    model-ready rows.

    Scale shape: the sessionization windows and the final aggregate all
    partition by user_id — one shuffle end to end, per-user work
    partition-local, output |sessions| rows (bounded by the event count /
    minimum session spacing, and naturally partitioned for a downstream
    training-shard write).  Every feature folds in the same aggregate
    pass: no second scan, no join back to events.  Determinism: duration
    is exact integer microsecond arithmetic (DIV, never float division);
    revenue is the only rounding site; the error flag is an exact integer
    max.  At 100 TB a hot bot user still serializes only its own
    partition — the family caveat — and salting the session id into the
    aggregate key would split even that.

    Reference scope: no event analytics in the reference facade; sibling
    of q_evt_sessionize (counts) / q_evt_survival (duration curve)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", F.col("sid").cast("bigint").alias("sid"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.expr(
                "CAST((unix_micros(CAST(max(ts) AS TIMESTAMP))"
                " - unix_micros(CAST(min(ts) AS TIMESTAMP))) DIV 60000000"
                " AS BIGINT)"
            ).alias("dur_min"),
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
                    F.lit(0.0),
                ),
                4,
            ).alias("revenue"),
            F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("int")
            .alias("had_error"),
        )
        .orderBy("user_id", "sid")
    )


@query(
    "q_evt_concurrency",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    s AS (
      SELECT user_id, sid, min(ts) AS s_start,
             max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM sess GROUP BY user_id, sid),
    d AS (
      SELECT s_start AS ts, 1 AS delta FROM s
      UNION ALL SELECT s_end AS ts, -1 AS delta FROM s),
    rw AS (
      SELECT date_trunc('hour', ts) AS h, ts, delta,
             sum(delta) OVER (PARTITION BY date_trunc('hour', ts)
                              ORDER BY ts, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS runw
      FROM d),
    b AS (
      SELECT h, count(*) FILTER (delta = 1) AS n_starts,
             sum(delta) AS net, max(runw) AS peak_rel
      FROM rw GROUP BY h),
    hours AS (
      SELECT unnest(generate_series((SELECT min(h) FROM b),
                                    (SELECT max(h) FROM b),
                                    INTERVAL 1 HOUR)) AS h),
    filled AS (
      SELECT hours.h, coalesce(n_starts, 0) AS n_starts,
             coalesce(net, 0) AS net, coalesce(peak_rel, 0) AS peak_rel
      FROM hours LEFT JOIN b USING (h)),
    c AS (
      SELECT h, n_starts, net, peak_rel,
             coalesce(sum(net) OVER (ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS carry
      FROM filled)
    SELECT strftime(h, '%Y-%m-%d %H:00:00') AS hour,
           CAST(n_starts AS BIGINT) AS n_starts,
           CAST(GREATEST(carry, carry + peak_rel) AS BIGINT) AS peak_active,
           CAST(carry + net AS BIGINT) AS end_active
    FROM c ORDER BY hour
    """,
)
def q_evt_concurrency(spark, sf_dir):
    """Platform concurrency curve: ONE ROW PER HOUR of the observed span
    (transition-free hours densified from the spine), with session
    starts, the TRUE in-hour peak of concurrently-active sessions
    (max(carry-in level, carry + best within-hour prefix) — a wind-down
    hour whose transitions only decrease still reports the level it
    started at; round-11 ADVICE fix), and the active count at hour end —
    the linear-output answer to the question q_join_interval_overlap
    materializes pairwise.  The round-10
    x100 measurement showed WHY this operator exists: at 100x users in
    the same wall-clock window the co-presence graph is ~99.6% complete,
    so ANY pair-materializing operator is Omega(n^2) IN ITS OUTPUT
    (~1.1e10 pairs at 150k users) — at that density the product question
    becomes concurrency statistics, which one sweep computes exactly
    with |hours| output rows whatever the user count.

    Scale shape — the DISTRIBUTED PREFIX SUM (two-level scan): sessions
    (one user_id shuffle) emit (+1 at start, -1 at end+gap) deltas; each
    hour bucket computes its within-bucket running sum independently
    (window partitioned BY BUCKET — parallel, no global order); bucket
    NET sums collapse to a <=|hours| frame whose cumulative sum supplies
    each bucket's carry-in; peak = carry + within-bucket prefix max.
    The only sequential scan is over the tiny bucket frame (<=720 rows
    for the 30-day fixture, |hours| at any scale) — the textbook
    carry-select pattern that turns an inherently sequential running sum
    into two parallel passes.  Determinism at tied timestamps: deltas
    order (ts, delta DESC) — all starts before any end at the same
    instant (the inclusive-overlap convention of the pair operator), and
    ties among equal deltas cannot change any prefix max.  All-integer
    arithmetic; both engines run the identical two-level formulation.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); linear-output sibling of
    q_join_interval_overlap (pairs) and q_evt_rolling_dau (daily
    actives)."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    s = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("s_end"),
    )
    d = s.select(F.col("s_start").alias("ts"), F.lit(1).alias("delta")).unionAll(
        s.select(F.col("s_end").alias("ts"), F.lit(-1).alias("delta"))
    )
    bw = Window.partitionBy("h").orderBy(
        F.col("ts").asc(), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    rw = d.withColumn("h", F.date_trunc("hour", "ts")).withColumn(
        "runw", F.sum("delta").over(bw)
    )
    b = rw.groupBy("h").agg(
        F.count(F.when(F.col("delta") == 1, 1)).alias("n_starts"),
        F.sum("delta").alias("net"),
        F.max("runw").alias("peak_rel"),
    )
    # densify transition-free hours (their peak/end = the carry level) —
    # the spine join is |hours| x |hours|, both tiny frames
    hours = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1")).select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    filled = hours.join(b, "h", "left").select(
        "h",
        F.coalesce("n_starts", F.lit(0)).alias("n_starts"),
        F.coalesce("net", F.lit(0)).alias("net"),
        F.coalesce("peak_rel", F.lit(0)).alias("peak_rel"),
    )
    # carry: cumulative bucket nets over the <=|hours| frame (tiny, the
    # one deliberately-sequential level of the two-level scan)
    cw = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    c = filled.withColumn("carry", F.coalesce(F.sum("net").over(cw), F.lit(0)))
    return c.select(
        F.date_format("h", "yyyy-MM-dd HH:00:00").alias("hour"),
        F.col("n_starts").cast("bigint").alias("n_starts"),
        F.greatest(F.col("carry"), F.col("carry") + F.col("peak_rel"))
        .cast("bigint")
        .alias("peak_active"),
        (F.col("carry") + F.col("net")).cast("bigint").alias("end_active"),
    ).orderBy("hour")


SEQ_PREFIX_LEN = 8  # session-opening window the patterns are mined over
SEQ_PAT_LEN = 3  # pattern length (|types|^3 <= 125 candidate patterns)


@query(
    "q_evt_seq_patterns",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    strs AS (
      SELECT user_id, sid,
             substr(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
                    1, {SEQ_PREFIX_LEN}) AS s
      FROM sess GROUP BY user_id, sid),
    ty AS (SELECT DISTINCT event_type AS t FROM events WHERE event_type IS NOT NULL),
    pats AS (
      SELECT a.t AS t1, b.t AS t2, c.t AS t3,
             a.t || '>' || b.t || '>' || c.t AS pattern,
             substr(a.t,1,1) || '.*' || substr(b.t,1,1) || '.*' || substr(c.t,1,1) AS rx
      FROM ty a, ty b, ty c),
    n AS (SELECT count(*) AS n_sessions FROM strs)
    SELECT pattern, CAST(count(*) AS BIGINT) AS support,
           round(count(*) * 1.0 / n_sessions, 4) AS share
    FROM strs, pats, n
    WHERE regexp_matches(s, rx)
    GROUP BY pattern, n_sessions
    ORDER BY support DESC, pattern
    """,
)
def q_evt_seq_patterns(spark, sf_dir):
    """Sequential pattern mining over SESSION OPENINGS (PrefixSpan-lite):
    for every ordered length-{SEQ_PAT_LEN} event-type pattern (gaps
    allowed), the number and share of sessions whose first
    {SEQ_PREFIX_LEN} events contain it as a subsequence — how sessions
    BEGIN, the question funnel analysis asks with a fixed step list and
    q_evt_bigrams/q_evt_markov answer only for ADJACENT pairs.  The
    opening window keeps the statistic unsaturated: over a long session
    almost every pattern eventually occurs, so full-session support
    degenerates to 1.0 for all patterns.

    Scale shape: sessionization is the standard one user_id shuffle;
    each session then collapses to ONE <=8-char type-initial string (the
    alphabet's initials are distinct, and both engines build the same
    string, so the subsequence test — the oracle's regex `a.*b.*c`, the
    Spark side's equivalent leftmost locate() chain — is exact); the
    candidate pattern table is |types|^{SEQ_PAT_LEN} <= 125 rows CROSS
    JOINed as a broadcast against the |sessions|-row string frame — a
    deliberately bounded build side (the q_agg_histogram shape), map-only
    at any corpus size, output bounded by the pattern count whatever the
    data.  The pattern table derives from the DISTINCT types present, so
    a fixture missing a type (perturbed sweep) shrinks the candidates on
    both engines identically.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); subsequence sibling of q_evt_bigrams
    (adjacent pairs) and q_evt_funnel (one fixed pattern)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    sess = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    strs = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.expr(
                "concat_ws('', transform("
                "  array_sort(collect_list(struct(ts, event_id,"
                "             substring(event_type, 1, 1) AS c))),"
                "  x -> x.c))"
            ).alias("s0")
        )
        .select(F.substring("s0", 1, SEQ_PREFIX_LEN).alias("s"))
    )
    ty = ev.select(F.col("event_type").alias("t")).distinct()
    # Regen guard (ADVICE r11, the guard_session_gap pattern): sessions are
    # encoded as type INITIALS, injective only while initials are distinct
    # and regex-safe — a regenerated fixture violating that would alias
    # distinct patterns identically on BOTH engines, invisible to the
    # value-hash gate.  Bounded pull: |event types| rows.
    initials = [r.t[:1] for r in ty.collect()]
    assert len(set(initials)) == len(initials) and all(
        i.isalpha() for i in initials
    ), f"seq_patterns needs distinct alphabetic event-type initials, got {initials}"
    a, b, c = ty.alias("a"), ty.alias("b"), ty.alias("c")
    pats = (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            F.concat_ws(
                ">", F.col("a.t"), F.col("b.t"), F.col("c.t")
            ).alias("pattern"),
            F.substring(F.col("a.t"), 1, 1).alias("c1"),
            F.substring(F.col("b.t"), 1, 1).alias("c2"),
            F.substring(F.col("c.t"), 1, 1).alias("c3"),
        )
    )
    n = strs.agg(F.count("*").alias("n_sessions"))
    # Subsequence test `c1.*c2.*c3` as a greedy leftmost locate() chain —
    # for single-character needles the leftmost-match strategy is exact
    # (if ANY i<j<k positions exist, taking the first c1, then the first
    # c2 after it, then the first c3 after that succeeds), so this equals
    # the oracle's regexp_matches(s, rx) row for row.  Codegen'd string
    # scans instead of |sessions| x |patterns| java.util.regex runs over
    # a non-literal pattern, which Spark cannot pre-compile (guide §4.1:
    # built-ins over opaque per-row work — measured the dominant cost of
    # this query at sf0.1).
    p1 = F.expr("locate(c1, s)")
    p2 = F.when(p1 > 0, F.expr("locate(c2, s, locate(c1, s) + 1)")).otherwise(0)
    return (
        strs.crossJoin(F.broadcast(pats))
        .withColumn("p2", p2)
        .filter(
            F.when(
                F.col("p2") > 0,
                F.expr("locate(c3, s, p2 + 1)") > 0,
            ).otherwise(F.lit(False))
        )
        .groupBy("pattern")
        .agg(F.count("*").alias("support"))
        .join(F.broadcast(n))
        .select(
            "pattern",
            F.col("support").cast("long").alias("support"),
            r4(F.col("support") * 1.0 / F.col("n_sessions")).alias("share"),
        )
        .orderBy(F.desc("support"), "pattern")
    )


@query(
    "q_ts_cusum",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, avg(n) AS mu FROM d GROUP BY event_type
    ), c AS (
      SELECT d.event_type, day, n, mu,
             sum(n - mu) OVER (PARTITION BY d.event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS s
      FROM d JOIN m ON d.event_type = m.event_type
    ), ranked AS (
      SELECT event_type, day, s,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(s) DESC, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM c
    )
    SELECT event_type, CAST(nd AS BIGINT) AS n_days,
           round(abs(s), 4) AS cusum_max, CAST(day AS VARCHAR) AS cp_day
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
)
def q_ts_cusum(spark, sf_dir):
    """CUSUM changepoint detection per event-type series: the cumulative
    sum of mean-centered daily counts peaks (in absolute value) at the
    most likely level-shift point — Page's CUSUM statistic in its
    retrospective single-changepoint form, the standard first-line
    monitor for "did this metric's level change, and when".  Emits the
    peak statistic and its day (ties break earliest).

    Determinism: mu is one avg per series; the cumulative sum runs in
    day order on both engines (identical summation order -> identical
    doubles), and the argmax ranks on (abs(s) DESC, day), so the picked
    day is engine-stable even at exact-tie peaks.

    Scale shape: the corpus collapses to (type, day) counts in one
    map-combined aggregate; everything after is windows over the
    |types| x |days| frame (tiny at any corpus size).  Output |types|
    rows.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); changepoint sibling of q_evt_anomaly
    (z-score days) and q_ts_decompose (trend/residual split)."""
    d = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("n"))
    )
    m = d.groupBy("event_type").agg(F.avg("n").alias("mu"))
    cw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.join(m, "event_type").withColumn(
        "s", F.sum(F.col("n") - F.col("mu")).over(cw)
    )
    rw = Window.partitionBy("event_type").orderBy(F.abs("s").desc(), "day")
    ranked = c.withColumn("rn", F.row_number().over(rw)).withColumn(
        "nd", F.count("*").over(Window.partitionBy("event_type"))
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("nd").cast("long").alias("n_days"),
            r4(F.abs("s")).alias("cusum_max"),
            F.col("day").cast("string").alias("cp_day"),
        )
        .orderBy("event_type")
    )


MARKOV_ATTR_K = 16  # absorption power-iteration rounds (unrolled in oracle)
MARKOV_CHANNELS = ("click", "error", "signup", "view")  # non-purchase types


def _attr_trans_ctes() -> str:
    """Shared oracle CTE prefix building the integer transition counts and
    row-normalized probabilities of the user-journey Markov chain:
    start -> first state, channel -> next state, last pre-purchase
    channel -> conv; journeys truncate at the FIRST purchase."""
    return """ev AS MATERIALIZED (
      SELECT user_id, event_id, ts, event_type FROM events
      WHERE user_id IS NOT NULL
    ), fp AS MATERIALIZED (
      SELECT user_id, min(row(ts, event_id)) AS cut
      FROM ev WHERE event_type = 'purchase' GROUP BY user_id
    ), seq AS MATERIALIZED (
      SELECT e.user_id, e.ts, e.event_id,
             CASE WHEN e.event_type = 'purchase' THEN 'conv'
                  ELSE e.event_type END AS st
      FROM ev e LEFT JOIN fp ON e.user_id = fp.user_id
      WHERE fp.cut IS NULL OR row(e.ts, e.event_id) <= fp.cut
    ), marked AS MATERIALIZED (
      SELECT user_id, st, lead(st) OVER w AS nxt, row_number() OVER w AS rn
      FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), trans AS MATERIALIZED (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 'start' AS src, st AS dst FROM marked WHERE rn = 1
        UNION ALL
        SELECT st, coalesce(nxt, CASE WHEN st = 'conv' THEN NULL
                                      ELSE 'null' END)
        FROM marked WHERE st <> 'conv' OR nxt IS NOT NULL
      ) WHERE dst IS NOT NULL GROUP BY src, dst
    ), tp AS MATERIALIZED (
      SELECT src, dst, n * 1.0 / sum(n) OVER (PARTITION BY src) AS p
      FROM trans
    )"""


def _attr_markov_oracle() -> str:
    variants = [("all", None)] + [(c, c) for c in MARKOV_CHANNELS]
    ctes = [_attr_trans_ctes()]
    for name, removed in variants:
        tag = name if removed else "all"
        guard = (
            f"AND src <> '{removed}' AND dst <> '{removed}' " if removed else ""
        )
        ctes.append(
            f"v_{tag}_0 AS (SELECT 'start' AS st, 1.0 AS mass)"
        )
        for k in range(1, MARKOV_ATTR_K + 1):
            ctes.append(
                f"""v_{tag}_{k} AS MATERIALIZED (
      SELECT dst AS st, sum(mass * p) AS mass
      FROM v_{tag}_{k - 1} v JOIN tp ON tp.src = v.st
        AND v.st NOT IN ('conv', 'null') {guard}
      GROUP BY dst
      UNION ALL
      SELECT st, mass FROM v_{tag}_{k - 1} WHERE st IN ('conv', 'null'))"""
        )
        ctes.append(
            f"""p_{tag} AS (
      SELECT coalesce(sum(mass), 0) AS pc FROM v_{tag}_{MARKOV_ATTR_K}
      WHERE st = 'conv')"""
        )
    removal_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, 1 - p_{c}.pc / p_all.pc AS removal "
        f"FROM p_{c}, p_all"
        for c in MARKOV_CHANNELS
    )
    ctes.append(f"rem AS ({removal_rows})")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT channel, round(removal, 4) AS removal_effect,
           round(removal / sum(removal) OVER (), 4) AS attribution
    FROM rem ORDER BY channel"""
    )


@query("q_evt_attribution_markov", oracle=_attr_markov_oracle())
def q_evt_attribution_markov(spark, sf_dir):
    """MARKOV (removal-effect) attribution — the data-driven successor of
    q_evt_attribution's last-touch rule: model user journeys as a Markov
    chain over channel states with absorbing conversion, and credit each
    channel by how much total conversion probability DISAPPEARS when the
    channel is removed from the graph (its transitions deleted, stranded
    mass lost) — removal_effect = 1 - p_conv(without c)/p_conv(all),
    normalized into attribution shares.  The industry-standard answer to
    position-rule arbitrariness (first/last touch credit whoever happens
    to sit at an endpoint; removal effect credits structural
    necessity).

    Computation: journeys truncate at the FIRST purchase (one window per
    user — no self-join); transitions collapse to an INTEGER count table
    of at most (|channels|+2)^2 rows; conversion probability is
    {MARKOV_ATTR_K} rounds of mass propagation from 'start' with 'conv'
    absorbing.  On Spark the <=36-row transition table is a BOUNDED
    DRIVER PULL (the kmeans/Holt scalar precedent) iterated in numpy;
    the oracle unrolls the identical rounds as chained CTEs per removal
    variant (the BPE/LPA pattern).  Probabilities are ratios of the same
    integers and every matvec sums <=6 terms, so 4-dp rounding is stable
    cross-engine.

    Scale shape: ONE data-sized pass (the per-user window), then
    constant-size work — the removal sweep costs |channels| iterations
    over a 6x6 matrix regardless of corpus size.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); graph-attribution sibling of
    q_evt_attribution (last-touch) and q_evt_markov (transition stats)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    st = F.when(F.col("event_type") == "purchase", "conv").otherwise(
        F.col("event_type")
    )
    seq = (
        ev.select("user_id", "ts", "event_id", st.alias("st"))
        .withColumn(
            "n_conv_before",
            F.count(F.when(F.col("st") == "conv", 1)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .filter(F.col("n_conv_before") == 0)  # truncate at first purchase
    )
    marked = seq.select(
        "user_id",
        "st",
        F.lead("st").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    starts = marked.filter(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("st").alias("dst")
    )
    steps = (
        marked.filter((F.col("st") != "conv") | F.col("nxt").isNotNull())
        .select(
            F.col("st").alias("src"),
            F.coalesce(
                "nxt",
                F.when(F.col("st") != "conv", F.lit("null")),
            ).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    trans = (
        starts.unionByName(steps).groupBy("src", "dst").agg(F.count("*").alias("n"))
    )
    # bounded pull: <= (|channels|+2)^2 integer rows (the Lloyd's-scalar
    # precedent) — the removal sweep is pure 6x6 arithmetic after this;
    # deterministic iteration order via the (src, dst) sort
    rows = sorted(trans.collect(), key=lambda r: (r.src, r.dst))
    out_tot: dict = {}
    for r in rows:
        out_tot[r.src] = out_tot.get(r.src, 0) + r.n
    # every declared channel gets a row — one absent from the data has
    # zero removal effect (its deletion changes nothing), matching the
    # oracle's fixed variant list on degraded fixtures
    channels = sorted(MARKOV_CHANNELS)

    def absorb(removed):
        mass = {"start": 1.0}
        pconv = 0.0
        for _ in range(MARKOV_ATTR_K):
            nxt: dict = {}
            for r in rows:
                if r.src in ("conv", "null") or r.src not in mass:
                    continue
                if removed and (r.src == removed or r.dst == removed):
                    continue
                m = mass[r.src] * (r.n / out_tot[r.src])
                if r.dst == "conv":
                    pconv += m
                elif r.dst != "null":
                    nxt[r.dst] = nxt.get(r.dst, 0.0) + m
            mass = nxt
        return pconv

    base = absorb(None)
    # Degraded-fixture guards (ADVICE r11): DuckDB renders x/0 as NULL,
    # so a fixture with no converting journeys (base == 0) yields NULL
    # removal effects, and an all-zero removal total yields NULL
    # attribution — degrade identically instead of ZeroDivisionError.
    removals = [
        (c, 1.0 - absorb(c) / base if base != 0 else None) for c in channels
    ]
    tot = sum(x for _, x in removals if x is not None)

    def r4d(x):
        # DuckDB's rounding convention (multiply-floor), the house rule
        # for driver-side sequential results (SCALE.md round-9 finding)
        import math

        if x is None:
            return None
        return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)

    data = [
        (c, r4d(x), r4d(x / tot) if x is not None and tot != 0 else None)
        for c, x in removals
    ]
    return spark.createDataFrame(
        data, "channel string, removal_effect double, attribution double"
    ).orderBy("channel")


@query(
    "q_evt_pmi",
    oracle="""
    WITH st AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             event_type
      FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    n AS (SELECT count(DISTINCT (user_id, day)) AS nb FROM st),
    tc AS (SELECT event_type, count(*) AS c FROM st GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS cab
      FROM st a JOIN st b ON a.user_id = b.user_id AND a.day = b.day
       AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, CAST(cab AS BIGINT) AS n_baskets,
           round(ln(cab * 1.0 * nb / (ca.c * 1.0 * cb.c)), 4) AS pmi
    FROM pairs JOIN tc ca ON ca.event_type = type_a
               JOIN tc cb ON cb.event_type = type_b, n
    ORDER BY type_a, type_b
    """,
)
def q_evt_pmi(spark, sf_dir):
    """Pointwise mutual information between event types over USER-DAY
    baskets: PMI(a,b) = ln(P(a,b) / (P(a)P(b))) with probabilities =
    basket frequencies — the order-free co-occurrence lift that
    completes the sequence family (q_evt_bigrams counts ADJACENT pairs,
    q_evt_markov conditions on order; PMI asks only "do these behaviors
    cluster on the same active day more than chance").  Positive PMI =
    behaviors that travel together (e.g. error-spike days driving
    support purchases); negative = substitutes.

    Scale shape: the corpus collapses to the DISTINCT (user, day, type)
    basket-membership frame in one map-combined aggregate; the pair join
    is basket-local (per basket at most |types| rows, so fan-out is
    bounded by |types|^2 per basket — never corpus x corpus); marginals
    and the basket count are tiny aggregates of the same frame.  Output
    <= |types|^2 / 2 rows whatever the corpus.  ln of exact integer
    ratios, one 4-dp rounding site (the q_agg_entropy convention).

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); co-occurrence sibling of q_evt_bigrams
    and q_evt_markov."""
    st = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "event_type",
        )
        .distinct()
    )
    nb = st.select("user_id", "day").distinct().agg(
        F.count("*").alias("nb")
    )
    tc = st.groupBy("event_type").agg(F.count("*").alias("c"))
    a = st.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = st.select("user_id", "day", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("cab"))
    )
    ca = tc.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a"))
    cb = tc.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .join(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("cab").cast("long").alias("n_baskets"),
            r4(
                F.log(
                    F.col("cab")
                    * 1.0
                    * F.col("nb")
                    / (F.col("c_a") * 1.0 * F.col("c_b"))
                )
            ).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


PATH_MAX = 6  # session-opening cap on the conversion path


@query(
    "q_evt_paths",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    ev2 AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn
      FROM sess),
    firstp AS (
      SELECT user_id, sid, min(rn) AS prn FROM ev2
      WHERE event_type = 'purchase' GROUP BY user_id, sid),
    paths AS (
      SELECT e.user_id, e.sid,
             string_agg(e.event_type, '>' ORDER BY e.rn) AS path
      FROM ev2 e JOIN firstp f USING (user_id, sid)
      WHERE e.rn <= least(f.prn, {PATH_MAX})
      GROUP BY e.user_id, e.sid),
    n AS (SELECT count(*) AS ns FROM paths)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           round(count(*) * 1.0 / ns, 4) AS share
    FROM paths, n GROUP BY path, ns
    ORDER BY n_sessions DESC, path
    """,
)
def q_evt_paths(spark, sf_dir):
    """Top CONVERSION PATHS: for every session containing a purchase, the
    exact event-type sequence from session start to the FIRST purchase
    (capped at {PATH_MAX} steps), ranked by popularity — the "which
    roads lead here" question funnel analysis (one fixed path) and
    attribution (channel credit, order-free) both stop short of.
    Path strings use FULL type names joined by '>', so no initial-
    collision guard is needed (contrast q_evt_seq_patterns).

    Scale shape: sessionization is the one user_id shuffle; the
    first-purchase cut and the path concat are both session-local
    (groupBy (user, sid) on rows already capped at {PATH_MAX} per
    session); the final aggregate's shuffle carries one <= ~60-char
    string per CONVERTING session, output bounded by distinct path
    strings (<= |types|^{PATH_MAX}, tiny in practice).

    Determinism: paths ordered by (ts, event_id) — the unique-tiebreak
    convention; the share division happens on identical (integer-valued)
    doubles.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); path sibling of q_evt_funnel (one fixed
    path) and q_evt_attribution_markov (order-free credit)."""
    # anonymous (NULL-user) events are excluded on BOTH engines: Spark's
    # window path would sessionize them as one merged pseudo-user while
    # the oracle's USING(user_id, ...) join silently drops them — the
    # NULL-key equi-join asymmetry the perturbed sweep caught (r12).
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    sess = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sw = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ev2 = sess.withColumn("rn", F.row_number().over(sw))
    prn = F.min(
        F.when(F.col("event_type") == "purchase", F.col("rn"))
    ).over(Window.partitionBy("user_id", "sid"))
    paths = (
        ev2.withColumn("prn", prn)
        .filter(
            F.col("prn").isNotNull()
            & (F.col("rn") <= F.least(F.col("prn"), F.lit(PATH_MAX)))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.expr(
                "concat_ws('>', transform("
                "  array_sort(collect_list(struct(rn, event_type AS et))),"
                "  x -> x.et))"
            ).alias("path")
        )
    )
    ns = paths.count()  # scalar converting-session count
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .select(
            "path",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.round(F.col("n_sessions") / F.lit(float(ns)), 4).alias("share"),
        )
        .orderBy(F.desc("n_sessions"), "path")
    )


@query(
    "q_ts_dow_profile",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events WHERE event_type IS NOT NULL
      GROUP BY event_type, day),
    tot AS (
      SELECT event_type, sum(n) AS s1, count(*) AS nd
      FROM d GROUP BY event_type),
    dowg AS (
      SELECT event_type, dayofweek(day) AS dow,
             sum(n) AS ds1, count(*) AS dnd
      FROM d GROUP BY event_type, dayofweek(day))
    SELECT g.event_type, CAST(g.dow AS INTEGER) AS dow,
           CAST(g.dnd AS BIGINT) AS n_days,
           CAST(g.ds1 AS BIGINT) AS n_events,
           round(g.ds1 * 1.0 / g.dnd, 4) AS dow_mean,
           round((g.ds1 * 1.0 / g.dnd) / (t.s1 * 1.0 / t.nd), 4) AS rel
    FROM dowg g JOIN tot t USING (event_type)
    ORDER BY event_type, dow
    """,
)
def q_ts_dow_profile(spark, sf_dir):
    """DAY-OF-WEEK seasonality profile per event-type series: mean daily
    volume per weekday and its ratio to the series' overall daily mean —
    the weekly-seasonality fingerprint q_ts_decompose (trend/residual)
    and q_ts_autocorr (lag correlation) both presuppose but don't emit.
    rel > 1 marks the heavy weekdays; a flat rel row means no weekly
    cycle.

    Determinism discipline (the q_agg_moments / ADVICE-r11 rule): every
    aggregate is an INTEGER sum (daily counts, day counts) — the only
    doubles are two divisions per output row on identical integer-valued
    binary64, so partial-aggregation order can never flip a bit.
    Weekday numbering pinned Sunday=0: DuckDB dayofweek() is 0-6
    Sun-first; Spark dayofweek() is 1-7 Sun-first, shifted by -1.

    Scale shape: the corpus collapses to (type, day) integer counts in
    one map-combined aggregate; everything downstream is windows/joins
    over the |types| x |days| frame (tiny at any corpus size).  Output
    |types| x 7 rows.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); seasonality sibling of q_ts_decompose
    and q_evt_heatmap (hour-of-week occupancy)."""
    d = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("n"))
    )
    tot = d.groupBy("event_type").agg(
        F.sum("n").alias("s1"), F.count("*").alias("nd")
    )
    dowg = d.groupBy(
        "event_type", (F.dayofweek("day") - 1).alias("dow")
    ).agg(F.sum("n").alias("ds1"), F.count("*").alias("dnd"))
    dmean = F.col("ds1") / F.col("dnd")
    omean = F.col("s1") / F.col("nd")
    return (
        dowg.join(tot, "event_type")
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            F.col("dnd").cast("long").alias("n_days"),
            F.col("ds1").cast("long").alias("n_events"),
            F.round(dmean, 4).alias("dow_mean"),
            F.round(dmean / omean, 4).alias("rel"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "q_evt_user_overlap",
    oracle="""
    WITH m AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
    sz AS (SELECT event_type, count(*) AS n FROM m GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM m a JOIN m b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_both AS BIGINT) AS n_both,
           round(n_both * 1.0 / (sa.n + sb.n - n_both), 4) AS jaccard,
           round(n_both * 1.0 / least(sa.n, sb.n), 4) AS containment
    FROM inter
    JOIN sz sa ON sa.event_type = type_a
    JOIN sz sb ON sb.event_type = type_b
    ORDER BY type_a, type_b
    """,
)
def q_evt_user_overlap(spark, sf_dir):
    """AUDIENCE OVERLAP matrix between event types: exact Jaccard and
    containment of the user sets of every type pair — the "how much do
    these segments share" question behind feature gating and campaign
    targeting.  Completes the co-occurrence family: q_evt_pmi scores
    same-DAY clustering vs chance, this scores GLOBAL audience overlap
    regardless of timing; it is also the exact ground truth the KMV
    union trick (q_agg_kmv) estimates at scale, kept exact here because
    the pair frame is |types|²-bounded.

    Scale shape: the corpus collapses to the DISTINCT (type, user)
    membership frame in one map-combined aggregate; the pair join is
    user-keyed over that frame (each user contributes its own type-pair
    fan-out, <= |types|² per user); sizes broadcast back onto the
    <= |types|²/2-row result.  Integer counts end-to-end; two divisions
    per output row on identical integer-valued doubles.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); set-overlap sibling of q_evt_pmi
    (lift) and q_graph_jaccard_neighbors (graph neighbourhoods)."""
    m = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    sz = m.groupBy("event_type").agg(F.count("*").alias("n"))
    a = m.select(F.col("event_type").alias("type_a"), "user_id")
    b = m.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(sz.select(F.col("event_type").alias("type_a"),
                                  F.col("n").alias("n_a"))), "type_a")
        .join(
            F.broadcast(sz.select(F.col("event_type").alias("type_b"),
                                  F.col("n").alias("n_b"))), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
            F.round(F.col("n_both") / F.least("n_a", "n_b"), 4).alias(
                "containment"
            ),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_ts_anomaly_mad",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events WHERE event_type IS NOT NULL
      GROUP BY event_type, day),
    st AS (
      SELECT event_type, median(n) AS med FROM d GROUP BY event_type),
    md AS (
      SELECT d.event_type, median(abs(d.n - st.med)) AS mad
      FROM d JOIN st USING (event_type) GROUP BY d.event_type)
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
           CAST(d.n AS BIGINT) AS n,
           round((d.n - st.med) / md.mad, 4) AS score
    FROM d JOIN st USING (event_type) JOIN md USING (event_type)
    WHERE md.mad > 0 AND abs(d.n - st.med) > 3 * md.mad
    ORDER BY event_type, day
    """,
)
def q_ts_anomaly_mad(spark, sf_dir):
    """ROBUST anomaly days per event-type series via median / MAD —
    the resistant twin of q_evt_anomaly's mean/stddev z-score: a burst
    day inflates the mean AND the stddev, masking itself and flagging
    normal days; the median and the median-absolute-deviation are
    unmoved by any minority of outliers (50% breakdown point), so the
    flag |n - median| > 3*MAD stays calibrated exactly when it matters.

    Determinism: daily counts are integers; the median of integers is an
    integer or a .5 (avg of the two middles) — exact binary64 on both
    engines; MAD repeats that on exact absolute deviations; one division
    per emitted row on identical doubles, 4-dp rounded.  Constant series
    (MAD = 0) emit nothing by contract — the score is undefined there.

    Scale shape: the corpus collapses to (type, day) counts in one
    map-combined aggregate; medians run per type over the tiny
    |types| x |days| frame; output only the anomalous days.

    Reference scope: no analytics in the reference facade
    (api/router/router.go:9-55); robust sibling of q_evt_anomaly
    (z-score) and q_ts_cusum (level shifts)."""
    d = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("n"))
    )
    st = d.groupBy("event_type").agg(F.median("n").alias("med"))
    md = (
        d.join(st, "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("n") - F.col("med"))).alias("mad"))
    )
    return (
        d.join(F.broadcast(st), "event_type")
        .join(F.broadcast(md), "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad"))
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("n").cast("long").alias("n"),
            F.round((F.col("n") - F.col("med")) / F.col("mad"), 4).alias("score"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "q_ts_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) AS s,
             count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    pre AS (
      SELECT day,
             sum(s) OVER w AS sl, sum(n) OVER w AS nl,
             sum(s) OVER () AS st, sum(n) OVER () AS nt
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT day, nl, nt - nl AS nr,
             sl / nl AS mean_l, (st - sl) / (nt - nl) AS mean_r,
             sl * sl / nl + (st - sl) * (st - sl) / (nt - nl)
               - st * st / nt AS gain
      FROM pre WHERE nl < nt
    )
    SELECT strftime(day, '%Y-%m-%d') AS split_day,
           CAST(nl AS BIGINT) AS n_l, CAST(nr AS BIGINT) AS n_r,
           round(mean_l / 10000, 4) AS mean_l,
           round(mean_r / 10000, 4) AS mean_r,
           round(gain / 100000000, 4) AS gain
    FROM scored ORDER BY gain DESC, split_day LIMIT 1
    """,
)
def q_ts_changepoint(spark, sf_dir):
    """Retrospective single CHANGEPOINT by binary segmentation: the day
    boundary that maximizes the between-segment sum-of-squares gain of
    daily purchase revenue (equivalently, minimizes two-segment SSE) —
    the offline argmax twin of q_ts_cusum's sequential detector.

    Determinism: daily sums are EXACT integer e4 cents (the
    q_stream_dim_join convention), so both engines score each split from
    the identical binary64 expression S_L^2/n_L + S_R^2/n_R - S^2/N;
    the argmax tiebreak is the earlier day.  Gain is reported in squared
    currency units (the /1e8 rescale of the e4 squares), 4dp.

    Scale shape: the corpus collapses to the |days| daily frame in one
    map-combined aggregate; prefix sums, scoring and the argmax are
    windows over that broadcast-sized frame.  At 100 TB the same plan
    holds — the only data-sized pass is the first aggregate.

    Reference scope: no time-series surface in the reference (Go metadata
    facade, api/router/router.go:9-55); offline sibling of q_ts_cusum."""
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 10000).cast("long"))
            .cast("double")
            .alias("s"),
            F.count("*").alias("n"),
        )
    )
    cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    tot = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    pre = daily.select(
        "day",
        F.sum("s").over(cum).alias("sl"),
        F.sum("n").over(cum).alias("nl"),
        F.sum("s").over(tot).alias("st"),
        F.sum("n").over(tot).alias("nt"),
    ).filter(F.col("nl") < F.col("nt"))
    sl, nl = F.col("sl"), F.col("nl")
    sr, nr = F.col("st") - F.col("sl"), F.col("nt") - F.col("nl")
    gain = sl * sl / nl + sr * sr / nr - F.col("st") * F.col("st") / F.col("nt")
    return (
        pre.select(
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            nl.cast("long").alias("n_l"),
            nr.cast("long").alias("n_r"),
            F.round(sl / nl / 10000, 4).alias("mean_l"),
            F.round(sr / nr / 10000, 4).alias("mean_r"),
            F.round(gain / 100000000, 4).alias("gain"),
        )
        .orderBy(F.desc("gain"), "split_day")
        .limit(1)
    )


VELOCITY_WINDOW_US = 24 * 3600 * 1_000_000  # 24h sliding window
VELOCITY_MIN = 3  # purchases within the window that trip the rule


@query(
    "q_evt_velocity",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, epoch_us(ts) AS tus FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ),
    w AS (
      SELECT user_id, ts,
             count(*) OVER (PARTITION BY user_id ORDER BY tus
                            RANGE BETWEEN {VELOCITY_WINDOW_US} PRECEDING
                                      AND CURRENT ROW) AS burst
      FROM p
    )
    SELECT user_id,
           CAST(max(burst) AS BIGINT) AS max_burst,
           CAST(count(CASE WHEN burst >= {VELOCITY_MIN} THEN 1 END) AS BIGINT)
             AS n_flagged,
           min(CASE WHEN burst >= {VELOCITY_MIN} THEN ts END) AS first_flag_ts,
           max(burst) >= {VELOCITY_MIN} AS flagged
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def q_evt_velocity(spark, sf_dir):
    """Sliding-window VELOCITY rule (fraud/abuse rate limiting): flag any
    purchase that is the {VELOCITY_MIN}rd-or-later by the same user
    within a trailing 24 h window, reported per user (max burst, flagged
    count, first trip time) — the rule-engine primitive behind
    transaction monitoring.

    Plan: ONE shuffle on user_id, then a RANGE-frame count over exact
    integer microseconds (no float time math, no self-join — the naive
    formulation is a |P| x |P| per-user theta join).  The per-user
    report is a map-side-combinable re-aggregation of the same frame.
    At 100 TB state per task is one user's purchase timeline — the
    sessionize shape.

    Reference scope: no event surface in the reference (Go metadata
    facade, api/router/router.go:9-55); rule-engine sibling of
    q_evt_concurrency (interval counting) and q_ts_cusum (drift)."""
    from pyspark.sql import Window as W

    p = (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-VELOCITY_WINDOW_US, 0)
    )
    burst = p.withColumn("burst", F.count("*").over(w))
    hit = F.col("burst") >= VELOCITY_MIN
    return (
        burst.groupBy("user_id")
        .agg(
            F.max("burst").cast("long").alias("max_burst"),
            F.count(F.when(hit, 1)).cast("long").alias("n_flagged"),
            F.min(F.when(hit, F.col("ts"))).alias("first_flag_ts"),
            (F.max("burst") >= VELOCITY_MIN).alias("flagged"),
        )
        .orderBy("user_id")
    )


BOT_TOP = 20  # highest-scoring users reported


@query(
    "q_evt_bot_score",
    oracle=f"""
    WITH base AS (
      SELECT user_id, ts, event_type, epoch_us(ts) AS tus
      FROM events WHERE user_id IS NOT NULL
    ),
    burst AS (
      SELECT user_id, max(b) AS max_burst FROM (
        SELECT user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY tus
                              RANGE BETWEEN 3600000000 PRECEDING
                                        AND CURRENT ROW) AS b
        FROM base) GROUP BY user_id
    ),
    feats AS (
      SELECT user_id, count(*) AS n_events,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err,
             sum(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS n_night
      FROM base GROUP BY user_id
    )
    SELECT f.user_id,
           CAST(f.n_events AS BIGINT) AS n_events,
           CAST(b.max_burst AS BIGINT) AS max_burst,
           round(CAST(f.n_err AS DOUBLE) / f.n_events, 4) AS err_ratio,
           round(CAST(f.n_night AS DOUBLE) / f.n_events, 4) AS night_ratio,
           round(0.4 * least(CAST(b.max_burst AS DOUBLE) / 20, 1.0)
                 + 0.3 * (CAST(f.n_err AS DOUBLE) / f.n_events)
                 + 0.3 * (CAST(f.n_night AS DOUBLE) / f.n_events), 4)
             AS bot_score
    FROM feats f JOIN burst b ON b.user_id = f.user_id
    ORDER BY bot_score DESC, f.user_id LIMIT {BOT_TOP}
    """,
)
def q_evt_bot_score(spark, sf_dir):
    """Abuse SCORECARD: a weighted composite of three behavioral features
    per user — trailing-1h event burst (automation), error ratio
    (scraping/probing), night-hours activity share — reporting the
    top-{BOT_TOP} suspects.  The feature-fusion pattern every
    rules-to-ML migration starts from: each feature is itself a
    registered-operator shape (velocity window, conditional ratios) and
    the score is a transparent linear blend.

    Determinism: features are exact integer counts / RANGE-frame maxima;
    ratios and the blend are one shared binary64 expression, 4dp;
    ordering on the rounded score with user_id tiebreak.

    Scale shape: ONE user_id shuffle serves both the RANGE-frame burst
    window and the feature aggregate (same key); the blend is map-only
    on the |users| frame; top-k = TakeOrderedAndProject.

    Reference scope: no event surface in the reference (Go metadata
    facade, api/router/router.go:9-55); composite sibling of
    q_evt_velocity (single rule) and q_evt_rfm (behavioral segmentation)."""
    from pyspark.sql import Window as W

    base = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        )
    )
    w = W.partitionBy("user_id").orderBy("tus").rangeBetween(-3_600_000_000, 0)
    burst = (
        base.withColumn("b", F.count("*").over(w))
        .groupBy("user_id")
        .agg(F.max("b").alias("max_burst"))
    )
    feats = base.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_err"),
        F.sum(F.when(F.hour("ts") < 6, 1).otherwise(0)).alias("n_night"),
    )
    err = F.col("n_err").cast("double") / F.col("n_events")
    night = F.col("n_night").cast("double") / F.col("n_events")
    score = (
        0.4 * F.least(F.col("max_burst").cast("double") / 20, F.lit(1.0))
        + 0.3 * err
        + 0.3 * night
    )
    return (
        feats.join(burst, "user_id")
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("max_burst").cast("long").alias("max_burst"),
            F.round(err, 4).alias("err_ratio"),
            F.round(night, 4).alias("night_ratio"),
            F.round(score, 4).alias("bot_score"),
        )
        .orderBy(F.desc("bot_score"), "user_id")
        .limit(BOT_TOP)
    )


PARETO_NUM, PARETO_DEN = 4, 5  # 80% revenue threshold as an exact ratio


@query(
    "q_evt_power_users",
    oracle=f"""
    WITH ur AS (
      SELECT user_id, sum(CAST(round(value * 100) AS BIGINT)) AS rev
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
      GROUP BY user_id),
    tot AS (SELECT sum(rev) AS t, count(*) AS n FROM ur),
    c AS (
      SELECT user_id, rev,
             sum(rev) OVER (ORDER BY rev DESC, user_id) AS cum
      FROM ur),
    top AS (
      SELECT c.rev, tot.t, tot.n FROM c, tot
      WHERE {PARETO_DEN} * (c.cum - c.rev) < {PARETO_NUM} * tot.t)
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_top,
           round(count(*) * 1.0 / max(n), 4) AS user_share,
           round(sum(rev) * 1.0 / max(t), 4) AS rev_share
    FROM top
    """,
)
def q_evt_power_users(spark, sf_dir):
    """Revenue concentration (Pareto) analysis: the MINIMAL set of users
    covering >= 80% of purchase revenue, reported as its user-count and
    revenue shares — the whale-detection pass behind monetization and
    abuse review ("2% of accounts drive 81% of spend").

    Scale shape — a DISTRIBUTED exact prefix sum, not a single-partition
    window: per-user revenue aggregates (keyed shuffle), then
    repartitionByRange on (rev DESC, user) + sortWithinPartitions, a
    per-PARTITION running sum (window partitioned by spark_partition_id),
    and a bounded |partitions|-row offset table collected + broadcast
    back — the classic two-level scan that gives an exact global cumsum
    with no all-rows-to-one-task stage.  All revenue arithmetic is exact
    integer cents and the threshold test is the exact integer cross-
    multiplication 5*(cum - rev) < 4*total, so the driver's value hash
    is bit-stable.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); concentration sibling of q_evt_rfm and
    q_agg_gini."""
    from pyspark.sql import Window as W

    N_RANGES = 8
    ur = (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev"))
    )
    ranked = (
        ur.repartitionByRange(N_RANGES, F.desc("rev"), F.asc("user_id"))
        .sortWithinPartitions(F.desc("rev"), F.asc("user_id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w = W.partitionBy("pid").orderBy(F.desc("rev"), F.asc("user_id")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    # localCheckpoint PINS the range partitioning: repartitionByRange
    # boundaries come from reservoir sampling seeded by the RDD id, and
    # Spark documents the output as potentially inconsistent across
    # executions — once per-upstream-partition row counts exceed the
    # reservoir (beyond fixture scale) the offset-collect job and the
    # final aggregate job could assign boundary rows to DIFFERENT pids,
    # silently corrupting cum/n_top/shares.  Materializing once makes
    # both downstream jobs read the same physical partitions (r13 ADVICE).
    within = ranked.withColumn("wcum", F.sum("rev").over(w)).localCheckpoint()
    # bounded |partitions|-row offset table (exact longs), broadcast back
    parts = within.groupBy("pid").agg(F.sum("rev").alias("psum")).collect()
    psums = {r.pid: r.psum for r in parts}
    offs = []
    acc = 0
    for pid in sorted(psums):
        offs.append((pid, acc))
        acc += psums[pid]
    total = acc
    off_df = spark.createDataFrame(offs or [(0, 0)], "pid int, off long")
    n_users = ur.count()
    cum = within.join(F.broadcast(off_df), "pid").withColumn(
        "cum", F.col("off") + F.col("wcum")
    )
    # force LONG on both comparison sides: a total in (2^31/5, 2^31)
    # makes F.lit() infer IntegerType and the x{PARETO_NUM} multiply
    # overflow int32 under ANSI (hit at the x10 decade step)
    top = cum.filter(
        F.lit(PARETO_DEN).cast("long") * (F.col("cum") - F.col("rev"))
        < F.lit(PARETO_NUM).cast("long") * F.lit(total).cast("long")
    )
    return top.agg(
        F.lit(n_users).cast("long").alias("n_users"),
        F.count("*").alias("n_top"),
        F.round(F.count("*") * 1.0 / n_users, 4).alias("user_share"),
        F.round(F.sum("rev") * 1.0 / F.lit(float(total)), 4).alias("rev_share"),
    )


@query(
    "q_ts_theil_sen",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    p AS (
      SELECT (b.rev - a.rev) * 1.0 / date_diff('day', a.day, b.day) AS slope
      FROM d a JOIN d b ON a.day < b.day)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5), 4) AS slope_med_cents
    FROM p
    """,
)
def q_ts_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend estimator over the daily purchase-revenue
    series: the MEDIAN of all pairwise day-to-day slopes — insensitive to
    ~29% outlier days, the standard robust alternative to the OLS slope
    (q_evt_forecast_eval's baseline) for revenue/traffic trend lines that
    contain promo spikes and outage holes.

    Scale shape: the pair relation is |days| x |days| over the DAILY
    AGGREGATE frame — bounded by the calendar (365 rows/year), never by
    event volume; the one big shuffle is the day aggregate itself.  The
    self-join is a deliberate bounded-build-side theta join
    (tests/test_plans.py CARTESIAN_OK).  Slopes are exact integer-cent
    differences over integer day gaps; the median is the shared
    linear-interpolation percentile, identical binary64 on both engines.

    Reference scope: no time-series surface in the reference facade
    (api/router/router.go:9-55); robust sibling of q_ts_holt and
    q_ts_cusum."""
    d = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev"))
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (
            (F.col("b.rev") - F.col("a.rev"))
            * 1.0
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope")
    )
    n_days = d.count()
    return pairs.agg(
        F.lit(n_days).cast("long").alias("n_days"),
        F.count("*").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 4).alias("slope_med_cents"),
    )


@query(
    "q_evt_new_vs_returning",
    oracle="""
    WITH fu AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL)
    SELECT strftime(du.day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS dau,
           CAST(count(CASE WHEN fu.first_day = du.day THEN 1 END) AS BIGINT)
             AS new_users,
           CAST(count(CASE WHEN fu.first_day < du.day THEN 1 END) AS BIGINT)
             AS returning_users,
           round(count(CASE WHEN fu.first_day < du.day THEN 1 END) * 1.0
                 / count(*), 4) AS returning_rate
    FROM du JOIN fu USING (user_id)
    GROUP BY du.day ORDER BY day
    """,
)
def q_evt_new_vs_returning(spark, sf_dir):
    """Daily NEW vs RETURNING active-user split — the first growth
    decomposition any product dashboard shows: DAU = users whose
    first-ever active day is today (acquisition) + users seen before
    (retention), plus the returning rate.

    Scale shape: first-seen day is one map-combined min() per user; the
    daily (day, user) frame is a distinct on the SAME user_id shuffle
    key, and the classifier join is user-keyed — one shuffle family
    end-to-end (the round-12 single-shuffle-key discipline).  Output is
    |days| rows.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); decomposition sibling of
    q_evt_rolling_dau and q_evt_retention."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
    )
    fu = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    du = ev.distinct()
    new_c = F.count(F.when(F.col("first_day") == F.col("day"), 1))
    ret_c = F.count(F.when(F.col("first_day") < F.col("day"), 1))
    return (
        du.join(fu, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("dau"),
            new_c.alias("new_users"),
            ret_c.alias("returning_users"),
            F.round(ret_c * 1.0 / F.count("*"), 4).alias("returning_rate"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "new_users",
            "returning_users",
            "returning_rate",
        )
        .orderBy("day")
    )


WILSON_Z = 1.96  # 95% two-sided


@query(
    "q_evt_error_rate_ci",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS k
      FROM events GROUP BY 1)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_errors,
           round(k * 1.0 / n, 4) AS err_rate,
           round(((k * 1.0 / n) + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  - {WILSON_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                        + {WILSON_Z} * {WILSON_Z} / (4 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n), 4) AS ci_lo,
           round(((k * 1.0 / n) + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  + {WILSON_Z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n
                        + {WILSON_Z} * {WILSON_Z} / (4 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n), 4) AS ci_hi
    FROM d ORDER BY day
    """,
)
def q_evt_error_rate_ci(spark, sf_dir):
    """Daily error rate with a WILSON 95% confidence interval — the
    statistically honest SLO panel: a raw rate of 0/50 and 0/50,000 read
    identically, the Wilson band does not (and unlike the normal
    approximation it stays inside [0,1] at the extremes).  The alerting
    rule is "ci_lo above threshold", which cannot be tripped by one
    unlucky small-sample day.

    Determinism: counts are exact integers; the interval is ONE shared
    binary64 expression on both engines, and every irrational step is an
    IEEE-correctly-rounded op (sqrt is exactly rounded by the standard,
    unlike libm log/exp) — so the 4-dp rounding is bit-stable.

    Scale shape: one map-combined daily aggregate; the formula is
    arithmetic on the |days| frame.  Reference scope: no analytics
    surface in the reference facade (api/router/router.go:9-55); the
    inferential sibling of q_evt_ab_test."""
    z = WILSON_Z
    d = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("k"),
        )
    )
    p = F.col("k") * 1.0 / F.col("n")
    n = F.col("n")
    half = F.lit(z) * F.sqrt(p * (1 - p) / n + F.lit(z) * z / (4 * n * n))
    denom = 1 + F.lit(z) * z / n
    center = p + F.lit(z) * z / (2 * n)
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.col("k").alias("n_errors"),
        F.round(p, 4).alias("err_rate"),
        F.round((center - half) / denom, 4).alias("ci_lo"),
        F.round((center + half) / denom, 4).alias("ci_hi"),
    ).orderBy("day")


VELOCITY_WINDOWS_H = (1, 24, 168)  # trailing windows: 1h / 24h / 7d


@query(
    "q_evt_velocity_multi",
    oracle=f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS tus FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    w AS (
      SELECT user_id,
             {", ".join(
                 f'''count(*) OVER (PARTITION BY user_id ORDER BY tus
                    RANGE BETWEEN {h * 3_600_000_000} PRECEDING
                              AND CURRENT ROW) AS b{h}h''' 
                 for h in VELOCITY_WINDOWS_H)}
      FROM p)
    SELECT user_id,
           {", ".join(f"CAST(max(b{h}h) AS BIGINT) AS max_burst_{h}h"
                      for h in VELOCITY_WINDOWS_H)},
           max(b1h) >= 3 OR max(b24h) >= 10 AS flagged
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def q_evt_velocity_multi(spark, sf_dir):
    """MULTI-WINDOW velocity profile: each purchase's trailing 1 h / 24 h
    / 7 d burst counts computed in ONE pass — real rate-limit policies
    are tiered ("3 per hour OR 10 per day"), and the three RANGE frames
    share a single user_id+ts sort, so the tiered rule costs exactly the
    same shuffle as q_evt_velocity's single window.

    Exact integer-microsecond frame bounds (the q_evt_velocity
    convention); peers share bursts via the RANGE frame on both engines.

    Scale shape: ONE user_id shuffle serves all three window frames (the
    round-12 single-shuffle-key discipline, plan-pinned family); output
    is |users| rows.

    Reference scope: no streaming/rules surface in the reference facade
    (api/router/router.go:9-55); tiered sibling of q_evt_velocity, whose
    streaming twin maintains the 24 h tier incrementally."""
    from pyspark.sql import Window as W

    p = (
        t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"))
    )
    base = W.partitionBy("user_id").orderBy("tus")
    bursts = [
        F.count("*")
        .over(base.rangeBetween(-h * 3_600_000_000, W.currentRow))
        .alias(f"b{h}h")
        for h in VELOCITY_WINDOWS_H
    ]
    w = p.select("user_id", *bursts)
    return (
        w.groupBy("user_id")
        .agg(
            *[
                F.max(f"b{h}h").alias(f"max_burst_{h}h")
                for h in VELOCITY_WINDOWS_H
            ],
        )
        .select(
            "user_id",
            *[f"max_burst_{h}h" for h in VELOCITY_WINDOWS_H],
            (
                (F.col("max_burst_1h") >= 3) | (F.col("max_burst_24h") >= 10)
            ).alias("flagged"),
        )
        .orderBy("user_id")
    )


PRE_PERIOD_DAYS = 15  # CUPED pre-period / Markov-eval train split (data-
# derived boundary: min(ts) day + 15 days — regeneration-seed-proof)


@query(
    "q_evt_cuped",
    oracle=f"""
    WITH cut AS (
      SELECT CAST(CAST(min(ts) AS DATE) AS TIMESTAMP)
             + INTERVAL {PRE_PERIOD_DAYS} DAY AS c
      FROM events),
    u AS (
      SELECT user_id,
             coalesce(sum(CASE WHEN ts < cut.c
                          THEN CAST(round(value * 100) AS BIGINT) END), 0)
               / 100.0 AS pre,
             coalesce(sum(CASE WHEN ts >= cut.c
                          THEN CAST(round(value * 100) AS BIGINT) END), 0)
               / 100.0 AS post
      FROM events, cut
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
            AND value IS NOT NULL
      GROUP BY user_id),
    g AS (
      SELECT round(covar_samp(pre, post) / var_samp(pre), 6) AS theta,
             round(avg(pre), 6) AS mp
      FROM u),
    adj AS (
      SELECT user_id % 2 AS cohort, post,
             post - g.theta * (pre - g.mp) AS a, g.theta
      FROM u, g)
    SELECT CAST(cohort AS BIGINT) AS cohort,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(post), 4) AS mean_post,
           round(avg(a), 4) AS mean_adj,
           round(var_samp(post), 4) AS var_post,
           round(var_samp(a), 4) AS var_adj,
           round(1 - var_samp(a) / var_samp(post), 4) AS var_reduction,
           max(theta) AS theta
    FROM adj GROUP BY cohort ORDER BY cohort
    """,
)
def q_evt_cuped(spark, sf_dir):
    """CUPED variance reduction for A/B revenue metrics (Deng et al.,
    WSDM'13 — the standard experimentation-platform technique): per user,
    PRE-period purchase revenue (first {PRE_PERIOD_DAYS} days) is the
    covariate; the post-period metric is adjusted as
    post - theta*(pre - mean(pre)) with theta = cov(pre,post)/var(pre),
    shrinking metric variance by the squared pre/post correlation without
    biasing the treatment contrast.  Reported per cohort (the
    q_evt_ab_test user_id %% 2 split): raw vs adjusted mean and variance
    and the realized variance reduction — the number that tells an
    experimenter how much extra power CUPED bought.

    Determinism: per-user pre/post are EXACT integer cents divided by
    100 (identical doubles on both engines); theta and mean(pre) are
    pre-rounded to 6 dp so the one cross-user float division cannot
    propagate an ulp into every adjusted value; outputs round at 4 dp.
    The period boundary is DATA-DERIVED (min event day + {PRE_PERIOD_DAYS}
    days), so fixture regeneration at any seed splits identically.

    Scale shape: one user-keyed aggregate with conditional sums (the
    period split adds columns, not scans), a 1-row moments frame
    broadcast back, map-side adjustment, |cohorts|-row rollup.  The
    bounded 1-row cutoff collect is the q_text_tfidf n_docs discipline.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); power sibling of q_evt_ab_test."""
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(
        F.expr(
            "CAST(CAST(min(ts) AS DATE) AS TIMESTAMP)"
            f" + INTERVAL {PRE_PERIOD_DAYS} DAYS"
        ).alias("c")
    ).collect()[0].c
    cents = F.round(F.col("value") * 100).cast("long")
    u = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("ts") < F.lit(cut), cents)), F.lit(0)
                )
                / 100.0
            ).alias("pre"),
            (
                F.coalesce(
                    F.sum(F.when(F.col("ts") >= F.lit(cut), cents)), F.lit(0)
                )
                / 100.0
            ).alias("post"),
        )
    )
    g = u.agg(
        F.round(F.covar_samp("pre", "post") / F.var_samp("pre"), 6).alias(
            "theta"
        ),
        F.round(F.avg("pre"), 6).alias("mp"),
    )
    adj = u.crossJoin(F.broadcast(g)).select(
        (F.col("user_id") % 2).alias("cohort"),
        "post",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("mp"))).alias(
            "a"
        ),
        "theta",
    )
    return (
        adj.groupBy(F.col("cohort").cast("long").alias("cohort"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.avg("post"), 4).alias("mean_post"),
            F.round(F.avg("a"), 4).alias("mean_adj"),
            F.round(F.var_samp("post"), 4).alias("var_post"),
            F.round(F.var_samp("a"), 4).alias("var_adj"),
            F.round(1 - F.var_samp("a") / F.var_samp("post"), 4).alias(
                "var_reduction"
            ),
            F.max("theta").alias("theta"),
        )
        .orderBy("cohort")
    )


@query(
    "q_evt_next_event_eval",
    oracle=f"""
    WITH cut AS (
      SELECT CAST(CAST(min(ts) AS DATE) AS TIMESTAMP)
             + INTERVAL {PRE_PERIOD_DAYS} DAY AS c
      FROM events),
    s AS (
      SELECT event_type AS prev,
             lead(event_type) OVER w AS nxt,
             lead(ts) OVER w AS nxt_ts
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tc AS (
      SELECT prev, nxt, count(*) AS n
      FROM s, cut WHERE nxt IS NOT NULL AND nxt_ts < cut.c
      GROUP BY prev, nxt),
    m AS (
      SELECT prev, nxt AS pred FROM (
        SELECT prev, nxt,
               row_number() OVER (PARTITION BY prev
                                  ORDER BY n DESC, nxt) AS rk
        FROM tc) WHERE rk = 1),
    ev AS (
      SELECT prev, nxt FROM s, cut
      WHERE nxt IS NOT NULL AND nxt_ts >= cut.c)
    SELECT ev.prev, m.pred,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(count(CASE WHEN ev.nxt = m.pred THEN 1 END) AS BIGINT)
             AS n_correct,
           CAST((count(CASE WHEN ev.nxt = m.pred THEN 1 END) * 20000
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 10000
             AS accuracy
    FROM ev JOIN m ON m.prev = ev.prev
    GROUP BY ev.prev, m.pred ORDER BY ev.prev
    """,
)
def q_evt_next_event_eval(spark, sf_dir):
    """TEMPORAL-SPLIT next-event prediction eval: train a first-order
    Markov next-event model on the first {PRE_PERIOD_DAYS} days of each
    user's event sequence (argmax transition per previous type, count
    desc with type tiebreak), score it on the transitions that LAND
    after the split — top-1 accuracy per previous type.  This is the
    honest out-of-time protocol every sequence model should be judged
    by (q_evt_markov reports the transition matrix; this measures
    whether yesterday's matrix predicts tomorrow), and the baseline
    number an LLM-over-events fine-tune must beat.

    Split rule: a transition belongs to the eval set iff its NEXT event
    lands at or after the boundary — the model predicts forward from a
    pre-boundary state, so boundary-crossing transitions are genuine
    eval cases, not leakage.  The boundary is data-derived (min event
    day + {PRE_PERIOD_DAYS} days, the q_evt_cuped convention); accuracy
    uses the pure-long half-up form (exact 4-dp midpoints happen for
    round eval counts).

    Scale shape: ONE user-keyed window shuffle produces every
    transition; the model is |types|² rows (<=25 here) broadcast onto
    the eval transitions; output is |types| rows.  At 100 TB: same one
    shuffle — the model table never grows with data.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); eval sibling of q_evt_markov /
    q_evt_attribution_markov."""
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(
        F.expr(
            "CAST(CAST(min(ts) AS DATE) AS TIMESTAMP)"
            f" + INTERVAL {PRE_PERIOD_DAYS} DAYS"
        ).alias("c")
    ).collect()[0].c
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("event_type").alias("prev"),
            F.lead("event_type").over(w).alias("nxt"),
            F.lead("ts").over(w).alias("nxt_ts"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    tc = (
        s.filter(F.col("nxt_ts") < F.lit(cut))
        .groupBy("prev", "nxt")
        .agg(F.count("*").alias("n"))
    )
    mw = Window.partitionBy("prev").orderBy(F.desc("n"), "nxt")
    m = (
        tc.withColumn("rk", F.row_number().over(mw))
        .filter(F.col("rk") == 1)
        .select("prev", F.col("nxt").alias("pred"))
    )
    evl = s.filter(F.col("nxt_ts") >= F.lit(cut)).select("prev", "nxt")
    correct = F.count(F.when(F.col("nxt") == F.col("pred"), 1))
    return (
        evl.join(F.broadcast(m), "prev")
        .groupBy("prev", "pred")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            correct.cast("long").alias("n_correct"),
        )
        .select(
            "prev",
            "pred",
            "n_eval",
            "n_correct",
            (
                F.expr("(n_correct * 20000 + n_eval) DIV (2 * n_eval)")
                .cast("double")
                / 10000
            ).alias("accuracy"),
        )
        .orderBy("prev")
    )


@query(
    "q_evt_srm_check",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id, user_id % 2 AS cohort
      FROM events WHERE user_id IS NOT NULL),
    c AS (
      SELECT count(CASE WHEN cohort = 0 THEN 1 END) AS n_a,
             count(CASE WHEN cohort = 1 THEN 1 END) AS n_b
      FROM u)
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round((n_a + n_b) / 2.0, 1) AS expected,
           round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                 / (n_a + n_b), 4) AS chi2,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
             > 3.8415 AS srm_flag
    FROM c
    """,
)
def q_evt_srm_check(spark, sf_dir):
    """Sample-ratio mismatch (SRM) check for the 50/50 experiment split —
    the FIRST gate an experimentation platform runs before reading any
    metric: if the assignment counts themselves deviate from the design
    ratio, every downstream result (q_evt_ab_test's z, q_evt_cuped's
    adjusted lift) is invalid regardless of significance.  Chi-square
    with 1 dof against the 50/50 design simplifies EXACTLY to
    (n_a - n_b)^2 / (n_a + n_b) — integer numerator and denominator, one
    double division (the q_graph_modularity exact-rational discipline) —
    flagged at the 95% critical value 3.8415.

    Scale shape: one DISTINCT-user shuffle (the q_evt_ab_test cohort
    universe), then a 1-row conditional-count aggregate.  Output is a
    single row.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); completes the experimentation trio
    (q_evt_ab_test significance, q_evt_cuped power, SRM validity)."""
    u = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", (F.col("user_id") % 2).alias("cohort"))
        .distinct()
    )
    c = u.agg(
        F.count(F.when(F.col("cohort") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("cohort") == 1, 1)).alias("n_b"),
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    chi2 = diff2.cast("double") / (F.col("n_a") + F.col("n_b"))
    return c.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round((F.col("n_a") + F.col("n_b")) / 2.0, 1).alias("expected"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.8415).alias("srm_flag"),
    )


# -- round-15 wave 2: periodicity detection + sequential testing ---------------

PERIODOGRAM_PERIODS = (6, 12, 24, 168)  # candidate periods, hours


@query(
    "q_ts_periodogram",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hh, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY hh),
    idx AS (
      SELECT datediff('hour', min(hh) OVER (), hh) AS tt,
             CAST(n AS DOUBLE) - avg(n) OVER () AS x
      FROM hourly),
    terms AS (
      SELECT p.p,
             sum(x * cos(2 * pi() * tt / p.p)) AS sc,
             sum(x * sin(2 * pi() * tt / p.p)) AS ss
      FROM idx CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in PERIODOGRAM_PERIODS)}]) AS p) p
      GROUP BY p.p),
    pw AS (
      SELECT p, sc * sc + ss * ss AS power,
             sum(sc * sc + ss * ss) OVER () AS tot
      FROM terms)
    SELECT CAST(p AS INTEGER) AS period_hours,
           round(power / tot, 4) AS power_share,
           CAST(row_number() OVER (ORDER BY round(power / tot, 4) DESC, p) = 1
                AS INTEGER) AS dominant
    FROM pw ORDER BY period_hours
    """,
)
def q_ts_periodogram(spark, sf_dir):
    """Periodicity detection over the hourly event-count series: the
    discrete-Fourier power at {len(PERIODOGRAM_PERIODS)} candidate
    periods ({', '.join(str(p) for p in PERIODOGRAM_PERIODS)} hours),
    reported as the SHARE of total candidate power plus the dominant
    flag — the spectral cousin of q_ts_autocorr (lag correlations ask
    "does lag p predict"; the periodogram asks "which cycle carries the
    energy"), and the check that picks the seasonal window before
    configuring a forecast or an anomaly baseline.

    Power_p = (sum x_t cos(2*pi*t/p))^2 + (sum x_t sin(2*pi*t/p))^2 over
    the MEAN-CENTERED series (no DC leakage).  The dominant flag is a
    pure function of the ROUNDED shares (rank on round(share,4) with the
    period tiebreak), so it adds no cross-engine float-rank exposure
    beyond the shares themselves.

    Scale shape: the corpus collapses map-side to |hours| rows (time-
    bounded, not data-bounded — 720 rows for a 30-day window at ANY
    corpus size); the projection onto {len(PERIODOGRAM_PERIODS)}
    candidate frequencies is a bounded explode of that tiny frame + one
    grouped sum.  At 100 TB the only corpus-linear cost is the first
    map-combined hour aggregate.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); spectral sibling of q_ts_autocorr /
    q_ts_decompose."""
    import math

    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hh")
        )
        .agg(F.count("*").alias("n"))
    )
    whole = Window.orderBy("hh").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = hourly.select(
        (
            (F.unix_timestamp("hh") - F.unix_timestamp(F.min("hh").over(whole)))
            / 3600
        ).cast("long").alias("tt"),
        (F.col("n").cast("double") - F.avg("n").over(whole)).alias("x"),
    )
    two_pi = 2 * math.pi
    terms = (
        idx.select(
            "tt", "x", F.explode(F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS])).alias("p")
        )
        .groupBy("p")
        .agg(
            F.sum(F.col("x") * F.cos(F.lit(two_pi) * F.col("tt") / F.col("p"))).alias("sc"),
            F.sum(F.col("x") * F.sin(F.lit(two_pi) * F.col("tt") / F.col("p"))).alias("ss"),
        )
    )
    pwin = Window.orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pw = terms.select(
        "p",
        (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")).alias("power"),
        F.sum(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
        .over(pwin)
        .alias("tot"),
    )
    dwin = Window.orderBy(F.desc(F.round(F.col("power") / F.col("tot"), 4)), "p")
    return pw.select(
        F.col("p").cast("int").alias("period_hours"),
        F.round(F.col("power") / F.col("tot"), 4).alias("power_share"),
        (F.row_number().over(dwin) == 1).cast("int").alias("dominant"),
    ).orderBy("period_hours")


SPRT_LIFT = 0.25      # H1: p1 = p0 * (1 + SPRT_LIFT)
SPRT_BOUND = 2.9444   # ln(19): alpha = beta = 0.05 Wald boundaries (4dp)


@query(
    "q_evt_sprt",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS d,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm_b,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events WHERE user_id IS NOT NULL),
    pars AS (
      SELECT sum(conv) * 1.0 / count(*) AS p0,
             least(sum(conv) * 1.0 / count(*) * {1 + SPRT_LIFT}, 0.999) AS p1
      FROM e),
    daily AS (
      SELECT d, CAST(sum(arm_b) AS BIGINT) AS n_b,
             CAST(sum(arm_b * conv) AS BIGINT) AS c_b
      FROM e GROUP BY d),
    cum AS (
      SELECT d, sum(n_b) OVER (ORDER BY d) AS n, sum(c_b) OVER (ORDER BY d) AS c
      FROM daily),
    llr AS (
      SELECT d, n, c,
             round(c * ln(p1 / p0) + (n - c) * ln((1 - p1) / (1 - p0)), 4)
               AS llr
      FROM cum CROSS JOIN pars)
    SELECT CAST(d AS VARCHAR) AS day,
           CAST(n AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_conv,
           llr,
           CASE WHEN llr >= {SPRT_BOUND} THEN 'reject_h0'
                WHEN llr <= -{SPRT_BOUND} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr ORDER BY day
    """,
)
def q_evt_sprt(spark, sf_dir):
    """Sequential probability ratio test (Wald SPRT) on the treatment
    arm's conversion rate, monitored DAY BY DAY — the fourth member of
    the experimentation family (q_evt_srm_check validates the split,
    q_evt_ab_test / q_evt_cuped read the metric, the SPRT decides WHEN
    to stop): per day the cumulative log-likelihood ratio of H1
    (p1 = p0 * {1 + SPRT_LIFT}) vs H0 (p0 = the pooled conversion rate)
    over the arm's Bernoulli trials, with the Wald +-ln(19) boundaries
    (alpha = beta = 0.05) mapped to reject_h0 / accept_h0 / continue.
    On this A/A-style parity split the path should hug 'continue'/
    'accept' — the calibration read.

    LLR_d = c_d * ln(p1/p0) + (n_d - c_d) * ln((1-p1)/(1-p0)) — the two
    log factors are computed ONCE from the 1-row parameter frame and the
    daily path is exact-integer counts times those constants, so the
    only float risk is the final 4dp round (decisions compare the
    ROUNDED value to the 4dp boundary literal on both engines).

    Scale shape: corpus -> one map-combined (day, arm) aggregate
    (|days| rows), one |days|-row running-sum window, and a 1-row
    parameter broadcast (the q_tpch_q22 scalar-distribution shape).  At
    100 TB only the first aggregate is corpus-linear.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55)."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.col("ts").cast("timestamp").cast("date").alias("d"),
            F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("arm_b"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
        )
    )
    pars = e.agg(
        (F.sum("conv") * 1.0 / F.count("*")).alias("p0"),
        F.least(
            F.sum("conv") * 1.0 / F.count("*") * (1 + SPRT_LIFT), F.lit(0.999)
        ).alias("p1"),
    )
    daily = e.groupBy("d").agg(
        F.sum("arm_b").cast("long").alias("n_b"),
        F.sum(F.col("arm_b") * F.col("conv")).cast("long").alias("c_b"),
    )
    cw = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("n_b").over(cw).alias("n"),
        F.sum("c_b").over(cw).alias("c"),
    )
    llr_col = F.round(
        F.col("c") * F.log(F.col("p1") / F.col("p0"))
        + (F.col("n") - F.col("c"))
        * F.log((1 - F.col("p1")) / (1 - F.col("p0"))),
        4,
    )
    out = cum.crossJoin(F.broadcast(pars)).withColumn("llr", llr_col)
    return out.select(
        F.col("d").cast("string").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_conv"),
        "llr",
        F.when(F.col("llr") >= SPRT_BOUND, "reject_h0")
        .when(F.col("llr") <= -SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


DID_SPLIT_DAY = 15  # pre = day <= 15, post = day > 15 (the drift_ks split)


@query(
    "q_evt_did",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS treat,
             CASE WHEN day(ts) <= {DID_SPLIT_DAY} THEN 0 ELSE 1 END AS post,
             avg(value) AS user_mean
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL
      GROUP BY user_id, treat, post),
    c AS (
      SELECT treat, post, CAST(count(*) AS BIGINT) AS n,
             avg(user_mean) AS m, var_samp(user_mean) AS v
      FROM u GROUP BY treat, post),
    wide AS (
      SELECT max(CASE WHEN treat = 0 AND post = 0 THEN m END) AS m_c_pre,
             max(CASE WHEN treat = 0 AND post = 1 THEN m END) AS m_c_post,
             max(CASE WHEN treat = 1 AND post = 0 THEN m END) AS m_t_pre,
             max(CASE WHEN treat = 1 AND post = 1 THEN m END) AS m_t_post,
             max(CASE WHEN treat = 0 AND post = 0 THEN v / n END) AS s_c_pre,
             max(CASE WHEN treat = 0 AND post = 1 THEN v / n END) AS s_c_post,
             max(CASE WHEN treat = 1 AND post = 0 THEN v / n END) AS s_t_pre,
             max(CASE WHEN treat = 1 AND post = 1 THEN v / n END) AS s_t_post,
             max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t_post
      FROM c)
    SELECT round(m_c_pre, 4) AS mean_c_pre, round(m_c_post, 4) AS mean_c_post,
           round(m_t_pre, 4) AS mean_t_pre, round(m_t_post, 4) AS mean_t_post,
           round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4) AS did,
           round(sqrt(s_c_pre + s_c_post + s_t_pre + s_t_post), 4) AS se,
           round(((m_t_post - m_t_pre) - (m_c_post - m_c_pre))
                 / sqrt(s_c_pre + s_c_post + s_t_pre + s_t_post), 4) AS z
    FROM wide
    """,
)
def q_evt_did(spark, sf_dir):
    """Difference-in-differences readout — the experimentation family's
    member for TREATMENTS THAT START MID-STREAM (srm validates the
    split, ab_test/cuped read a parallel experiment, sprt decides when
    to stop, DiD reads a before/after rollout against a control):
    did = (treat_post - treat_pre) - (control_post - control_pre) on
    per-user mean purchase value, with the four-cell Welch standard
    error and z.  On this parity split with no real treatment the z
    should be small — the placebo/calibration read, like q_evt_ab_test.

    Per-user means per period first (the unit-of-randomization
    discipline q_evt_ab_test documents — raw-event stats understate
    variance via within-user correlation); a user active in both
    periods contributes one observation to each.

    Scale shape: corpus -> one map-combined (user, period) aggregate ->
    4 cell rows -> 1; all post-aggregate arithmetic stays in the plan,
    expression order mirrors the oracle.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55)."""
    u = (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .groupBy(
            "user_id",
            (F.col("user_id") % 2).alias("treat"),
            F.when(F.dayofmonth("ts") <= DID_SPLIT_DAY, 0)
            .otherwise(1)
            .alias("post"),
        )
        .agg(F.avg("value").alias("user_mean"))
    )
    c = u.groupBy("treat", "post").agg(
        F.count("*").cast("long").alias("n"),
        F.avg("user_mean").alias("m"),
        F.var_samp("user_mean").alias("v"),
    )

    def cell(tr, po, col):
        return F.max(
            F.when((F.col("treat") == tr) & (F.col("post") == po), F.col(col))
        )

    wide = c.agg(
        cell(0, 0, "m").alias("m_c_pre"),
        cell(0, 1, "m").alias("m_c_post"),
        cell(1, 0, "m").alias("m_t_pre"),
        cell(1, 1, "m").alias("m_t_post"),
        F.max(
            F.when((F.col("treat") == 0) & (F.col("post") == 0),
                   F.col("v") / F.col("n"))
        ).alias("s_c_pre"),
        F.max(
            F.when((F.col("treat") == 0) & (F.col("post") == 1),
                   F.col("v") / F.col("n"))
        ).alias("s_c_post"),
        F.max(
            F.when((F.col("treat") == 1) & (F.col("post") == 0),
                   F.col("v") / F.col("n"))
        ).alias("s_t_pre"),
        F.max(
            F.when((F.col("treat") == 1) & (F.col("post") == 1),
                   F.col("v") / F.col("n"))
        ).alias("s_t_post"),
    )
    did = (F.col("m_t_post") - F.col("m_t_pre")) - (
        F.col("m_c_post") - F.col("m_c_pre")
    )
    se = F.sqrt(
        F.col("s_c_pre") + F.col("s_c_post") + F.col("s_t_pre") + F.col("s_t_post")
    )
    return wide.select(
        F.round("m_c_pre", 4).alias("mean_c_pre"),
        F.round("m_c_post", 4).alias("mean_c_post"),
        F.round("m_t_pre", 4).alias("mean_t_pre"),
        F.round("m_t_post", 4).alias("mean_t_post"),
        F.round(did, 4).alias("did"),
        F.round(se, 4).alias("se"),
        F.round(did / se, 4).alias("z"),
    )


# Two-sided 5% / 80%-power normal quantiles, full-precision literals so
# both engines parse the identical doubles
Z_ALPHA = "1.959963984540054"
Z_BETA = "0.8416212335729143"
POWER_TARGET_LIFT = 0.05  # relative lift the n_required sizing targets


@query(
    "q_evt_power",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS cohort, avg(value) AS user_mean
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id
    ), c AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n,
             avg(user_mean) AS m, var_samp(user_mean) AS v
      FROM u GROUP BY cohort
    ), wide AS (
      SELECT max(CASE WHEN cohort = 0 THEN n END) AS n_a,
             max(CASE WHEN cohort = 0 THEN m END) AS m_a,
             max(CASE WHEN cohort = 0 THEN v END) AS v_a,
             max(CASE WHEN cohort = 1 THEN n END) AS n_b,
             max(CASE WHEN cohort = 1 THEN m END) AS m_b,
             max(CASE WHEN cohort = 1 THEN v END) AS v_b
      FROM c
    )
    SELECT n_a, n_b,
           round((m_a * n_a + m_b * n_b) / (n_a + n_b), 4) AS mean_pooled,
           round(({Z_ALPHA} + {Z_BETA}) * sqrt(v_a / n_a + v_b / n_b), 4)
             AS mde_abs,
           round(({Z_ALPHA} + {Z_BETA}) * sqrt(v_a / n_a + v_b / n_b)
                 / ((m_a * n_a + m_b * n_b) / (n_a + n_b)), 4) AS mde_rel,
           CAST(ceil((({Z_ALPHA} + {Z_BETA}) * ({Z_ALPHA} + {Z_BETA}))
                     * (v_a + v_b)
                     / (({POWER_TARGET_LIFT}
                         * ((m_a * n_a + m_b * n_b) / (n_a + n_b)))
                        * ({POWER_TARGET_LIFT}
                           * ((m_a * n_a + m_b * n_b) / (n_a + n_b)))))
                AS BIGINT) AS n_required
    FROM wide
    """,
)
def q_evt_power(spark, sf_dir):
    """Power analysis of the A/B pipeline — the SIXTH experimentation
    member, and the one that runs BEFORE the experiment (srm_check
    validates the split, ab_test/cuped/did read metrics, sprt decides
    when to stop; power decides whether to bother): at the current arm
    sizes and per-user variance, the minimum detectable effect at 5%
    two-sided alpha / 80% power (absolute and relative to the pooled
    mean), and the per-arm n required to detect a
    {POWER_TARGET_LIFT:.0%} lift — the number that sizes the experiment
    calendar.  mde = (z_a + z_b) * sqrt(v_a/n_a + v_b/n_b);
    n_required = (z_a + z_b)^2 (v_a + v_b) / (lift * pooled_mean)^2.

    Per-user means first (the unit-of-randomization discipline the whole
    family shares); the z quantiles are full-precision literals parsed
    to identical doubles by both engines, so the only float work is the
    mirrored expression over the two cohort cells.

    Scale shape: corpus -> one map-combined per-user aggregate -> 2
    cohort rows -> 1.  All arithmetic stays in the plan.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55)."""
    u = (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.avg("value").alias("user_mean"))
        .withColumn("cohort", F.col("user_id") % 2)
    )
    c = u.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n"),
        F.avg("user_mean").alias("m"),
        F.var_samp("user_mean").alias("v"),
    )

    def cell(k, col):
        return F.max(F.when(F.col("cohort") == k, F.col(col)))

    wide = c.agg(
        cell(0, "n").alias("n_a"), cell(0, "m").alias("m_a"),
        cell(0, "v").alias("v_a"), cell(1, "n").alias("n_b"),
        cell(1, "m").alias("m_b"), cell(1, "v").alias("v_b"),
    )
    zsum = F.expr(f"{Z_ALPHA} + {Z_BETA}")
    pooled = (F.col("m_a") * F.col("n_a") + F.col("m_b") * F.col("n_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    mde = zsum * F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
    # r16 ADVICE: square by exact-mirrored multiplication, not pow(x,2) —
    # libm pow carries 1-ulp platform-dependent slack on each engine, and
    # this value feeds ceil() into the integer n_required (the oracle
    # squares the same way).
    lift_pooled = F.lit(POWER_TARGET_LIFT) * pooled
    n_req = F.ceil(
        (zsum * zsum)
        * (F.col("v_a") + F.col("v_b"))
        / (lift_pooled * lift_pooled)
    ).cast("long")
    return wide.select(
        "n_a",
        "n_b",
        F.round(pooled, 4).alias("mean_pooled"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(mde / pooled, 4).alias("mde_rel"),
        n_req.alias("n_required"),
    )


# -- experimentation guardrail: sample-ratio mismatch (r16) -------------------

SRM_CHI2_CRIT = 3.8415  # chi-square critical value, df=1, alpha=0.05


@query(
    "q_evt_srm",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    c AS (
      SELECT CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b
      FROM u)
    SELECT n_a, n_b,
           round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                 / (n_a + n_b), 4) AS chi2,
           CAST(CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                          / (n_a + n_b) > {SRM_CHI2_CRIT}
                     THEN 1 ELSE 0 END AS INT) AS srm_flag
    FROM c
    """,
)
def q_evt_srm(spark, sf_dir):
    """SAMPLE-RATIO-MISMATCH guardrail — the check every experimentation
    readout in this family (ab_test / cuped / sprt / did / power)
    presumes: is the 50/50 parity assignment actually 50/50 in the
    data?  chi-square with df=1 against equal expected counts reduces
    exactly to (n_a - n_b)^2 / n on user counts; flag when it exceeds
    {SRM_CHI2_CRIT} (alpha = 0.05).  A flagged split means the readouts
    are invalid regardless of their p-values — SRM is the industry's
    standard trust gate (Kohavi et al., KDD'19 describe it as the most
    common experiment bug detector).

    EXACT-INTEGER form: unit of analysis is the DISTINCT user (the
    ab_test discipline), counts and the squared difference are longs,
    one double division feeds the rounded statistic and the integer
    flag.

    Scale shape: distinct-user dedup is one map-combined aggregate on
    the user key; the parity census collapses to a single row.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); guardrail sibling of q_evt_ab_test
    (operators/events.py)."""
    u = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )
    c = u.agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).cast("long").alias("n_b"),
    )
    chi2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    ) / (F.col("n_a") + F.col("n_b"))
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 4).alias("chi2"),
        F.when(chi2 > SRM_CHI2_CRIT, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


# -- weekly cohort retention triangle (r16) -----------------------------------


@query(
    "q_evt_retention_matrix",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(ts AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL),
    anchor AS (SELECT min(d) AS d0 FROM ev),
    uw AS (
      SELECT DISTINCT ev.user_id,
             datediff('day', a.d0, ev.d) // 7 AS w
      FROM ev CROSS JOIN anchor a),
    fw AS (SELECT user_id, min(w) AS cohort_week FROM uw GROUP BY user_id),
    coh AS (SELECT cohort_week, count(*) AS n_cohort FROM fw
            GROUP BY cohort_week),
    act AS (
      SELECT f.cohort_week, u.w - f.cohort_week AS age_week,
             count(DISTINCT u.user_id) AS n_active
      FROM uw u JOIN fw f USING (user_id)
      GROUP BY f.cohort_week, u.w - f.cohort_week)
    SELECT CAST(a.cohort_week AS BIGINT) AS cohort_week,
           CAST(a.age_week AS BIGINT) AS age_week,
           CAST(a.n_active AS BIGINT) AS n_active,
           CAST(c.n_cohort AS BIGINT) AS n_cohort,
           ((a.n_active * 20000 + c.n_cohort) // (2 * c.n_cohort))
             / 10000.0 AS retention
    FROM act a JOIN coh c USING (cohort_week)
    ORDER BY cohort_week, age_week
    """,
)
def q_evt_retention_matrix(spark, sf_dir):
    """Weekly COHORT-RETENTION TRIANGLE — the canonical growth-analytics
    readout: users cohorted by first-active week (week = floor
    days-since-corpus-min / 7, exact integer arithmetic — never
    week-of-year, whose ISO boundary rules differ across engines), one
    row per (cohort_week, age_week) with the active-user count and the
    retention share of the cohort.

    Determinism: the anchor date is min(date) computed identically in
    both engines; week indices, counts and cohort sizes are exact longs;
    the retention RATE uses the repo's pure-LONG half-up form
    ((n*20000 + d) DIV (2d))/1e4 — round ratios of ROUND fixture counts
    land exactly on 4-dp midpoints (the r13 q_dq_rules lesson), so no
    float rounding is allowed anywhere in the rate.

    Scale shape: one distinct (user, week) dedup keyed on the user,
    a per-user min (map-combined), one user-keyed join back, and a
    |cohorts x ages| output (bounded by calendar^2, not corpus); the
    1-row anchor broadcasts (CARTESIAN_OK).

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); cohort sibling of q_evt_ltv and the
    funnel family."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("d"))
    )
    anchor = ev.agg(F.min("d").alias("d0"))
    uw = (
        ev.join(F.broadcast(anchor))
        .select(
            "user_id",
            (F.datediff(F.col("d"), F.col("d0")) / 7)
            .cast("long")
            .alias("w"),
        )
        .distinct()
    )
    fw = uw.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    coh = fw.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    act = (
        uw.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).alias("age_week"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        act.join(coh, "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("age_week").cast("long").alias("age_week"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            (
                F.expr(
                    "(n_active * 20000 + n_cohort) div (2 * n_cohort)"
                ).cast("double")
                / 10000.0
            ).alias("retention"),
        )
        .orderBy("cohort_week", "age_week")
    )


# -- cohort LTV curve (r16) ---------------------------------------------------


@query(
    "q_evt_ltv",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL),
    anchor AS (SELECT min(d) AS d0 FROM p),
    pw AS (
      SELECT p.user_id, datediff('day', a.d0, p.d) // 7 AS w, p.value
      FROM p CROSS JOIN anchor a),
    fw AS (SELECT user_id, min(w) AS cohort_week FROM pw GROUP BY user_id),
    coh AS (SELECT cohort_week, count(*) AS n_users FROM fw
            GROUP BY cohort_week),
    rev AS (
      SELECT f.cohort_week, pw.w - f.cohort_week AS age_week,
             round(sum(pw.value), 4) AS rev
      FROM pw JOIN fw f USING (user_id)
      GROUP BY f.cohort_week, pw.w - f.cohort_week),
    cum AS (
      SELECT cohort_week, age_week,
             sum(rev) OVER (PARTITION BY cohort_week ORDER BY age_week
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM rev)
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(c.age_week AS BIGINT) AS age_week,
           CAST(h.n_users AS BIGINT) AS n_users,
           round(c.cum_rev, 4) AS cum_revenue,
           round(c.cum_rev / h.n_users, 4) AS ltv
    FROM cum c JOIN coh h USING (cohort_week)
    ORDER BY cohort_week, age_week
    """,
)
def q_evt_ltv(spark, sf_dir):
    """Cohort LIFETIME-VALUE curve — cumulative purchase revenue per
    buyer cohort (first-purchase week) by age week, divided by cohort
    population: the readout that prices acquisition (payback week =
    first age where ltv crosses CAC).

    Determinism: week indexing as in q_evt_retention_matrix (exact
    integer days-since-min // 7); per-(cohort, age) revenue is rounded
    to 4 dp BEFORE the cumulative window, so the running sum
    accumulates exact-4-dp-multiple values — any cross-engine window
    accumulation-order noise is ~1e-12 while the nearest rounding
    midpoint is 0.5e-4 away (sums of 4-dp multiples are 4-dp
    multiples); the final round is a no-op re-quantization.

    Scale shape: purchases -> one user-keyed first-week aggregate ->
    (cohort, age) revenue cells (calendar-bounded) -> a per-cohort
    cumulative window over <= |weeks| rows; the 1-row anchor broadcasts
    (CARTESIAN_OK).

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); revenue sibling of
    q_evt_retention_matrix."""
    from pyspark.sql import Window as W

    p = (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select("user_id", F.col("ts").cast("date").alias("d"), "value")
    )
    anchor = p.agg(F.min("d").alias("d0"))
    pw = p.join(F.broadcast(anchor)).select(
        "user_id",
        (F.datediff(F.col("d"), F.col("d0")) / 7).cast("long").alias("w"),
        "value",
    )
    fw = pw.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    coh = fw.groupBy("cohort_week").agg(F.count("*").alias("n_users"))
    rev = (
        pw.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).alias("age_week"),
        )
        .agg(F.round(F.sum("value"), 4).alias("rev"))
    )
    cw = (
        W.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = rev.select(
        "cohort_week", "age_week", F.sum("rev").over(cw).alias("cum_rev")
    )
    return (
        cum.join(coh, "cohort_week")
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("age_week").cast("long").alias("age_week"),
            F.col("n_users").cast("long").alias("n_users"),
            F.round(F.col("cum_rev"), 4).alias("cum_revenue"),
            F.round(F.col("cum_rev") / F.col("n_users"), 4).alias("ltv"),
        )
        .orderBy("cohort_week", "age_week")
    )


# -- seasonal-naive backtest (r16) --------------------------------------------

SN_SEASON_DAYS = 7  # weekly seasonality of the daily event-count series


@query(
    "q_ts_seasonal_naive",
    oracle=f"""
    WITH dc AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1)
    SELECT strftime(dc.d, '%Y-%m-%d') AS day, dc.n,
           p.n AS forecast,
           dc.n - p.n AS err,
           abs(dc.n - p.n) AS abs_err
    FROM dc JOIN dc p ON p.d = dc.d - {SN_SEASON_DAYS}
    ORDER BY day
    """,
)
def q_ts_seasonal_naive(spark, sf_dir):
    """SEASONAL-NAIVE backtest of the daily event count: forecast(d) =
    actual(d - {SN_SEASON_DAYS}) — the baseline every fancier forecaster
    (q_ts_ewma, q_ts_holt, q_ts_dow_profile) must beat before it earns
    its complexity (the M-competition discipline: seasonal-naive is the
    standard yardstick for seasonal series).  One row per day with a
    same-weekday prior, carrying the signed and absolute errors.

    FULLY EXACT: counts and their differences are longs; the prior-week
    lookup is a CALENDAR join (d - {SN_SEASON_DAYS} days), never a
    7-ROW lag — a gap day would silently shift a row-lag onto the wrong
    weekday while the calendar join just drops the pair.

    Scale shape: one map-combined date aggregate (|days| rows), then a
    self-join keyed on the date — broadcast-sized at any corpus scale
    (the series length is calendar-bounded).

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); baseline sibling of q_ts_holt /
    q_evt_forecast_eval."""
    dc = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    p = dc.select(F.col("d").alias("pd"), F.col("n").alias("forecast"))
    return (
        dc.join(p, F.col("pd") == F.date_sub(F.col("d"), SN_SEASON_DAYS))
        .select(
            F.col("d").cast("string").alias("day"),
            "n",
            "forecast",
            (F.col("n") - F.col("forecast")).alias("err"),
            F.abs(F.col("n") - F.col("forecast")).alias("abs_err"),
        )
        .orderBy("day")
    )


# -- EWMA fast/slow crossover signals (r16) -----------------------------------

EWMA_FAST = 0.5  # fast EWMA smoothing factor
EWMA_SLOW = 0.2  # slow EWMA smoothing factor


@query(
    "q_ts_ewma_cross",
    oracle=f"""
    WITH RECURSIVE dc AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
    ), idx AS (
      SELECT d, n, row_number() OVER (ORDER BY d) AS i FROM dc
    ), h(i, fa, sl) AS (
      SELECT 1, CAST(n AS DOUBLE), CAST(n AS DOUBLE) FROM idx WHERE i = 1
      UNION ALL
      SELECT idx.i,
             CAST({EWMA_FAST} AS DOUBLE) * idx.n
               + CAST({1 - EWMA_FAST} AS DOUBLE) * h.fa,
             CAST({EWMA_SLOW} AS DOUBLE) * idx.n
               + CAST({1 - EWMA_SLOW} AS DOUBLE) * h.sl
      FROM h JOIN idx ON idx.i = h.i + 1
    ), s AS (
      SELECT idx.d, idx.n, h.i, h.fa, h.sl,
             CASE WHEN h.fa > h.sl THEN 1
                  WHEN h.fa < h.sl THEN -1 ELSE 0 END AS sgn
      FROM idx JOIN h ON h.i = idx.i)
    SELECT strftime(d, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
           round(fa, 4) AS ewma_fast, round(sl, 4) AS ewma_slow,
           CAST(CASE
             WHEN i = 1 THEN 0
             WHEN sgn = 1 AND lag(sgn) OVER (ORDER BY i) <= 0 THEN 1
             WHEN sgn = -1 AND lag(sgn) OVER (ORDER BY i) >= 0 THEN -1
             ELSE 0 END AS INT) AS signal
    FROM s ORDER BY day
    """,
)
def q_ts_ewma_cross(spark, sf_dir):
    """FAST/SLOW EWMA CROSSOVER detector on the daily event count — the
    trading-desk "golden cross" applied to ops telemetry: signal +1 the
    day the fast EWMA (alpha={EWMA_FAST}) crosses above the slow one
    (alpha={EWMA_SLOW}) — demand regime shifting up — and -1 on the
    cross down.  Where q_ts_cusum detects LEVEL changes against a fixed
    reference, the crossover detects TREND reversals with zero tuning
    beyond the two smoothing constants.

    Determinism: both recurrences are computed with the same literal
    constants and operation order in the pandas loop and the unrolled
    RECURSIVE CTE (a*y + (1-a)*prev — multiply/add only, never pow()),
    so fast/slow are BIT-IDENTICAL across engines and the raw-double
    sign comparison cannot diverge; emitted smoothed values are rounded
    with the DuckDB multiply-floor convention (the q_ts_holt note).

    Scale shape: the corpus collapses to a |days|-row series in one
    map-combined aggregate; the sequential recurrence runs on that
    calendar-bounded series inside a single applyInPandas group (the
    q_ts_holt / q_ts_cusum precedent — state is two doubles, the series
    never exceeds the calendar).

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); regime sibling of q_ts_cusum and
    q_ts_holt."""
    import pandas as pd

    dc = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )

    def cross(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        r = lambda x: math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)
        pdf = pdf.sort_values("d").reset_index(drop=True)
        ys = pdf["n"].tolist()
        fa = sl = float(ys[0])
        fas, sls, sigs = [r(fa)], [r(sl)], [0]
        prev_sgn = 0 if fa == sl else (1 if fa > sl else -1)
        for y in ys[1:]:
            fa = EWMA_FAST * y + (1 - EWMA_FAST) * fa
            sl = EWMA_SLOW * y + (1 - EWMA_SLOW) * sl
            sgn = 1 if fa > sl else (-1 if fa < sl else 0)
            if sgn == 1 and prev_sgn <= 0:
                sig = 1
            elif sgn == -1 and prev_sgn >= 0:
                sig = -1
            else:
                sig = 0
            fas.append(r(fa))
            sls.append(r(sl))
            sigs.append(sig)
            prev_sgn = sgn
        pdf["ewma_fast"] = pd.Series(fas, dtype="float64")
        pdf["ewma_slow"] = pd.Series(sls, dtype="float64")
        pdf["signal"] = pd.Series(sigs, dtype="int32")
        return pdf[["g", "d", "n", "ewma_fast", "ewma_slow", "signal"]]

    return (
        dc.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            cross,
            "g int, d date, n long, ewma_fast double, ewma_slow double, "
            "signal int",
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "n",
            "ewma_fast",
            "ewma_slow",
            "signal",
        )
        .orderBy("day")
    )


# -- theta-method forecast (trend + SES residual) (r16 wave 4) ----------------

THETA_ALPHA = 0.3  # SES smoothing of the detrended residual


@query(
    "q_ts_theta",
    oracle=f"""
    WITH RECURSIVE dc AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
    ), idx AS (
      SELECT d, n, row_number() OVER (ORDER BY d) AS i FROM dc
    ), st AS (
      SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(i) AS BIGINT) AS sx,
             CAST(sum(n) AS BIGINT) AS sy, CAST(sum(i * i) AS BIGINT) AS sxx,
             CAST(sum(i * n) AS BIGINT) AS sxy
      FROM idx
    ), ab AS (
      SELECT CAST(nn * sxy - sx * sy AS DOUBLE)
               / (nn * sxx - sx * sx) AS b,
             (sy - CAST(nn * sxy - sx * sy AS DOUBLE)
                   / (nn * sxx - sx * sx) * sx) / nn AS a
      FROM st
    ), h(i, s) AS (
      SELECT 1, idx.n - (ab.a + ab.b * 1) FROM idx, ab WHERE i = 1
      UNION ALL
      SELECT idx.i,
             {THETA_ALPHA} * (idx.n - (ab.a + ab.b * idx.i))
               + {1 - THETA_ALPHA} * h.s
      FROM h JOIN idx ON idx.i = h.i + 1 CROSS JOIN ab
    )
    SELECT strftime(idx.d, '%Y-%m-%d') AS day, CAST(idx.n AS BIGINT) AS n,
           round(ab.a + ab.b * idx.i, 4) AS trend,
           round(h.s, 4) AS resid_smooth,
           CASE WHEN idx.i > 1
                THEN round(ab.a + ab.b * idx.i
                           + lag(h.s) OVER (ORDER BY idx.i), 4)
           END AS forecast
    FROM idx JOIN h ON h.i = idx.i CROSS JOIN ab ORDER BY day
    """,
)
def q_ts_theta(spark, sf_dir):
    """THETA-style forecast of the daily event count: exact-integer OLS
    trend (the counts are integers, so every regression sum is an exact
    long and the slope is one correctly-rounded division) plus SES
    (alpha={THETA_ALPHA}) over the DETRENDED residual; each day's
    one-step forecast is trend(i) + smoothed-residual(i-1).  The theta
    method's decomposition idea (M3 competition winner) in its
    deterministic two-line form: q_ts_holt couples level+trend in one
    recurrence, theta separates the global trend (closed-form) from the
    local residual memory (one SES state) — on series whose trend is
    stable but noisy it degrades more gracefully.

    Determinism: regression sums exact longs on both engines; a/b and
    every per-day expression are the same IEEE op sequence in the pandas
    loop and the recursive CTE; the SES recurrence is multiply/add only;
    emitted floats use the DuckDB multiply-floor rounding convention
    (the q_ts_holt note).

    Scale shape: corpus -> one map-combined date aggregate (|days|
    rows); the regression is a second 1-row aggregate over that series;
    the recurrence runs in a single applyInPandas group over the
    calendar-bounded series.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); forecasting sibling of q_ts_holt and
    q_ts_seasonal_naive."""
    import pandas as pd

    dc = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
    )

    def theta(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        r = lambda x: math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)
        pdf = pdf.sort_values("d").reset_index(drop=True)
        ys = pdf["n"].tolist()
        nn = len(ys)
        sx = sum(range(1, nn + 1))
        sy = sum(ys)
        sxx = sum(i * i for i in range(1, nn + 1))
        sxy = sum(i * y for i, y in enumerate(ys, start=1))
        b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
        a = (sy - (nn * sxy - sx * sy) / (nn * sxx - sx * sx) * sx) / nn
        trends, smooths, fcs = [], [], []
        s = None
        for i, y in enumerate(ys, start=1):
            tr = a + b * i
            if i == 1:
                fcs.append(None)
                s = y - (a + b * 1)
            else:
                fcs.append(r(a + b * i + s))
                s = THETA_ALPHA * (y - (a + b * i)) + (1 - THETA_ALPHA) * s
            trends.append(r(tr))
            smooths.append(r(s))
        pdf["trend"] = pd.Series(trends, dtype="float64")
        pdf["resid_smooth"] = pd.Series(smooths, dtype="float64")
        pdf["forecast"] = pd.Series(fcs, dtype="float64")
        return pdf[["g", "d", "n", "trend", "resid_smooth", "forecast"]]

    return (
        dc.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            theta,
            "g int, d date, n long, trend double, resid_smooth double, "
            "forecast double",
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "n",
            "trend",
            "resid_smooth",
            "forecast",
        )
        .orderBy("day")
    )
