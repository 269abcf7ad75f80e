"""Window function operators (SURVEY.md §2.B "Window functions").

Conventions: every ordering includes a unique tiebreak key (o_orderkey /
event_id) so row_number, frames and ntile are deterministic across engines
(SURVEY.md §7 watch-list #5).

Scale notes: a window partitioned by a key compiles to one shuffle on that
key + an in-partition sort; no driver involvement. Partition-by-customer keys
are high-cardinality, so the shuffle is balanced. None of these use a global
(unpartitioned) window except q_win_ntile_percent, which is bounded to a
filtered subset — an unpartitioned window pulls everything into ONE task and
must never see full-table input at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER w AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark, sf_dir):
    """rank / dense_rank / row_number per customer by order value."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        r4("o_totalprice").alias("o_totalprice"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "q_win_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer — the canonical dedup/top-k-per-key shape."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            r4("o_totalprice").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW), 4)
               AS running_spend
    FROM orders
    """,
)
def q_win_running(spark, sf_dir):
    """Running per-customer spend (rows frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        r4(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@query(
    "q_win_sliding_rows",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING
                                                  AND CURRENT ROW), 4)
               AS moving_avg_3
    FROM orders
    """,
)
def q_win_sliding_rows(spark, sf_dir):
    """3-row moving average per customer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        r4(F.avg("o_totalprice").over(w)).alias("moving_avg_3"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000.0 PRECEDING AND CURRENT ROW)
               AS n_within_50k
    FROM orders
    """,
)
def q_win_range_frame(spark, sf_dir):
    """Value-based (RANGE) frame: peers within 50k below current price.

    The DataFrame-API rangeBetween only takes integral offsets, so the
    double-valued frame is expressed as a SQL window expression."""
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        r4("o_totalprice").alias("o_totalprice"),
        F.expr(
            "count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
            "RANGE BETWEEN 50000.0 PRECEDING AND CURRENT ROW)"
        ).alias("n_within_50k"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 4) AS o_totalprice,
           round(lag(o_totalprice)  OVER w, 4) AS prev_price,
           round(lead(o_totalprice) OVER w, 4) AS next_price,
           round(first_value(o_totalprice) OVER w, 4) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_lag_lead(spark, sf_dir):
    """lag / lead / first_value along each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        r4("o_totalprice").alias("o_totalprice"),
        r4(F.lag("o_totalprice").over(w)).alias("prev_price"),
        r4(F.lead("o_totalprice").over(w)).alias("next_price"),
        r4(F.first("o_totalprice").over(w)).alias("first_price"),
    )


@query(
    "q_win_ntile_percent",
    oracle="""
    SELECT s_suppkey, round(s_acctbal, 4) AS s_acctbal,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist()    OVER w, 4) AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
)
def q_win_ntile_percent(spark, sf_dir):
    """ntile / percent_rank / cume_dist over the (small) supplier table.

    Deliberately an unpartitioned window — only ever applied to a
    dimension-sized input (100 rows); a global window on a fact table would
    serialize into one task."""
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        r4("s_acctbal").alias("s_acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        r4(F.percent_rank().over(w)).alias("pct_rank"),
        r4(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "q_win_value_fns",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_value_fns(spark, sf_dir):
    """first_value / last_value / nth_value over an unbounded frame with a
    deterministic (date, key) ordering."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


MM_WIN = 7  # rolling window width (rows = trailing days)


@query(
    "q_win_moving_median",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT strftime(day, '%Y-%m-%d') AS day, CAST(rev AS BIGINT) AS rev,
           round(CAST(quantile_cont(rev, 0.5) OVER w AS DOUBLE), 4) AS med{MM_WIN},
           CAST(min(rev) OVER w AS BIGINT) AS min{MM_WIN},
           CAST(max(rev) OVER w AS BIGINT) AS max{MM_WIN}
    FROM d
    WINDOW w AS (ORDER BY day ROWS BETWEEN {MM_WIN - 1} PRECEDING
                                       AND CURRENT ROW)
    ORDER BY day
    """,
)
def q_win_moving_median(spark, sf_dir):
    """ROLLING MEDIAN window (plus rolling min/max): the trailing-7-day
    median of daily purchase revenue — the robust smoother dashboards use
    where a rolling MEAN (q_ts_ewma's linear cousin) chases promo spikes.
    Exercises an order-statistic aggregate over a sliding ROWS frame —
    the window shape Spark evaluates by maintaining the frame's multiset
    per step, distinct from the running/sliding SUM family.

    Scale shape: the corpus collapses to the |days| daily frame in one
    map-combined aggregate; the window runs over that calendar-bounded
    frame (the q_ts_changepoint convention).  Revenue is exact integer
    cents; the interpolated median is the identical binary64 expression
    on both engines.

    Reference scope: no window surface in the reference facade
    (api/router/router.go:9-55); order-statistic sibling of
    q_win_sliding_rows."""
    d = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-(MM_WIN - 1), Window.currentRow)
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev",
        F.round(F.expr(
            f"percentile(rev, 0.5) OVER (ORDER BY day ROWS BETWEEN {MM_WIN - 1}"
            " PRECEDING AND CURRENT ROW)"
        ), 4).alias(f"med{MM_WIN}"),
        F.min("rev").over(w).alias(f"min{MM_WIN}"),
        F.max("rev").over(w).alias(f"max{MM_WIN}"),
    ).orderBy("day")
