"""Join operators (SURVEY.md §2.B "Joins").

Capability basis: the reference's catalog exists to serve engine-side joins
over its tables (reference README.md:3-7; partition/sort metadata in
api/handlers/models.go:62-70 is only meaningful to a join-capable engine).

Scale notes (100 TB):
- equi joins: plain ``df.join`` — Catalyst picks sort-merge or (with AQE)
  shuffled-hash; both shuffle only on the join key.
- small dimensions (nation, region, literal band tables): ``F.broadcast`` —
  no shuffle of the big side at all.
- theta/range joins: keep the non-equi side tiny and broadcast it, so the
  BroadcastNestedLoopJoin is (big side) × (handful of rows), never
  (big) × (big).
- as-of join: implemented as union + window ``last(ignorenulls)`` — one
  shuffle on (user_id), NO per-row range explosion. This is the pattern that
  survives 1000 executors; a join-then-rank would build |purchases| ×
  |earlier clicks| intermediates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from .common import r4, t

# ---------------------------------------------------------------- equi family

_ORD_CUST_COLS = """
    o.o_orderkey, o.o_custkey, round(o.o_totalprice, 4) AS o_totalprice,
    c.c_custkey, c.c_name, c.c_mktsegment
"""


def _orders_customer(spark, sf_dir, how: str, broadcast_dim: bool = False):
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    # Outer joins are only interesting when keys are partially missing: keep
    # only high-value orders so some customers have no match (and vice versa).
    o = o.filter(F.col("o_totalprice") > 150000.0)
    if broadcast_dim:
        c = F.broadcast(c)
    joined = o.join(c, o.o_custkey == c.c_custkey, how)
    return joined.select(
        "o_orderkey",
        "o_custkey",
        r4("o_totalprice").alias("o_totalprice"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
    )


_ORD_CUST_SQL = """
    SELECT {cols}
    FROM (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
    {how} JOIN customer c ON o.o_custkey = c.c_custkey
""".format


@query("q_join_inner", oracle=_ORD_CUST_SQL(cols=_ORD_CUST_COLS, how="INNER"))
def q_join_inner(spark, sf_dir):
    """Equi inner join orders ⋈ customer (Catalyst picks SMJ/SHJ)."""
    return _orders_customer(spark, sf_dir, "inner")


@query("q_join_left", oracle=_ORD_CUST_SQL(cols=_ORD_CUST_COLS, how="LEFT"))
def q_join_left(spark, sf_dir):
    """Left outer join — unmatched orders keep NULL customer columns."""
    return _orders_customer(spark, sf_dir, "left")


@query("q_join_right", oracle=_ORD_CUST_SQL(cols=_ORD_CUST_COLS, how="RIGHT"))
def q_join_right(spark, sf_dir):
    """Right outer join — customers with no qualifying order survive."""
    return _orders_customer(spark, sf_dir, "right")


@query("q_join_full", oracle=_ORD_CUST_SQL(cols=_ORD_CUST_COLS, how="FULL"))
def q_join_full(spark, sf_dir):
    """Full outer join."""
    return _orders_customer(spark, sf_dir, "full")


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def q_join_semi(spark, sf_dir):
    """Left semi join (EXISTS): customers having a >300k order."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def q_join_anti(spark, sf_dir):
    """Left anti join (NOT EXISTS)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark, sf_dir):
    """Cross join of the two tiny dimensions (5 × 25 rows)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return r.crossJoin(n).select("r_regionkey", "r_name", "n_nationkey", "n_name")


@query(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Broadcast hash join of small dims — plan must show BroadcastHashJoin;
    the fact table is never shuffled."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


# ------------------------------------------------------------ non-equi family


@query(
    "q_join_theta",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
               ('high', 250000.0, 400000.0), ('top', 400000.0, 1e9)
    )
    SELECT b.band, count(*) AS n_orders,
           round(sum(o.o_totalprice), 4) AS sum_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q_join_theta(spark, sf_dir):
    """Theta (price-band) join. The band table is a 4-row literal and is
    broadcast, so the BroadcastNestedLoopJoin streams the fact side once."""
    o = t(spark, sf_dir, "orders").select("o_totalprice")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 100000.0),
            ("mid", 100000.0, 250000.0),
            ("high", 250000.0, 400000.0),
            ("top", 400000.0, 1e9),
        ],
        "band string, lo double, hi double",
    )
    joined = o.join(
        F.broadcast(bands),
        (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n_orders"),
        r4(F.sum("o_totalprice")).alias("sum_price"),
    )


@query(
    "q_join_range",
    oracle="""
    WITH iv(iv_id, iv_start, iv_end) AS (
        VALUES (1, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-06'),
               (2, TIMESTAMP '2024-01-06', TIMESTAMP '2024-01-11'),
               (3, TIMESTAMP '2024-01-11', TIMESTAMP '2024-01-16'),
               (4, TIMESTAMP '2024-01-16', TIMESTAMP '2024-01-21'),
               (5, TIMESTAMP '2024-01-21', TIMESTAMP '2024-01-26'),
               (6, TIMESTAMP '2024-01-26', TIMESTAMP '2024-01-31')
    )
    SELECT iv.iv_id, count(*) AS n_events, round(sum(e.value), 4) AS sum_value
    FROM events e JOIN iv ON e.ts >= iv.iv_start AND e.ts < iv.iv_end
    GROUP BY iv.iv_id
    """,
)
def q_join_range(spark, sf_dir):
    """Interval/range join of events onto time windows (broadcast intervals)."""
    e = t(spark, sf_dir, "events").select("ts", "value")
    iv = spark.createDataFrame(
        [(i + 1, f"2024-01-{1 + 5 * i:02d}", f"2024-01-{6 + 5 * i:02d}") for i in range(6)],
        "iv_id int, s string, e string",
    ).select(
        "iv_id",
        F.col("s").cast("timestamp_ntz").alias("iv_start"),
        F.col("e").cast("timestamp_ntz").alias("iv_end"),
    )
    joined = e.join(
        F.broadcast(iv), (e.ts >= iv.iv_start) & (e.ts < iv.iv_end)
    )
    return joined.groupBy("iv_id").agg(
        F.count("*").alias("n_events"),
        r4(F.sum("value")).alias("sum_value"),
    )


@query(
    "q_join_asof",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS purchase_value,
           round(c.click_value, 4) AS last_click_value,
           c.ts AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest click by the same user at or
    before the purchase time.

    Implementation is the union+window pattern: tag both streams, sort each
    user's timeline once, and carry the last click forward with
    ``last(ignorenulls=True)``. One shuffle on user_id, no range-join blowup —
    the shape that scales to 100 TB of events. DuckDB oracle: ASOF LEFT JOIN.
    """
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # dedupe clicks to one row per (user_id, ts) so the as-of pick is
    # deterministic under timestamp ties (mirrors the oracle's GROUP BY)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
        "event_id",
        "value",
        F.lit(None).cast("double").alias("click_value"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_p"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "click_value",
        )
    )
    # clicks (is_p=0) sort before purchases (is_p=1) at equal ts, so a
    # same-instant click is visible to the purchase — ASOF `>=` semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_click_value", F.last("click_value", ignorenulls=True).over(w)
    ).withColumn(
        "last_click_ts",
        F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("is_p") == 1).select(
        "event_id",
        "user_id",
        "ts",
        r4("value").alias("purchase_value"),
        r4("last_click_value").alias("last_click_value"),
        "last_click_ts",
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           count(*) AS n_lineitems,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q_join_multiway(spark, sf_dir):
    """Six-table join chain (TPC-H Q5 shape). Fact-to-fact joins shuffle on
    their keys; the three dimensions are broadcast."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    ).agg(
        F.count("*").alias("n_lineitems"),
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           round(o.o_totalprice, 4) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_bucketed(spark, sf_dir):
    """Shuffle-free co-located join via bucketing: both sides are written
    ``bucketBy(8, join_key)`` + ``sortBy`` into the session catalog, so the
    join needs NO Exchange on either side (asserted in tests/test_plans.py)
    — the pre-partitioning strategy for a join repeated at 100 TB, where
    paying one bucketed write amortizes every subsequent join's shuffle.

    The bucketed tables are session-scoped (in-memory catalog, scratch
    LOCATION) and rebuilt once per session per sf_dir."""
    from .common import scratch_dir

    import os
    import shutil

    import re

    # Sanitize EVERY non-identifier character, not just '/' and '.': the
    # round-9 fixture-regeneration dry run pointed this query at a dir
    # with a '-' in its name and the unquoted CREATE DATABASE identifier
    # failed to parse (tools/regen_fixture.py finding).
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir).strip("_")
    # One database PER sf_dir: a shared db would pin its LOCATION to the
    # first sf_dir seen (CREATE DATABASE IF NOT EXISTS is a no-op after
    # that), so a later sf's tables would land — and leak across sessions —
    # under the wrong scratch path.
    db = f"icsb_buckets_{tag}"
    loc = scratch_dir(sf_dir, "bucketed")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    ob, cb = f"{db}.orders_{tag}", f"{db}.customer_{tag}"

    def build(name, src, key, cols):
        if spark.catalog.tableExists(name):
            return
        # The in-memory catalog is per-session but the scratch dir is not:
        # clear a stale location left by a previous session before rebuilding.
        shutil.rmtree(os.path.join(loc, name.split(".", 1)[1]), ignore_errors=True)
        (
            t(spark, sf_dir, src)
            .select(*cols)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )

    build(ob, "orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"])
    build(cb, "customer", "c_custkey", ["c_custkey", "c_name"])
    o, c = spark.table(ob), spark.table(cb)
    # hint("merge"): at fixture scale the planner would broadcast the small
    # side (and skip bucketed reads); at 100 TB neither side broadcasts and
    # SMJ-over-buckets is precisely the plan being demonstrated.
    return o.join(c.hint("merge"), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name", r4("o_totalprice").alias("o_totalprice")
    )


@query(
    "q_join_bloom_prune",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS sum_total
    FROM orders o
    WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
    GROUP BY o.o_orderpriority
    """,
)
def q_join_bloom_prune(spark, sf_dir):
    """Semi join with a broadcast Bloom-filter prefilter on the fact side.

    The 100 TB pattern: before shuffling a huge fact table into a join,
    broadcast a compact Bloom filter of the (filtered) dimension keys and
    drop non-matching fact rows AT THE SCAN — the shuffle then carries only
    candidate rows. Spark injects this automatically in some shapes
    (runtime row-level filtering); this operator builds the filter
    explicitly so the technique works on any join the optimizer misses.

    Mechanics, all JVM-side codegen: k=3 bit positions per key via salted
    xxhash64 mod m=65536; the build side ORs one-hot words into a
    1024-long bitmap (a tiny two-stage aggregate on an already-filtered
    dim); the bitmap ships as a literal array and the probe tests all
    three bits with element_at + bitwise AND. False positives are removed
    by the exact semi join that follows, so results are EXACTLY the plain
    semi join's (the oracle checks that); false negatives are impossible
    by construction. At sf0.1 the bloom passes ~20% of orders to the
    shuffle (the BUILDING share) plus <1% false positives."""
    m_bits, n_words = 65536, 1024
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )

    def positions(key: str):
        # SQL-expr form: shiftleft/element_at take column shift amounts in
        # SQL, but PySpark's F.shiftleft only accepts a Python int.
        return [f"pmod(xxhash64({key}, {i}), {m_bits})" for i in range(3)]

    # Build: explode the 3 positions, OR one-hot words per 64-bit slot.
    build = (
        cust.select(
            F.expr("explode(array(" + ", ".join(positions("c_custkey")) + "))").alias(
                "pos"
            )
        )
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        # driver-side bound: ≤ n_words rows (1024 longs, 8 KB) — the whole
        # point is that the bitmap is small enough to ship as a literal
        .collect()
    )
    words = [0] * n_words
    for row in build:
        words[row["word"]] = row["bits"]
    bitmap = F.array(*[F.lit(w) for w in words])

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    probe = " AND ".join(
        f"(element_at(bm, CAST(({p}) DIV 64 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))) != 0"
        for p in positions("o_custkey")
    )
    # scan-level prune; only candidate rows reach the join's shuffle
    candidates = o.withColumn("bm", bitmap).filter(F.expr(probe)).drop("bm")
    return (
        candidates.join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked),
    s AS (
      SELECT user_id, sid, min(ts) AS s_start,
             max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM sess GROUP BY user_id, sid)
    SELECT a.user_id AS u1, b.user_id AS u2,
           CAST(count(*) AS BIGINT) AS n_overlaps
    FROM s a JOIN s b
      ON a.user_id < b.user_id
     AND a.s_start <= b.s_end AND b.s_start <= a.s_end
    GROUP BY u1, u2
    """,
)
def q_join_interval_overlap(spark, sf_dir):
    """Large x large interval-overlap join (user co-presence): count, per
    user pair, how many of their activity sessions overlap in time. A
    session's active window runs to 30 minutes past its last event (the
    inactivity timeout).

    The scale technique is BUCKET QUANTIZATION: a naive overlap join is a
    BroadcastNestedLoopJoin with an |s|^2 predicate pass, which no cluster
    survives when both sides are large. Instead each interval explodes
    into the hour buckets it spans (short sessions -> 1-2 rows), the join
    becomes an EQUI join on the bucket (one shuffle, AQE splits hot
    hours), and the exact overlap predicate re-filters candidates. Cost is
    O(candidate pairs per bucket), never O(|s|^2) — the standard binning
    pattern behind temporal/spatial joins at 100 TB.

    Two details keep the post-join side flat when bucket occupancy grows
    (more users in the same wall-clock window — exactly what happened at
    sf0.1, where a trailing distinct turned 10x data into 19x runtime):

    - a pair that co-occupies several buckets is emitted ONLY in its first
      shared bucket (``bucket == hour(greatest(starts))`` — the standard
      binned-join dedup condition), so no distinct is needed at all: the
      join output IS the exact set of overlapping session pairs;
    - the per-user-pair count then partial-aggregates map-side inside the
      join stage, so the only post-join shuffle carries pre-combined
      (u1, u2) counts, never raw candidate pairs."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    sess = (
        ev.withColumn(
            "new_s",
            F.when(
                prev.isNull() | (prev < F.col("ts") - F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("s_end"),
        )
    )
    bucketed = sess.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    # fixed_width: the candidate-pair fan-out happens INSIDE the join
    # task, so AQE (sizing by the ~MB shuffle input) would coalesce the
    # exchange to 1-2 tasks and serialize the O(per-bucket^2) predicate
    # work — see operators/common.py fixed_width (measured 9.5s -> 1.6s
    # warm at sf0.1).
    from .common import fixed_width

    bucketed = fixed_width(
        bucketed.select("user_id", "s_start", "s_end", "bucket"), "bucket"
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    first_shared = F.date_trunc(
        "hour", F.greatest(F.col("a.s_start"), F.col("b.s_start"))
    )
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.s_start") <= F.col("b.s_end"))
        & (F.col("b.s_start") <= F.col("a.s_end"))
        # emit each qualifying pair exactly once: in the first bucket the
        # two intervals share (overlap guarantees that bucket is in BOTH
        # explode ranges) — replaces a distinct over duplicated candidates
        & (F.col("a.bucket") == first_shared),
    ).select(
        F.col("a.user_id").alias("u1"),
        F.col("b.user_id").alias("u2"),
    )
    return pairs.groupBy("u1", "u2").agg(F.count("*").alias("n_overlaps"))


ASOF_TOLERANCE_MIN = 30


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts, max(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, round(p.value, 4) AS purchase_value,
           CASE WHEN c.ts IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                THEN round(c.click_value, 4) END AS last_click_value,
           CASE WHEN c.ts IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                THEN CAST(date_diff('second', c.ts, p.ts) AS BIGINT)
                END AS staleness_s
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof_tolerance(spark, sf_dir):
    """As-of join WITH a staleness bound (merge_asof tolerance= / the
    feature-store freshness rule): the latest prior click joins only if
    it is at most {ASOF_TOLERANCE_MIN} minutes old — older state must NOT
    leak into the row (a stale feature silently joining is the classic
    training-serving skew bug; here it surfaces as NULL + no staleness).

    Same single-shuffle union+window shape as q_join_asof — the tolerance
    is a POST-carry filter on the carried timestamp, not a join-condition
    change, so the plan cost is identical and the bound can vary per
    query without re-partitioning anything."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    tagged = purchases.select(
        "user_id", "ts", F.lit(1).alias("is_p"), "event_id", "value",
        F.lit(None).cast("double").alias("click_value"),
    ).unionByName(
        clicks.select(
            "user_id", "ts", F.lit(0).alias("is_p"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "click_value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "lcv", F.last("click_value", ignorenulls=True).over(w)
    ).withColumn(
        "lct",
        F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    age_s = F.unix_timestamp("ts") - F.unix_timestamp("lct")
    fresh = F.col("lct").isNotNull() & (age_s <= ASOF_TOLERANCE_MIN * 60)
    return carried.filter(F.col("is_p") == 1).select(
        "event_id",
        "user_id",
        r4("value").alias("purchase_value"),
        F.when(fresh, r4("lcv")).alias("last_click_value"),
        F.when(fresh, age_s).cast("long").alias("staleness_s"),
    )


FUZZY_MAX_EDIT = 3  # levenshtein verify radius for the name-match join


@query(
    "q_join_fuzzy_match",
    oracle=f"""
    WITH d AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS n,
             string_split(p_name, ' ')[-1] AS noun
      FROM part WHERE p_name IS NOT NULL GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
           a.n AS rows_a, b.n AS rows_b
    FROM d a JOIN d b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_EDIT}
    ORDER BY name_a, name_b
    """,
)
def q_join_fuzzy_match(spark, sf_dir):
    """Fuzzy NAME-match join (entity resolution / MDM): near-identical
    part names linked by edit distance <= {FUZZY_MAX_EDIT}, candidates
    generated by a BLOCKING key (the name's last token) so the verify
    join is block-local — never dictionary x dictionary, the same
    blocked-quadratic discipline as q_sim_pairs / q_dedup_fuzzy applied
    to string identity instead of content similarity.

    The load-bearing scale decision: matching runs on the DISTINCT-NAME
    DICTIONARY, not the row stream.  The first aggregate collapses the
    table to (name, row_count) — vocabulary-bounded (Heaps-ish), orders
    of magnitude smaller than the table — and every downstream cost is
    dictionary-sized; row multiplicities ride along as counts so the
    linkage report still quantifies row impact (rows_a/rows_b).  At
    sf0.01: 2,000 rows -> 64 names -> 80 linked pairs; pairing raw rows
    instead would emit 106,692.  At 100 TB the blocking key grows a
    second component (length band / first char) exactly like the LSH
    band knob; the oracle mirrors whatever the operator blocks on, so
    the twin holds at any key choice.

    Both engines compute classic unweighted Levenshtein (Spark
    F.levenshtein = DuckDB levenshtein), an integer — no rounding site.

    Reference scope: no fuzzy-match surface in the reference (Go
    metadata facade, api/router/router.go:9-55); string-identity sibling
    of q_dedup_fuzzy (content MinHash) and q_join_theta (non-equi
    verify)."""
    d = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").isNotNull())
        .groupBy("p_name")
        .agg(F.count("*").alias("n"))
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    a = d.select(
        F.col("p_name").alias("name_a"),
        F.col("n").alias("rows_a"),
        "noun",
    )
    b = d.select(
        F.col("p_name").alias("name_b"),
        F.col("n").alias("rows_b"),
        "noun",
    )
    return (
        a.join(b, "noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("dist") <= FUZZY_MAX_EDIT)
        .select("name_a", "name_b", "dist", "rows_a", "rows_b")
        .orderBy("name_a", "name_b")
    )


SPATIAL_R = 0.02  # match radius in the unit square
_H44 = 17592186044416.0  # 2^44: md5-prefix hash-space size


@query(
    "q_join_spatial_grid",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             ('0x' || substr(md5('c:' || CAST(c_custkey AS VARCHAR)), 1, 11))::BIGINT
               / {_H44} AS x,
             ('0x' || substr(md5('c:' || CAST(c_custkey AS VARCHAR)), 12, 11))::BIGINT
               / {_H44} AS y
      FROM customer),
    s AS (
      SELECT s_suppkey,
             ('0x' || substr(md5('s:' || CAST(s_suppkey AS VARCHAR)), 1, 11))::BIGINT
               / {_H44} AS x,
             ('0x' || substr(md5('s:' || CAST(s_suppkey AS VARCHAR)), 12, 11))::BIGINT
               / {_H44} AS y
      FROM supplier)
    SELECT c.c_custkey, s.s_suppkey,
           round(sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)), 4)
             AS dist
    FROM c, s
    WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
          <= {SPATIAL_R} * {SPATIAL_R}
    ORDER BY c_custkey, s_suppkey
    """,
)
def q_join_spatial_grid(spark, sf_dir):
    """SPATIAL radius join via GRID BUCKETING: all (customer, supplier)
    pairs within distance {SPATIAL_R} in the unit square — the
    point-radius join behind geo matching / store-coverage queries.
    Coordinates are synthesized deterministically from the keys (salted
    portable-md5 fractions, the q_dedup_fuzzy hash convention), so both
    engines see identical doubles and the oracle can be the plain
    distance theta-join.

    Plan shape (the 100 TB point): the naive theta join is |C| x |S| — a
    BroadcastNestedLoopJoin that cannot scale.  The grid plan quantizes
    points to cells of side {SPATIAL_R} (one cell = the radius, so any
    matching pair differs by <= 1 cell per axis), explodes the SMALLER
    side into its 3x3 neighbour cells, and EQUI-joins on (cx, cy) —
    shuffle-partitionable on the cell key, 9x fan-out of the small side,
    exact distance as a post-filter INSIDE each cell bucket.  This is
    IVF/LSH bucketing (q_sim_ann_ivf) specialized to 2-D metric space;
    completeness needs no fp care because cell side == radius makes the
    +-1-cell envelope safe regardless of floor rounding.

    Determinism: both engines compute the identical binary64 coords and
    compare identical squared distances; the cell arithmetic exists only
    on the Spark side (a candidate SUPERSET), so its rounding can never
    change the answer, only the candidate count.

    Reference scope: no join surface in the reference facade
    (api/router/router.go:9-55); bucketed sibling of q_join_range
    (1-D band) and q_join_interval_overlap (time intervals)."""

    def coords(df, key, salt):
        h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
        return df.select(
            key,
            (F.conv(F.substring(h, 1, 11), 16, 10).cast("long") / _H44).alias("x"),
            (F.conv(F.substring(h, 12, 11), 16, 10).cast("long") / _H44).alias("y"),
        )

    cust = coords(t(spark, sf_dir, "customer"), "c_custkey", "c:")
    supp = coords(t(spark, sf_dir, "supplier"), "s_suppkey", "s:")
    cell = lambda v: F.floor(F.col(v) / SPATIAL_R).cast("int")  # noqa: E731
    cgrid = cust.select(
        "c_custkey", "x", "y", cell("x").alias("cx"), cell("y").alias("cy")
    )
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    sgrid = (
        supp.select(
            "s_suppkey",
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            cell("x").alias("scx"),
            cell("y").alias("scy"),
        )
        .withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.col("scx") + F.col("dx")).alias("cx"),
            (F.col("scy") + F.col("dy")).alias("cy"),
        )
    )
    # explicit products, not pow(,2): the oracle multiplies, and libm pow
    # is not guaranteed bit-equal to x*x
    dxc, dyc = F.col("x") - F.col("sx"), F.col("y") - F.col("sy")
    d2 = dxc * dxc + dyc * dyc
    return (
        cgrid.join(sgrid, ["cx", "cy"])
        .filter(d2 <= F.lit(SPATIAL_R * SPATIAL_R))
        .select(
            "c_custkey",
            "s_suppkey",
            F.round(F.sqrt(d2), 4).alias("dist"),
        )
        .orderBy("c_custkey", "s_suppkey")
    )


@query(
    "q_join_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    u AS (
        SELECT user_id, ts, 1 AS is_p, event_id FROM p
        UNION ALL
        SELECT user_id, ts, 0 AS is_p, NULL AS event_id FROM c
    ),
    w AS (
        SELECT *,
               max(CASE WHEN is_p = 0 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, is_p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
               min(CASE WHEN is_p = 0 THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, is_p
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
        FROM u
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
             WHEN next_ts IS NULL THEN prev_ts
             WHEN prev_ts IS NULL THEN next_ts
             WHEN ts - prev_ts <= next_ts - ts THEN prev_ts
             ELSE next_ts
           END AS nearest_click_ts,
           CASE
             WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
             WHEN next_ts IS NULL THEN 'prev'
             WHEN prev_ts IS NULL THEN 'next'
             WHEN ts - prev_ts <= next_ts - ts THEN 'prev'
             ELSE 'next'
           END AS direction,
           CAST(CASE
             WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
             WHEN next_ts IS NULL THEN epoch_us(ts) - epoch_us(prev_ts)
             WHEN prev_ts IS NULL THEN epoch_us(next_ts) - epoch_us(ts)
             WHEN ts - prev_ts <= next_ts - ts THEN epoch_us(ts) - epoch_us(prev_ts)
             ELSE epoch_us(next_ts) - epoch_us(ts)
           END AS BIGINT) AS gap_us
    FROM w WHERE is_p = 1
    """,
)
def q_join_nearest(spark, sf_dir):
    """Nearest-event join: for each purchase, the click by the same user
    closest in time in EITHER direction (backward ties win — the
    deterministic 'prefer the earlier cause' rule).  The bidirectional
    sibling of q_join_asof (backward-only).

    Plan: the union+window pattern again — tag both streams, ONE shuffle
    on user_id, then two ROWS-frame extrema per row (last click at-or-
    before via a running max, first click after via a reverse running
    min).  Never a range join: at 100 TB the naive |P| x |C| theta join
    is a BNLJ, while this shape is linear in events per user.  Same-ts
    clicks sort before purchases (is_p tiebreak) so a simultaneous click
    resolves as 'prev' with gap 0 on both engines.  Gap is reported in
    exact integer microseconds (no float time math).

    Reference scope: no join surface in the reference (Go metadata
    facade, api/router/router.go:9-55); north-star temporal-join sibling
    of q_join_asof / q_join_asof_tolerance."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.lit(1).alias("_one"))
        .select("user_id", "ts")
    )
    tagged = p.select(
        "user_id", "ts", F.lit(1).alias("is_p"), "event_id"
    ).unionByName(
        c.select(
            "user_id", "ts", F.lit(0).alias("is_p"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    click_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    w = tagged.withColumn("prev_ts", F.max(click_ts).over(back)).withColumn(
        "next_ts", F.min(click_ts).over(fwd)
    )
    # fixture ts is TIMESTAMP_NTZ; unix_micros needs LTZ — the cast is
    # session-UTC so differences are exact (the q_evt_conversion_lag cast)
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    d_prev, d_next = us("ts") - us("prev_ts"), us("next_ts") - us("ts")
    pick_prev = F.col("next_ts").isNull() | (
        F.col("prev_ts").isNotNull() & (d_prev <= d_next)
    )
    return (
        w.filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(pick_prev, F.col("prev_ts"))
            .otherwise(F.col("next_ts"))
            .alias("nearest_click_ts"),
            F.when(
                F.col("prev_ts").isNull() & F.col("next_ts").isNull(), F.lit(None)
            )
            .when(pick_prev, F.lit("prev"))
            .otherwise(F.lit("next"))
            .alias("direction"),
            F.when(pick_prev, d_prev).otherwise(d_next).alias("gap_us"),
        )
    )


@query(
    "q_join_pit",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_v,
             event_type
      FROM events WHERE event_type IN ('signup', 'purchase')
        AND user_id IS NOT NULL
    ),
    w AS (
      SELECT *,
             sum(is_v) OVER (PARTITION BY user_id ORDER BY ts, is_v DESC,
                             event_id ROWS UNBOUNDED PRECEDING) AS version,
             max(CASE WHEN is_v = 1 THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, is_v DESC, event_id
               ROWS UNBOUNDED PRECEDING) AS valid_from
      FROM u
    )
    SELECT event_id, user_id, ts,
           CASE WHEN version > 0 THEN CAST(version AS BIGINT) END AS tier_version,
           valid_from AS tier_since,
           CASE WHEN version > 0
                THEN CAST(epoch_us(ts) - epoch_us(valid_from) AS BIGINT)
           END AS tenure_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def q_join_pit(spark, sf_dir):
    """POINT-IN-TIME join against a versioned (SCD2-style) dimension: each
    purchase picks the dimension VERSION valid at its event time — here
    the per-user tier that increments at every signup event, with
    validity [signup_ts, next_signup_ts).  Purchases before the first
    version get NULLs (no validity interval covers them) — the
    leakage-safe feature-store lookup: joining tomorrow's tier onto
    today's purchase is exactly the training-serving skew PIT joins
    exist to prevent.

    Plan: the dimension's validity intervals are never materialized —
    version rows and facts union into ONE user_id-shuffled timeline and
    a running count/max carries (version, valid_from) onto each fact
    (same-instant version sorts BEFORE the fact, so a signup at the
    purchase instant is visible — SCD2 inclusive-start).  The naive
    plan is a fact×versions range join (quadratic per user); this is
    linear, the q_join_asof discipline extended to carried ATTRIBUTES.
    Tenure is exact integer microseconds.

    Reference scope: no join surface in the reference (Go metadata
    facade, api/router/router.go:9-55); SCD2 companion of q_scd2 (which
    BUILDS type-2 dims) — this is the read side at serving time."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase") & F.col("user_id").isNotNull()
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "signup", 1).otherwise(0).alias("is_v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_v"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("version", F.sum("is_v").over(w)).withColumn(
        "valid_from", F.max(F.when(F.col("is_v") == 1, F.col("ts"))).over(w)
    )
    has_v = F.col("version") > 0
    tus = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.when(has_v, F.col("version").cast("long")).alias("tier_version"),
        F.col("valid_from").alias("tier_since"),
        F.when(has_v, tus("ts") - tus("valid_from")).alias("tenure_us"),
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH p AS (
      SELECT user_id, count(*) AS n_purchases,
             sum(CAST(round(value * 100) AS BIGINT)) AS purchase_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    e AS (
      SELECT user_id, count(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY user_id)
    SELECT coalesce(p.user_id, e.user_id) AS user_id,
           p.user_id IS NULL AND e.user_id IS NULL AS is_anonymous,
           CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
           CAST(coalesce(p.purchase_cents, 0) AS BIGINT) AS purchase_cents,
           CAST(coalesce(e.n_errors, 0) AS BIGINT) AS n_errors
    FROM p FULL JOIN e ON p.user_id IS NOT DISTINCT FROM e.user_id
    ORDER BY user_id NULLS FIRST
    """,
)
def q_join_null_safe(spark, sf_dir):
    """NULL-SAFE equality join (<=> / IS NOT DISTINCT FROM): full-outer
    merge of per-user purchase and error profiles where the ANONYMOUS
    bucket (user_id NULL) is a first-class join key — plain equality
    would silently drop both sides' NULL groups into unmatched rows (the
    q_sub_not_in_null trap in join form), double-counting the anonymous
    segment.  Every sessionless-traffic rollup needs exactly this join.

    Scale shape: two keyed aggregates collapse the corpus first; the
    null-safe join runs over the |users|-sized aggregate frames (Spark
    plans <=> as a regular hash join — the key's null flag joins like a
    value — so no BNLJ penalty).

    Reference scope: no join surface in the reference facade
    (api/router/router.go:9-55); NULL-semantics sibling of
    q_sub_not_in_null and q_join_full."""
    ev = t(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "purchase_cents"
            ),
        )
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("e_user"))
        .agg(F.count("*").alias("n_errors"))
    )
    j = p.join(e, p["user_id"].eqNullSafe(e["e_user"]), "full")
    return j.select(
        F.coalesce(p["user_id"], F.col("e_user")).alias("user_id"),
        (p["user_id"].isNull() & F.col("e_user").isNull()).alias("is_anonymous"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("purchase_cents", F.lit(0)).alias("purchase_cents"),
        F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
    ).orderBy(F.col("user_id").asc_nulls_first())


@query(
    "q_join_role_playing",
    oracle="""
    WITH dim AS (
      SELECT d, strftime(d, '%Y-%m') AS ym FROM (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
        UNION
        SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem)),
    f AS (
      SELECT l.l_orderkey, l.l_quantity,
             CAST(o.o_orderdate AS DATE) AS od, CAST(l.l_shipdate AS DATE) AS sd
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT dord.ym AS order_month, dshp.ym AS ship_month,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(date_diff('day', f.od, f.sd)), 4) AS avg_delay_days
    FROM f
    JOIN dim dord ON dord.d = f.od
    JOIN dim dshp ON dshp.d = f.sd
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_join_role_playing(spark, sf_dir):
    """ROLE-PLAYING dimension join: ONE date dimension joined twice under
    different roles (order date, ship date) — the standard star-schema
    idiom (a single conformed calendar serves every date column) that
    requires disambiguating aliases; the output is the order-month x
    ship-month shipping-lag matrix with the average delay.

    Scale shape: the dim is tiny (distinct dates) and broadcasts for
    BOTH roles; the fact join lineitem⋈orders is the one real shuffle
    (key-partitioned).  Delay is exact integer day arithmetic; the
    average is an exact-int division.

    Reference scope: no join surface in the reference facade
    (api/router/router.go:9-55); dimensional sibling of q_join_multiway
    and q_scan_runtime_filter's star shape."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.col("l_shipdate").cast("date").alias("sd")
    )
    dim = (
        o.select(F.col("od").alias("d"))
        .union(li.select(F.col("sd").alias("d")))
        .distinct()
        .withColumn("ym", F.date_format("d", "yyyy-MM"))
    )
    f = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    dord = dim.select(F.col("d").alias("od_d"), F.col("ym").alias("order_month"))
    dshp = dim.select(F.col("d").alias("sd_d"), F.col("ym").alias("ship_month"))
    return (
        f.join(F.broadcast(dord), F.col("od") == F.col("od_d"))
        .join(F.broadcast(dshp), F.col("sd") == F.col("sd_d"))
        .groupBy("order_month", "ship_month")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg(F.datediff("sd", "od")), 4).alias("avg_delay_days"),
        )
        .orderBy("order_month", "ship_month")
    )
