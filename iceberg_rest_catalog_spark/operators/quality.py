"""Declarative data-quality rule audit — the admission gate a 100 TB
ingest pipeline runs before publishing a snapshot.

The reference exposes table metadata but no content validation
(`tables.go:150-227` commits whatever the writer staged); production
catalogs pair that commit path with a rule engine (null-rate, domain,
uniqueness, referential integrity) whose report decides whether the
snapshot is published or quarantined.  q_dq_rules is that engine over the
TPC-H fixture tables, expressed Spark-first:

- **predicate rules** (range / domain / null checks) compile to ONE
  map-combined aggregate per table — `count(*)` plus one conditional sum
  per rule — so adding a rule adds a column, not a scan, and the shuffle
  carries a single partial row per partition whatever the table size;
- **uniqueness rules** are one key-shuffle `groupBy(pk)` whose aggregate
  emits both the checked total and the rows-in-duplicate-groups count
  (sum(c) / sum(c) filtered c>1) — one pass, no self-join;
- **referential rules** are LEFT ANTI equi-joins child→parent (broadcast
  while the parent key set fits, AQE-planned shuffle join beyond that);
- the final report is a UNION of 1-row frames — |rules| rows total, so
  the assembly cost is nil at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import t

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
SHIP_DEADLINE = "2001-06-30 00:00:00"

_DQ_ORACLE = f"""
WITH cust AS (
  SELECT count(*) AS n,
         sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS v_acct,
         sum(CASE WHEN c_mktsegment IS NULL
                    OR c_mktsegment NOT IN {tuple(SEGMENTS)} THEN 1 ELSE 0 END) AS v_seg
  FROM customer),
ord AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_totalprice < 5000 THEN 1 ELSE 0 END) AS v_price,
         sum(CASE WHEN o_orderstatus IS NULL
                    OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_status
  FROM orders),
li AS (
  SELECT count(*) AS n,
         sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS v_qty,
         sum(CASE WHEN l_discount < 0 OR l_discount > 0.10 THEN 1 ELSE 0 END) AS v_disc,
         sum(CASE WHEN l_shipdate > TIMESTAMP '{SHIP_DEADLINE}' THEN 1 ELSE 0 END) AS v_ship
  FROM lineitem),
cust_pk AS (
  SELECT sum(c) AS n, coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS v
  FROM (SELECT count(*) AS c FROM customer GROUP BY c_custkey)),
ord_pk AS (
  SELECT sum(c) AS n, coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS v
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
ord_fk AS (
  SELECT (SELECT count(*) FROM orders) AS n,
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS v),
li_fk AS (
  SELECT (SELECT count(*) FROM lineitem) AS n,
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS v),
report AS (
  SELECT 'customer_acctbal_nonneg' AS rule_id, n, v_acct AS v FROM cust
  UNION ALL SELECT 'customer_pk_unique', n, v FROM cust_pk
  UNION ALL SELECT 'customer_segment_domain', n, v_seg FROM cust
  UNION ALL SELECT 'lineitem_discount_range', n, v_disc FROM li
  UNION ALL SELECT 'lineitem_fk_orders', n, v FROM li_fk
  UNION ALL SELECT 'lineitem_qty_le40', n, v_qty FROM li
  UNION ALL SELECT 'lineitem_ship_deadline', n, v_ship FROM li
  UNION ALL SELECT 'orders_fk_customer', n, v FROM ord_fk
  UNION ALL SELECT 'orders_pk_unique', n, v FROM ord_pk
  UNION ALL SELECT 'orders_price_min_5k', n, v_price FROM ord
  UNION ALL SELECT 'orders_status_domain', n, v_status FROM ord)
SELECT rule_id, CAST(n AS BIGINT) AS n_checked, CAST(v AS BIGINT) AS n_violations,
       -- pure-LONG half-up rounding of (n-v)/n to 4 dp: (n-v)/n can sit
       -- EXACTLY on a 4-dp midpoint (47991/60000 = 0.79985, hit by the
       -- seed-2027 regen check), where the engines' double round()
       -- disagrees by an ulp — the q_agg_time_decay convention
       CAST(((n - v) * 20000 + n) // (2 * n) AS DOUBLE) / 10000 AS pass_rate
FROM report ORDER BY rule_id
"""


def _pred_rules(df, rules):
    """ONE aggregate computing count(*) + a conditional sum per rule, then
    stack() to (rule_id, n_checked, n_violations) rows — adding a rule
    adds a column to the partial aggregate, never another scan."""
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"v{i}")
        for i, (_, cond) in enumerate(rules)
    ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{rid}', n, v{i}" for i, (rid, _) in enumerate(rules)
    )
    return one.selectExpr(
        f"stack({len(rules)}, {parts}) AS (rule_id, n_checked, n_violations)"
    )


def _pk_rule(df, key, rule_id):
    """Uniqueness in one pass: per-key counts, then sum(c) = checked and
    sum(c where c>1) = rows participating in a duplicate group."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("c"))
        .agg(
            F.lit(rule_id).alias("rule_id"),
            F.sum("c").alias("n_checked"),
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)).alias(
                "n_violations"
            ),
        )
    )


def _fk_rule(child, child_key, parent, parent_key, rule_id):
    """Referential integrity: LEFT ANTI child→parent. NULL child keys
    never match (SQL NOT EXISTS semantics: a NULL key is an orphan)."""
    orphans = child.join(
        parent.select(parent_key), child[child_key] == parent[parent_key], "left_anti"
    )
    total = child.agg(F.count("*").alias("n_checked"))
    bad = orphans.agg(F.count("*").alias("n_violations"))
    return total.join(bad).select(
        F.lit(rule_id).alias("rule_id"), "n_checked", "n_violations"
    )


@query("q_dq_rules", oracle=_DQ_ORACLE)
def q_dq_rules(spark, sf_dir):
    """Data-quality rule audit over customer/orders/lineitem: 11 rules in
    three families (predicate range/domain, primary-key uniqueness,
    referential integrity), reported as (rule_id, n_checked, n_violations,
    pass_rate).  The fixture exercises both outcomes: acctbal/qty/price/
    shipdate rules catch real violations while pk/fk/domain rules pass —
    the report discriminates, it doesn't rubber-stamp.

    Scale shape (module docstring): predicate family = one map-combined
    pass per table; uniqueness = one pk shuffle; referential = anti joins;
    report assembly = |rules| rows of unions.  The two count frames per FK
    rule meet in a 1-row×1-row join (bounded, map-only)."""
    cust = t(spark, sf_dir, "customer")
    ordr = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    pred = _pred_rules(
        cust,
        [
            ("customer_acctbal_nonneg", F.col("c_acctbal") < 0),
            (
                "customer_segment_domain",
                F.col("c_mktsegment").isNull()
                | ~F.col("c_mktsegment").isin(*SEGMENTS),
            ),
        ],
    ).unionByName(
        _pred_rules(
            ordr,
            [
                ("orders_price_min_5k", F.col("o_totalprice") < 5000),
                (
                    "orders_status_domain",
                    F.col("o_orderstatus").isNull()
                    | ~F.col("o_orderstatus").isin("O", "F", "P"),
                ),
            ],
        )
    ).unionByName(
        _pred_rules(
            li,
            [
                ("lineitem_qty_le40", F.col("l_quantity") > 40),
                (
                    "lineitem_discount_range",
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.10),
                ),
                (
                    "lineitem_ship_deadline",
                    F.col("l_shipdate") > F.expr(f"TIMESTAMP_NTZ '{SHIP_DEADLINE}'"),
                ),
            ],
        )
    )
    pks = _pk_rule(cust, "c_custkey", "customer_pk_unique").unionByName(
        _pk_rule(ordr, "o_orderkey", "orders_pk_unique")
    )
    fks = _fk_rule(
        ordr, "o_custkey", cust, "c_custkey", "orders_fk_customer"
    ).unionByName(_fk_rule(li, "l_orderkey", ordr, "o_orderkey", "lineitem_fk_orders"))

    return (
        pred.unionByName(pks)
        .unionByName(fks)
        .select(
            "rule_id",
            F.col("n_checked").cast("bigint").alias("n_checked"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            # exact integer half-up to 4 dp — (n-v)/n lands on decimal
            # midpoints for round fixture sizes (the seed-2027 catch)
            (
                F.expr(
                    "((n_checked - n_violations) * 20000 + n_checked)"
                    " DIV (2 * n_checked)"
                ).cast("double")
                / 10000
            ).alias("pass_rate"),
        )
        .orderBy("rule_id")
    )


SKEW_TOP = 10

_SKEW_ORACLE = f"""
WITH kc AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
st AS (
  SELECT sum(n) AS total, avg(n) AS mean_n, count(*) AS n_keys FROM kc
)
SELECT kc.user_id, CAST(kc.n AS BIGINT) AS n,
       round(kc.n * 1.0 / st.total, 4) AS share,
       round(kc.n / st.mean_n, 4) AS skew_factor,
       CAST(st.n_keys AS BIGINT) AS n_keys
FROM kc CROSS JOIN st
ORDER BY kc.n DESC, kc.user_id
LIMIT {SKEW_TOP}
"""


@query("q_meta_skew_audit", oracle=_SKEW_ORACLE)
def q_meta_skew_audit(spark, sf_dir):
    """Hot-key skew audit over the events table's user_id — the
    measurement that decides WHETHER a join/aggregation needs salting
    (operators/skew.py) before anyone pays for it.  Reports the
    {SKEW_TOP} heaviest keys with absolute count, corpus share, and skew
    factor vs the mean key (skew_factor >> 1 on a key that also joins a
    large build side = the AQE-skew-join / salting trigger).

    Scale shape: ONE map-combined count per key (the same partial-agg
    shuffle any groupBy pays), a 1-row stats aggregate broadcast back,
    and a TakeOrderedAndProject top-{SKEW_TOP} — per-partition heads
    only, never a global sort of the key histogram."""
    kc = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    st = kc.agg(
        F.sum("n").alias("total"),
        F.avg("n").alias("mean_n"),
        F.count("*").alias("n_keys"),
    )
    return (
        kc.join(F.broadcast(st))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("total"), 4).alias("share"),
            F.round(F.col("n") / F.col("mean_n"), 4).alias("skew_factor"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(SKEW_TOP)
    )


@query(
    "q_dq_gap_hours",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events
    ),
    types AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL),
    spine AS (
      SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
      FROM types t CROSS JOIN bounds b
    ),
    present AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS h FROM events
      WHERE event_type IS NOT NULL
    ),
    miss AS (
      SELECT s.event_type, s.h FROM spine s
      WHERE NOT EXISTS (SELECT 1 FROM present p
                        WHERE p.event_type = s.event_type AND p.h = s.h)
    ),
    isl AS (
      SELECT event_type,
             epoch_us(h) // 3600000000
               - row_number() OVER (PARTITION BY event_type ORDER BY h) AS grp
      FROM miss
    ),
    runs AS (
      SELECT event_type, max(run) AS max_gap_hours
      FROM (SELECT event_type, grp, count(*) AS run FROM isl GROUP BY 1, 2)
      GROUP BY event_type
    ),
    stats AS (
      SELECT s.event_type, count(*) AS expected_hours,
             count(p.h) AS present_hours
      FROM spine s LEFT JOIN present p
        ON p.event_type = s.event_type AND p.h = s.h
      GROUP BY s.event_type
    )
    SELECT st.event_type,
           CAST(st.expected_hours AS BIGINT) AS expected_hours,
           CAST(st.present_hours AS BIGINT) AS present_hours,
           CAST(st.expected_hours - st.present_hours AS BIGINT) AS missing_hours,
           CAST(coalesce(r.max_gap_hours, 0) AS BIGINT) AS max_gap_hours
    FROM stats st LEFT JOIN runs r ON r.event_type = st.event_type
    ORDER BY st.event_type
    """,
)
def q_dq_gap_hours(spark, sf_dir):
    """Ingest-completeness audit: per event type, how many hourly cells of
    the observed time range are EMPTY, and the longest consecutive empty
    run — the 'did the producer stall' check a streaming ingest runs
    before publishing a partition (freshness/completeness sibling of
    q_dq_rules' content rules).

    Plan: the corpus collapses to the distinct (type, hour) cell set in
    one map-combined aggregate (the only data-sized pass); the hour spine
    is generated from the 1-row min/max bounds (sequence + explode, |hours|
    rows), the anti-join and the gaps-and-islands window (hour-index minus
    row_number, the q_evt_streaks trick, over integer microsecond hours)
    all run on |types| x |hours| rows — broadcast-sized whatever the data
    volume.  At 100 TB: same plan, the spine is still 5 x |hours| rows.

    Reference scope: the reference commits whatever the writer staged
    (tables.go:150-227, no content/freshness validation); this is the
    audit a production catalog pairs with that commit path."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    present = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    miss = spine.join(present, ["event_type", "h"], "left_anti")
    isl = miss.withColumn(
        "grp",
        (F.unix_micros("h") / F.lit(3600000000)).cast("long")
        - F.row_number().over(W.partitionBy("event_type").orderBy("h")),
    )
    runs = (
        isl.groupBy("event_type", "grp")
        .agg(F.count("*").alias("run"))
        .groupBy("event_type")
        .agg(F.max("run").alias("max_gap_hours"))
    )
    stats = (
        spine.join(present.withColumn("hit", F.lit(1)), ["event_type", "h"], "left")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("expected_hours"),
            F.count("hit").alias("present_hours"),
        )
    )
    return (
        stats.join(runs, "event_type", "left")
        .select(
            "event_type",
            F.col("expected_hours").cast("bigint").alias("expected_hours"),
            F.col("present_hours").cast("bigint").alias("present_hours"),
            (F.col("expected_hours") - F.col("present_hours"))
            .cast("bigint")
            .alias("missing_hours"),
            F.coalesce("max_gap_hours", F.lit(0)).cast("bigint").alias("max_gap_hours"),
        )
        .orderBy("event_type")
    )


@query(
    "q_dq_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    n AS (SELECT count(*) AS n FROM d)
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n_obs,
           round(count(*) * 1.0 / max(n.n), 4) AS obs_share,
           round(log10(1 + 1.0 / digit), 4) AS benford_share,
           round(abs(round(count(*) * 1.0 / max(n.n), 4)
                     - round(log10(1 + 1.0 / digit), 4)), 4) AS abs_dev
    FROM d, n GROUP BY digit ORDER BY digit
    """,
)
def q_dq_benford(spark, sf_dir):
    """Benford's-law first-digit audit of the order amounts — the classic
    fraud/synthetic-data screen: organically-grown monetary amounts
    follow P(d) = log10(1 + 1/d), and a generator (or a fraudster
    inventing invoices) that draws amounts uniformly shows up as a flat
    digit profile with large deviations (TPC-H's uniform totalprice is
    exactly such a generator, making the fixture a positive control).

    Determinism: the digit comes from exact integer string arithmetic
    (floor -> BIGINT -> first char), never log10-of-data; the nine
    Benford constants are log10 of small rationals whose 4-dp roundings
    sit >= 4e-6 from any midpoint, so a 1-ulp libm difference between
    engines cannot flip them, and abs_dev subtracts the two ROUNDED
    shares (multiples of 1e-4) so its own rounding is stable.

    Scale shape: one map-combined 9-group aggregate; output is always
    <= 9 rows.  Reference scope: no DQ surface in the reference facade
    (api/router/router.go:9-55); sibling of q_dq_rules."""
    d = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
    )
    from pyspark.sql import Window as W

    # total folded INTO the plan (r13 ADVICE): a whole-frame window over
    # the <=9-row aggregate, not a separate d.count() action — one scan
    # of orders per invocation instead of two, matching the oracle's
    # single-pass cross-join form.
    benford = F.log10(1 + 1.0 / F.col("digit"))
    obs = F.col("n_obs") * 1.0 / F.sum("n_obs").over(W.partitionBy())
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
        .select(
            "digit",
            "n_obs",
            F.round(obs, 4).alias("obs_share"),
            F.round(benford, 4).alias("benford_share"),
            F.round(F.abs(F.round(obs, 4) - F.round(benford, 4)), 4).alias(
                "abs_dev"
            ),
        )
        .orderBy("digit")
    )


@query(
    "q_dq_null_profile",
    oracle="""
    WITH t AS (
      SELECT count(*) AS n,
             count(event_id) AS c_event_id, count(ts) AS c_ts,
             count(user_id) AS c_user_id, count(event_type) AS c_event_type,
             count(value) AS c_value, count(props) AS c_props
      FROM events)
    SELECT col, CAST(n - c AS BIGINT) AS n_null,
           round((n - c) * 1.0 / n, 4) AS null_rate
    FROM t, LATERAL (VALUES
      ('event_id', c_event_id), ('event_type', c_event_type),
      ('props', c_props), ('ts', c_ts),
      ('user_id', c_user_id), ('value', c_value)) v(col, c)
    ORDER BY col
    """,
)
def q_dq_null_profile(spark, sf_dir):
    """Per-column NULL profile of the events table — the first DQ pass
    any ingest runs: one scan, one conditional count per column, a
    |columns|-row report.  The Spark side computes all counts in ONE
    map-combined aggregate row (count(col) skips NULLs, exactly the
    oracle's semantics) and unpivots the bounded 1-row result with
    stack() — the scan is single-pass no matter how many columns are
    profiled, which is the difference between one and N table scans at
    100 TB.

    Reference scope: no DQ surface in the reference facade
    (api/router/router.go:9-55); column-axis sibling of q_dq_rules (row
    rules) and q_meta_column_stats (catalog stats)."""
    cols = ["event_id", "event_type", "props", "ts", "user_id", "value"]
    ev = t(spark, sf_dir, "events")
    one = ev.agg(
        F.count("*").alias("n"),
        *[F.count(c).alias(f"c_{c}") for c in cols],
    )
    stack_args = ", ".join(f"'{c}', c_{c}" for c in cols)
    return (
        one.select(
            "n", F.expr(f"stack({len(cols)}, {stack_args}) AS (col, c)")
        )
        .select(
            "col",
            (F.col("n") - F.col("c")).alias("n_null"),
            F.round((F.col("n") - F.col("c")) * 1.0 / F.col("n"), 4).alias(
                "null_rate"
            ),
        )
        .orderBy("col")
    )


# (table, key columns) — the fixture's declared primary keys.  lineitem's
# composite (l_orderkey, l_linenumber) is DELIBERATELY not unique in the
# synthetic fixture (TESTDATA.md), so the audit is non-degenerate.
_PK_SPECS = (
    ("customer", ("c_custkey",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
    ("events", ("event_id",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("orders", ("o_orderkey",)),
    ("part", ("p_partkey",)),
    ("supplier", ("s_suppkey",)),
)


def _pk_oracle() -> str:
    arms = []
    for tbl, keys in _PK_SPECS:
        kcols = ", ".join(keys)
        arms.append(f"""
    SELECT '{tbl}.{"+".join(keys)}' AS pk,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(count(CASE WHEN c > 1 THEN 1 END) AS BIGINT) AS n_dup_keys,
           CAST(sum(c) - count(*) AS BIGINT) AS n_dup_rows
    FROM (SELECT count(*) AS c FROM {tbl} GROUP BY {kcols})""")
    return " UNION ALL ".join(arms) + " ORDER BY pk"


@query("q_dq_uniqueness", oracle=_pk_oracle())
def q_dq_uniqueness(spark, sf_dir):
    """PRIMARY-KEY uniqueness audit across every fixture table: per
    declared key, total rows, distinct keys, duplicated keys and excess
    rows — the constraint check a lakehouse runs because parquet tables
    enforce nothing (the reference catalog stores schemas but no
    constraints either — internal/catalog/tables.go).  The synthetic
    lineitem's composite key is KNOWN non-unique (TESTDATA.md), so the
    audit demonstrably catches a real violation rather than printing
    eight zeros.

    Scale shape: per table ONE map-combined count over the key columns
    only (column-pruned scan — key bytes travel, never rows), then a
    4-value rollup of the |keys|-row frame; the eight audits are
    independent unioned aggregates.  Output is always |tables| rows.

    Reference scope: no DQ surface in the reference facade
    (api/router/router.go:9-55); constraint sibling of q_dq_rules."""
    arms = []
    for tbl, keys in _PK_SPECS:
        c = (
            t(spark, sf_dir, tbl)
            .groupBy(*[F.col(k) for k in keys])
            .agg(F.count("*").alias("c"))
        )
        arms.append(
            c.agg(
                F.lit(f"{tbl}.{'+'.join(keys)}").alias("pk"),
                F.sum("c").cast("long").alias("n_rows"),
                F.count("*").cast("long").alias("n_keys"),
                F.count(F.when(F.col("c") > 1, 1))
                .cast("long")
                .alias("n_dup_keys"),
                (F.sum("c") - F.count("*")).cast("long").alias("n_dup_rows"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("pk")


# (name, child table, child key, parent table, parent key) — the fixture's
# foreign-key edges.  Orphans (child rows without a parent) are the
# integrity direction; childless parents are the COVERAGE direction —
# TPC-H guarantees ~1/3 of customers never ordered, so the audit is
# non-degenerate on clean data.
_FK_SPECS = (
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("embeddings->documents", "embeddings", "vec_id", "documents", "doc_id"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
)


def _fk_oracle() -> str:
    arms = []
    for name, ct, ck, pt, pk in _FK_SPECS:
        arms.append(f"""
    SELECT '{name}' AS fk,
           (SELECT CAST(count({ck}) AS BIGINT) FROM {ct}) AS n_child,
           (SELECT CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT {ck} AS k FROM {ct} WHERE {ck} IS NOT NULL) c
            LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {pt}) p USING (k)
            WHERE p.k IS NULL) AS n_orphan_keys,
           (SELECT CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT {pk} AS k FROM {pt}) p
            LEFT JOIN (SELECT DISTINCT {ck} AS k FROM {ct}) c USING (k)
            WHERE c.k IS NULL) AS n_childless_parents""")
    return " UNION ALL ".join(arms) + " ORDER BY fk"


@query("q_dq_referential", oracle=_fk_oracle())
def q_dq_referential(spark, sf_dir):
    """REFERENTIAL-integrity audit over the fixture's FK graph: per edge,
    the non-null child references, the ORPHAN keys (child references with
    no parent — broken integrity) and the CHILDLESS parents (coverage —
    TPC-H guarantees ~1/3 of customers never ordered, so the column is
    live on clean data).  The audit a lakehouse runs before trusting a
    join, because parquet enforces no FKs (and neither does the reference
    catalog's metadata model).

    Scale shape (tightened in the r15 drift adjudication, BASELINE.md):
    per edge, ONE child scan collapses map-side to per-key counts (so
    n_child = sum(c) and the orphan direction share the scan), the parent
    collapses to its distinct keys, and a single FULL OUTER join on the
    key answers all three columns in one aggregate — orphans are child
    keys with no parent row, childless parents are parent keys with no
    child count.  No anti-join pair, no 1-row assembly joins; child and
    parent ROWS never shuffle (keys only), output is always |edges| rows.

    Reference scope: no DQ surface in the reference facade
    (api/router/router.go:9-55); integrity sibling of q_dq_uniqueness."""
    arms = []
    for name, ct, ck, pt, pk in _FK_SPECS:
        ckc = (
            t(spark, sf_dir, ct)
            .filter(F.col(ck).isNotNull())
            .groupBy(F.col(ck).alias("k"))
            .agg(F.count("*").alias("c"))
        )
        pkeys = (
            t(spark, sf_dir, pt)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("p", F.lit(1))
        )
        arms.append(
            ckc.join(pkeys, "k", "full_outer").agg(
                F.lit(name).alias("fk"),
                F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_child"),
                F.count(F.when(F.col("c").isNotNull() & F.col("p").isNull(), 1))
                .cast("long")
                .alias("n_orphan_keys"),
                F.count(F.when(F.col("c").isNull(), 1))
                .cast("long")
                .alias("n_childless_parents"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("fk")


FRESH_SLA_HOURS = 24  # staleness SLA for the freshness ledger


@query(
    "q_dq_freshness",
    oracle=f"""
    WITH w AS (SELECT max(ts) AS wm FROM events),
    per AS (
      SELECT event_type, max(ts) AS last_ts, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IS NOT NULL GROUP BY event_type)
    SELECT event_type, n,
           CAST(CAST(last_ts AS TIMESTAMP) AS VARCHAR) AS last_event,
           -- elapsed whole hours from TRUNCATED epoch seconds: DuckDB's
           -- datediff('hour') counts hour-BOUNDARY crossings (10:59 ->
           -- 11:01 = 1), which diverges from elapsed time — caught by
           -- the perturbed-fixture check at birth
           (CAST(floor(epoch(wm)) AS BIGINT)
            - CAST(floor(epoch(last_ts)) AS BIGINT)) // 3600 AS lag_hours,
           CAST((CAST(floor(epoch(wm)) AS BIGINT)
                 - CAST(floor(epoch(last_ts)) AS BIGINT)) // 3600
                >= {FRESH_SLA_HOURS} AS INTEGER) AS stale
    FROM per CROSS JOIN w ORDER BY event_type
    """,
)
def q_dq_freshness(spark, sf_dir):
    """Per-stream FRESHNESS ledger: each event type's last event time,
    its lag in whole hours behind the corpus watermark (max ts over all
    types), and a stale flag at the {FRESH_SLA_HOURS} h SLA — the audit
    a lakehouse runs before trusting "today's" dashboard, because a
    silently stalled producer looks exactly like a quiet day
    (q_stream_late_audit's docstring has referenced this batch sibling
    since r14; it now exists).

    Scale shape: one map-combined per-type (max, count) aggregate
    (|types| rows) + a 1-row watermark broadcast (the q_tpch_q22
    scalar-distribution shape).  Lag is an exact integer hour
    difference — no float path at all.

    Reference scope: no DQ surface in the reference facade
    (api/router/router.go:9-55); temporal sibling of q_dq_gap_hours
    (intra-stream gaps) and the streaming late-data ledger."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    w = ev.agg(F.max("ts").alias("wm"))
    per = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.max("ts").alias("last_ts"), F.count("*").cast("long").alias("n"))
    )
    lag = F.floor(
        (F.unix_timestamp("wm") - F.unix_timestamp("last_ts")) / 3600
    ).cast("long")
    return (
        per.crossJoin(F.broadcast(w))
        .select(
            "event_type",
            "n",
            F.col("last_ts").cast("string").alias("last_event"),
            lag.alias("lag_hours"),
            (lag >= FRESH_SLA_HOURS).cast("int").alias("stale"),
        )
        .orderBy("event_type")
    )


# -- IQR-fence outlier audit (r16) --------------------------------------------


@query(
    "q_dq_anomaly_iqr",
    oracle="""
    WITH v AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL),
    r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    q AS (
      SELECT event_type, max(n) AS n,
             max(CASE WHEN rk = (n + 3) // 4 THEN value END) AS q1,
             max(CASE WHEN rk = (3 * n + 3) // 4 THEN value END) AS q3
      FROM r GROUP BY event_type),
    o AS (
      SELECT v.event_type,
             count(*) FILTER (
               v.value < q.q1 - 1.5 * (q.q3 - q.q1)
               OR v.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS n_out
      FROM v JOIN q USING (event_type) GROUP BY v.event_type)
    SELECT q.event_type, CAST(q.n AS BIGINT) AS n_values,
           round(q.q1, 4) AS q1, round(q.q3, 4) AS q3,
           round(q.q3 - q.q1, 4) AS iqr,
           CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_outliers
    FROM q LEFT JOIN o USING (event_type)
    ORDER BY event_type
    """,
)
def q_dq_anomaly_iqr(spark, sf_dir):
    """IQR-FENCE outlier audit of events.value per event type — the
    Tukey boxplot rule (outlier := outside [q1 - 1.5·IQR, q3 + 1.5·IQR])
    as a data-quality gate: a type whose outlier count jumps between
    loads signals an instrumentation change or corrupt batch.

    Determinism: quartiles are EXACT-RANK order statistics (the value at
    row ceil(n/4) / ceil(3n/4) of the sorted column — type-1 quantiles),
    never interpolated percentiles, whose interpolation rules differ
    across engines; the value at rank k is unique regardless of tie
    permutation, the fence arithmetic is the same IEEE expression on
    both engines, and the outlier comparison is raw-double against that
    bit-identical fence.

    Scale shape: one partitioned sort per event type (the quantile
    shuffle), a |types|-row quartile frame, one broadcast-back join for
    the fence count.  At extreme cardinality swap the exact rank for
    approx_percentile over the same partitioning — the audit's framing
    columns stay identical.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); distribution sibling of q_dq_rules and
    q_ts_anomaly_mad (operators/events.py)."""
    from pyspark.sql import Window as W

    v = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "value")
    )
    pw = W.partitionBy("event_type")
    r = v.select(
        "event_type",
        "value",
        F.row_number().over(pw.orderBy("value")).alias("rk"),
        F.count("*").over(pw).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rk") == F.expr("(n + 3) div 4"), F.col("value"))
        ).alias("q1"),
        F.max(
            F.when(F.col("rk") == F.expr("(3 * n + 3) div 4"), F.col("value"))
        ).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    o = (
        v.join(q, "event_type")
        .filter((F.col("value") < lo) | (F.col("value") > hi))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_out"))
    )
    return (
        q.join(o, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_values"),
            F.round("q1", 4).alias("q1"),
            F.round("q3", 4).alias("q3"),
            F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# -- per-column profile drift between time halves (r16 wave 3) ----------------

DRIFT_SPLIT_DAY = 15  # first half: day-of-month <= 15


def _drift_arm(col: str) -> str:
    return f"""
      SELECT '{col}' AS column_name,
             count(*) FILTER (day(ts) <= {DRIFT_SPLIT_DAY}) AS n_a,
             count(*) FILTER (day(ts) > {DRIFT_SPLIT_DAY}) AS n_b,
             count(*) FILTER (day(ts) <= {DRIFT_SPLIT_DAY}
                              AND {col} IS NULL) AS null_a,
             count(*) FILTER (day(ts) > {DRIFT_SPLIT_DAY}
                              AND {col} IS NULL) AS null_b,
             count(DISTINCT {col})
               FILTER (day(ts) <= {DRIFT_SPLIT_DAY}) AS nd_a,
             count(DISTINCT {col})
               FILTER (day(ts) > {DRIFT_SPLIT_DAY}) AS nd_b
      FROM events"""


@query(
    "q_dq_schema_drift",
    oracle=f"""
    WITH arms AS ({" UNION ALL ".join(_drift_arm(c) for c in ("event_type", "user_id", "value", "props"))}),
    rates AS (
      SELECT column_name, n_a, n_b, null_a, null_b, nd_a, nd_b,
             (null_a * 20000 + n_a) // (2 * n_a) AS ra_i,
             (null_b * 20000 + n_b) // (2 * n_b) AS rb_i
      FROM arms)
    SELECT column_name,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ra_i / 10000.0 AS null_rate_a,
           rb_i / 10000.0 AS null_rate_b,
           (ra_i - rb_i) / 10000.0 AS null_rate_delta,
           CAST(nd_a AS BIGINT) AS n_distinct_a,
           CAST(nd_b AS BIGINT) AS n_distinct_b
    FROM rates ORDER BY column_name
    """,
)
def q_dq_schema_drift(spark, sf_dir):
    """PER-COLUMN PROFILE DRIFT between the two halves of the event
    window (day-of-month <= {DRIFT_SPLIT_DAY} vs after): row volume,
    null rate, and distinct cardinality per audited column — the
    schema-level companion of q_evt_drift_ks (which watches the VALUE
    distribution): a null-rate jump or cardinality collapse between
    loads is the classic silent instrumentation break that value-level
    tests miss.

    EXACT arithmetic throughout: counts are longs; null rates use the
    pure-LONG half-up form ((n*20000 + d) DIV 2d)/1e4 and the DELTA is
    the difference of those INTEGER quantizations re-scaled — no float
    subtraction anywhere near a rounding boundary.

    Scale shape: one map-combined pass per audited column arm (the
    distinct counts are the only shuffle — swap to approx_count_distinct
    at extreme cardinality, the documented q_agg_approx_distinct
    precedent); output is |columns| rows.

    Reference scope: no analytics surface in the reference facade
    (api/router/router.go:9-55); drift sibling of q_evt_drift_ks and
    q_dq_null_profile."""
    ev = t(spark, sf_dir, "events")
    half_a = F.dayofmonth("ts") <= DRIFT_SPLIT_DAY
    arms = []
    for c in ("event_type", "user_id", "value", "props"):
        arms.append(
            ev.agg(
                F.lit(c).alias("column_name"),
                F.count(F.when(half_a, 1)).alias("n_a"),
                F.count(F.when(~half_a, 1)).alias("n_b"),
                F.count(F.when(half_a & F.col(c).isNull(), 1)).alias("null_a"),
                F.count(F.when(~half_a & F.col(c).isNull(), 1)).alias("null_b"),
                F.count_distinct(F.when(half_a, F.col(c))).alias("nd_a"),
                F.count_distinct(F.when(~half_a, F.col(c))).alias("nd_b"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    ra = F.expr("(null_a * 20000 + n_a) div (2 * n_a)")
    rb = F.expr("(null_b * 20000 + n_b) div (2 * n_b)")
    return (
        out.select(
            "column_name",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (ra.cast("double") / 10000.0).alias("null_rate_a"),
            (rb.cast("double") / 10000.0).alias("null_rate_b"),
            ((ra - rb).cast("double") / 10000.0).alias("null_rate_delta"),
            F.col("nd_a").cast("long").alias("n_distinct_a"),
            F.col("nd_b").cast("long").alias("n_distinct_b"),
        )
        .orderBy("column_name")
    )
