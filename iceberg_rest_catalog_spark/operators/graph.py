"""Iterative graph analytics over the event log.

Connected components already exists as the dedup clustering step
(llm/dedup.py q_dedup_cluster); this module adds the other canonical
iterative graph workload — PageRank — over the event-TRANSITION graph
(nodes = event types, an edge u->v weighted by how often a user's next
event after u is v). Product analytics uses exactly this shape for
next-action modeling and Markov-chain attribution.

Scale shape: the expensive part is building the edge list — one window
(lead) over the partitioning key plus one aggregate, both sharing the
user_id/edge-key shuffle. The power iteration itself joins the rank vector
against the edge list k times; here the graph is |event_types| nodes, but
the SAME loop runs with a billion-node edge table: ranks and edges both
shuffle on the join key, the per-iteration aggregate is map-side combined,
and localCheckpoint truncates the growing lineage each round (the
q_dedup_cluster pattern). The node set is DISTINCT event_type from the
events themselves (not edges.src), so a sink node — one with inbound
transitions but none outbound — still holds rank; its outflow leaks, the
classic dangling-mass approximation, identically on both engines because
the oracle computes the same unrolled recurrence over the same node set.

Unlike q_dedup_cluster (rows-only by design), the fixed iteration count
makes this one fully oracle-checkable: the DuckDB oracle UNROLLS the ten
power-iteration steps as chained CTEs generated at import time — iterative
Spark loop vs closed-form SQL recurrence, hash-compared.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from .common import t

ITERS = 10
DAMPING = 0.85


def _pagerank_oracle(iters: int) -> str:
    """Unrolled power iteration: pr0..pr{iters} as chained CTEs."""
    ctes = [
        """nodes AS (SELECT DISTINCT event_type AS node FROM events),
    n AS (SELECT count(*) AS c FROM nodes),
    nxt AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    ecnt AS (
      SELECT src, dst, count(*) AS cnt FROM nxt
      WHERE dst IS NOT NULL GROUP BY src, dst),
    edges AS (
      SELECT src, dst, cnt * 1.0 / sum(cnt) OVER (PARTITION BY src) AS p
      FROM ecnt),
    pr0 AS (SELECT node, 1.0 / (SELECT c FROM n) AS rank FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pr{k} AS (
      SELECT nodes.node,
             0.15 / (SELECT c FROM n)
             + 0.85 * coalesce(sum(p.rank * e.p), 0.0) AS rank
      FROM nodes
      LEFT JOIN edges e ON e.dst = nodes.node
      LEFT JOIN pr{k - 1} p ON p.node = e.src
      GROUP BY nodes.node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, round(rank, 6) AS rank FROM pr{iters}"
    )


def _pagerank(ev):
    """Core PageRank over an events DataFrame (user_id, event_type, ts,
    event_id). Extracted so unit tests can run it on a hand-built graph
    (e.g. one containing a sink node) without parquet fixtures."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst")
    ).filter(F.col("dst").isNotNull())
    ecnt = nxt.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    # transition probability: per-src normalization (window, not a join —
    # ecnt is |types|^2 rows here, |distinct edges| at scale; either way
    # one shuffle keyed on src)
    edges = ecnt.select(
        "src",
        "dst",
        (F.col("cnt") * 1.0 / F.sum("cnt").over(Window.partitionBy("src"))).alias("p"),
    ).localCheckpoint()  # edge build runs ONCE, not once per iteration
    # Node set comes from the EVENTS, not from edges.src: a sink node (only
    # ever a dst, no out-transitions) must still hold rank, matching the
    # oracle's `SELECT DISTINCT event_type FROM events`.
    nodes = ev.select(F.col("event_type").alias("node")).distinct().localCheckpoint()
    ncnt = nodes.agg(F.count("*").alias("c"))
    ranks = nodes.join(F.broadcast(ncnt)).select(
        "node", (F.lit(1.0) / F.col("c")).alias("rank")
    )
    for it in range(ITERS):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
            .groupBy(F.col("dst").alias("cnode"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == F.col("cnode"), "left")
            .join(F.broadcast(ncnt))
            .select(
                "node",
                (
                    F.lit(0.15) / F.col("c")
                    + F.lit(0.85) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # Truncate lineage every 2nd round (and on the last): a 2-deep
        # join chain re-plans fine, and halving the checkpoint count saves
        # one full rank-vector materialization per round at scale (local
        # wall-clock is scheduling-bound on the tiny type graph and
        # unchanged).
        if it % 2 == 1 or it == ITERS - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query("q_graph_pagerank", oracle=_pagerank_oracle(ITERS))
def q_graph_pagerank(spark, sf_dir):
    """Weighted PageRank (d=0.85, 10 iterations) over the event-transition
    graph: edge u->v with probability = share of u-events whose same-user
    successor is v. Returns (node, rank) rounded to 6 dp."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return _pagerank(ev)


@query(
    "q_graph_triangles",
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
      FROM sess GROUP BY user_id, sid),
    e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM s a JOIN s b
        ON a.user_id < b.user_id
       AND a.s_start <= b.s_end AND b.s_start <= a.s_end),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
           round((SELECT count(*) FROM tri) * 1.0 /
                 nullif((SELECT count(*)
                         FROM e e1 JOIN e e2 ON e2.u = e1.v), 0), 4)
             AS closure_rate
    """,
)
def q_graph_triangles(spark, sf_dir):
    """Triangle count + global clustering (transitivity) of the user
    co-presence graph — the cohesion metric behind community/bot-ring
    detection (bot swarms show near-complete triangles; drive-by overlap
    shows almost none). Edges = session-overlapping user pairs (the
    q_join_interval_overlap relation, deduplicated).

    The algorithm is the node-ORDERED wedge join: with every edge stored
    u < v, each wedge a<b<c is generated once (e(a,b) ⋈ e(b,c)) and
    closed against e(a,c) — each triangle counted exactly once, no /6
    correction, no symmetric-edge blowup. At 100 TB-scale graphs the
    same join ordered by DEGREE instead of id bounds wedge counts by
    arboricity (the classic optimization; id-order keeps the oracle
    portable here). closure_rate = triangles / ORDERED wedges — with
    id-ordered edges each triangle closes exactly one ordered wedge
    (a<b, b<c), so the ratio is already the wedge-closure probability;
    the unordered transitivity formula's x3 does not apply.

    Edge construction REUSES q_join_interval_overlap's bucket-quantized
    interval join (its output rows ARE the distinct overlapping pairs) —
    the naive theta self-join over sessions is exactly the
    BroadcastNestedLoopJoin that operator exists to avoid."""
    from .joins import q_join_interval_overlap

    edges = q_join_interval_overlap(spark, sf_dir).select(
        F.col("u1").alias("u"), F.col("u2").alias("v")
    )
    edges = edges.localCheckpoint()  # bound lineage: 3 self-join arms
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"])
    # One ACTION for all three counts: tag each relation, union the per-tag
    # aggregates, and pivot to a single row — the checkpointed edge list is
    # the only materialized input, and the whole summary is one job when the
    # caller collects (was: three separate .count() jobs).
    counts = (
        edges.agg(F.count(F.lit(1)).alias("n")).select(F.lit("e").alias("k"), "n")
        .unionByName(
            wedges.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("w").alias("k"), "n"
            )
        )
        .unionByName(
            tri.agg(F.count(F.lit(1)).alias("n")).select(F.lit("t").alias("k"), "n")
        )
    )
    n_w = F.max(F.when(F.col("k") == "w", F.col("n")))
    n_t = F.max(F.when(F.col("k") == "t", F.col("n")))
    return counts.agg(
        F.max(F.when(F.col("k") == "e", F.col("n"))).alias("n_edges"),
        n_t.alias("n_triangles"),
        F.round(n_t * 1.0 / F.when(n_w != 0, n_w), 4).alias("closure_rate"),
    )
