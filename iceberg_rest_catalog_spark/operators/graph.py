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
