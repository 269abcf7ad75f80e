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


# Dense-path ceiling: above this the n^2/8-byte adjacency matrix stops
# being "tiny" (100k nodes = 1.25 GB) — and a graph THAT wide can only be
# storable if it is sparse, which is the wedge join's regime.
_DENSE_MAX_NODES = 100_000


def _triangles_dense(spark, ei, n):
    """Exact triangle count for dense graphs via adjacency bitsets.

    Takes the already-materialized INT-indexed edge list (ui < vi). Builds
    the packed n x ceil(n/64) adjacency matrix with ONE codegen'd bit_or
    aggregate (rows = (node, word, bits), the q_join_bloom_prune one-hot
    pattern), collects it (n^2/8 bytes — 280 KB at n=1500, 28 MB at
    n=15000, gated by _DENSE_MAX_NODES), and probes it from a mapInPandas
    pass over the EDGE list: for edge (u, v) with u < v, popcount(B[u] &
    B[v] & mask(index > v)) is the number of triangles whose id-minimal
    edge is (u, v) — each triangle counted exactly once. Returns a 1-row
    (n) DataFrame; the probe stays fully distributed and touches
    O(|edges| * n/64) vectorized words, never wedge rows."""
    import numpy as np

    n_words = (n + 63) // 64
    adj = ei.unionAll(ei.select(F.col("vi").alias("ui"), F.col("ui").alias("vi")))
    words = (
        # Cluster by node BEFORE the aggregate: raw edge order is random, so
        # a straight partial agg builds a near-complete n*n/64-group hash
        # table in EVERY task (OOM'd the decade step at 224M adjacency rows
        # x 32 tasks); after the ui shuffle each task holds one node range
        # and its table is n_words * (n / parallelism) entries.
        adj.repartition("ui")
        .select(
            "ui",
            F.expr("CAST(vi DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(vi % 64 AS INT))").alias("bit"),
        )
        .groupBy("ui", "word")
        .agg(F.bit_or("bit").alias("bits"))
        # driver-side bound: <= n * n/64 rows = n^2/8 bytes of bitmap,
        # small by the density gate above; Arrow toPandas, not collect() —
        # 3.5M JVM Row objects at n=15000 were half the driver-heap story
        .toPandas()
    )
    B = np.zeros((n, n_words), dtype=np.uint64)
    B[words["ui"].to_numpy(), words["word"].to_numpy()] = (
        words["bits"].to_numpy(np.int64).astype(np.uint64)
    )
    # masks[v] keeps only neighbor indices STRICTLY ABOVE v
    masks = np.zeros((n, n_words), dtype=np.uint64)
    for v in range(n):
        w, b = divmod(v + 1, 64)
        if w < n_words:
            masks[v, w] = np.uint64((~0) << b & 0xFFFFFFFFFFFFFFFF)
            masks[v, w + 1:] = np.uint64(0xFFFFFFFFFFFFFFFF)
    popcnt = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint64)

    def count_batches(batches):
        import pandas as pd

        for pdf in batches:
            ui = pdf["ui"].to_numpy()
            vi = pdf["vi"].to_numpy()
            inter = B[ui] & B[vi] & masks[vi]
            total = int(popcnt[inter.view(np.uint8)].sum())
            yield pd.DataFrame({"n": [total]})

    partial = ei.mapInPandas(count_batches, "n long")
    return partial.agg(F.sum("n").alias("n"))


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

    Counting strategy is DENSITY-AWARE — the co-presence relation is the
    canonical dense graph (a 30-day window makes almost every active-user
    pair overlap; at sf0.1 the graph is 1500 nodes at mean degree 1494,
    i.e. 99.6% complete, where an id- or even degree-ordered wedge join
    materializes 5.6e8 rows for a one-row answer):

    - ORDERED WEDGES are never materialized: with every edge stored u < v,
      the wedge count is the aggregate sum over b of indeg(b)*outdeg(b) —
      one self-join of two |nodes|-row degree frames, not an edge⋈edge.
    - TRIANGLES use per-node adjacency BITSETS: n*n/8 bytes is SMALL
      exactly when the wedge join is pathological (dense ⇒ n is bounded
      by the edge count's square root). Bit rows build as a codegen'd
      bit_or aggregate (the q_join_bloom_prune pattern), the packed
      matrix ships to executors in the task closure, and a mapInPandas
      pass over the EDGES — never the wedges — popcounts
      ``B[u] & B[v] & mask(id > v)``, counting each triangle once at its
      id-minimal edge. 1.1M edges cost ~17 MB of Arrow and vectorized
      numpy AND/LUT-popcount, vs 5.6e8 shuffled wedge rows.
    - On SPARSE graphs (node count above _DENSE_MAX_NODES, where n^2/8
      would not fit but wedge counts are arboricity-bounded) the classic
      ordered wedge join takes over — same counts, opposite density
      regime. Both paths close each triangle exactly once, so the DuckDB
      oracle (plain wedge join) is identical for either.

    closure_rate = triangles / ORDERED wedges — with id-ordered edges
    each triangle closes exactly one ordered wedge (a<b, b<c), so the
    ratio is already the wedge-closure probability; the unordered
    transitivity formula's x3 does not apply.

    Edge construction REUSES q_join_interval_overlap's bucket-quantized
    interval join (its output rows ARE the distinct overlapping pairs) —
    the naive theta self-join over sessions is exactly the
    BroadcastNestedLoopJoin that operator exists to avoid."""
    from pyspark import StorageLevel

    from .joins import q_join_interval_overlap

    # Stage the raw (long, long) pair relation DISK_ONLY: it is consumed
    # exactly twice (node collect, int re-index) and then dropped. Caching
    # it deserialized on-heap next to the int edge list held the working
    # set at 2x |edges| rows and OOM'd the 16 GB JVM at the x10 decade
    # step (112M pairs); disk staging costs one sequential re-read and
    # frees the heap for the shuffles that actually need it.
    edges = (
        q_join_interval_overlap(spark, sf_dir)
        .select(F.col("u1").alias("u"), F.col("u2").alias("v"))
        .persist(StorageLevel.DISK_ONLY)
    )
    nodes = [
        r.x
        # driver-side bound: |nodes| ids — the dense path exists only
        # while n^2/8 bytes is small, so n is inherently bounded here
        for r in edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .distinct()
        .collect()
    ]
    n = len(nodes)
    # Re-index node ids to dense ints ONCE and make that the only resident
    # edge representation (~16 B/row vs the long-pair original): degrees,
    # edge count, and both triangle paths all read it. Rank-in-sorted-order
    # is monotone, so ui < vi still holds for every stored edge.
    order = {node: i for i, node in enumerate(sorted(nodes))}
    idx_df = spark.createDataFrame(
        [(node, i) for node, i in order.items()], "node long, idx int"
    )
    ei = (
        edges.join(F.broadcast(idx_df.withColumnRenamed("node", "u")), "u")
        .withColumnRenamed("idx", "ui")
        .join(F.broadcast(idx_df.withColumnRenamed("node", "v")), "v")
        .withColumnRenamed("idx", "vi")
        .select("ui", "vi")
    ).localCheckpoint()  # the single materialization every arm reads
    edges.unpersist()

    # Ordered-wedge count as an aggregate: sum_b indeg(b)*outdeg(b).
    indeg = ei.groupBy(F.col("vi").alias("x")).agg(F.count("*").alias("ind"))
    outdeg = ei.groupBy(F.col("ui").alias("x")).agg(F.count("*").alias("outd"))
    wedge_cnt = indeg.join(outdeg, "x").agg(
        F.sum(F.col("ind") * F.col("outd")).alias("n")
    )

    if n <= _DENSE_MAX_NODES:
        tri_cnt = _triangles_dense(spark, ei, n)
    else:
        e1 = ei.select(F.col("ui").alias("a"), F.col("vi").alias("b"))
        e2 = ei.select(F.col("ui").alias("b"), F.col("vi").alias("c"))
        e3 = ei.select(F.col("ui").alias("a"), F.col("vi").alias("c"))
        tri_cnt = e1.join(e2, "b").join(e3, ["a", "c"]).agg(
            F.count(F.lit(1)).alias("n")
        )

    # One ACTION for all three counts when the caller collects: tag each
    # 1-row aggregate, union, pivot to a single row.
    counts = (
        ei.agg(F.count(F.lit(1)).alias("n")).select(F.lit("e").alias("k"), "n")
        .unionByName(wedge_cnt.select(F.lit("w").alias("k"), "n"))
        .unionByName(tri_cnt.select(F.lit("t").alias("k"), "n"))
    )
    n_w = F.max(F.when(F.col("k") == "w", F.col("n")))
    n_t = F.max(F.when(F.col("k") == "t", F.col("n")))
    return counts.agg(
        F.max(F.when(F.col("k") == "e", F.col("n"))).alias("n_edges"),
        n_t.alias("n_triangles"),
        F.round(n_t * 1.0 / F.when(n_w != 0, n_w), 4).alias("closure_rate"),
    )


# -- connected components ----------------------------------------------------

CC_ITERS = 8


def _cc_oracle(iters: int) -> str:
    """Unrolled min-label propagation: lbl0..lbl{iters} as chained CTEs."""
    ctes = [
        """nxt AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    de AS (
      SELECT DISTINCT src AS u, dst AS v FROM nxt
      WHERE dst IS NOT NULL AND src <> dst),
    edges AS (SELECT u, v FROM de UNION SELECT v AS u, u AS v FROM de),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    lbl0 AS (SELECT node, node AS lbl FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""lbl{k} AS (
      SELECT n.node, least(p.lbl, coalesce(min(q.lbl), p.lbl)) AS lbl
      FROM nodes n
      JOIN lbl{k - 1} p ON p.node = n.node
      LEFT JOIN edges e ON e.u = n.node
      LEFT JOIN lbl{k - 1} q ON q.node = e.v
      GROUP BY n.node, p.lbl)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, lbl AS component FROM lbl{iters}"
    )


@query("q_graph_cc", oracle=_cc_oracle(CC_ITERS))
def q_graph_cc(spark, sf_dir):
    """Connected components of the undirected event-transition graph by
    min-label propagation ({CC_ITERS} fixed rounds): every node starts
    labeled with itself; each round it takes the minimum of its own label
    and its neighbors' — after k rounds a node holds the smallest id within
    k hops, so components whose diameter fits in the budget are exact.
    Returns (node, component).

    The FIXED round count is what makes this value-checkable (the DuckDB
    oracle unrolls the identical recurrence as chained CTEs, the
    q_graph_pagerank trick) — unlike q_dedup_cluster's converge-until-done
    loop, which is rows-only by design. Same loop discipline as PageRank:
    neighbor-min is one join keyed on the edge's far end plus one
    map-combined min-agg keyed on the near end, and localCheckpoint every
    second round truncates lineage so round k re-plans a 2-deep chain, not
    a k-deep one. At billion-edge scale the round budget is the known
    weakness of plain propagation (rounds ~ graph diameter); the
    production swap is alternating large-star/small-star (O(log n) rounds,
    same per-round join+agg shape), at the cost of the closed-form oracle.

    Reference scope: the reference (Go REST facade) has no graph ops;
    this extends the engine's analytics family alongside q_graph_pagerank.
    """
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    de = (
        ev.select(
            F.col("event_type").alias("u"),
            F.lead("event_type").over(w).alias("v"),
        )
        .filter(F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )
    edges = (
        de.unionAll(de.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()  # edge build runs ONCE, not once per round
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    lbl = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint()
    for it in range(CC_ITERS):
        nbr_min = (
            edges.join(lbl, edges.v == lbl.node)
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        lbl = (
            lbl.join(nbr_min, lbl.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
            )
        )
        if it % 2 == 1 or it == CC_ITERS - 1:
            lbl = lbl.localCheckpoint()
    return lbl.select("node", F.col("lbl").alias("component"))
