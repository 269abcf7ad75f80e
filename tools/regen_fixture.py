"""Fixture-regeneration dry run: same-schema synthetic tables at a NEW seed.

TESTDATA.md's fixture-regeneration checklist names three oracle twins whose
Spark/DuckDB agreement is FIXTURE-SENSITIVE (q_graph_cc convergence within
CC_ITERS, q_sim_mmr rounded-argmax ties, q_fn_math dtype pins) and claims
its guards catch a regeneration before the driver surfaces an opaque hash
mismatch. This tool PROVES that claim by actually doing the regeneration:

1. synthesize all ten tables with the driver fixture's schemas and value
   shapes (dtypes, category sets, ranges, sortedness, the events
   TIMESTAMP(NANOS) physical type) but a different RNG seed — the exact
   event no repo control prevents;
2. run the checklist guards against the new fixture:
   - q_graph_cc: measure min-label rounds-to-convergence of the regenerated
     event graph (the logic of
     tests/test_llm_quality.py::test_event_graph_min_label_margin_within_cc_iters);
   - q_sim_mmr: audit 4-dp rounded relevance-score argmax ties among the
     first-pick candidates (the precondition the MMR twin tests pin);
   - q_fn_math (+ everything else): the full dtype-strict t2 gate,
     ``CHECK_SF_DIR=<out> python tools/check_queries.py``;
3. print a verdict per guard so the outcome can be recorded in TESTDATA.md.

The generator mimics shape, not values: distributions were read off the
driver fixture (31-word document vocab, exponential event values, weak
label-centroid embedding structure, Poisson ~4 lineitems/order, sorted
nano-timestamped events) so the regenerated data stresses the same code
paths at the same densities.

Usage: python tools/regen_fixture.py [--seed 777] [--sf 0.01] [--out DIR]
       [--check]   # also run the full t2 gate (slow)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PART_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PART_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_W = [0.4, 0.15, 0.15, 0.15, 0.15]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(out: str, seed: int, sf: float) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = max(1, int(150_000 * sf))
    n_supp = max(1, int(10_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_ord = max(1, int(1_500_000 * sf))
    n_li = max(1, int(6_000_000 * sf))
    n_evt = max(1, int(1_000_000 * sf))
    n_users = max(2, int(15_000 * sf))
    n_doc = 500
    n_vec = 500

    def w(name, table):
        pq.write_table(table, f"{out}/{name}.parquet", version="2.6")

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, -1000, 10000, n_cust),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, -1000, 10000, n_supp),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PART_ADJ[a]} {PART_NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(PART_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + np.arange(n_part) / 10, 1),
    }))
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    span = (np.datetime64("2001-08-02", "us").astype(np.int64) - d0) // DAY_US
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, 1000, 500000, n_ord),
        "o_orderdate": pa.array(
            d0 + rng.integers(0, span, n_ord) * DAY_US, pa.timestamp("us")
        ),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    w("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, 1000, 100000, n_li),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100, 2),
        "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            d0 + rng.integers(0, span + 95, n_li) * DAY_US, pa.timestamp("us")
        ),
    }))
    # events: sorted ns timestamps over one month; the TIMESTAMP(NANOS)
    # physical type is the driver fixture's defining quirk (io.load_table's
    # nanosAsLong path must fire on a regenerated fixture too).
    e0 = np.datetime64("2024-01-01", "ns").astype(np.int64)
    month_ns = 30 * 86_400 * 10**9
    ts = np.sort(e0 + rng.integers(0, month_ns, n_evt))
    w("events", pa.table({
        "event_id": pa.array(range(n_evt), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
        "value": np.maximum(np.round(rng.exponential(50, n_evt), 2), 0.01),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }))
    texts = [
        " ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), m)])
        for m in rng.integers(10, 100, n_doc)
    ]
    w("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vec)
    vecs = rng.standard_normal((n_vec, 64)) + 1.2 * cents[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    print(f"regenerated fixture (seed={seed}, sf={sf}) -> {out}")


def guard_cc(spark, out: str) -> dict:
    """Checklist guard 1: min-label rounds-to-convergence vs CC_ITERS."""
    from collections import deque

    from iceberg_rest_catalog_spark.operators.graph import CC_ITERS, _event_graph

    nodes_df, de = _event_graph(spark, out)
    adj: dict = {}
    for r in de.collect():
        adj.setdefault(r.u, set()).add(r.v)
        adj.setdefault(r.v, set()).add(r.u)
    all_nodes = {r.node for r in nodes_df.collect()}
    seen: set = set()
    rounds_needed = 0
    for start in sorted(all_nodes):
        if start in seen:
            continue
        comp, dq = {start}, deque([start])
        while dq:
            x = dq.popleft()
            for y in adj.get(x, ()):
                if y not in comp:
                    comp.add(y)
                    dq.append(y)
        seen |= comp
        root, dist = min(comp), {min(comp): 0}
        dq = deque([root])
        while dq:
            x = dq.popleft()
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        rounds_needed = max(rounds_needed, max(dist.values(), default=0))
    return {
        "guard": "q_graph_cc rounds-to-convergence",
        "rounds_needed": rounds_needed,
        "cc_iters": CC_ITERS,
        "trips": rounds_needed > CC_ITERS,
    }


def guard_session_gap(spark, out: str) -> dict:
    """Checklist guard 3 (round-11 ADVICE): q_stream_session_features'
    batch/stream equivalence requires NO per-user adjacent-event gap of
    EXACTLY 30 minutes — session_window splits at gap == 30 min while the
    batch gaps-and-islands rule merges.  A regenerated fixture that lands
    an event pair on the boundary would silently break the driver's
    equivalence check; this guard makes the documented precondition fail
    loudly instead."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.io import load_table

    ev = load_table(spark, out, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    n_exact = (
        ev.withColumn("gap", F.col("ts") - F.lag("ts").over(w))
        .filter(F.col("gap") == F.expr("INTERVAL 30 MINUTES"))
        .count()
    )
    return {
        "guard": "session gap != exactly 30 min",
        "exact_30min_gaps": n_exact,
        "trips": n_exact > 0,
    }


def guard_mmr(spark, out: str) -> dict:
    """Checklist guard 2: 4-dp rounded first-pick argmax tie audit.

    The MMR twin agrees across engines because cosines are rounded to 4 dp
    BEFORE the greedy argmax and ties then break on vec_id identically. A
    regenerated fixture can introduce NEW near-tie collisions (distinct raw
    scores that collide after rounding) — this audit counts, per probe
    query, (a) rounding-induced collisions anywhere in the candidate set
    and (b) ties at the FIRST-PICK argmax itself, the spot where an
    unrounded argmax would silently diverge between numpy and SQL."""
    import numpy as np

    from iceberg_rest_catalog_spark.io import load_table
    from iceberg_rest_catalog_spark.llm.similarity import (
        MMR_CANDIDATES,
        MMR_LAMBDA,
        MMR_PROBES,
    )

    emb = load_table(spark, out, "embeddings").select("vec_id", "embedding")
    pdf = emb.toPandas()  # 500-row fixture table; driver-side audit is exact
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    E, ids = E[order], ids[order]
    r = lambda x: np.floor(np.abs(x) * 1e4 + 0.5) * np.sign(x) / 1e4
    collisions = first_pick_ties = 0
    for qi in range(min(MMR_PROBES, len(ids))):
        rel = E @ E[qi]
        mask = ids != ids[qi]
        cand = np.argsort(-r(rel[mask]), kind="stable")[:MMR_CANDIDATES]
        raw = (MMR_LAMBDA * rel[mask])[cand]
        rounded = r(raw)
        collisions += len(rounded) - len(np.unique(rounded))
        top = rounded.max()
        if (rounded == top).sum() > 1:
            first_pick_ties += 1
    return {
        "guard": "q_sim_mmr rounded-argmax ties",
        "rounded_collisions": int(collisions),
        "first_pick_ties": int(first_pick_ties),
        "trips": first_pick_ties > 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", default=None)
    ap.add_argument("--check", action="store_true",
                    help="also run the full t2 gate against the new fixture")
    args = ap.parse_args()
    out = args.out or f"/tmp/regen/sf{args.sf}-seed{args.seed}"
    generate(out, args.seed, args.sf)

    sys.path.insert(0, "/root/repo")
    from iceberg_rest_catalog_spark.session import get_spark

    spark = get_spark()
    results = [
        guard_cc(spark, out),
        guard_mmr(spark, out),
        guard_session_gap(spark, out),
    ]
    for r in results:
        print(json.dumps(r))
    if args.check:
        env = dict(os.environ, CHECK_SF_DIR=out)
        rc = subprocess.call(
            [sys.executable, os.path.join(os.path.dirname(__file__), "check_queries.py")],
            env=env,
        )
        print(json.dumps({"guard": "full t2 gate (dtype-strict)", "exit": rc,
                          "trips": rc != 0}))


if __name__ == "__main__":
    main()
