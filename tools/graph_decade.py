"""Round-8 graph-family decade steps (VERDICT r7 item 3).

Two measurements the r6/r7 decade work never recorded:

1. q_graph_pagerank / q_graph_cc at sf0.1 vs the x10 adversarial corpus
   (decade_step convention: warm pass then timed noop-sink pass).  Both
   operate on the event-TYPE transition graph, whose node count is the
   (constant) number of event types — the decade step measures the
   edge-build scan over 10x events, with the iteration cost pinned flat.

2. _triangles_sparse — the production path above the 30k dense gate —
   on a DETERMINISTIC synthetic sparse graph at two scales (n=100k and
   n=1M nodes, ~11 chords/node), because the fixture-derived co-presence
   graph is near-complete: forcing the wedge join onto it would measure
   the pathological regime the density gate exists to avoid, not the
   sparse path's contract (arboricity-bounded wedges).  The construction:
   edges (i, i+d) for d in 1..10 plus one hash-placed long chord per
   node — ~45 triangles/node from chord overlaps, a spread of long-range
   edges, all generated distributed via spark.range (no driver
   materialization).

Usage: python tools/adversarial_corpus.py /root/testdata/sf0.1 \
           /tmp/scale_x10 10 --all-tables     # once, if not present
       python tools/graph_decade.py [pagerank cc sparse_triangles]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from iceberg_rest_catalog_spark import registry
from iceberg_rest_catalog_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
X10 = "/tmp/scale_x10"


def _timed_noop(build) -> float:
    """Time plan CONSTRUCTION + execution: pagerank/cc run their iteration
    loop eagerly (localCheckpoint) at call time, so the build must sit
    inside the timed section (the decade_step convention) — timing only
    the final noop write of a pre-built frame measures nothing."""
    build().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def sparse_edges(spark, n: int):
    """~11n-edge sparse graph on n nodes: local chords (i, i+d), d=1..10,
    plus one deterministic pseudo-random long chord per node."""
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("ui"),
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("d"),
        )
        .select("ui", (F.col("ui") + F.col("d")).alias("vi"))
        .filter(F.col("vi") < n)
    )
    long_chord = (
        spark.range(n)
        .select(
            F.col("id").alias("ui"),
            (F.col("id") + 11 + F.pmod(F.xxhash64("id"), F.lit(997))).alias("vi"),
        )
        .filter(F.col("vi") < n)
    )
    return base.unionAll(long_chord).distinct()


def main() -> None:
    spark = get_spark("graph-decade")
    spark.sparkContext.setLogLevel("ERROR")
    which = set(sys.argv[1:]) or {"pagerank", "cc", "sparse_triangles"}
    qs = registry.queries()

    for name, qid in (("pagerank", "q_graph_pagerank"), ("cc", "q_graph_cc")):
        if name not in which:
            continue
        rec = {"query": qid}
        for label, sf in (("sf0.1", BASE), ("x10", X10)):
            rec[f"{label}_sec"] = _timed_noop(lambda: qs[qid](spark, sf))
        rec["ratio"] = round(rec["x10_sec"] / max(rec["sf0.1_sec"], 1e-9), 2)
        print(json.dumps(rec), flush=True)

    if "sparse_triangles" in which:
        from iceberg_rest_catalog_spark.operators.graph import _triangles_sparse

        rec = {"query": "_triangles_sparse(synthetic)"}
        for label, n in (("n100k", 100_000), ("n1m", 1_000_000)):
            ei = sparse_edges(spark, n).localCheckpoint()
            n_edges = ei.count()
            t0 = time.perf_counter()
            tri = _triangles_sparse(ei).collect()[0].n
            rec[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            rec[f"{label}_edges"] = n_edges
            rec[f"{label}_triangles"] = tri
        rec["ratio"] = round(rec["n1m_sec"] / max(rec["n100k_sec"], 1e-9), 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
