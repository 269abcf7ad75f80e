"""Round-6 decade step: sf0.1 vs the synthetic x10 corpus (~sf1-equivalent).

Builds nothing — expects tools/adversarial_corpus.py to have written
/tmp/scale_x10 (documents, embeddings AND events scaled 10x; see that
module's docstring for the construction). Measures each query warm at both
scales and prints one JSON line per query with the runtime ratio for the
10x input step, plus output-row counts so output-bound queries can be
judged sub-linear IN OUTPUT, not just in input.

Usage: python tools/adversarial_corpus.py /root/testdata/sf0.1 \
           /tmp/scale_x10 10 --all-tables
       python tools/decade_step.py [query ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry
from iceberg_rest_catalog_spark.session import get_spark

BASE = os.environ.get("DECADE_BASE_DIR", "/root/testdata/sf0.1")
# Point DECADE_X_DIR at a different step corpus to measure another axis —
# e.g. /tmp/scale_len10 (--long-docs builder) for the doc-LENGTH axis
# (VERDICT r11 item 4: count-axis corpora can't see per-doc super-linear
# terms).  DECADE_X_LABEL names the column in the JSON output.
X10 = os.environ.get("DECADE_X_DIR", "/tmp/scale_x10")
X_LABEL = os.environ.get("DECADE_X_LABEL", "x10")
QUERIES = [
    "q_dedup_fuzzy",
    "q_dedup_fuzzy_verified",
    "q_dedup_incremental",
    "q_sim_knn_batch",
    "q_join_interval_overlap",
    "q_graph_triangles",
    "q_dedup_spans",
    "q_dedup_index",
    "q_embed_pq",
]


def main() -> None:
    spark = get_spark("decade")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = sys.argv[1:] or QUERIES
    for name in names:
        fn = qs[name]
        rec = {"query": name}
        for label, sf in (("sf0.1", BASE), (X_LABEL, X10)):
            fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            rec[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            rec[f"{label}_rows"] = fn(spark, sf).count()
        rec["ratio"] = round(rec[f"{X_LABEL}_sec"] / max(rec["sf0.1_sec"], 1e-9), 2)
        rec["out_ratio"] = round(
            rec[f"{X_LABEL}_rows"] / max(rec["sf0.1_rows"], 1), 2
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
