"""×10 / ×100 scale rows for the multimodal family (VERDICT r10 item 4).

q_multimodal_phash_dedup had only a ×10 number (2.86× with the
frequent-bucket cap); resize / frame_sample / audio had none.  This tool
measures all four at sf0.1 → /tmp/scale_x10 → /tmp/scale_x100 (the
adversarial_corpus --all-tables builds; documents ×100 ≈ 500k rows) with
the decade_step protocol: warm pass, timed noop write, output-row count
so output-bound queries are judged sub-linear IN OUTPUT.

Usage: python tools/multimodal_scale.py [query ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry
from iceberg_rest_catalog_spark.session import get_spark

# CAUTION: /tmp/scale_x100 is the DOCUMENTS-only x100 build (other tables
# symlink to sf0.1 — fine for the multimodal/document family this tool was
# written for).  For events/embeddings-driven queries point SCALE_X100 at
# /tmp/scale_x100_all (the --all-tables build: 10M events, 200k vectors).
SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10", "/tmp/scale_x10"),
    ("x100", os.environ.get("SCALE_X100", "/tmp/scale_x100")),
]
QUERIES = [
    "q_multimodal_resize",
    "q_multimodal_frame_sample",
    "q_multimodal_audio",
    "q_multimodal_phash_dedup",
]


def main() -> None:
    spark = get_spark("mm-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = sys.argv[1:] or QUERIES
    for name in names:
        fn = qs[name]
        rec = {"query": name}
        for label, sf in SCALES:
            fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            rec[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            rec[f"{label}_rows"] = fn(spark, sf).count()
        rec["x10_ratio"] = round(rec["x10_sec"] / max(rec["sf0.1_sec"], 1e-9), 2)
        rec["x100_ratio"] = round(
            rec["x100_sec"] / max(rec["sf0.1_sec"], 1e-9), 2
        )
        rec["x100_out_ratio"] = round(
            rec["x100_rows"] / max(rec["sf0.1_rows"], 1), 2
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
