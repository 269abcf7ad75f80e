"""Measure the q_text_bpe_train batch_m knob (VERDICT r10 item 5).

The claim to verify: BPE training cost at real vocab sizes is dominated
by the COUNTING-ROUND count (driver-sequenced shuffles over the
vocab-bounded symbol table), not by corpus size — so (a) batching the
selection (one counting shuffle per m merges) cuts wall-clock roughly
with the round count at a fixed merge budget, and (b) the ×10 corpus
step moves runtime far less than the round count does, because the
distinct-word symbol table is Heaps'-law-bounded.

Protocol: warm the session once, then run _bpe_train(n_merges=N, batch_m)
for each (corpus, m) cell, timing the full driver loop (the collect()s
ARE the cost being measured). One JSON line per cell.

Usage: python tools/bpe_batch_knob.py [n_merges] (default 24)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark.llm.curation import _bpe_train
from iceberg_rest_catalog_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
X10 = "/tmp/scale_x10"


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    spark = get_spark("bpe-knob")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: JVM + parquet footer caches
    _bpe_train(spark, BASE, n_merges=4, batch_m=1).collect()

    for label, sf in (("sf0.1", BASE), ("x10", X10)):
        for m in (1, 8):
            t0 = time.perf_counter()
            rows = _bpe_train(spark, sf, n_merges=n_merges, batch_m=m).collect()
            sec = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {
                        "corpus": label,
                        "batch_m": m,
                        "n_merges": n_merges,
                        "merges_done": len(rows),
                        "sec": sec,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
