"""Round-7 K-knob measurement for q_dedup_semantic (VERDICT r6 item 4).

The SemDeDup claim under test: with K (centroid count) FIXED, a 10x corpus
makes every cluster 10x bigger, so the within-cluster pair term grows
~100x and the decade step is quadratic-ish; with K scaled so the expected
cluster SIZE stays flat (semantic_k_for: ~512 vectors/cluster), the pair
term grows only linearly and the decade step returns to the same 5-7x
band as the other dedup pipelines.

Runs _semantic_survivors warm (noop sink, one warm + one timed pass, the
decade_step convention) at:
  sf0.1   K=K_CLUSTERS(8)        -- the r6 baseline shape
  x10     K=K_CLUSTERS(8)        -- knob OFF: quadratic growth expected
  x10     K=semantic_k_for(n)    -- knob ON: linear band expected

Usage: python tools/semantic_k_knob.py   (expects /tmp/scale_x10 from
       tools/adversarial_corpus.py, like tools/decade_step.py)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry  # noqa: F401  (module import wiring)
from iceberg_rest_catalog_spark.llm.dedup import _semantic_survivors, semantic_k_for
from iceberg_rest_catalog_spark.llm.similarity import K_CLUSTERS, _emb
from iceberg_rest_catalog_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
X10 = "/tmp/scale_x10"


def timed(spark, sf_dir, k):
    df = _semantic_survivors(spark, sf_dir, k)
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    _semantic_survivors(spark, sf_dir, k).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = time.perf_counter() - t0
    return round(sec, 2), _semantic_survivors(spark, sf_dir, k).count()


def main() -> None:
    spark = get_spark("semantic-k")
    spark.sparkContext.setLogLevel("ERROR")
    n10 = _emb(spark, X10).count()
    k_scaled = semantic_k_for(n10)
    base_sec, base_rows = timed(spark, BASE, K_CLUSTERS)
    fixed_sec, fixed_rows = timed(spark, X10, K_CLUSTERS)
    scaled_sec, scaled_rows = timed(spark, X10, k_scaled)
    print(
        json.dumps(
            {
                "n_x10": n10,
                "k_fixed": K_CLUSTERS,
                "k_scaled": k_scaled,
                "sf0.1_k8_sec": base_sec,
                "sf0.1_rows": base_rows,
                "x10_k8_sec": fixed_sec,
                "x10_k8_rows": fixed_rows,
                "x10_kscaled_sec": scaled_sec,
                "x10_kscaled_rows": scaled_rows,
                "decade_ratio_k_fixed": round(fixed_sec / max(base_sec, 1e-9), 2),
                "decade_ratio_k_scaled": round(
                    scaled_sec / max(base_sec, 1e-9), 2
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
