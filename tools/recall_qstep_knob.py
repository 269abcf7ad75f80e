"""Round-8 probe-stride knob measurement for q_sim_recall_eval.

The claim under test: with the probe stride (KNN_QSTEP) FIXED, a 10x
corpus makes the probe batch 10x bigger, so the exact brute-force
baseline (|batch| x corpus with the batch broadcast) grows ~100x and the
decade step leaves the linear band (measured 8.25x in the round-8 decade
table); with the stride scaled so the batch SIZE stays ~RECALL_TARGET_
PROBES (recall_qstep_for), the baseline grows only with the corpus scan
and the audit returns to the linear band — the semantic_k_for discipline
applied to the probe side. A recall estimate is a sample statistic: its
CI depends on batch size, not batch fraction, so the scaled stride loses
nothing.

Runs _recall_eval warm (noop sink, one warm + one timed pass, the
decade_step convention) at:
  sf0.1   qstep=KNN_QSTEP(25)        -- the registered/oracle shape
  x10     qstep=KNN_QSTEP(25)        -- knob OFF: quadratic growth
  x10     qstep=recall_qstep_for(n)  -- knob ON: linear band expected

Also reports the mean recall under both strides on the SAME x10 corpus —
the audit's ANSWER must be statistically unchanged by the knob.

Usage: python tools/recall_qstep_knob.py   (expects /tmp/scale_x10 from
       tools/adversarial_corpus.py, like tools/decade_step.py)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry  # noqa: F401  (module import wiring)
from iceberg_rest_catalog_spark.llm.similarity import (
    KNN_QSTEP,
    _emb,
    _recall_eval,
    recall_qstep_for,
)
from iceberg_rest_catalog_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
X10 = "/tmp/scale_x10"


def timed(spark, sf_dir, qstep):
    _recall_eval(spark, sf_dir, qstep).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    t0 = time.perf_counter()
    _recall_eval(spark, sf_dir, qstep).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = round(time.perf_counter() - t0, 2)
    rows = _recall_eval(spark, sf_dir, qstep).collect()
    mean_recall = round(sum(r.recall for r in rows) / max(len(rows), 1), 4)
    return sec, len(rows), mean_recall


def main() -> None:
    spark = get_spark("recall-qstep")
    spark.sparkContext.setLogLevel("ERROR")
    n10 = _emb(spark, X10).count()
    q_scaled = recall_qstep_for(n10)

    base = timed(spark, BASE, KNN_QSTEP)
    off = timed(spark, X10, KNN_QSTEP)
    on = timed(spark, X10, q_scaled)
    print(
        json.dumps(
            {
                "sf0.1_qstep": KNN_QSTEP,
                "sf0.1": dict(zip(("sec", "probes", "mean_recall"), base)),
                "x10_qstep_fixed": KNN_QSTEP,
                "x10_fixed": dict(zip(("sec", "probes", "mean_recall"), off)),
                "x10_qstep_scaled": q_scaled,
                "x10_scaled": dict(zip(("sec", "probes", "mean_recall"), on)),
                "ratio_fixed": round(off[0] / max(base[0], 1e-9), 2),
                "ratio_scaled": round(on[0] / max(base[0], 1e-9), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
