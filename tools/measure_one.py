"""Standalone per-query measurement harness for the r16 optimization round.

Times one or more registered queries exactly like bench.py does (noop sink,
one warm pass + N timed passes, per-query median, release_persistent_state
between runs) and optionally writes the formatted physical plan to a file —
the guide §1 "measure first / capture explain" loop, without paying for the
whole 102-query suite per iteration.

Usage:
    python tools/measure_one.py q_graph_triangles q_stream_topk
    python tools/measure_one.py --passes 5 --plans plans/r16 --suffix before q_evt_seq_patterns
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_rest_catalog_spark import registry  # noqa: E402
from iceberg_rest_catalog_spark.operators.common import (  # noqa: E402
    release_persistent_state,
    release_persistent_state_deep,
)
from iceberg_rest_catalog_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    args = ap.parse_args()

    spark = get_spark("measure_one")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    qs = registry.queries()
    results: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(formatted_plan(df))
            release_persistent_state(spark)
        samples = []
        # warm (release discipline mirrors bench.py run_one: deep per run)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        release_persistent_state_deep(spark)
        for _ in range(args.passes):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_persistent_state_deep(spark)
        med = sorted(samples)[len(samples) // 2]
        results[name] = {"median": med, "samples": samples}
        print(f"MEASURE {name} median={med} samples={samples}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
