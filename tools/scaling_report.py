"""Empirical scaling check: headline queries across sf0.001 / 0.01 / 0.1.

Runtime should grow far slower than the 10× data steps while fixed overhead
dominates, approaching linear only as real work displaces scheduling — a
sanity check that no operator hides super-linear (all-pairs / re-scan)
behavior. Prints one JSON line per query with per-sf seconds and the
0.01→0.1 ratio (the step where data, not overhead, dominates).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry
from iceberg_rest_catalog_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "q_tpch_q1",
    "q_tpch_q5",
    "q_tpch_q21",
    "q_dedup_fuzzy",
    "q_sim_lsh",
    "q_text_tokens",
    "q_evt_sessionize",
    # round-3 additions
    "q_dedup_fuzzy_verified",
    "q_cluster_kmeans",
    "q_text_perplexity",
    "q_text_chunk_dedup",
    "q_join_bloom_prune",
    "q_join_interval_overlap",
    "q_sim_ann_ivf",
    "q_evt_anomaly",
    "q_embed_quantize",
    "q_graph_pagerank",
    "q_evt_attribution",
    "q_ts_interpolate",
    "q_shard_assign",
    "q_text_bpe_pairs",
    # round-5 additions
    "q_dedup_simhash_shingle",
    "q_dedup_incremental",
    "q_sim_knn_batch",
    "q_dedup_spans",
    "q_dedup_index",
    "q_embed_pq",
    # round-5 second wave
    "q_agg_countmin",
    "q_tokenizer_apply",
    "q_caption_pairs",
    "q_evt_rolling_dau",
    "q_embed_matryoshka",
    # round-5 third wave (the data-proportional ones)
    "q_dedup_eval_sweep",
    "q_evt_pattern_match",
    "q_evt_drift_ks",
    # round-6 additions (the data-proportional ones; q_graph_cc reduces to
    # the |event_types|-node graph and q_sim_mmr to a bounded candidate set)
    "q_curriculum_order",
    "q_dedup_semantic",
    "q_agg_bloom",
]


def main() -> None:
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in QUERIES:
        fn = qs[name]
        secs = []
        for sf in SFS:
            fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf": [0.001, 0.01, 0.1],
                    "sec": secs,
                    "ratio_0.01_to_0.1": round(secs[2] / max(secs[1], 1e-9), 2),
                }
            )
        )


if __name__ == "__main__":
    main()
