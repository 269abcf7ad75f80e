"""Driver-contract regression tests for ``__spark_entry__``.

The grading driver may call ``queries()`` / ``oracle_sql()`` BEFORE it builds
a SparkSession, so the whole registry import chain must not need one (string
DDL return types on udf/pandas_udf/udtf are parsed through the active
SparkContext at decoration time — the bug these tests pin down).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_collect_without_spark_session():
    """registry.collect() must succeed in a fresh interpreter with no JVM."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import pyspark.sql.utils as u\n"
        "import __spark_entry__ as e\n"
        "qs, osql = e.queries(), e.oracle_sql()\n"
        # exact-count pin (VERDICT r9 item 7): a module import that silently
        # fails to register its queries trips this loudly; bump on every
        # operator addition.
        "assert len(qs) == 408, len(qs)\n"
        "assert set(osql) <= set(qs), sorted(set(osql) - set(qs))\n"
        "print('OK', len(qs), len(osql))\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.startswith("OK")


def test_every_oracle_has_query():
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    dangling = [k for k in osql if k not in qs]
    assert not dangling, dangling


def test_driver_window_is_mechanical_staleness_order():
    """Since round 8 the registry DERIVES the driver-window ordering from the
    committed CORRECTNESS_r*.json artifacts (VERDICT r7 item 2: generate, not
    check).  This test recomputes the policy independently and asserts the
    live queries() ordering obeys it: never-driver-checked ids first, then
    red rows, then oldest-evidence-first with id tiebreak."""
    import json

    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    assert len(ids) == len(set(ids))

    # Independent re-parse of the artifacts (same green rule as the driver).
    last_seen: dict[str, int] = {}
    failed: set[str] = set()
    rounds = []
    import glob as _glob
    import re as _re

    for path in sorted(_glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(_re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        rounds.append(r)
        for qid, row in json.load(open(path)).items():
            last_seen[qid] = r
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if ok:
                failed.discard(qid)
            else:
                failed.add(qid)

    never = [q for q in ids if q not in last_seen]
    red = sorted(
        (q for q in ids if q in last_seen and q in failed),
        key=lambda q: (last_seen[q], q),
    )
    green = sorted(
        (q for q in ids if q in last_seen and q not in failed),
        key=lambda q: (last_seen[q], q),
    )
    assert ids == never + red + green

    # And the registry's own evidence parse agrees with this one.
    reg_seen, reg_failed = registry.driver_evidence()
    assert {q: r for q, r in reg_seen.items()} == last_seen
    assert set(reg_failed) == failed


def test_round9_window_head_is_new_ops_then_r3_block():
    """Concrete pin of the round-9 rotation (only while r8 is the newest
    committed artifact): the four round-9 operators have no driver row
    yet, so they LEAD in registration order (never-checked beats stale);
    then ordering is purely oldest-evidence-first — the 27 r3-stale ids
    (the 5-text tail + all 22 TPC-H), then the ~50-cap fills from the
    r4-stale block.  When CORRECTNESS_r09.json lands, the mechanical
    ordering moves on and this pin retires (regenerate it per round)."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 8:
        import pytest

        pytest.skip(f"rotation pin written against r8 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert not failed
    # Registration order: llm.similarity registers first (imported as a
    # dependency of the earlier _QUERY_MODULES entries), then graph, then
    # events — each in definition order.
    new_ops = [
        "q_embed_cell_purity",
        "q_sim_hard_negatives",
        "q_sim_knn_batch_2level",
        "q_graph_jaccard_neighbors",
        "q_evt_survival",
        "q_ts_holt",
        "q_evt_session_features",
    ]
    assert ids[:7] == new_ops and all(q not in last_seen for q in new_ops)
    assert all(q in last_seen for q in ids[7:])
    r3_block = [
        "q_text_repetition",
        "q_text_stats",
        "q_text_tfidf",
        "q_text_token_count",
        "q_text_tokens",
    ] + sorted(f"q_tpch_q{i}" for i in range(1, 23))
    assert ids[7:34] == r3_block
    # the remainder of a 50-window comes from the r4-stale family, id-sorted
    assert all(last_seen[q] == 4 for q in ids[34:50])
    assert ids[34:50] == sorted(ids[34:50])


def test_survey_section2_matches_registry_exactly():
    """SURVEY.md §2's operator inventory and the registry are the same id
    set (zero symmetric difference) — the judge checks this mechanically;
    this test makes adding an op without its §2 row (or vice versa) fail
    in CI instead of at grading time."""
    import re

    from iceberg_rest_catalog_spark import registry

    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    survey_ids = set(re.findall(r"^\| ([qc]_\w+) \|", survey, re.M))
    reg_ids = set(registry.queries())
    assert survey_ids == reg_ids, (
        sorted(survey_ids - reg_ids),
        sorted(reg_ids - survey_ids),
    )


def test_round10_window_head_is_new_ops_then_r4_block():
    """Concrete pin of the round-10 rotation (only while r9 is the newest
    committed artifact): the two round-10 operators have no driver row
    yet so they LEAD in registration order (streaming.queries registers
    before llm.curation), and the window then fills oldest-evidence-first
    from the r4-stale block, id-sorted.  Regenerate per round (the r9
    twin above retired when CORRECTNESS_r09.json landed)."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 9:
        import pytest

        pytest.skip(f"rotation pin written against r9 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert not failed
    new_ops = [
        "q_stream_session_features",
        "q_text_bpe_train",
        "q_evt_concurrency",
    ]
    assert ids[: len(new_ops)] == new_ops
    assert all(q not in last_seen for q in new_ops)
    assert all(q in last_seen for q in ids[len(new_ops):])
    # the 50-window remainder: the WHOLE 34-id r4-stale family, id-sorted,
    # then the head of the r5 block, id-sorted
    r4 = ids[3:37]
    assert all(last_seen[q] == 4 for q in r4) and r4 == sorted(r4)
    r5 = ids[37:50]
    assert all(last_seen[q] == 5 for q in r5) and r5 == sorted(r5)


def test_bench_suites_resolve_in_registry():
    """bench.py silently filters HEADLINE/TRACKED to registered names —
    a typo'd entry would drop a query from the suite without an error.
    Pin: every name in both lists resolves, and the two lists are
    disjoint (a query must not be double-counted)."""
    sys.path.insert(0, REPO)
    import importlib

    import __spark_entry__ as e

    bench = importlib.import_module("bench")
    qs = set(e.queries())
    missing = [n for n in bench.HEADLINE + bench.TRACKED if n not in qs]
    assert not missing, missing
    assert not set(bench.HEADLINE) & set(bench.TRACKED)


def test_newest_driver_artifacts_are_tracked():
    """Structural fix for the recurring round-open miss (VERDICT r13 item 1):
    the highest-numbered CORRECTNESS_r*.json / BENCH_r*.json present on disk
    must be in `git ls-files`.  Rounds 9-13 each left the freshest driver
    artifacts untracked at HEAD because the commit relied on a checklist;
    a red test can't be forgotten."""
    import re
    import glob

    tracked = set(
        subprocess.run(
            ["git", "ls-files"], cwd=REPO, capture_output=True, text=True
        ).stdout.split()
    )
    for stem in ("CORRECTNESS_r", "BENCH_r"):
        # variant artifacts (e.g. BENCH_r16_c8.json, the driver's low-core
        # probe) carry no round suffix of their own — skip them
        on_disk = [
            p
            for p in glob.glob(os.path.join(REPO, stem + "*.json"))
            if re.search(r"_r(\d+)\.json$", p)
        ]
        if not on_disk:
            continue
        newest = max(
            on_disk,
            key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
        )
        rel = os.path.relpath(newest, REPO)
        assert rel in tracked, (
            f"{rel} exists on disk but is not committed — "
            "git add it before closing the round"
        )


def test_round11_window_head_is_new_ops_then_r5_block():
    """Concrete pin of the round-11 rotation (only while r10 is the newest
    committed artifact): the twenty round-11 operators have no driver
    row yet so they LEAD in registration order, and the window then fills
    oldest-evidence-first from the r5-stale block.  Regenerate per round."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 10:
        import pytest

        pytest.skip(f"rotation pin written against r10 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert not failed
    new_ops = [
        "q_stream_transform_state",
        "q_stream_join_outer",
        "q_stream_join_full",
        "q_stream_dim_join",
        "q_sim_range_ivf",
        "q_graph_label_propagation",
        "q_data_epochs",
        "q_evt_seq_patterns",
        "q_ts_cusum",
        "q_evt_attribution_markov",
        "q_evt_pmi",
        "q_agg_weighted_median",
        "q_agg_moments",
        "q_fn_regexp",
        "q_sql_lateral",
        "q_meta_orphan_files",
        "q_meta_refs",
        "q_join_fuzzy_match",
        "q_text_winnow",
        "q_dedup_winnow_pairs",
    ]
    n = len(new_ops)
    assert ids[:n] == new_ops and all(q not in last_seen for q in new_ops)
    # the 50-window tail is the r5-stale block, id-sorted
    assert all(last_seen[q] == 5 for q in ids[n:50])
    assert ids[n:50] == sorted(ids[n:50])

# Round-12 additions, in registration order.  Update alongside every new
# @query registration this round — the rotation pin below derives from it.
R12_NEW_OPS: list[str] = [
    "q_multimodal_bytes_audit",
    "q_stream_kmv",
    "q_stream_velocity",
    "q_text_hashing_features",
    "q_graph_kcore",
    "q_graph_clustering_coeff",
    "q_graph_assortativity",
    "q_cluster_dbscan",
    "q_sample_neyman",
    "q_evt_paths",
    "q_ts_dow_profile",
    "q_evt_user_overlap",
    "q_ts_anomaly_mad",
    "q_ts_changepoint",
    "q_evt_velocity",
    "q_evt_bot_score",
    "q_agg_kmv",
    "q_agg_theta_intersect",
    "q_agg_time_decay",
    "q_intersect_all",
    "q_sub_all",
    "q_fn_struct",
    "q_fn_url",
    "q_meta_snapshot_lineage",
    "q_time_travel_asof",
    "q_snapshot_rollback",
    "q_scan_runtime_filter",
    "q_scan_cache_reuse",
    "q_source_text",
    "q_join_spatial_grid",
    "q_join_nearest",
    "q_join_pit",
    "q_dq_gap_hours",
    "q_text_collocations",
    "q_text_burstiness",
]


def test_round12_window_head_is_red_then_r5_stale():
    """Concrete pin of the round-12 rotation (only while r11 is the newest
    committed artifact): any round-12 newborns lead (never-checked), then
    q_fn_regexp — the ONLY red r11 row (driver canonicalizer crash on its
    raw array column, fixed this round by the q_fn_array stringify
    convention) — then green oldest-evidence-first.  Regenerate per round."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 11:
        import pytest

        pytest.skip(f"rotation pin written against r11 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert set(failed) == {"q_fn_regexp"}
    n = len(R12_NEW_OPS)
    assert ids[:n] == R12_NEW_OPS and all(q not in last_seen for q in R12_NEW_OPS)
    assert ids[n] == "q_fn_regexp"  # the red row is pinned first after newborns
    # the green remainder drains the 7 remaining r5-stale ids, then r6-stale,
    # each block id-sorted — i.e. (last_seen, id)-ordered
    tail = ids[n + 1 : 50]
    assert tail == sorted(tail, key=lambda q: (last_seen[q], q))
    assert {last_seen[q] for q in tail} <= {5, 6}


# Round-13 additions, in registration order.  Update alongside every new
# @query registration this round — the rotation pin below derives from it.
R13_NEW_OPS: list[str] = [
    "q_sim_index_stats",
    "q_dedup_index_stats",
    "q_stream_bitmap_distinct",
    "q_stream_topk",
    "q_graph_degree_dist",
    "q_doc_shard_pack",
    "q_evt_power_users",
    "q_ts_theil_sen",
    "q_evt_new_vs_returning",
    "q_evt_error_rate_ci",
    "q_evt_velocity_multi",
    "q_agg_bitmap_distinct",
    "q_agg_argmax",
    "q_agg_decimal_exact",
    "q_agg_grouping_id",
    "q_agg_listagg",
    "q_win_moving_median",
    "q_fn_encode",
    "q_fn_lambda",
    "q_fn_format",
    "q_fn_try",
    "q_udf_map_in_pandas",
    "q_source_schema_merge",
    "q_join_null_safe",
    "q_join_role_playing",
    "q_dq_benford",
    "q_dq_null_profile",
    "q_text_filter_sweep",
    "q_sim_ann_ivf_pq",
]


def test_round13_window_head_is_newborns_then_r6_stale():
    """Concrete pin of the round-13 rotation (only while r12 is the newest
    committed artifact): round-13 newborns lead (never-checked); there are
    NO red rows (r12 was fully green); then green oldest-evidence-first —
    the remaining r6-stale block, id-sorted.  Regenerate per round."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 12:
        import pytest

        pytest.skip(f"rotation pin written against r12 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert not failed  # r12 closed fully green
    n = len(R13_NEW_OPS)
    assert ids[:n] == R13_NEW_OPS and all(q not in last_seen for q in R13_NEW_OPS)
    # the green remainder is (last_seen, id)-ordered, starting at r6-stale
    tail = ids[n:50]
    assert tail == sorted(tail, key=lambda q: (last_seen[q], q))
    assert {last_seen[q] for q in tail} <= {6, 7}


R14_NEW_OPS: list[str] = [
    "q_multimodal_retrieval_eval",
    "q_stream_late_audit",
    "q_stream_topk_bounded",
    "q_graph_modularity",
    "q_evt_cuped",
    "q_evt_next_event_eval",
    "q_evt_srm_check",
    "q_dq_uniqueness",
    "q_dq_referential",
    "q_text_perplexity_bigram",
    "q_sim_index_update",
    "q_sim_ivf_pq_recall_eval",
]


def test_round14_window_head_is_newborns_then_stale_block():
    """Concrete pin of the round-14 rotation (only while r13 is the newest
    committed artifact): round-14 newborns lead (never-checked, module
    registration order); there are NO red rows (r13 closed fully green);
    then green oldest-evidence-first.  Regenerate per round."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 13:
        import pytest

        pytest.skip(f"rotation pin written against r13 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert not failed  # r13 closed fully green
    n = len(R14_NEW_OPS)
    assert ids[:n] == R14_NEW_OPS and all(q not in last_seen for q in R14_NEW_OPS)
    # the green remainder is (last_seen, id)-ordered
    tail = ids[n:50]
    assert tail == sorted(tail, key=lambda q: (last_seen[q], q))


R15_NEW_OPS: list[str] = [
    "q_sim_ann_ivf_filtered",
    "q_stream_drift_psi",
    "q_sim_graph_search",
    "q_tokenizer_bpe_apply",
    "q_sample_bootstrap",
    "q_ts_periodogram",
    "q_evt_sprt",
    "q_evt_did",
    "q_evt_power",
    "q_dq_freshness",
]


def test_round15_window_head_is_newborns_then_red_then_stale():
    """Concrete pin of the round-15 rotation (only while r14 is the newest
    committed artifact): round-15 newborns lead (never-checked, module
    registration order); the single r14 red row (q_graph_modularity —
    fixed this round by the deterministic edge scoring) comes next so the
    driver re-checks it first; then green oldest-evidence-first.
    Regenerate per round."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 14:
        import pytest

        pytest.skip(f"rotation pin written against r14 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert failed == frozenset({"q_graph_modularity"})  # the r14 red row
    n = len(R15_NEW_OPS)
    assert ids[:n] == R15_NEW_OPS and all(q not in last_seen for q in R15_NEW_OPS)
    assert ids[n] == "q_graph_modularity"  # red re-checks before stale greens
    # the green remainder is (last_seen, id)-ordered
    tail = ids[n + 1 : 50]
    assert tail == sorted(tail, key=lambda q: (last_seen[q], q))


R16_NEW_OPS: list[str] = [
    "q_graph_edge_audit",
    "q_graph_fof",
    "q_graph_eccentricity",
    "q_evt_srm",
    "q_evt_retention_matrix",
    "q_evt_ltv",
    "q_ts_seasonal_naive",
    "q_ts_ewma_cross",
    "q_ts_theta",
    "q_agg_hhi",
    "q_agg_trimmed_mean",
    "q_agg_skewkurt",
    "q_dq_anomaly_iqr",
    "q_dq_schema_drift",
    "q_text_rake",
    "q_text_readability",
]


def test_round16_window_head_is_newborns_then_red_then_stale():
    """Concrete pin of the round-16 rotation (only while r15 is the newest
    committed artifact): round-16 newborns lead (never-checked, module
    registration order) — the q_graph_edge_audit diagnostic MUST be in the
    driver window (VERDICT r15 item 1); the single r15 red row
    (q_graph_modularity) re-checks next, now over the detvec
    engine-invariant oracles; then green oldest-evidence-first.
    Regenerate per round."""
    import glob as _glob
    import re as _re

    sys.path.insert(0, REPO)
    newest = max(
        int(_re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    if newest != 15:
        import pytest

        pytest.skip(f"rotation pin written against r15 artifacts (newest: r{newest})")

    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    last_seen, failed = registry.driver_evidence()
    assert failed == frozenset({"q_graph_modularity"})  # the r15 red row
    n = len(R16_NEW_OPS)
    assert ids[:n] == R16_NEW_OPS and all(q not in last_seen for q in R16_NEW_OPS)
    assert ids[n] == "q_graph_modularity"  # red re-checks before stale greens
    tail = ids[n + 1 : 50]
    assert tail == sorted(tail, key=lambda q: (last_seen[q], q))
