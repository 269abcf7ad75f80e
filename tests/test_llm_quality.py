"""Quality checks for the approximate dedup/similarity operators: the
approximations must track their exact ground truths on the fixtures."""

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs(spark):
    from iceberg_rest_catalog_spark import registry

    return registry.queries()


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact_jaccard(spark, qs):
    """Banded MinHash-LSH (16 hashes, 4x4 bands, est >= 0.5) must recover
    nearly all exact-Jaccard >= 0.5 pairs: at j=0.5 the banding catch
    probability is ~1-(1-0.5^4)^4 = 0.23 per weak pair, but the fixture's
    planted near-dups sit at j~0.99 where recall is ~1.0."""
    exact = _pairs(qs["q_dedup_ngram"](spark, SF))
    approx = _pairs(qs["q_dedup_fuzzy"](spark, SF))
    strong = exact  # fixture near-dups are all high-jaccard
    recall = len(strong & approx) / max(len(strong), 1)
    assert recall >= 0.9, (recall, len(strong), len(approx))


def test_cluster_count_consistent_with_pairs(spark, qs):
    pairs = _pairs(qs["q_dedup_fuzzy"](spark, SF))
    clusters = qs["q_dedup_cluster"](spark, SF).collect()
    nodes = {d for p in pairs for d in p}
    assert sum(c.cluster_size for c in clusters) == len(nodes)
    # every cluster id is its own minimum member
    for c in clusters:
        members = [int(x) for x in c.member_ids.split(",")]
        assert min(members) == c.cluster_id
        assert c.cluster_size == len(members)


def test_ann_ivf_overlaps_brute_force(spark, qs):
    """IVF with 4/16 probes must recover a meaningful share of the exact
    top-10 (random vectors -> no cluster structure, so probing 25% of cells
    gives roughly that fraction; assert a sane floor)."""
    brute = {r.vec_id for r in qs["q_sim_topk"](spark, SF).collect()}
    ivf = {r.vec_id for r in qs["q_sim_ann_ivf"](spark, SF).collect()}
    assert len(brute & ivf) >= 2, (brute, ivf)


def test_hash_split_is_deterministic_and_disjoint(spark, qs):
    rows1 = qs["q_sample_hash"](spark, SF).collect()
    rows2 = qs["q_sample_hash"](spark, SF).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    by_split = {}
    for r in rows1:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    assert not (by_split.get("eval", set()) & by_split.get("train", set()))


def test_min_label_propagation_converges_on_long_chains(spark):
    """Connected components must reach the exact fixpoint on components
    whose diameter exceeds any small fixed round count — a chain
    0-1-...-9 (diameter 9) collapses to a single cluster labeled 0."""
    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.llm.dedup import _propagate_min_labels

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = edges.select(F.col("doc_a").alias("node")).distinct()
    labels = _propagate_min_labels(nodes.withColumn("label", F.col("node")), edges)
    assert {r.label for r in labels.collect()} == {0}


def test_shingle_simhash_tracks_exact_jaccard(spark, qs):
    """Shingle-unit SimHash must track the exact trigram-Jaccard ground
    truth better than chance and with high precision — the property that
    makes it the boilerplate-robust variant (SCALE.md round-5 notes)."""
    exact = _pairs(qs["q_dedup_ngram"](spark, SF))
    got = _pairs(qs["q_dedup_simhash_shingle"](spark, SF))
    tp = len(got & exact)
    assert tp / max(len(exact), 1) >= 0.5, (len(got), len(exact), tp)  # recall
    assert tp / max(len(got), 1) >= 0.9, (len(got), tp)  # precision


def test_min_label_propagation_handles_empty_graph(spark):
    """A fully deduplicated corpus yields zero candidate pairs; the
    propagation must return the empty fixpoint immediately instead of
    burning max_rounds on None label sums and raising (round-5 review)."""
    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.llm.dedup import _propagate_min_labels

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    nodes = (
        empty.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    assert _propagate_min_labels(nodes, empty, max_rounds=3).count() == 0


def test_incremental_dedup_consistent_with_full_dedup(spark, qs):
    """The incremental verdict must agree with the global operators on the
    same fixture: every batch doc flagged exact_dup shares its md5 with a
    corpus doc (cross-checked via q_dedup_exact groups), every batch doc
    with n_near > 0 appears in a q_dedup_fuzzy pair with a corpus doc, and
    kept <=> neither tier fired."""
    inc = {r.doc_id: r for r in qs["q_dedup_incremental"](spark, SF).collect()}
    assert inc, "batch split must be non-empty"

    # cross-check the exact tier against q_dedup_exact's hash groups
    exact_groups = qs["q_dedup_exact"](spark, SF).collect()
    # rebuild doc_id -> hash via a raw read (the operator returns groups)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pyspark.sql import functions as F

    by_doc = {
        r.doc_id: r.h
        for r in docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("h"))
        .collect()
    }
    corpus_hashes = {h for d, h in by_doc.items() if d % 5 != 0}
    for doc_id, r in inc.items():
        assert doc_id % 5 == 0
        want_exact = 1 if by_doc[doc_id] in corpus_hashes else 0
        assert r.exact_dup == want_exact, (doc_id, r)

    # cross-check the near tier against the symmetric fuzzy pairs
    fuzzy = _pairs(qs["q_dedup_fuzzy"](spark, SF))
    cross = {}
    for a, b in fuzzy:
        for x, y in ((a, b), (b, a)):
            if x % 5 == 0 and y % 5 != 0:
                cross.setdefault(x, set()).add(y)
    for doc_id, r in inc.items():
        assert r.n_near == len(cross.get(doc_id, ())), (doc_id, r)
        assert r.kept == (1 if r.exact_dup == 0 and r.n_near == 0 else 0)


def test_knn_batch_structure_and_agreement_with_single_query(spark, qs):
    """Every query vector gets exactly K ranked neighbours (rank 1..K,
    cos non-increasing), and for vec_id 0 — also q_sim_ann_ivf's query —
    the batched result substantially overlaps the single-query IVF top-10
    (same centroids, same probe budget; only tie-rounding may differ)."""
    from iceberg_rest_catalog_spark.llm.similarity import KNN_K, KNN_QSTEP

    rows = qs["q_sim_knn_batch"](spark, SF).collect()
    by_q = {}
    for r in rows:
        assert r.q_vec_id % KNN_QSTEP == 0
        by_q.setdefault(r.q_vec_id, []).append(r)
    assert by_q, "query set must be non-empty"
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, KNN_K + 1)), (q, rs)
        cos = [r.cos for r in rs]
        assert cos == sorted(cos, reverse=True), (q, rs)
        assert all(r.nn_vec_id != q for r in rs)

    ivf = {r.vec_id for r in qs["q_sim_ann_ivf"](spark, SF).collect()}
    got0 = {r.nn_vec_id for r in by_q[0]}
    assert len(got0 & ivf) >= 2, (got0, ivf)


def test_frame_sample_and_audio_window_shapes(spark, qs):
    """Frame sampling: exactly 4 slots per doc, frame indices within
    [0, n_frames), non-decreasing in slot, ts consistent with fps. Audio:
    per-doc window energies sum to the total byte sum of the payload."""
    frames = qs["q_multimodal_frame_sample"](spark, SF).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.slot)
        n_frames = 1 + doc_id % 300
        fps = 24 + (doc_id % 2) * 6
        assert [r.slot for r in rs] == [0, 1, 2, 3]
        idx = [r.frame_idx for r in rs]
        assert idx == sorted(idx) and 0 <= idx[0] and idx[-1] == n_frames - 1
        for r in rs:
            assert r.ts_ms == r.frame_idx * 1000 // fps

    docs = {
        r.doc_id: r.text.encode("utf-8")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
        if r.text
    }
    audio = qs["q_multimodal_audio"](spark, SF).collect()
    energy = {}
    for r in audio:
        energy[r.doc_id] = energy.get(r.doc_id, 0) + r.energy
        assert 0 <= r.peak <= 255
    assert energy.keys() == docs.keys()
    for doc_id, b in docs.items():
        assert energy[doc_id] == sum(b), doc_id


def _labels_of(df):
    return {(r.node, r.label) for r in df.collect()}


def test_cc_star_equals_min_label_on_fixture_and_random_graphs(spark, qs):
    """large-star/small-star must compute the identical component-minimum
    labeling as min-label propagation on the real LSH pair graph and on
    random Erdos-Renyi-ish graphs."""
    import random

    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.llm.dedup import (
        _cc_star,
        _minhash_pairs,
        _propagate_min_labels,
    )

    def minlabel(pairs_df):
        edges = pairs_df.union(
            pairs_df.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        ).localCheckpoint()
        nodes = edges.select(F.col("doc_a").alias("node")).distinct()
        return _propagate_min_labels(
            nodes.withColumn("label", F.col("node")), edges, max_rounds=600
        )

    real = _minhash_pairs(spark, SF).select("doc_a", "doc_b").localCheckpoint()
    assert _labels_of(_cc_star(real)) == _labels_of(minlabel(real))

    rng = random.Random(7)
    for n, m in [(50, 40), (80, 120)]:
        es = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(m)
        ]
        es = [(a, b) for a, b in es if a != b]
        pairs = spark.createDataFrame(es, "doc_a long, doc_b long")
        assert _labels_of(_cc_star(pairs)) == _labels_of(minlabel(pairs))


def test_graph_cc_star_path_equals_min_label_oracle_twin(spark, qs):
    """q_graph_cc's production star-CC path must produce the identical
    labeling as the fixed-round min-label recurrence the DuckDB oracle
    unrolls — the equivalence that justifies keeping the closed-form
    oracle while the implementation runs the O(log n)-round algorithm
    (VERDICT r6 item 5)."""
    from iceberg_rest_catalog_spark.operators.graph import (
        _cc_min_label,
        _event_graph,
    )

    got = {(r.node, r.component) for r in qs["q_graph_cc"](spark, SF).collect()}
    nodes, de = _event_graph(spark, SF)
    want = {(r.node, r.component) for r in _cc_min_label(nodes, de).collect()}
    assert got == want and got


def test_event_graph_min_label_margin_within_cc_iters(spark):
    """q_graph_cc's oracle unrolls exactly CC_ITERS min-label rounds while
    the implementation computes exact components (star-CC); they agree iff
    min-label CONVERGES within CC_ITERS on the fixture graph.  Measure the
    actual rounds-to-convergence (max BFS distance from each component's
    min-id node) at both driver scale factors and assert it fits with
    margin — so a fixture regeneration that stretches the graph's diameter
    fails THIS test loudly instead of surfacing as a driver hash mismatch
    (ADVICE r7; TESTDATA.md fixture-regeneration checklist)."""
    from collections import deque

    from iceberg_rest_catalog_spark.operators.graph import CC_ITERS, _event_graph

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        nodes_df, de = _event_graph(spark, sf_dir)
        # |nodes| = |event_types| — a handful; driver-side BFS is exact.
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
            # component via BFS, then eccentricity of its min-id node
            comp = {start}
            dq = deque([start])
            while dq:
                x = dq.popleft()
                for y in adj.get(x, ()):
                    if y not in comp:
                        comp.add(y)
                        dq.append(y)
            seen |= comp
            root = min(comp)
            dist = {root: 0}
            dq = deque([root])
            while dq:
                x = dq.popleft()
                for y in adj.get(x, ()):
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        dq.append(y)
            rounds_needed = max(rounds_needed, max(dist.values(), default=0))
        assert rounds_needed <= CC_ITERS, (
            f"{sf_dir}: min-label needs {rounds_needed} rounds > "
            f"CC_ITERS={CC_ITERS}; q_graph_cc's oracle twin no longer holds"
        )


def test_cc_star_logarithmic_rounds_on_chain(spark):
    """A 256-node chain has diameter 255: min-label needs ~255 rounds;
    the star alternation must finish within 12 — the property that makes
    it the 100 TB path."""
    from iceberg_rest_catalog_spark.llm.dedup import _cc_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(255)], "doc_a long, doc_b long"
    )
    labels = _labels_of(_cc_star(chain, max_rounds=12))
    assert labels == {(i, 0) for i in range(256)}


def test_dedup_index_roundtrip_matches_signatures(spark, qs):
    """The materialized index must round-trip bit-identical signatures and
    lay out one parquet partition per band."""
    import os

    from pyspark.sql import functions as F

    from iceberg_rest_catalog_spark.llm.dedup import (
        N_BANDS,
        _signatures,
    )
    from iceberg_rest_catalog_spark.operators.common import scratch_dir, t

    got = {r.doc_id: tuple(r)[1:] for r in qs["q_dedup_index"](spark, SF).collect()}
    direct = {
        r.doc_id: tuple(r)[1:]
        for r in _signatures(
            t(spark, SF, "documents").filter(F.col("text").isNotNull())
        ).collect()
    }
    assert got == direct

    path = scratch_dir(SF, "lsh_index")
    parts = {p for p in os.listdir(path) if p.startswith("band=")}
    assert parts == {f"band={b}" for b in range(N_BANDS)}


def test_span_dedup_flags_planted_near_dups(spark, qs):
    """Fixture near-dups mostly share long verbatim runs, so docs in
    fuzzy near-dup pairs should overwhelmingly show repeated 20-token
    spans (edit-dense pairs may legitimately break every window); counts
    are bounded by totals and by the corpus-frequency definition."""
    spans = {r.doc_id: r for r in qs["q_dedup_spans"](spark, SF).collect()}
    for r in spans.values():
        assert 0 <= r.n_repeated <= r.n_spans
        assert r.max_span_df >= 1
        assert (r.n_repeated > 0) == (r.max_span_df > 1)
    pairs = _pairs(qs["q_dedup_fuzzy"](spark, SF))
    strong = {d for a, b in pairs for d in (a, b) if d in spans}
    flagged = {d for d, r in spans.items() if r.n_repeated > 0}
    assert strong, "fixture must contain planted near-dups"
    assert len(strong & flagged) / len(strong) >= 0.8, strong - flagged


def test_pq_codes_are_valid_and_self_encode_codebook_vectors(spark, qs):
    """Every code lies in [0, K); a vector that IS a codeword must encode
    to itself in every subspace (distance 0, code-asc tiebreak, and the
    random fixture vectors make zero-distance ties impossible)."""
    from iceberg_rest_catalog_spark.llm.embedding import K_CODES, N_SUB

    rows = {r.vec_id: r for r in qs["q_embed_pq"](spark, SF).collect()}
    assert rows
    for vec_id, r in rows.items():
        codes = [r[f"c{s}"] for s in range(N_SUB)]
        assert all(0 <= c < K_CODES for c in codes), (vec_id, codes)
        if vec_id < K_CODES:
            assert codes == [vec_id] * N_SUB, (vec_id, codes)


def test_adc_search_tracks_exact_l2(spark, qs):
    """ADC over PQ codes must return ascending rounded distances, never
    the query itself, and keep contact with the exact L2 top-10 (random
    vectors + 16 codewords/subspace leave high distortion, so the floor
    is modest — the bit-level correctness is the DuckDB oracle's job)."""
    import numpy as np

    from iceberg_rest_catalog_spark.llm.similarity import QUERY_VEC_ID

    rows = qs["q_sim_ann_pq"](spark, SF).collect()
    assert len(rows) == 10
    d = [r.adc_d2 for r in rows]
    assert d == sorted(d) and all(x >= 0 for x in d)
    assert all(r.vec_id != QUERY_VEC_ID for r in rows)

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        if r.embedding is not None
    }
    q = emb[QUERY_VEC_ID]
    exact = sorted(
        ((((v - q) ** 2).sum(), k) for k, v in emb.items() if k != QUERY_VEC_ID),
    )[:10]
    exact_ids = {k for _, k in exact}
    assert exact_ids & {r.vec_id for r in rows}, (exact_ids, rows)


def test_streaming_ingest_gate_equals_batch_incremental(spark, qs):
    """The streaming deployment of the ingest gate must produce exactly
    the batch incremental verdict — same docs, same tiers, same counts."""
    batch = sorted(map(tuple, qs["q_dedup_incremental"](spark, SF).collect()))
    stream = sorted(map(tuple, qs["q_stream_ingest_gate"](spark, SF).collect()))
    assert stream == batch


def test_sample_fixed_k_matches_hash_order_recompute(spark, qs):
    """Exact-K stratified draw: per source exactly min(50, |stratum|) docs,
    contiguous ranks, true stratum size, and the SELECTION equals a pure-
    python recompute of the md5-of-id order — determinism and uniformity
    in one check."""
    import hashlib
    from collections import defaultdict

    from iceberg_rest_catalog_spark.operators.common import t

    rows = qs["q_sample_fixed_k"](spark, SF).collect()
    docs = t(spark, SF, "documents").select("source", "doc_id").collect()

    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append(r.doc_id)
    want = {}
    for src, ids in by_src.items():
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want[src] = order[:50]

    got = defaultdict(dict)
    for r in rows:
        got[r.source][r.samp_rank] = r.doc_id
        assert r.n_stratum == len(by_src[r.source])
    assert set(got) == set(want)
    for src, sel in want.items():
        ranks = got[src]
        assert sorted(ranks) == list(range(1, len(sel) + 1))
        assert [ranks[k] for k in range(1, len(sel) + 1)] == sel


def test_dedup_prefix_matches_python_recompute(spark, qs):
    """Prefix clusters equal a pure-python group-by of the first 64
    lowercased characters; keeper is the min doc_id of each cluster."""
    from collections import defaultdict

    from iceberg_rest_catalog_spark.operators.common import t

    docs = t(spark, SF, "documents").select("doc_id", "text").collect()
    groups = defaultdict(list)
    for r in docs:
        if r.text is not None:
            groups[r.text.lower()[:64]].append(r.doc_id)
    want = {
        d: (len(ids), 1 if d == min(ids) else 0)
        for ids in groups.values()
        if len(ids) > 1
        for d in ids
    }

    rows = qs["q_dedup_prefix"](spark, SF).collect()
    got = {r.doc_id: (r.n_prefix, r.kept) for r in rows}
    assert got == want and got  # non-trivial on the fixture


def test_text_zipf_matches_python_recompute(spark, qs):
    """Vocab size, token volume, modal token and the fitted slope agree
    with a Counter + numpy polyfit recompute; the slope is negative
    (frequencies decay with rank)."""
    import math
    from collections import Counter

    import numpy as np

    from iceberg_rest_catalog_spark.operators.common import t

    docs = t(spark, SF, "documents").select("text").collect()
    c = Counter()
    for r in docs:
        if r.text is not None:
            c.update(w for w in r.text.lower().split(" ") if w)

    r = qs["q_text_zipf"](spark, SF).collect()[0]
    assert r.n_distinct_tokens == len(c)
    assert r.total_tokens == sum(c.values())
    top_token, top_n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (r.top_token, r.top_n) == (top_token, top_n)

    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(n) for _, n in ranked]
    slope = float(np.polyfit(xs, ys, 1)[0])
    assert r.zipf_slope < 0
    assert abs(r.zipf_slope - slope) < 1e-3


def test_embed_coverage_matches_python_recompute(spark, qs):
    """The coverage audit equals a pure-python recompute over the raw
    tables, and its totals are self-consistent (docs = with + missing;
    orphans only under '<no-doc>')."""
    from collections import defaultdict

    from iceberg_rest_catalog_spark.operators.common import t

    docs = t(spark, SF, "documents").select("doc_id", "source").collect()
    vecs = {
        r.vec_id: r.has
        for r in t(spark, SF, "embeddings")
        .selectExpr("vec_id", "embedding IS NOT NULL AS has")
        .collect()
    }
    want = defaultdict(lambda: [0, 0, 0, 0])  # docs, with, missing, orphan
    doc_ids = set()
    for r in docs:
        doc_ids.add(r.doc_id)
        key = r.source if r.source is not None else "<null-source>"
        want[key][0] += 1
        if vecs.get(r.doc_id):
            want[key][1] += 1
        else:
            want[key][2] += 1
    for vid in vecs:
        if vid not in doc_ids:
            want["<no-doc>"][3] += 1

    got = {
        r.source: [r.n_docs, r.n_with_vec, r.n_missing_vec, r.n_orphan_vec]
        for r in qs["q_embed_coverage"](spark, SF).collect()
    }
    assert got == {k: v for k, v in want.items()}
    for src, (n, w, m, o) in got.items():
        assert n == w + m
        assert (o > 0) <= (src == "<no-doc>")


def _numpy_ivf_knn(spark, k):
    """Pure-numpy recompute of the IVF kNN edges (assignment, probing,
    per-query top-k) using the same rounded-cosine + id-tiebreak ranking
    as the Spark/DuckDB implementations.  Returns {q: [nn, ...]}."""
    import numpy as np

    from iceberg_rest_catalog_spark.llm.similarity import N_CELLS, N_PROBE
    from iceberg_rest_catalog_spark.operators.common import t

    rows = (
        t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = np.round(Xn @ Xn.T, 4)  # [i, j] rounded cosine

    cent_idx = {int(v): i for i, v in enumerate(ids) if v < N_CELLS}
    cells = sorted(cent_idx)  # cell ids
    cmat = cos[:, [cent_idx[c] for c in cells]]  # similarity to each centroid

    def ranked_cells(i):
        return sorted(range(len(cells)), key=lambda j: (-cmat[i, j], cells[j]))

    assign = {int(ids[i]): cells[ranked_cells(i)[0]] for i in range(len(ids))}
    probe = {
        int(ids[i]): {cells[j] for j in ranked_cells(i)[:N_PROBE]}
        for i in range(len(ids))
    }
    idx_of = {int(v): i for i, v in enumerate(ids)}
    knn = {}
    for q in ids:
        q = int(q)
        cand = [
            int(v)
            for v in ids
            if int(v) != q and assign[int(v)] in probe[q]
        ]
        cand.sort(key=lambda v: (-cos[idx_of[q], idx_of[v]], v))
        knn[q] = cand[:k]
    return idx_of, cos, knn


def test_recall_eval_matches_numpy_recompute(spark, qs):
    """Per-query recall equals |numpy-IVF-topk ∩ numpy-exact-topk| / k,
    and the audit is non-degenerate (mean recall in (0, 1])."""
    from iceberg_rest_catalog_spark.llm.similarity import KNN_K, KNN_QSTEP

    idx_of, cos, ivf = _numpy_ivf_knn(spark, KNN_K)
    rows = qs["q_sim_recall_eval"](spark, SF).collect()
    assert rows and all(r.q_vec_id % KNN_QSTEP == 0 for r in rows)
    for r in rows:
        q = r.q_vec_id
        exact = sorted(
            (v for v in idx_of if v != q),
            key=lambda v: (-cos[idx_of[q], idx_of[v]], v),
        )[:KNN_K]
        hits = len(set(exact) & set(ivf[q]))
        assert (r.n_hits, r.recall) == (hits, round(hits / KNN_K, 4)), q
    mean = sum(r.recall for r in rows) / len(rows)
    assert 0 < mean <= 1


def test_knn_bfs_matches_numpy_recompute(spark, qs):
    """Hop distances equal a python BFS over the numpy-recomputed
    symmetrized kNN graph, truncated at BFS_ITERS hops; the seed is at
    distance 0 and every reported node is reachable."""
    from collections import deque

    from iceberg_rest_catalog_spark.operators.graph import BFS_ITERS, BFS_K, BFS_SRC

    _, _, knn = _numpy_ivf_knn(spark, BFS_K)
    adj = {v: set() for v in knn}
    for u, vs in knn.items():
        for v in vs:
            adj[u].add(v)
            adj[v].add(u)
    dist = {BFS_SRC: 0}
    dq = deque([BFS_SRC])
    while dq:
        u = dq.popleft()
        if dist[u] >= BFS_ITERS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    rows = qs["q_graph_knn_bfs"](spark, SF).collect()
    got = {r.vec_id: r.dist for r in rows}
    assert got == dist
    assert got[BFS_SRC] == 0
    assert max(got.values()) <= BFS_ITERS


def test_norm_outliers_matches_numpy(spark, qs):
    """Per-label stats and |z|>2 counts recompute from numpy on the raw
    vectors under the 4dp-rounding discipline."""
    import numpy as np

    from iceberg_rest_catalog_spark.operators.common import t

    vecs = (
        t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .select("label", "embedding")
        .collect()
    )
    by_label = {}
    for r in vecs:
        nrm = round(
            float(np.sqrt(np.sum(np.array(r.embedding, dtype=np.float64) ** 2))), 4
        )
        by_label.setdefault(r.label, []).append(nrm)
    rows = qs["q_embed_norm_outliers"](spark, SF).collect()
    assert {r.label for r in rows} == set(by_label)
    for r in rows:
        ns = np.array(by_label[r.label])
        mean, std = round(float(ns.mean()), 4), round(float(ns.std(ddof=1)), 4)
        assert (r.n, r.mean_norm, r.std_norm) == (len(ns), mean, std)
        assert (r.min_norm, r.max_norm) == (round(float(ns.min()), 4),
                                            round(float(ns.max()), 4))
        assert r.n_outliers == int(np.sum(np.abs(ns - mean) > 2 * std))


def test_centroid_shift_matches_numpy_and_is_stable(spark, qs):
    """cos_shift recomputes from 4dp-rounded per-dim half means and both
    halves are populated.  The fixture's labels are NOT directional
    clusters (per-label means sit near the origin), so the cosine is
    bounded but unconstrained in sign — the numpy recompute is the real
    pin here."""
    import numpy as np

    from iceberg_rest_catalog_spark.operators.common import t

    vecs = (
        t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    halves = {}
    for r in vecs:
        halves.setdefault((r.label, r.vec_id % 2), []).append(
            np.array(r.embedding, dtype=np.float64)
        )
    rows = qs["q_embed_centroid_shift"](spark, SF).collect()
    for r in rows:
        a = np.round(np.mean(halves[(r.label, 0)], axis=0), 4)
        b = np.round(np.mean(halves[(r.label, 1)], axis=0), 4)
        exp = round(float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b))), 4)
        assert abs(r.cos_shift - exp) < 1e-9, r.label
        assert (r.n_a, r.n_b) == (len(halves[(r.label, 0)]),
                                  len(halves[(r.label, 1)]))
        assert -1.0 <= r.cos_shift <= 1.0


def test_pca_var_respects_rayleigh_bound(spark, qs):
    """The fixed-round power-iteration estimate can never EXCEED the true
    top eigenvalue (||Cv||/||v|| <= lambda_1 for every v), trace matches
    numpy's covariance trace at 4dp granularity, and the share is the
    ratio.  The fixture is near-isotropic (tiny spectral gap), so the
    3-round estimate sits below lambda_1 — assert it lands within the
    mean-eigenvalue..lambda_1 band rather than demanding convergence."""
    import numpy as np

    from iceberg_rest_catalog_spark.operators.common import t

    row = qs["q_embed_pca_var"](spark, SF).collect()[0]
    X = np.stack(
        [
            r.embedding
            for r in t(spark, SF, "embeddings")
            .filter("embedding IS NOT NULL")
            .collect()
        ]
    ).astype(np.float64)
    C = np.cov(X.T)
    lam1 = float(np.linalg.eigvalsh(C)[-1])
    assert row.n == len(X)
    assert abs(row.trace_var - np.trace(C)) < 0.05  # 4dp per-entry rounding
    assert row.top_eig <= lam1 + 1e-3
    assert row.top_eig >= np.trace(C) / C.shape[0] * 0.5
    assert abs(row.var_share - round(row.top_eig / row.trace_var, 4)) < 1e-9
    assert 0 < row.var_share <= 1


def test_scale_knob_formulas():
    """The three scale knobs share a contract: identity at/below the
    oracle-pinned operating point (so the registered queries never
    drift), monotone growth with the corpus, bounded caps."""
    from iceberg_rest_catalog_spark.llm.dedup import semantic_k_for
    from iceberg_rest_catalog_spark.llm.similarity import (
        IVF_TARGET_CELL,
        KNN_QSTEP,
        N_CELLS,
        RECALL_TARGET_PROBES,
        ivf_cells_for,
        recall_qstep_for,
    )

    for knob, floor in (
        (recall_qstep_for, KNN_QSTEP),
        (ivf_cells_for, N_CELLS),
        (semantic_k_for, 8),
    ):
        assert knob(0) == floor and knob(100) == floor  # identity at fixture scale
        prev = 0
        for n in (10**3, 10**4, 10**6, 10**8):
            cur = knob(n)
            assert cur >= prev
            prev = cur
    # targets actually hold once past the floor
    assert recall_qstep_for(10**6) == 10**6 // RECALL_TARGET_PROBES
    assert ivf_cells_for(10**6) == 10**6 // IVF_TARGET_CELL
    assert ivf_cells_for(10**12) == 65_536  # broadcast-table cap


def test_recall_eval_scaled_stride_shrinks_batch(spark, qs):
    """The parameterized core actually honours the stride: doubling it
    halves the probe batch, every probe id respects the modulus, and the
    registered query equals the core at the pinned stride."""
    from iceberg_rest_catalog_spark.llm.similarity import (
        KNN_QSTEP,
        _recall_eval,
    )

    pinned = sorted(
        (r.q_vec_id, r.n_hits) for r in qs["q_sim_recall_eval"](spark, SF).collect()
    )
    core = sorted(
        (r.q_vec_id, r.n_hits)
        for r in _recall_eval(spark, SF, KNN_QSTEP).collect()
    )
    assert pinned == core
    wide = _recall_eval(spark, SF, KNN_QSTEP * 2).collect()
    assert all(r.q_vec_id % (KNN_QSTEP * 2) == 0 for r in wide)
    assert 0 < len(wide) < len(pinned)


def test_phash_dedup_matches_bruteforce_python(spark, qs):
    """The chunk-blocked pair set equals the BRUTE-FORCE hamming<=3 pair
    set recomputed in python over raw payload bytes (pigeonhole: <=3
    differing bits must leave one 16-bit chunk intact), and the fixture's
    planted near-dups actually surface."""
    from iceberg_rest_catalog_spark.operators.common import t

    docs = (
        t(spark, SF, "documents")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )
    ph = {}
    for r in docs:
        b = r.text.encode("utf-8")
        if len(b) < 64:
            continue
        stride = len(b) // 64
        sample = [b[i * stride] for i in range(64)]
        mean = sum(sample) / 64.0
        ph[r.doc_id] = sum(1 << i for i, v in enumerate(sample) if v > mean)
    expect = set()
    ids = sorted(ph)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            if bin(ph[a] ^ ph[b]).count("1") <= 3:
                expect.add((a, b))
    # Brute-force equality is only meaningful while no chunk bucket
    # exceeds the query's 100-row hot-bucket cap; assert that fixture
    # property explicitly so a future fixture change fails HERE with a
    # clear message instead of as a confusing set difference below.
    from collections import Counter

    buckets = Counter()
    for h in ph.values():
        for cix, ch in enumerate(
            [h & 0xFFFF, (h >> 16) & 0xFFFF,
             (h >> 32) & 0xFFFF, (h >> 48) & 0xFFFF]
        ):
            buckets[(cix, ch)] += 1
    assert max(buckets.values()) <= 100, (
        "fixture now has a chunk bucket past the 100-row cap; the "
        "brute-force recompute must apply the same suppression"
    )
    rows = qs["q_multimodal_phash_dedup"](spark, SF).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == expect
    assert got  # planted near-dups surface
    # cap doesn't bind on the fixture -> accounting columns report zero
    assert all(r.n_hot_buckets == 0 and r.n_hot_docs == 0 for r in rows)


def test_random_projection_matches_numpy_and_concentrates(spark, qs):
    """Every row matches the hashlib/numpy recompute and the JL norm
    ratio concentrates around 1 (a 16-dim +-1 projection preserves norms
    in expectation)."""
    import numpy as np

    from iceberg_rest_catalog_spark.llm.embedding import RP_K, _rp_signs
    from iceberg_rest_catalog_spark.operators.common import t

    S = np.array(_rp_signs(), dtype=np.float64)
    assert S.shape == (RP_K, 64) and set(np.unique(S)) == {-1.0, 1.0}
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in t(spark, SF, "embeddings")
        .filter("embedding IS NOT NULL")
        .collect()
    }
    rows = qs["q_embed_random_projection"](spark, SF).collect()
    assert {r.vec_id for r in rows} == set(vecs)
    ratios = []
    for r in rows[:50]:
        x = vecs[r.vec_id]
        y = (S @ x) / 4.0
        exp_ratio = round(
            float(np.sqrt(y @ y) / np.sqrt(x @ x)), 4
        )
        assert abs(r.norm_ratio - exp_ratio) < 1e-9
        assert abs(r.y0 - round(float(y[0]), 4)) < 1e-9
        assert abs(r.y1 - round(float(y[1]), 4)) < 1e-9
    ratios = [r.norm_ratio for r in rows]
    assert 0.8 < sum(ratios) / len(ratios) < 1.2


def test_lang_mixture_shares_and_entropy(spark, qs):
    """Per-source shares sum to 1, exactly one dominant language per
    source, and the entropy recomputes from the counts."""
    import math
    from collections import defaultdict

    rows = qs["q_text_lang_mixture"](spark, SF).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for src, rs in by_src.items():
        tot = sum(r.n for r in rs)
        assert abs(sum(r.share for r in rs) - 1.0) < 5e-4
        assert sum(r.is_dominant for r in rs) == 1
        dom = max(rs, key=lambda r: (r.n, "".join(chr(255 - ord(c)) for c in r.lang)))
        # the dominant row must match the documented (n desc, lang asc)
        # tiebreak exactly, not just carry the max count
        marked = next(r for r in rs if r.is_dominant)
        assert (marked.lang, marked.n) == (dom.lang, dom.n)
        ent = -sum((r.n / tot) * math.log2(r.n / tot) for r in rs)
        for r in rs:
            assert abs(r.src_entropy - round(ent, 4)) < 1e-9


def test_kmeans_elbow_monotone_and_consistent(spark, qs):
    """Inertia is non-increasing in k (more centroids can only tighten a
    Lloyd fit seeded by nesting prefixes — verified empirically on the
    fixture, asserted as the elbow curve's defining shape), every sweep
    member covers the full corpus, k=8 matches q_cluster_kmeans' inertia
    recomputed from its own assignment, and mean_d2 = inertia / n."""
    rows = sorted(qs["q_embed_kmeans_elbow"](spark, SF).collect(),
                  key=lambda r: r.k)
    from iceberg_rest_catalog_spark.llm.similarity import ELBOW_KS

    assert [r.k for r in rows] == list(ELBOW_KS)
    ns = {r.n for r in rows}
    assert len(ns) == 1  # same corpus at every k
    inertias = [r.inertia for r in rows]
    assert inertias == sorted(inertias, reverse=True)
    for r in rows:
        assert abs(r.mean_d2 - round(r.inertia / r.n, 4)) < 2e-4


def test_phash_hot_bucket_cap_binds(spark, qs, tmp_path):
    """On a degenerate corpus (hundreds of docs with identical payload
    statistics) every chunk bucket blows past the cap and the blocking
    join suppresses them ALL — output empty instead of ~n^2/2 pairs.  A
    handful of genuinely distinct docs still pair among themselves."""
    import pyspark.sql.functions as F

    base = "word " * 40
    rows = [(i, base + "tail") for i in range(300)]  # one hot bucket family
    # two near-dup distinct docs (cold buckets, hamming 0 pair)
    rows += [(1000, "zebra quokka " * 12), (1001, "zebra quokka " * 12)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = qs["q_multimodal_phash_dedup"](spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # the 300-doc identical family would contribute 300*299/2 = 44850
    # pairs; the cap suppresses the family entirely
    assert (1000, 1001) in pairs
    assert len(pairs) == 1


def test_dedup_report_conserves_corpus(spark, qs):
    """The multiplicity rows partition the corpus exactly: docs sum to
    |corpus|, chars to total chars, removable = docs - clusters per row,
    the size-1 row removes nothing, and every removable count recomputes
    from the raw prefix clusters."""
    import hashlib
    from collections import defaultdict

    from iceberg_rest_catalog_spark.operators.common import t

    docs = t(spark, SF, "documents").select("doc_id", "n_chars", "text").collect()
    members = defaultdict(list)
    for r in docs:
        h = hashlib.md5((r.text or "").lower()[:64].encode()).hexdigest()
        members[h].append((r.doc_id, r.n_chars))
    by_sz = defaultdict(lambda: [0, 0, 0, 0])  # clusters, docs, chars, removable_chars
    for ids in members.values():
        kept = min(ids)[1]
        b = by_sz[len(ids)]
        b[0] += 1
        b[1] += len(ids)
        b[2] += sum(c for _, c in ids)
        b[3] += sum(c for _, c in ids) - kept
    rows = qs["q_dedup_report"](spark, SF).collect()
    assert sum(r.docs for r in rows) == len(docs)
    assert sum(r.chars_total for r in rows) == sum(r.n_chars for r in docs)
    for r in rows:
        e = by_sz[r.sz]
        assert (r.n_clusters, r.docs, r.chars_total, r.chars_removable) == tuple(e)
        assert r.removable_docs == r.docs - r.n_clusters
        if r.sz == 1:
            assert r.removable_docs == 0 and r.chars_removable == 0
    assert any(r.sz > 1 for r in rows)  # the fixture has prefix dups


def test_ngram_coverage_recomputes_and_inverts_decontaminate(spark, qs):
    """Coverage recomputes from raw python gram sets, is a proper rate,
    and inverts q_decontaminate's direction: a train doc flagged there
    shares >=1 gram with SOME eval doc, so total coverage hits are
    positive iff decontaminate flags anything."""
    import hashlib
    from collections import defaultdict

    from iceberg_rest_catalog_spark.operators.common import t

    docs = t(spark, SF, "documents").select("doc_id", "text").collect()
    grams = {}
    for r in docs:
        s = (r.text or "").split(" ")
        n = max(len(s) - 7, 1)
        grams[r.doc_id] = {" ".join(s[i:i + 8]) for i in range(n)}
    is_eval = {
        r.doc_id: hashlib.md5(str(r.doc_id).encode()).hexdigest()[0] in "01"
        for r in docs
    }
    train = set()
    for d, gs in grams.items():
        if not is_eval[d]:
            train |= gs
    rows = qs["q_text_ngram_coverage"](spark, SF).collect()
    assert {r.doc_id for r in rows} == {d for d in grams if is_eval[d]}
    for r in rows:
        gs = grams[r.doc_id]
        cov = len(gs & train)
        assert (r.n_grams, r.covered) == (len(gs), cov)
        assert abs(r.coverage - round(cov / len(gs), 4)) < 1e-9
    decon = qs["q_decontaminate"](spark, SF).collect()
    assert (sum(r.covered for r in rows) > 0) == (len(decon) > 0)


# -- round-10: the flat/two-level assignment knob -----------------------------


def test_assignment_knob_branch_equivalence(spark, qs):
    """The round-10 assignment knob (VERDICT r9 item 2).  (a) The switch
    point: flat at ASSIGN_FLAT_MAX vectors, two-level strictly above.
    (b) Forcing the TWO-LEVEL arm on BOTH engines at fixture scale
    (Spark: two_level=True; DuckDB: the ivf_ranked_ctes branch-guard
    constant rewritten to 0) yields row-identical kNN joins and
    kNN-graph edges — so past ASSIGN_FLAT_MAX, where the registered
    operators actually flip, the value-hash twin holds on the arm they
    take.  (c) The registered q_sim_knn_batch at fixture scale (flat
    arm) is unchanged vs the explicit flat call — the historical shape
    survives the knob."""
    import duckdb

    from iceberg_rest_catalog_spark.llm.similarity import (
        ASSIGN_FLAT_MAX,
        KNN_QSTEP,
        _emb_count,
        _knn_batch,
        _knn_batch_oracle_scaled,
        assignment_two_level,
        ivf_cells_for,
    )
    from iceberg_rest_catalog_spark.operators.graph import (
        _knn_edges,
        _knn_edges_ctes,
    )

    assert not assignment_two_level(ASSIGN_FLAT_MAX)
    assert assignment_two_level(ASSIGN_FLAT_MAX + 1)

    n = _emb_count(spark, SF)
    assert not assignment_two_level(n)  # fixture sits on the flat arm
    cells = ivf_cells_for(n)

    # (c) registered == explicit flat at fixture scale
    reg = sorted(tuple(r) for r in qs["q_sim_knn_batch"](spark, SF).collect())
    flat = sorted(
        tuple(r)
        for r in _knn_batch(
            spark, SF, KNN_QSTEP, n_cells=cells, two_level=False
        ).collect()
    )
    assert reg == flat

    # (b) forced two-level, both engines
    def force_two_level(sql: str) -> str:
        return sql.replace(f"<= {ASSIGN_FLAT_MAX}", "<= 0").replace(
            f"> {ASSIGN_FLAT_MAX}", "> 0"
        )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    got = sorted(
        (r.q_vec_id, r.nn_vec_id, r.rank, r.cos)
        for r in _knn_batch(
            spark, SF, KNN_QSTEP, n_cells=cells, two_level=True
        ).collect()
    )
    want = sorted(
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in con.execute(
            force_two_level(_knn_batch_oracle_scaled(KNN_QSTEP))
        ).fetchall()
    )
    assert got == want and got  # nonempty

    _, edges = _knn_edges(spark, SF, two_level=True)
    got_e = sorted((r.u, r.v) for r in edges.collect())
    want_e = sorted(
        (int(u), int(v))
        for u, v in con.execute(
            force_two_level(
                "WITH " + _knn_edges_ctes() + " SELECT u, v FROM edges"
            )
        ).fetchall()
    )
    assert got_e == want_e and got_e


def test_ann_ivf_knob_branch_equivalence(spark, qs):
    """q_sim_ann_ivf's round-11 knob migration (VERDICT r10 item 2):
    (a) registered == explicit-flat at fixture scale (historical shape
    survives); (b) the forced TWO-LEVEL arm matches the oracle with its
    branch guard forced to the two-level side — so past ASSIGN_FLAT_MAX
    the value-hash twin holds on the arm both engines actually take."""
    import duckdb

    from iceberg_rest_catalog_spark.llm.similarity import (
        _IVF_ORACLE,
        ASSIGN_FLAT_MAX,
        _ann_ivf,
        _emb_count,
        assignment_two_level,
        ivf_cells_for,
    )

    n = _emb_count(spark, SF)
    assert not assignment_two_level(n)  # fixture sits on the flat arm
    cells = ivf_cells_for(n)

    reg = sorted(tuple(r) for r in qs["q_sim_ann_ivf"](spark, SF).collect())
    flat = sorted(
        tuple(r)
        for r in _ann_ivf(spark, SF, n_cells=cells, two_level=False).collect()
    )
    assert reg == flat and reg

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    forced = _IVF_ORACLE.replace(f"<= {ASSIGN_FLAT_MAX}", "<= 0").replace(
        f"> {ASSIGN_FLAT_MAX}", "> 0"
    )
    got = sorted(
        (r.vec_id, r.label, r.cell, r.cos)
        for r in _ann_ivf(spark, SF, n_cells=cells, two_level=True).collect()
    )
    want = sorted(
        (int(a), b, int(c), float(d))
        for a, b, c, d in con.execute(forced).fetchall()
    )
    assert got == want and got


def test_bpe_train_matches_sequential_reference(spark, qs):
    """Replay CLASSIC sequential BPE driver-side (dict word-freqs, tuple
    symbol lists, the textbook left-to-right scan-and-skip merge) and
    compare the whole merge table — proving the relational formulation
    (merge-every-occurrence + run-parity for lhs==rhs) IS the sequential
    algorithm, plus the compression-curve property (tokens_after strictly
    decreasing, each drop = the number of merged occurrences)."""
    from collections import Counter

    from iceberg_rest_catalog_spark.llm.curation import N_MERGES
    from iceberg_rest_catalog_spark.io import load_table

    rows = qs["q_text_bpe_train"](spark, SF).collect()
    assert len(rows) == N_MERGES

    docs = load_table(spark, SF, "documents").select("text").collect()
    freqs = Counter(
        w for r in docs if r.text for w in r.text.split(" ") if w
    )
    words = {w: tuple(w) for w in freqs}

    expect = []
    for step in range(1, N_MERGES + 1):
        pc = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # argmax with (freq DESC, lhs, rhs) tiebreak
        (lhs, rhs), fcnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = lhs + rhs
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
        tokens_after = sum(len(s) * freqs[w] for w, s in words.items())
        expect.append((step, lhs, rhs, merged, fcnt, tokens_after))

    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_freq, r.tokens_after)
        for r in rows
    ]
    assert got == expect

    curve = [r.tokens_after for r in rows]
    assert all(a > b for a, b in zip(curve, curve[1:]))


def test_bpe_train_batched_matches_batched_reference(spark, qs):
    """The round-11 batch_m knob (VERDICT r10 item 5): replay the SAME
    batched selection rule driver-side (one pair count per batch, greedy
    top-m skipping pairs that share a symbol with — or equal the
    concatenation of — an earlier pick, textbook scan-and-skip
    application) and compare the whole merge table.  Also pins the
    registered query to batch_m=1 (sequential contract unchanged)."""
    from collections import Counter

    from iceberg_rest_catalog_spark.llm.curation import (
        BPE_BATCH_M,
        _bpe_train,
    )
    from iceberg_rest_catalog_spark.io import load_table

    assert BPE_BATCH_M == 1  # registered contract stays sequential

    M, TOTAL = 4, 12
    rows = _bpe_train(spark, SF, n_merges=TOTAL, batch_m=M).collect()
    assert len(rows) == TOTAL

    docs = load_table(spark, SF, "documents").select("text").collect()
    freqs = Counter(w for r in docs if r.text for w in r.text.split(" ") if w)
    words = {w: tuple(w) for w in freqs}

    def apply_merge(lhs, rhs):
        merged = lhs + rhs
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)

    expect, step = [], 0
    while step < TOTAL:
        want = min(M, TOTAL - step)
        pc = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        cand = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        used, picked = set(), []
        for (lhs, rhs), f in cand[: 4 * want]:
            if len(picked) == want:
                break
            if lhs in used or rhs in used or (lhs + rhs) in used:
                continue
            picked.append((lhs, rhs, f))
            used.update((lhs, rhs, lhs + rhs))
        for lhs, rhs, fcnt in picked:
            apply_merge(lhs, rhs)
            step += 1
            tokens = sum(len(s) * freqs[w] for w, s in words.items())
            expect.append((step, lhs, rhs, lhs + rhs, fcnt, tokens))

    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_freq, r.tokens_after)
        for r in rows
    ]
    assert got == expect
    curve = [r.tokens_after for r in rows]
    assert all(a > b for a, b in zip(curve, curve[1:]))


def test_range_ivf_contains_knn_hits_above_tau(spark, qs):
    """q_sim_range_ivf (round 11) is the threshold dual of
    q_sim_knn_batch over the SAME probe geometry (at fixture scale both
    strides floor at KNN_QSTEP): every top-k hit with cos >= RANGE_TAU
    must appear in the range result with the identical rounded cosine,
    and every range row must clear the threshold."""
    from iceberg_rest_catalog_spark.llm.similarity import RANGE_TAU

    rng = {
        (r.q_vec_id, r.nn_vec_id): r.cos
        for r in qs["q_sim_range_ivf"](spark, SF).collect()
    }
    assert rng and all(c >= RANGE_TAU for c in rng.values())
    knn = [
        r
        for r in qs["q_sim_knn_batch"](spark, SF).collect()
        if r.cos >= RANGE_TAU
    ]
    assert knn  # the fixture has in-threshold top-k hits
    for r in knn:
        assert rng.get((r.q_vec_id, r.nn_vec_id)) == r.cos


def test_data_epochs_water_filling_invariants(spark, qs):
    """UniMax allocation properties: allocations sum to the budget
    (14/5 x corpus tokens), capped sources sit at exactly E_MAX epochs,
    uncapped sources share one common level below E_MAX and above every
    capped source's capacity, and both arms are non-empty at fixture
    scale (the knob-tuning precondition)."""
    from iceberg_rest_catalog_spark.llm.curation import (
        BUDGET_DEN,
        BUDGET_NUM,
        E_MAX,
    )

    rows = qs["q_data_epochs"](spark, SF).collect()
    total = sum(r.toks for r in rows)
    budget = BUDGET_NUM * total / BUDGET_DEN
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 1e-4 * budget
    capped = [r for r in rows if r.capped]
    uncapped = [r for r in rows if not r.capped]
    assert capped and uncapped
    for r in capped:
        assert r.epochs == E_MAX and r.alloc_tokens == E_MAX * r.toks
    levels = {r.alloc_tokens for r in uncapped}
    assert len(levels) == 1
    level = levels.pop()
    assert all(r.epochs < E_MAX for r in uncapped)
    assert all(r.alloc_tokens <= level for r in capped)
