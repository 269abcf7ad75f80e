"""Similarity search over ``embeddings.embedding`` (array<float>, 64-dim).

Cosine math is pure higher-order-function arithmetic (zip_with + aggregate)
— JVM-side, no Python, no UDF. Three search shapes:

- q_sim_topk:   brute-force top-k vs one query vector. The broadcast join
                ships the 1-row query to every executor; orderBy+limit
                compiles to TakeOrderedAndProject (k rows per partition to
                the driver, never the full score table).
- q_sim_pairs:  all-pairs >= threshold inside label blocks (block size
                bounds the quadratic term; the 100 TB shape is the same
                join keyed by an LSH bucket instead of a label).
- q_sim_ann_ivf: IVF-style ANN — assign every vector to its nearest
                coarse centroid (the first ivf_cells_for(corpus) vectors
                as deterministic centroids; two-level assignment above
                ASSIGN_FLAT_MAX), probe the N_PROBE cells nearest to the
                query, brute-force only inside probed cells. At scale the
                assignment is a broadcast join against the centroid table
                and cell id becomes the partition key, so the probe reads
                N_PROBE/cells of the data.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.functions import pandas_udf

from ..operators.common import r4, t
from ..registry import query

TOP_K = 10
PAIR_THRESHOLD = 0.35
N_CELLS = 16
N_PROBE = 4
QUERY_VEC_ID = 0
LSH_BITS = 4
DIM = 64


def _srp_signs(j: int) -> list[int]:
    """Deterministic +-1 hyperplane for SRP-LSH bit j (splitmix-style hash
    of (j, d) — stable across runs/clusters, no RNG state)."""
    out = []
    for d in range(DIM):
        x = (j * 1_000_003 + d) * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        out.append(1 if x & 1 else -1)
    return out


_SRP = [_srp_signs(j) for j in range(LSH_BITS)]


def _emb(spark, sf_dir):
    """embeddings with missing (NULL) vectors excluded — the uniform
    vector-op contract: a row without an embedding cannot be searched,
    clustered or quantized (NULL rows crash the numpy pair scorer and
    diverge between engines otherwise; found by the NULL-injection
    audit).

    widen(): the per-vector float math downstream (norms, dot products,
    centroid assignment) is compute-heavy map work; see
    operators/common.py widen — parallelizes the single-split bench scan,
    no-op on a real many-split corpus."""
    from ..operators.common import widen

    return widen(
        t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull()),
        "vec_id",
    )


def _emb_count(spark, sf_dir) -> int:
    """Non-null embedding count for the scale-knob formulas — the same
    quantity the oracles' count(*) FROM e computes.  Deliberately skips
    _emb's widen(): a count needs no fan-out parallelism, and paying the
    32-way repartition shuffle for a 1-row aggregate measurably taxed
    every knob-default query (~0.3-0.7 s per invocation at bench scale).
    One map-combined scan-and-count job, row-group-metadata cheap on any
    real parquet layout."""
    return (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .count()
    )


def _dbl(col):
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def det_gram(Q, M):
    """DETERMINISTIC block dot-product Q·Mᵀ (float64): accumulates over
    the dim axis in a fixed sequential loop of IEEE-exact elementwise
    multiply-adds — never a BLAS GEMM, whose accumulation order
    (threads/SIMD blocking) is environment-dependent.  A 1-ulp GEMM
    difference on a value adjacent to a 4-dp midpoint flips a round()
    output and with it any rank/threshold built on it — the r14
    q_graph_modularity driver red.  The fixed dim-order accumulation is
    bit-identical on every BLAS/CPU and matches the operation order of
    the JVM zip_with fold (acc + q_i*m_i, index order), at vectorized
    numpy speed (dim elementwise passes, not |pairs|*dim scalar ops)."""
    import numpy as np

    Q = np.asarray(Q, dtype=np.float64)
    M = np.asarray(M, dtype=np.float64)
    S = np.zeros((Q.shape[0], M.shape[0]))
    for d in range(Q.shape[1]):
        S += np.outer(Q[:, d], M[:, d])
    return S


def det_rowdot(A, B):
    """DETERMINISTIC per-row dot of equal-shape float64 matrices — the
    fixed dim-order twin of det_gram for paired rows (no einsum: numpy's
    reduction kernels carry CPU-dispatch-dependent SIMD lane grouping)."""
    import numpy as np

    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    s = np.zeros(A.shape[0])
    for d in range(A.shape[1]):
        s += A[:, d] * B[:, d]
    return s


def det_norm(M):
    """DETERMINISTIC per-row L2 norm (fixed dim-order sum of squares)."""
    import numpy as np

    return np.sqrt(det_rowdot(M, M))


GB_BAND = 1e-3  # guard-band half-width, in cos*1e4 units (= 1e-7 cosine)


def gb_gram_cos(Q, M, qn=None, mn=None):
    """GUARD-BAND two-pass cosine/dot block (VERDICT r15 item 4): one
    BLAS GEMM computes the bulk, then every entry whose |value|*1e4 lies
    within GB_BAND of a .5 rounding boundary is re-scored with the
    deterministic fixed-dim-order kernel and overwritten.

    The r15 det-everywhere swap (det_gram's 64 sequential outer-product
    passes) bought determinism at ~64x the memory traffic of one GEMM —
    q_graph_triangles 1.98x, q_graph_pagerank 1.56x, q_sim_rerank 1.50x
    idle regressions (r15 verdict, Performance).  This two-pass form is
    PROVABLY identical to det-everywhere at GEMM speed:

    - GEMM vs fixed-order accumulation differ by summation order only —
      tens of float64 ulps, <= ~1e-13 on unit-normalized 64-dim data;
    - the band is 1e-7 cosine units, four orders wider, so any entry
      whose GEMM value sits OUTSIDE the band has its det twin on the
      same side of the boundary and rounds to the identical 4-dp value;
    - every entry INSIDE the band is replaced by the det value itself
      (det_rowdot over the flagged (i,j) pairs — same op order as
      det_gram entry (i,j)).

    On the committed fixtures the flagged set is empty (measured minimum
    margin >= 2.9e-4 in cos*1e4 units, r15 verdict), so the output is
    the GEMM path at full speed; the re-score arm exists for corpora
    that do land near a boundary.  With qn/mn given the result is the
    cosine matrix (divided by np.outer(qn, mn) exactly as the det
    callers did); without, the raw dot block."""
    import numpy as np

    Q = np.asarray(Q, dtype=np.float64)
    M = np.asarray(M, dtype=np.float64)
    S = Q @ M.T  # BLAS bulk pass; near-boundary entries re-scored below
    if qn is not None:
        S /= np.outer(qn, mn)
    b = np.abs(S) * 1e4
    ii, jj = np.nonzero(np.abs(b - np.floor(b) - 0.5) < GB_BAND)
    if ii.size:
        det = det_rowdot(Q[ii], M[jj])
        if qn is not None:
            det /= qn[ii] * mn[jj]
        S[ii, jj] = det
    return S


@pandas_udf(DoubleType())
def _dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized batch dot product.

    Catalyst's higher-order functions are interpreted per element (no
    codegen), so for the PAIR-scoring hot path — millions of candidate pairs
    × vector dim — a vectorized numpy fold over the Arrow batch is ~5-10×
    faster.  Per-row expressions (norms, single-query scoring) stay
    JVM-side.  Determinism (r15): the fold is det_rowdot's fixed dim-order
    accumulation, not einsum — einsum's reduction uses CPU-dispatched SIMD
    whose lane grouping can differ across hosts, the same environment-
    variance class as the BLAS GEMM that broke q_graph_modularity in r14
    (these dots feed round()+row_number in q_embed_matryoshka)."""
    import numpy as np

    return pd.Series(det_rowdot(np.stack(a.values), np.stack(b.values)))


def _norm(c):
    return F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _cos(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


@query(
    "q_sim_topk",
    oracle=f"""
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
                  WHERE vec_id = {QUERY_VEC_ID})), 4) AS cos
    FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def q_sim_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector."""
    e = _emb(spark, sf_dir)
    q = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_dbl("embedding").alias("qe"))
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            r4(_cos(_dbl("embedding"), F.col("qe"))).alias("cos"),
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
    )


@query(
    "q_sim_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 4) AS cos
    FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 4) >= {PAIR_THRESHOLD}
    """,
)
def q_sim_pairs(spark, sf_dir):
    """All pairs with cosine >= threshold inside each label block —
    block-matrix scoring (one shuffle by label, numpy matmul per block;
    see q_sim_lsh for the pattern rationale)."""
    e = _emb(spark, sf_dir).withColumn("emb", _dbl("embedding"))
    out = _block_pairs(
        e.select("vec_id", F.col("label").cast("string").alias("block"), "emb")
    )
    return out.select(
        "id_a", "id_b", F.col("block").cast("int").alias("label"), "cos"
    )


def _block_pairs(df):
    """Block-matrix pair scoring: df(vec_id, block, emb) -> all within-block
    pairs with rounded cosine >= PAIR_THRESHOLD. One shuffle keyed by block;
    per-block scoring is a single numpy matmul inside applyInPandas, so only
    |corpus| rows cross the Arrow boundary, never |pairs|."""

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "block": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "block": "str", "cos": "float64"}
            )
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["emb"].values)
        # Guard-band two-pass (r16): GEMM bulk + det re-score of any
        # entry within GB_BAND of a rounding boundary — provably equal to
        # the r15 det-everywhere scoring (the rounded cosine feeds a >=
        # threshold; see gb_gram_cos) at GEMM speed.
        m = m / det_norm(m)[:, None]
        cos = np.round(gb_gram_cos(m, m), 4)
        ia, ib = np.triu_indices(len(ids), k=1)
        lo, hi = np.minimum(ids[ia], ids[ib]), np.maximum(ids[ia], ids[ib])
        keep = cos[ia, ib] >= PAIR_THRESHOLD
        return pd.DataFrame(
            {
                "id_a": lo[keep],
                "id_b": hi[keep],
                "block": pdf["block"].iloc[0],
                "cos": cos[ia, ib][keep],
            }
        )

    return df.groupBy("block").applyInPandas(
        _score, schema="id_a long, id_b long, block string, cos double"
    )


def _lsh_bucket_sql() -> str:
    bits = []
    for j in range(LSH_BITS):
        arr = "[" + ",".join(f"{s}.0" for s in _SRP[j]) + "]"
        bits.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}) > 0 "
            f"THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def srp_bucket(col: str = "emb"):
    """SRP-LSH bucket key: LSH_BITS sign bits of dot(v, fixed hyperplanes),
    concatenated to a '0101'-style string. JVM-side HOF arithmetic; the
    DuckDB twin is :func:`_lsh_bucket_sql`. Shared by q_sim_lsh and the
    caption-curation op (llm/curation.py:q_caption_pairs)."""
    return F.concat(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        col,
                        F.array(*[F.lit(float(s)) for s in _SRP[j]]),
                        lambda x, s: x * s,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                "1",
            ).otherwise("0")
            for j in range(LSH_BITS)
        ]
    )


@query(
    "q_sim_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding, {_lsh_bucket_sql()} AS bucket
      FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        c.embedding::DOUBLE[]), 4) AS cos
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       c.embedding::DOUBLE[]), 4) >= {PAIR_THRESHOLD}
    """,
)
def q_sim_lsh(spark, sf_dir):
    """SRP-LSH-bucketed similarity pairs: sign bits of dot(v, fixed random
    hyperplanes) form the block key; cosine is verified only inside buckets.

    The unlabeled-corpus counterpart of q_sim_pairs: bucket count scales as
    2^bits so block sizes stay bounded as the corpus grows — candidate
    generation is a hash-partitioned self-join, never all-pairs."""
    e = _emb(spark, sf_dir).withColumn("emb", _dbl("embedding"))
    eb = e.withColumn("block", srp_bucket("emb")).select("vec_id", "block", "emb")
    return _block_pairs(eb).select(
        "id_a", "id_b", F.col("block").alias("bucket"), "cos"
    )


KNN_K = 3
KNN_QSTEP = 25  # query set = vec_id % 25 == 0 (deterministic, ~4%)

RECALL_TARGET_PROBES = 400  # probe-batch size the recall audit converges at
IVF_TARGET_CELL = 512  # target per-cell population for the cell-count knob

# SQL twins of ivf_cells_for / recall_qstep_for, computed from count(*)
# over the same `e` CTE the Python computes .count() over — so the
# REGISTERED queries can run the scale knob and the DuckDB oracle stays
# an exact value-hash twin at any corpus size (VERDICT r8 item 2).  At
# every fixture SF (500 / 2,000 vectors) both formulas floor at the
# original constants, so the sf0.01 gate is bit-identical to the
# pre-knob plans; they depart exactly where the x10 decade measurements
# said the fixed constants go super-linear (SCALE.md round 8).
SCALED_CELLS_SQL = (
    f"(SELECT GREATEST({N_CELLS}, LEAST(65536, count(*) // {IVF_TARGET_CELL}))"
    " FROM e)"
)
SCALED_QSTEP_SQL = (
    f"(SELECT GREATEST({KNN_QSTEP}, (count(*) + {RECALL_TARGET_PROBES - 1})"
    f" // {RECALL_TARGET_PROBES}) FROM e)"
)

# -- assignment-strategy knob (flat vs hierarchical two-level) ----------------

N_COARSE_MIN = 4
ASSIGN_FLAT_MAX = 50_000  # vectors; the flat/two-level switch point


def assignment_two_level(n_vectors: int) -> bool:
    """Assignment-strategy knob (VERDICT r9 item 2): with cells =
    ivf_cells_for(n) ~ n/IVF_TARGET_CELL, FLAT assignment scores every
    centroid for every vector — n*cells ~ n^2/512 cosines, the one
    super-linear term the x100 program measured (104.3 s at 200k vectors,
    SCALE.md round 9).  Above ASSIGN_FLAT_MAX the registered IVF-family
    operators (q_sim_knn_batch, q_sim_recall_eval, q_graph_knn_bfs,
    q_graph_jaccard_neighbors) switch to hierarchical two-level coarse
    quantization (2n*sqrt(cells) cosines — the q_sim_knn_batch_2level
    geometry); below it flat assignment is both optimal and the exact
    historical fixture shape.  At the switch point n=50k, cells~97, flat
    = ~4.9M cosines — comfortably sub-second — while the n^2 term is
    about to bind (200k -> 78M).  The SQL twin is the same count(*)
    compared to the same constant (ivf_ranked_ctes), so both engines take
    the same branch at any corpus size."""
    return n_vectors > ASSIGN_FLAT_MAX


def _coarse_sql() -> str:
    """SQL twin of ``max(N_COARSE_MIN, isqrt(cells))`` — for cells <=
    65,536 the correctly-rounded double sqrt agrees with integer isqrt."""
    return (
        f"GREATEST({N_COARSE_MIN}, CAST(floor(sqrt(CAST({SCALED_CELLS_SQL}"
        " AS DOUBLE))) AS BIGINT))"
    )


def ivf_ranked_ctes(qstep_sql=None) -> str:
    """Shared oracle CTE block ``e .. cent .. ranked .. assigned, probed``
    for the IVF family, with the ASSIGNMENT BRANCH as SQL: the flat
    all-cells ranking feeds `ranked` when count(*) <= ASSIGN_FLAT_MAX,
    the group-scoped two-level ranking when count(*) > ASSIGN_FLAT_MAX —
    the exact value-hash twin of assignment_two_level(count) at any
    corpus size (both arms are computed, the constant guard keeps exactly
    one; at oracle scale both are trivially cheap).  `probed` keeps each
    vector's top-N_PROBE candidate cells, optionally restricted to the
    ``vec_id % qstep`` query batch (qstep_sql=None = every vector probes,
    the kNN-graph edge-build shape)."""
    qfilter = f"vec_id % {qstep_sql} = 0 AND " if qstep_sql is not None else ""
    # HOIST DISCIPLINE (r16): every cosine is computed in a plain
    # projection CTE (fs/vs/rsflat/rs2) and the row_number windows order
    # by the projected column.  With the detvec unrolled float64
    # expressions, an expression INSIDE a window ORDER BY makes DuckDB's
    # window operator hold per-thread expression state that scales with
    # tree size x pipeline duplication — measured OOM (>100 GB) at 32
    # threads on a 500-vector corpus; the hoisted shape runs the same
    # plan in ~1 s bounded.  Values are identical: same expression, same
    # tie-breaks, just a named column.
    return f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS cell, emb AS c FROM e WHERE vec_id < {SCALED_CELLS_SQL}),
coarse AS (SELECT vec_id AS g, emb AS cg FROM e WHERE vec_id < {_coarse_sql()}),
fs AS (
  SELECT f.cell, f.c, coarse.g,
         round(list_cosine_similarity(f.c, coarse.cg), 4) AS gc
  FROM cent f CROSS JOIN coarse),
f2c AS (
  SELECT cell, c, g FROM (
    SELECT cell, c, g,
           row_number() OVER (
             PARTITION BY cell ORDER BY gc DESC, g) AS rn
    FROM fs
  ) WHERE rn = 1),
vs AS (
  SELECT e.vec_id, e.emb, coarse.g,
         round(list_cosine_similarity(e.emb, coarse.cg), 4) AS gc
  FROM e CROSS JOIN coarse),
v2c AS (
  SELECT vec_id, emb, g FROM (
    SELECT vec_id, emb, g,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY gc DESC, g) AS rn
    FROM vs
  ) WHERE rn = 1),
rsflat AS (
  SELECT e.vec_id, e.emb, cent.cell,
         round(list_cosine_similarity(e.emb, cent.c), 4) AS cc
  FROM e CROSS JOIN cent),
rs2 AS (
  SELECT v.vec_id, v.emb, f.cell,
         round(list_cosine_similarity(v.emb, f.c), 4) AS cc
  FROM v2c v JOIN f2c f USING (g)),
ranked AS (
  SELECT vec_id, emb, cell, rn FROM (
    SELECT vec_id, emb, cell,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
    FROM rsflat)
  WHERE (SELECT count(*) FROM e) <= {ASSIGN_FLAT_MAX}
  UNION ALL
  SELECT vec_id, emb, cell, rn FROM (
    SELECT vec_id, emb, cell,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
    FROM rs2)
  WHERE (SELECT count(*) FROM e) > {ASSIGN_FLAT_MAX}),
assigned AS (SELECT vec_id, emb, cell FROM ranked WHERE rn = 1),
probed AS (
  SELECT vec_id AS q_vec_id, emb AS qe, cell FROM ranked
  WHERE {qfilter}rn <= {N_PROBE})"""


def _knn_batch_oracle_scaled(qstep_sql) -> str:
    """The IVF kNN-join oracle over the BRANCHED assignment (flat below
    ASSIGN_FLAT_MAX vectors, two-level above — ivf_ranked_ctes); qstep may
    be a constant or a count(*) SQL expression."""
    return f"""
WITH {ivf_ranked_ctes(qstep_sql)},
pscore AS (
  SELECT p.q_vec_id, a.vec_id AS nn_vec_id,
         round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
  FROM probed p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.q_vec_id)
SELECT q_vec_id, nn_vec_id, CAST(rank AS BIGINT) AS rank, cos FROM (
  SELECT q_vec_id, nn_vec_id, cos,
         row_number() OVER (
           PARTITION BY q_vec_id
           ORDER BY cos DESC, nn_vec_id) AS rank
  FROM pscore
) WHERE rank <= {KNN_K}
"""


def _knn_batch_oracle(cells_sql: str, qstep_sql) -> str:
    """The FLAT-assignment IVF kNN-join oracle with the cell count and
    probe stride as SQL expressions — kept for the measurement tools'
    pinned shapes; the REGISTERED queries use _knn_batch_oracle_scaled
    (assignment branch included) since round 10."""
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE embedding IS NOT NULL
),
cent AS (SELECT vec_id AS cell, emb AS c FROM e WHERE vec_id < {cells_sql}),
ascore AS (
  SELECT e.vec_id, e.emb, cent.cell,
         round(list_cosine_similarity(e.emb, cent.c), 4) AS cc
  FROM e CROSS JOIN cent),
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT vec_id, emb, cell,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
    FROM ascore
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS q_vec_id, emb AS qe FROM e
      WHERE vec_id % {qstep_sql} = 0),
qscore AS (
  SELECT q.q_vec_id, q.qe, cent.cell,
         round(list_cosine_similarity(q.qe, cent.c), 4) AS cc
  FROM q CROSS JOIN cent),
probed AS (
  SELECT q_vec_id, qe, cell FROM (
    SELECT q_vec_id, qe, cell,
           row_number() OVER (
             PARTITION BY q_vec_id ORDER BY cc DESC, cell) AS rn
    FROM qscore
  ) WHERE rn <= {N_PROBE}
),
pscore AS (
  SELECT p.q_vec_id, a.vec_id AS nn_vec_id,
         round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
  FROM probed p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.q_vec_id)
SELECT q_vec_id, nn_vec_id, CAST(rank AS BIGINT) AS rank, cos FROM (
  SELECT q_vec_id, nn_vec_id, cos,
         row_number() OVER (
           PARTITION BY q_vec_id
           ORDER BY cos DESC, nn_vec_id) AS rank
  FROM pscore
) WHERE rank <= {KNN_K}
"""


_KNN_BATCH_ORACLE = _knn_batch_oracle_scaled(KNN_QSTEP)


def ivf_cells_for(n_vectors: int) -> int:
    """IVF cell-count knob: with N_CELLS fixed, cell population grows
    with the corpus, so every cell-equi-join candidate set (ANN probe,
    kNN-graph edge build) grows linearly per query — quadratically in
    total for full-corpus kNN joins (q_graph_knn_bfs measured 8.84x for
    the x10 step, SCALE.md round 8). Scaling cells ~ n/IVF_TARGET_CELL
    pins per-cell population, so probing a fixed N_PROBE cells costs the
    same per query at any corpus size. Floored at the oracle's N_CELLS,
    capped at 65,536 cells — at 64 float64 dims that is a ~34 MB centroid
    table, past Spark's 10 MB auto-broadcast default but still an explicit
    F.broadcast() comfortably inside executor memory (the cap bounds the
    table; raise spark.sql.autoBroadcastJoinThreshold accordingly or accept
    the hint-forced build side) — the semantic_k_for discipline applied to
    the index geometry. NOTE: unlike
    the probe-stride knob this one moves the recall operating point
    (fixed N_PROBE over smaller cells sees a smaller corpus fraction);
    tools/ivf_cells_knob.py measures both the cost and that trade."""
    return max(N_CELLS, min(65_536, n_vectors // IVF_TARGET_CELL))


def recall_qstep_for(n_vectors: int) -> int:
    """Probe-batch knob for the ANN audits: a recall (or kNN-join eval)
    estimate is a statistic of the probe SAMPLE, so its confidence
    interval depends on the batch SIZE, not the batch FRACTION — a few
    hundred probes give the same +-few-% recall CI at any corpus size.
    The fixed ``vec_id % KNN_QSTEP`` stride makes the batch grow linearly
    with the corpus and the exact brute-force baseline |batch| x corpus =
    QUADRATICALLY (measured: 8.25x for the x10 step, SCALE.md round 8);
    scaling the stride pins the batch at ~RECALL_TARGET_PROBES and
    returns the audit to one linear corpus scan — the q_dedup_semantic
    ``semantic_k_for`` discipline applied to the probe side."""
    return max(KNN_QSTEP, -(-n_vectors // RECALL_TARGET_PROBES))


_IVF_ORACLE = f"""
WITH {ivf_ranked_ctes()}
SELECT a.vec_id, lbl.label, a.cell,
       round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
FROM probed p
JOIN assigned a USING (cell)
JOIN embeddings lbl ON lbl.vec_id = a.vec_id
WHERE p.q_vec_id = {QUERY_VEC_ID} AND a.vec_id <> {QUERY_VEC_ID}
ORDER BY cos DESC, a.vec_id
LIMIT {TOP_K}
"""


@query("q_sim_ann_ivf", oracle=_IVF_ORACLE)
def q_sim_ann_ivf(spark, sf_dir):
    """IVF-style approximate nearest neighbour: coarse-quantize every vector
    to its nearest centroid, probe only the N_PROBE cells closest to the
    query, brute-force inside them.  Deterministic centroids = the first
    ivf_cells_for(corpus) vectors (a real system would k-means them
    offline).

    Since round 11 the single-query lookup runs the SAME scaled geometry
    as its batched siblings (VERDICT r10 item 2): cell count =
    ivf_cells_for(count) pins per-cell population at ~IVF_TARGET_CELL so
    probe cost stays flat as the corpus grows, and above ASSIGN_FLAT_MAX
    vectors the assignment switches to hierarchical two-level coarse
    quantization (assignment_two_level — killing the n*cells flat-scoring
    term).  The oracle computes both knobs from count(*) over the same
    CTE (ivf_ranked_ctes' branch guard), so the DuckDB value-hash twin
    holds on whichever arm either engine takes.  At every fixture SF both
    formulas floor at the historical constants (16 cells, flat), so the
    sf0.01 gate keeps the original plan shape."""
    return _ann_ivf(spark, sf_dir)


def _ann_ivf(
    spark,
    sf_dir,
    n_cells: int | None = None,
    two_level: bool | None = None,
):
    """Core of q_sim_ann_ivf with the cell count and assignment strategy
    as parameters (tests / measurement tools force the arms; the
    registered query derives both from count(*))."""
    if n_cells is None or two_level is None:
        n = _emb_count(spark, sf_dir)
        if n_cells is None:
            n_cells = ivf_cells_for(n)
        if two_level is None:
            two_level = assignment_two_level(n)
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", _dbl("embedding").alias("emb")
    )
    if two_level:
        within = _two_level_within(spark, sf_dir, n_cells)
    else:
        within = _flat_within(spark, sf_dir, n_cells)
    assigned = within.filter(F.col("rn") == 1).select("vec_id", "emb", "cell")
    # the ONE query vector's top-N_PROBE cells — a <=N_PROBE-row frame
    probed = within.filter(
        (F.col("vec_id") == QUERY_VEC_ID) & (F.col("rn") <= N_PROBE)
    ).select(F.col("emb").alias("qe"), "cell")
    topk = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id", "cell", r4(_cos(F.col("emb"), F.col("qe"))).alias("cos")
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
    )
    # label joins back on the <=TOP_K-row result, never the scored set
    return (
        e.select("vec_id", "label")
        .join(F.broadcast(topk), "vec_id")
        .select("vec_id", "label", "cell", "cos")
        .orderBy(F.desc("cos"), "vec_id")
    )


FILTER_LABEL = 3  # the metadata predicate of the filtered ANN search

_IVF_FILTERED_ORACLE = f"""
WITH {ivf_ranked_ctes()}
SELECT a.vec_id, lbl.label, a.cell,
       round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
FROM probed p
JOIN assigned a USING (cell)
JOIN embeddings lbl ON lbl.vec_id = a.vec_id
WHERE p.q_vec_id = {QUERY_VEC_ID} AND a.vec_id <> {QUERY_VEC_ID}
  AND lbl.label = {FILTER_LABEL}
ORDER BY cos DESC, a.vec_id
LIMIT {TOP_K}
"""


@query("q_sim_ann_ivf_filtered", oracle=_IVF_FILTERED_ORACLE)
def q_sim_ann_ivf_filtered(spark, sf_dir):
    """FILTERED vector search — top-{TOP_K} under a metadata predicate
    (label = {FILTER_LABEL}), the production feature every vector store
    grew in the RAG era: "nearest neighbours among documents matching a
    filter".  This is the PRE-FILTER strategy: the predicate applies to
    the probed cells' candidates BEFORE ranking, so the returned k are
    the true filtered top-k of the probed region — unlike post-filtering
    an unfiltered top-k, which silently returns fewer (or zero) rows at
    selective predicates (the classic filtered-ANN failure; at ~10%
    selectivity here a post-filter of top-{TOP_K} would keep ~1 row).

    Scale shape: inherits q_sim_ann_ivf's geometry (scaled cell count,
    flat/two-level assignment, broadcast <=N_PROBE probe frame, cell
    equi-join); the label join applies to the CANDIDATE rows (the
    ~N_PROBE/n_cells corpus fraction), not the corpus, and the finisher
    is TakeOrdered on the rounded cosine.  In a production index the
    label rides the inverted list (zero extra join); the fixture keeps
    vectors and labels in one table, so a candidate-bounded vec_id
    equi-join stands in.

    Reference scope: no vector surface in the reference facade
    (api/router/router.go:9-55); predicate sibling of q_sim_ann_ivf
    (same oracle family + label filter)."""
    n = _emb_count(spark, sf_dir)
    n_cells = ivf_cells_for(n)
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", _dbl("embedding").alias("emb")
    )
    if assignment_two_level(n):
        within = _two_level_within(spark, sf_dir, n_cells)
    else:
        within = _flat_within(spark, sf_dir, n_cells)
    assigned = within.filter(F.col("rn") == 1).select("vec_id", "emb", "cell")
    probed = within.filter(
        (F.col("vec_id") == QUERY_VEC_ID) & (F.col("rn") <= N_PROBE)
    ).select(F.col("emb").alias("qe"), "cell")
    cand = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(e.select("vec_id", "label"), "vec_id")
        .filter(F.col("label") == FILTER_LABEL)
    )
    return (
        cand.select(
            "vec_id", "label", "cell",
            r4(_cos(F.col("emb"), F.col("qe"))).alias("cos"),
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
    )


RANGE_TAU = 0.35  # range-search radius (cosine), = PAIR_THRESHOLD

_RANGE_ORACLE = f"""
WITH {ivf_ranked_ctes(SCALED_QSTEP_SQL)}
SELECT p.q_vec_id, a.vec_id AS nn_vec_id,
       round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
FROM probed p JOIN assigned a USING (cell)
WHERE a.vec_id <> p.q_vec_id
  AND round(list_cosine_similarity(a.emb, p.qe), 4) >= {RANGE_TAU}
"""


@query("q_sim_range_ivf", oracle=_RANGE_ORACLE)
def q_sim_range_ivf(spark, sf_dir):
    """IVF RANGE search: for every query in the deterministic probe batch,
    ALL corpus neighbours with cosine >= {RANGE_TAU} inside the probed
    cells — the threshold dual of q_sim_knn_batch's top-k.  Retrieval
    pipelines need both: top-k for fixed-budget context packing, range
    for "everything semantically close" jobs (near-dup candidate pull,
    hard-positive mining, graph edge building at a similarity floor)
    where the right answer size is data-dependent and a k cutoff silently
    truncates dense neighbourhoods.

    Scale shape: identical candidate machinery to q_sim_knn_batch — the
    scaled cell count (ivf_cells_for), the probe-batch stride
    (recall_qstep_for: a few hundred probes whatever the corpus size) and
    the flat/two-level assignment switch (assignment_two_level) are all
    derived from count(*), with the oracle branching on the same guards —
    but the per-query finisher is a stateless FILTER on the rounded
    cosine instead of a rank window: no per-query sort, output streams
    straight out of the candidate join, so a dense query can return 100
    rows while a lonely one returns none.

    Reference scope: no vector surface in the reference facade
    (api/router/router.go:9-55); threshold sibling of q_sim_knn_batch
    (top-k) and q_sim_pairs/q_sim_lsh (symmetric pair generation)."""
    n = _emb_count(spark, sf_dir)
    n_cells = ivf_cells_for(n)
    qstep = recall_qstep_for(n)
    if assignment_two_level(n):
        within = _two_level_within(spark, sf_dir, n_cells)
    else:
        within = _flat_within(spark, sf_dir, n_cells)
    assigned = within.filter(F.col("rn") == 1).select("vec_id", "emb", "cell")
    probed = within.filter(
        (F.col("vec_id") % qstep == 0) & (F.col("rn") <= N_PROBE)
    ).select(
        F.col("vec_id").alias("q_vec_id"), F.col("emb").alias("qe"), "cell"
    )
    return (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col("vec_id").alias("nn_vec_id"),
            r4(_cos(F.col("emb"), F.col("qe"))).alias("cos"),
        )
        .filter(F.col("cos") >= RANGE_TAU)
    )


def _knn_batch(
    spark,
    sf_dir,
    qstep: int,
    n_cells: int | None = None,
    two_level: bool | None = None,
):
    """Core of q_sim_knn_batch with the probe stride, IVF cell count and
    assignment strategy as parameters.  Since round 9 the REGISTERED query
    passes ivf_cells_for(count); since round 10 it ALSO auto-selects the
    assignment strategy via assignment_two_level(count) — flat below
    ASSIGN_FLAT_MAX vectors (the fixture shape, bit-identical to the
    pre-knob plans), hierarchical two-level above (killing the n^2/512
    flat-assignment term, SCALE.md round 9/10).  The oracle computes both
    formulas from count(*) (SCALED_CELLS_SQL + the ivf_ranked_ctes branch
    guard) so the value-hash twin holds at any corpus size.
    ``n_cells``/``two_level`` explicit values serve the measurement tools
    (tools/ivf_cells_knob.py) and tests; an explicit n_cells with
    two_level=None pins the historical FLAT shape."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))
    if n_cells is None:
        # one count job; at cluster scale this is parquet row-group
        # metadata, not a data scan
        n = _emb_count(spark, sf_dir)
        n_cells = ivf_cells_for(n)
        if two_level is None:
            two_level = assignment_two_level(n)
    if two_level:
        return _knn_batch_2level(spark, sf_dir, qstep, n_cells)
    cent = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("c")
    )

    aw = Window.partitionBy("vec_id").orderBy(F.desc("cc"), "cell")
    assigned = (
        e.join(F.broadcast(cent))
        .withColumn("cc", r4(_cos(F.col("emb"), F.col("c"))))
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cell")
    )

    q = e.filter(F.col("vec_id") % qstep == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("emb").alias("qe")
    )
    pw = Window.partitionBy("q_vec_id").orderBy(F.desc("qc"), "cell")
    probed = (
        q.join(F.broadcast(cent))
        .withColumn("qc", r4(_cos(F.col("qe"), F.col("c"))))
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= N_PROBE)
        .select("q_vec_id", "qe", "cell")
    )

    kw = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), "nn_vec_id")
    return (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col("vec_id").alias("nn_vec_id"),
            r4(_cos(F.col("emb"), F.col("qe"))).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(kw).cast("long"))
        .filter(F.col("rank") <= KNN_K)
        .select("q_vec_id", "nn_vec_id", "rank", "cos")
    )


@query("q_sim_knn_batch", oracle=_KNN_BATCH_ORACLE)
def q_sim_knn_batch(spark, sf_dir):
    """Batched IVF k-NN JOIN: top-{KNN_K} nearest corpus neighbours for
    EVERY vector in a deterministic query set (vec_id % 25 == 0) — the
    production ANN shape. Single-query top-k (q_sim_topk / q_sim_ann_ivf)
    answers a lookup; training-data pipelines instead join a whole table
    of queries (new batch embeddings, eval probes, retrieval buckets)
    against the corpus at once.

    Plan shape (and why it scales):
    - centroid table (N_CELLS rows) is BROADCAST twice — once to assign
      every corpus vector to its cell (explode x16 + windowed argmin,
      identical to q_sim_ann_ivf's assignment), once to give each query
      its N_PROBE probe cells;
    - the probe join is an EQUI join on cell: each query meets only the
      ~N_PROBE/N_CELLS fraction of the corpus sharing its probed cells,
      never the full corpus — the batched generalization of "read 4 of 16
      cells". At cluster scale the corpus side is written partitioned by
      cell (q_sink_partitioned) so the probe join partition-prunes;
    - per-query top-k is a window over the candidate set, ranked on the
      ROUNDED cosine with vec_id tiebreak so both engines rank
      identically (unrounded ranking diverges at 1e-16 across engines).

    Scoring stays JVM-side (zip_with/aggregate); candidate volume here is
    |queries| x corpus/4, well under the pair-scorer threshold where the
    Arrow numpy path (_dot_pd) wins.

    Since round 9 the IVF cell count is the SCALE KNOB by default:
    cells = ivf_cells_for(count) pins per-cell population at
    ~IVF_TARGET_CELL so the cell-join candidate volume stays linear in
    the corpus (x10 measured 8.84x fixed -> 2.64x scaled, SCALE.md r8);
    the oracle computes the identical formula from count(*)
    (SCALED_CELLS_SQL), keeping the value-hash twin exact at any size.

    Since round 10 the ASSIGNMENT STRATEGY is a knob too: above
    ASSIGN_FLAT_MAX vectors the registered query switches to hierarchical
    two-level coarse quantization (the q_sim_knn_batch_2level geometry —
    2n*sqrt(cells) vs n^2/512 cosines; measured 31.5 s vs 104.3 s at 200k
    vectors, SCALE.md round 9), with the oracle's ivf_ranked_ctes branch
    guard choosing the same arm from count(*)."""
    return _knn_batch(spark, sf_dir, KNN_QSTEP)


K_CLUSTERS = 8


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_KMEANS_ASSIGN = """
  SELECT vec_id, label, emb, cell FROM (
    SELECT vec_id, label, emb, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cell ASC) AS rn
    FROM (
      SELECT e.vec_id, e.label, e.emb, c.cell,
             list_distance(e.emb, c.c) AS dist
      FROM {src} e CROSS JOIN {cent} c)
  ) WHERE rn = 1
"""

_KMEANS_RECENTER = """
  SELECT cell, list(v ORDER BY d) AS c FROM (
    SELECT cell, i AS d, avg(emb[i]) AS v
    FROM {assigned}, (SELECT unnest(range(1, 65)) AS i) dims
    GROUP BY cell, i
  ) GROUP BY cell
"""

# The unrolled 3-iteration Lloyd CTE chain, shared by the kmeans oracle and
# the semantic-dedup oracle (llm/dedup.py q_dedup_semantic): a3 is the final
# (vec_id, label, emb, cell) assignment.
_KMEANS_CTES = f"""e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
),
c0 AS (SELECT vec_id AS cell, emb AS c FROM e WHERE vec_id < {K_CLUSTERS}),
a1 AS ({_KMEANS_ASSIGN.format(src='e', cent='c0')}),
c1 AS ({_KMEANS_RECENTER.format(assigned='a1')}),
a2 AS ({_KMEANS_ASSIGN.format(src='e', cent='c1')}),
c2 AS ({_KMEANS_RECENTER.format(assigned='a2')}),
a3 AS ({_KMEANS_ASSIGN.format(src='e', cent='c2')})"""

_KMEANS_ORACLE = f"""
WITH {_KMEANS_CTES}
SELECT vec_id, label, CAST(cell AS BIGINT) AS cluster FROM a3
"""


# Above this many centroids the packed-array arm (ONE broadcast row holding
# all k centroids, argmin per vector over the array) gives way to the
# broadcast-join + window form: the scale path (semantic_k_for, tens of
# thousands of centroids) wants centroids as rows, not a single k x 64
# array cell.  64 covers every registered query (K_CLUSTERS=8,
# ELBOW_KS<=16).
KMEANS_PACKED_MAX_K = 64


def _cents_row(cent):
    """(cell, c) centroid rows -> ONE row [cents: array<struct<cell,c>>]
    sorted by cell, for a broadcast cross-join onto the corpus.  The
    centroid values never leave the JVM — no driver round-trip, no
    literal inlining."""
    return cent.agg(
        F.array_sort(F.collect_list(F.struct("cell", "c"))).alias("cents")
    )


def _argmin_cell(emb, cents):
    """struct<d2, cell> of the nearest centroid in the packed array.
    Struct ordering is lexicographic (d2 ASC, then cell ASC), so array_min
    picks the IDENTICAL winner as the row_number() window ORDER BY d2 ASC,
    cell ASC — including on exact d2 ties — and the d2 fold is the same
    sequential zip_with aggregate, so the compared doubles are
    bit-identical."""
    return F.array_min(
        F.transform(
            cents,
            lambda s: F.struct(
                _l2sq(emb, s["c"]).alias("d2"), s["cell"].alias("cell")
            ),
        )
    )


def _recenter(assigned):
    """Lloyd recenter: the same posexplode + (cell, dim) avg aggregate the
    oracle unrolls, as (cell, c) rows."""
    return (
        assigned.select("cell", F.posexplode("emb").alias("d", "val"))
        .groupBy("cell", "d")
        .agg(F.avg("val").alias("v"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "v"))),
                lambda s: s.v,
            ).alias("c")
        )
    )


def _kmeans_assigned(spark, sf_dir, k: int = K_CLUSTERS):
    """The 3-iteration Lloyd assignment (vec_id, label, emb, cell) — the
    body of q_cluster_kmeans, extracted so q_dedup_semantic can derive its
    dedup blocks from the SAME deterministic clustering the oracle unrolls.

    ``k`` is the SemDeDup scale knob (VERDICT r6 item 4): the registered
    queries pin k=K_CLUSTERS so the unrolled oracle stays exact, while the
    scale path (llm/dedup.py semantic_k_for) grows k with the corpus so
    E[|cluster|^2] stays flat.

    Since round 17 small k (every registered query) packs the k x 64
    centroids into ONE broadcast row and assigns via an array_min
    projection — the corpus row count is never multiplied by k, exchanged
    or sorted for assignment (guide §2.1: the per-iteration window was an
    Exchange+Sort of the k x -exploded corpus), and the whole 3-iteration
    chain stays lazy (no per-iteration checkpoint action: each recenter
    references its input once, so the plan nests linearly).  Large k keeps
    the broadcast-join + window form: the scale path wants centroids as
    rows, not one giant array cell."""
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", _dbl("embedding").alias("emb")
    )
    if k <= KMEANS_PACKED_MAX_K:
        cent = e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cell"), F.col("emb").alias("c")
        )
        assigned = None
        for it in range(3):
            best = _argmin_cell(F.col("emb"), F.col("cents"))
            assigned = e.crossJoin(F.broadcast(_cents_row(cent))).select(
                "vec_id", "label", "emb", best["cell"].alias("cell")
            )
            if it < 2:
                cent = _recenter(assigned)
        return assigned

    from pyspark.sql import Window

    cent = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cell"))
    assigned = None
    for it in range(3):
        assigned = (
            e.join(F.broadcast(cent))
            .withColumn("d2", _l2sq(F.col("emb"), F.col("c")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "label", "emb", "cell")
        )
        if it < 2:
            cent = (
                assigned.select("cell", F.posexplode("emb").alias("d", "val"))
                .groupBy("cell", "d")
                .agg(F.avg("val").alias("v"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("d", "v"))),
                        lambda s: s.v,
                    ).alias("c")
                )
                .localCheckpoint()
            )
    return assigned


@query("q_cluster_kmeans", oracle=_KMEANS_ORACLE)
def q_cluster_kmeans(spark, sf_dir):
    """K-means over the embedding corpus (3 Lloyd iterations, K=8,
    deterministic first-K init) — the clustering step behind
    curation/diversity sampling and IVF centroid training. The oracle
    unrolls the identical 3 iterations in SQL, so assignments are
    value-checked cross-engine, not rows-only.

    Scale shape per iteration: centroids are K x 64 doubles -> broadcast
    join (corpus never shuffles for assignment; the argmin window is keyed
    by vec_id over K candidate rows); recentering is one posexplode +
    (cell, dim) aggregate — K*64 output rows. localCheckpoint truncates
    the iteration lineage (same pattern as q_dedup_cluster)."""
    return _kmeans_assigned(spark, sf_dir).select(
        "vec_id", "label", F.col("cell").cast("long").alias("cluster")
    )


HAMMING_TOP_K = 20


def _hamming_oracle() -> str:
    """DuckDB mirror of q_sim_hamming: identical sign-bit codes, identical
    Hamming ranking."""
    def half(off):
        return " + ".join(
            f"CASE WHEN e[{off + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
            for i in range(32)
        )
    return f"""
    WITH x AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
    ), c AS (
      SELECT vec_id, label,
             CAST({half(0)} AS BIGINT) AS code_a,
             CAST({half(32)} AS BIGINT) AS code_b
      FROM x
    ), q AS (
      SELECT code_a AS qa, code_b AS qb FROM c WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT c.vec_id, c.label, c.code_a, c.code_b,
           bit_count(xor(c.code_a, q.qa)) + bit_count(xor(c.code_b, q.qb))
               AS hamming
    FROM c, q
    WHERE c.vec_id <> {QUERY_VEC_ID}
    ORDER BY hamming, c.vec_id
    LIMIT {HAMMING_TOP_K}
    """


@query("q_sim_hamming", oracle=_hamming_oracle())
def q_sim_hamming(spark, sf_dir):
    """Binary-embedding similarity: 1-bit (sign) quantization of the 64-dim
    embedding into two 32-bit code halves, then a Hamming-distance top-k
    scan against the vec_id=0 query code — the standard 64x-compression
    prefilter production ANN pipelines run before exact re-ranking (the
    q_sim_topk shape takes over on the survivors).

    Scale: the encode is one map-only projection (64 sign tests -> 16 bytes
    per row, replacing 256 bytes of float32); the query code broadcasts;
    the scan is xor + popcount — memory-bandwidth-bound and ~16x lighter
    than float cosine — and top-k compiles to TakeOrderedAndProject, so
    only k rows per partition reach the driver. Codes are pure integer
    functions of the data, so the oracle reproduces them exactly."""
    e = _emb(spark, sf_dir)

    def half(off):
        col = None
        for i in range(32):
            term = F.when(
                F.col("embedding")[off + i] > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            col = term if col is None else col + term
        return col

    c = e.select(
        "vec_id", "label", half(0).alias("code_a"), half(32).alias("code_b")
    )
    q = (
        c.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("code_a").alias("qa"), F.col("code_b").alias("qb"))
    )
    hamming = F.bit_count(F.col("code_a").bitwiseXOR(F.col("qa"))) + F.bit_count(
        F.col("code_b").bitwiseXOR(F.col("qb"))
    )
    return (
        c.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", "label", "code_a", "code_b", hamming.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(HAMMING_TOP_K)
    )


MRL_DIM = 16     # truncation prefix (Matryoshka nesting level)
MRL_K = 5        # top-k whose recall we measure
MRL_QUERY_MOD = 50


@query(
    "q_embed_matryoshka",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL
    ), q AS (
      SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id % {MRL_QUERY_MOD} = 0
    ), sc AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(e.emb, q.qe), 4) AS cf,
             round(list_cosine_similarity(list_slice(e.emb, 1, {MRL_DIM}),
                                          list_slice(q.qe, 1, {MRL_DIM})), 4)
               AS ct
      FROM q JOIN e ON e.vec_id <> q.query_id
    ), scored AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cf DESC, vec_id) AS rn_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ct DESC, vec_id) AS rn_trunc
      FROM sc
    )
    SELECT query_id,
           round(count(*) FILTER (rn_full <= {MRL_K} AND rn_trunc <= {MRL_K})
                 * 1.0 / {MRL_K}, 4) AS recall_at_{MRL_K}
    FROM scored GROUP BY query_id
    """,
)
def q_embed_matryoshka(spark, sf_dir):
    """Matryoshka/MRL truncation audit: for a probe batch, how much of the
    exact top-{MRL_K} neighbourhood survives when vectors are truncated to
    their first {MRL_DIM} of {DIM} dims (per-query recall@{MRL_K}) — the
    measurement that decides whether a 4x cheaper prefix index (the
    coarse stage of an adaptive-retrieval funnel) is safe to deploy.

    Completes the vector-compression family's third axis: PQ codes
    (q_embed_pq/q_sim_ann_pq), int8 scalar quantization
    (q_embed_quantize), and dimension truncation here.

    Scale shape: probe set broadcasts (it is batch-sized, not
    corpus-sized); ONE corpus scan scores both resolutions (the truncated
    dot is a prefix slice, not a second pass); two row_numbers share one
    (query) shuffle partition; output is |probes| rows. The corpus-side
    ranking at 100 TB runs per-partition and TakeOrdered-merges — nothing
    here materializes beyond |probes| x k candidate rows.

    Hot-path note: norms are computed ONCE PER ROW before the pair join
    (cos = dot of pre-normalized vectors), and the two per-pair dots run
    through the Arrow-batched numpy kernel (:func:`_dot_pd`) — per-pair
    higher-order-function cosines (which re-derive both norms for every
    pair) measured 3.4 s vs ~1 s for this shape at sf0.1."""
    from pyspark.sql import Window

    def _with_units(df, emb_col):
        full_n = _norm(emb_col)
        pre = F.slice(emb_col, 1, MRL_DIM)
        pre_n = _norm(pre)
        return df.select(
            *df.columns,
            F.transform(emb_col, lambda x: x / full_n).alias("u_full"),
            F.transform(pre, lambda x: x / pre_n).alias("u_trunc"),
        )

    e = _with_units(
        _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb")), "emb"
    ).drop("emb")
    q = e.filter(F.col("vec_id") % MRL_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("u_full").alias("q_full"),
        F.col("u_trunc").alias("q_trunc"),
    )
    j = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        r4(_dot_pd("u_full", "q_full")).alias("cos_full"),
        r4(_dot_pd("u_trunc", "q_trunc")).alias("cos_trunc"),
    )
    w = Window.partitionBy("query_id")
    ranked = j.select(
        "query_id",
        F.row_number()
        .over(w.orderBy(F.desc("cos_full"), "vec_id"))
        .alias("rn_full"),
        F.row_number()
        .over(w.orderBy(F.desc("cos_trunc"), "vec_id"))
        .alias("rn_trunc"),
    )
    return ranked.groupBy("query_id").agg(
        r4(
            F.sum(
                F.when(
                    (F.col("rn_full") <= MRL_K) & (F.col("rn_trunc") <= MRL_K), 1
                ).otherwise(0)
            )
            / F.lit(float(MRL_K))
        ).alias(f"recall_at_{MRL_K}")
    )


RERANK_CANDIDATES = 32
RERANK_K = 5


def _rerank_oracle() -> str:
    def half(off):
        return " + ".join(
            f"CASE WHEN e[{off + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
            for i in range(32)
        )
    return f"""
    WITH x AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (
      SELECT vec_id, label, e,
             CAST({half(0)} AS BIGINT) AS code_a,
             CAST({half(32)} AS BIGINT) AS code_b
      FROM x
    ), q AS (
      SELECT code_a AS qa, code_b AS qb, e AS qe
      FROM c WHERE vec_id = {QUERY_VEC_ID}
    ), cand AS (
      SELECT c.vec_id, c.label, c.e,
             bit_count(xor(c.code_a, q.qa)) + bit_count(xor(c.code_b, q.qb))
               AS hamming
      FROM c, q WHERE c.vec_id <> {QUERY_VEC_ID}
      ORDER BY hamming, c.vec_id
      LIMIT {RERANK_CANDIDATES}
    )
    SELECT cand.vec_id, cand.label, cand.hamming,
           round(list_cosine_similarity(cand.e, q.qe), 4) AS cos
    FROM cand, q
    ORDER BY cos DESC, cand.vec_id
    LIMIT {RERANK_K}
    """


@query("q_sim_rerank", oracle=_rerank_oracle())
def q_sim_rerank(spark, sf_dir):
    """Two-stage retrieval funnel (the production bi-encoder serving
    architecture): a cheap 128-bit Hamming scan shortlists
    {RERANK_CANDIDATES} candidates, then EXACT float cosine re-ranks only
    the shortlist to the final top-{RERANK_K} — the quantized first pass
    reads 16 bytes/vector, the expensive float pass touches
    O(candidates) rows, never the corpus.

    At 100 TB: stage 1 is the only corpus-wide scan and is xor+popcount
    over sign codes (memory-bandwidth-bound, 16x lighter than cosine,
    TakeOrderedAndProject so only candidates/partition reach the driver
    side); stage 2's exact re-rank joins the candidate ids back to the
    float column — an id-keyed point-lookup join at candidate scale.
    Deterministic through both stages: (hamming, vec_id) then
    (rounded cos desc, vec_id)."""
    e = _emb(spark, sf_dir)

    def half(off):
        col = None
        for i in range(32):
            term = F.when(
                F.col("embedding")[off + i] > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            col = term if col is None else col + term
        return col

    c = e.select(
        "vec_id",
        "label",
        _dbl("embedding").alias("emb"),
        half(0).alias("code_a"),
        half(32).alias("code_b"),
    )
    q = c.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("code_a").alias("qa"),
        F.col("code_b").alias("qb"),
        F.col("emb").alias("qe"),
    )
    hamming = F.bit_count(F.col("code_a").bitwiseXOR(F.col("qa"))) + F.bit_count(
        F.col("code_b").bitwiseXOR(F.col("qb"))
    )
    cand = (
        c.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", "label", "emb", "qe", hamming.alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(RERANK_CANDIDATES)
    )
    return (
        cand.select(
            "vec_id", "label", "hamming", r4(_cos("emb", "qe")).alias("cos")
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(RERANK_K)
    )


# -- MMR diversified retrieval ----------------------------------------------

MMR_PROBES = 4       # query vectors: vec_id < MMR_PROBES
MMR_CANDIDATES = 8   # relevance top-N entering the diversifier
MMR_K = 4            # diversified picks per query
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    """Greedy MMR unrolled: one (sel_k, S_k) CTE pair per pick — the
    q_graph_pagerank closed-form-recurrence trick applied to a greedy
    selection instead of a power iteration."""
    ctes = [
        f"""e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL),
    q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < {MMR_PROBES}),
    relsc AS (
      SELECT q.qid, e.vec_id, e.emb,
             round(list_cosine_similarity(e.emb, q.qe), 4) AS rel
      FROM e JOIN q ON e.vec_id <> q.qid),
    scored AS (
      SELECT qid, vec_id, emb, rel,
             row_number() OVER (
               PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
      FROM relsc),
    cand AS (SELECT qid, vec_id, emb, rel FROM scored
             WHERE rn <= {MMR_CANDIDATES}),
    ps AS (
      SELECT a.qid, a.vec_id AS i, b.vec_id AS j,
             round(list_cosine_similarity(a.emb, b.emb), 4) AS s
      FROM cand a JOIN cand b
        ON a.qid = b.qid AND a.vec_id <> b.vec_id),
    sel1 AS (
      SELECT qid, vec_id, round({MMR_LAMBDA} * rel, 4) AS mmr
      FROM (SELECT qid, vec_id, rel,
                   -- order by the ROUNDED score (the value returned and the
                   -- one the numpy path argmaxes): distinct rels can tie
                   -- after rounding 0.7*rel to 4 dp, and the tie must break
                   -- on vec_id identically in both engines (ADVICE r6)
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY round({MMR_LAMBDA} * rel, 4) DESC,
                                               vec_id) AS rn
            FROM cand)
      WHERE rn = 1),
    s1 AS (SELECT qid, vec_id FROM sel1)"""
    ]
    for k in range(2, MMR_K + 1):
        score = f"round({MMR_LAMBDA} * c.rel - {round(1 - MMR_LAMBDA, 4)} * max(p.s), 4)"
        ctes.append(
            f"""sel{k} AS (
      SELECT qid, vec_id, mmr FROM (
        SELECT c.qid, c.vec_id, {score} AS mmr,
               row_number() OVER (PARTITION BY c.qid
                                  ORDER BY {score} DESC, c.vec_id) AS rn
        FROM cand c
        JOIN s{k - 1} s ON s.qid = c.qid
        JOIN ps p ON p.qid = c.qid AND p.i = c.vec_id AND p.j = s.vec_id
        LEFT JOIN s{k - 1} x ON x.qid = c.qid AND x.vec_id = c.vec_id
        WHERE x.vec_id IS NULL
        GROUP BY c.qid, c.vec_id, c.rel)
      WHERE rn = 1),
    s{k} AS (SELECT qid, vec_id FROM s{k - 1}
             UNION ALL SELECT qid, vec_id FROM sel{k})"""
        )
    parts = [
        f"SELECT qid AS query_id, CAST({k} AS INT) AS rank, vec_id, mmr FROM sel{k}"
        for k in range(1, MMR_K + 1)
    ]
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(parts)


@query("q_sim_mmr", oracle=_mmr_oracle())
def q_sim_mmr(spark, sf_dir):
    """Maximal-marginal-relevance retrieval: per query, take the relevance
    top-{MMR_CANDIDATES} then greedily pick {MMR_K} results maximizing
    ``lambda*rel(d) - (1-lambda)*max_{{s in S}} sim(d, s)`` — the standard
    diversified-retrieval/RAG-context selection objective (relevant AND
    mutually non-redundant, so near-duplicate passages don't crowd the
    context window). Returns (query_id, rank, vec_id, mmr).

    Two-stage shape is the scale design: stage 1 (relevance top-N per
    query) is the existing broadcast-probe scan + per-query window — one
    pass over the corpus however large, N bounded. Stage 2 (the inherently
    SEQUENTIAL greedy loop) runs inside applyInPandas per query group over
    exactly N candidates — O(K*N) rounded-cosine comparisons on a numpy
    matrix that fits in L1. The quadratic/sequential part never touches
    the corpus, only the bounded candidate set, so 1e9 vectors cost the
    same diversifier work as 1e3. All cosines are rounded to 4 dp BEFORE
    the greedy argmax (half-away-from-zero on both engines) so the pick
    sequence is bit-stable across Spark, numpy and the DuckDB oracle,
    which unrolls the greedy recurrence as one (sel_k, S_k) CTE pair per
    pick. Ties break on vec_id ascending.

    Reference scope: no similarity family in the reference facade; sibling
    of q_sim_rerank (exactness rerank) — this one diversifies instead.
    """
    emb = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))
    q = emb.filter(F.col("vec_id") < MMR_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qe")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("rel"), "vec_id")
    cand = (
        emb.join(F.broadcast(q), emb.vec_id != q.qid)
        .select("qid", "vec_id", "emb", r4(_cos("emb", "qe")).alias("rel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_CANDIDATES)
        .drop("rn")
    )

    def diversify(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        E = np.stack(pdf["emb"].to_numpy())
        # Guard-band two-pass (r16): the rounded sims feed the MMR argmax
        # selection (a rank) — gb_gram_cos is provably identical to the
        # r15 det-everywhere scoring at GEMM speed.
        nrm = det_norm(E)
        sims = gb_gram_cos(E, E, nrm, nrm)
        # half-away-from-zero to 4 dp — the F.round / DuckDB round convention
        # (np.round is half-even and WOULD diverge on exact .00005 ties)
        r = lambda x: np.floor(np.abs(x) * 1e4 + 0.5) * np.sign(x) / 1e4
        sims = r(sims)
        rel = pdf["rel"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        chosen: list[int] = []
        # -inf, not 0: cosine is signed, and max over a selected set whose
        # members are all ANTI-similar to d must stay negative (a 0 floor
        # silently rewards redundancy-with-negatives; caught by the oracle)
        maxsim = np.full(len(pdf), -np.inf)
        out = []
        for k in range(1, min(MMR_K, len(pdf)) + 1):
            score = (
                r(MMR_LAMBDA * rel)
                if k == 1
                else r(MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * maxsim)
            )
            score = np.where(np.isin(np.arange(len(pdf)), chosen), -np.inf, score)
            # argmax with vec_id-ascending tiebreak: rows are vec_id-sorted,
            # argmax returns the FIRST max
            pick = int(np.argmax(score))
            chosen.append(pick)
            out.append((int(pdf["qid"].iloc[0]), k, int(ids[pick]), float(score[pick])))
            maxsim = np.maximum(maxsim, sims[:, pick])
        return pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "mmr"])

    return cand.groupBy("qid").applyInPandas(
        diversify, "query_id long, rank int, vec_id long, mmr double"
    )


_RECALL_ORACLE = f"""
WITH ivf AS ({_knn_batch_oracle_scaled(SCALED_QSTEP_SQL)}),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE embedding IS NOT NULL
),
q AS (SELECT vec_id AS q_vec_id, emb AS qe FROM e
      WHERE vec_id % {SCALED_QSTEP_SQL} = 0),
xsc AS (
  SELECT q.q_vec_id, e.vec_id AS nn_vec_id,
         round(list_cosine_similarity(e.emb, q.qe), 4) AS cos
  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_vec_id),
exact AS (
  SELECT q_vec_id, nn_vec_id FROM (
    SELECT q_vec_id, nn_vec_id,
           row_number() OVER (
             PARTITION BY q_vec_id ORDER BY cos DESC, nn_vec_id) AS rk
    FROM xsc
  ) WHERE rk <= {KNN_K}),
hits AS (
  SELECT x.q_vec_id, count(*) AS h
  FROM exact x JOIN ivf i
    ON i.q_vec_id = x.q_vec_id AND i.nn_vec_id = x.nn_vec_id
  GROUP BY x.q_vec_id)
SELECT q.q_vec_id, CAST(coalesce(h.h, 0) AS INTEGER) AS n_hits,
       round(coalesce(h.h, 0) * 1.0 / {KNN_K}, 4) AS recall
FROM q LEFT JOIN hits h USING (q_vec_id) ORDER BY q_vec_id
"""


def _recall_eval(spark, sf_dir, qstep: int | None = None):
    """Core of q_sim_recall_eval with the probe stride as a parameter.
    Since round 9 the REGISTERED query passes qstep=None, which
    self-computes recall_qstep_for(count) — the probe batch (and with it
    the |batch| x corpus exact baseline) stays FIXED-SIZE as the corpus
    grows, and the oracle computes the identical stride from count(*)
    (SCALED_QSTEP_SQL).  Explicit strides serve the measurement tools
    (tools/recall_qstep_knob.py) and tests."""
    from pyspark.sql import Window

    if qstep is None:
        # one count serves all three knobs (qstep here, cells and the
        # flat/two-level assignment branch in _knn_batch)
        n = _emb_count(spark, sf_dir)
        qstep = recall_qstep_for(n)
        ivf = _knn_batch(
            spark,
            sf_dir,
            qstep,
            n_cells=ivf_cells_for(n),
            two_level=assignment_two_level(n),
        ).select("q_vec_id", "nn_vec_id")
    else:
        ivf = _knn_batch(spark, sf_dir, qstep).select("q_vec_id", "nn_vec_id")

    e = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))
    q = e.filter(F.col("vec_id") % qstep == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("emb").alias("qe")
    )
    rw = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), "nn_vec_id")
    exact = (
        F.broadcast(q)
        .join(e)
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col("vec_id").alias("nn_vec_id"),
            r4(_cos(F.col("emb"), F.col("qe"))).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= KNN_K)
        .select("q_vec_id", "nn_vec_id")
    )
    hits = exact.join(ivf, ["q_vec_id", "nn_vec_id"]).groupBy("q_vec_id").agg(
        F.count("*").alias("h")
    )
    return (
        q.select("q_vec_id")
        .join(hits, "q_vec_id", "left")
        .select(
            "q_vec_id",
            F.coalesce("h", F.lit(0)).cast("int").alias("n_hits"),
            F.round(F.coalesce("h", F.lit(0)) * 1.0 / KNN_K, 4).alias("recall"),
        )
        .orderBy("q_vec_id")
    )


@query("q_sim_recall_eval", oracle=_RECALL_ORACLE)
def q_sim_recall_eval(spark, sf_dir):
    """Recall@k audit of the IVF ANN index: for every query in the
    deterministic probe batch (vec_id % {QSTEP} == 0), intersect the
    IVF top-{K} (q_sim_knn_batch, probed-cells-only) with the EXACT
    top-{K} (brute force over the full corpus) and report hits/recall per
    query.  This is the measurement every ANN deployment runs before
    trusting an index — approximate results without a recall number are
    not results — and the op whose output tunes N_PROBE/N_CELLS.

    Scale shape: the exact baseline is deliberately brute-force — that is
    what makes it ground truth — but it runs over the PROBE BATCH only
    (a fixed sample, ~4% here; a few hundred queries in production), so
    cost is |batch| x corpus map work with the batch BROADCAST against
    one corpus scan (the q_embed_matryoshka recall-audit shape, never a
    corpus x corpus product).  The IVF side inherits q_sim_knn_batch's
    equi-join-on-cell plan.  Both sides rank on the 4dp-ROUNDED cosine
    with vec_id tiebreak, so hit membership is bit-stable across engines.

    Since round 9 the probe stride is the SCALE KNOB by default:
    qstep = recall_qstep_for(count) pins the batch at
    ~RECALL_TARGET_PROBES probes (a recall CI depends on batch SIZE, not
    fraction), so the exact baseline stays one linear corpus scan as the
    corpus grows (x10 measured 8.25x fixed -> 4.94x scaled, SCALE.md r8);
    the oracle computes the identical stride from count(*)
    (SCALED_QSTEP_SQL), keeping the value-hash twin exact at any size.
    """
    return _recall_eval(spark, sf_dir)



ELBOW_KS = (4, 8, 16)  # the candidate centroid counts the elbow sweeps


def _elbow_oracle() -> str:
    """Three unrolled Lloyd chains (one per candidate k, sharing the `e`
    scan CTE) + a final-assignment inertia readout per k.  d2 is the
    explicit index-fold (generate_series 1..64), the same sequential
    order as the Spark zip_with fold, so the summands are bit-identical
    before the one rounding site per k."""
    d2 = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> (a.emb[i] - c.c[i]) * (a.emb[i] - c.c[i])))"
    )
    chains, selects = [], []
    for k in ELBOW_KS:
        chains.append(
            f"""c0_{k} AS (SELECT vec_id AS cell, emb AS c FROM e
               WHERE vec_id < {k}),
    a1_{k} AS ({_KMEANS_ASSIGN.format(src='e', cent=f'c0_{k}')}),
    c1_{k} AS ({_KMEANS_RECENTER.format(assigned=f'a1_{k}')}),
    a2_{k} AS ({_KMEANS_ASSIGN.format(src='e', cent=f'c1_{k}')}),
    c2_{k} AS ({_KMEANS_RECENTER.format(assigned=f'a2_{k}')}),
    a3_{k} AS ({_KMEANS_ASSIGN.format(src='e', cent=f'c2_{k}')}),
    i_{k} AS (
      SELECT {k} AS k, CAST(count(*) AS BIGINT) AS n,
             round(sum({d2}), 4) AS inertia,
             round(sum({d2}) / count(*), 4) AS mean_d2
      FROM a3_{k} a JOIN c2_{k} c USING (cell))"""
        )
        selects.append(f"SELECT * FROM i_{k}")
    e_cte = """e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
    )"""
    return (
        "WITH "
        + ",\n    ".join([e_cte] + chains)
        + "\n    "
        + " UNION ALL ".join(selects)
        + " ORDER BY k"
    )


@query("q_embed_kmeans_elbow", oracle=_elbow_oracle())
def q_embed_kmeans_elbow(spark, sf_dir):
    """K-selection elbow curve: the SAME deterministic 3-iteration Lloyd
    recurrence as q_cluster_kmeans, swept over k in {ELBOW_KS}, reporting
    per k the total inertia (sum of squared distance to the final
    centroid) and its per-vector mean — the curve that picks K before
    anyone commits to a clustering, and the fixture-scale companion of
    the `semantic_k_for` / `ivf_cells_for` knobs (those scale K with the
    corpus; this measures what a given K buys on THIS corpus).

    Scale shape: identical per-vector math to q_cluster_kmeans per k —
    since round 17 the assignment is a packed-centroid broadcast-row
    argmin (see _kmeans_assigned) and the THREE k-chains advance
    together: one broadcast row carries the packed centroids of every k,
    so each Lloyd level is ONE corpus pass computing all |ELBOW_KS|
    argmins and one combined (k, cell, dim) recenter aggregate — 4 jobs
    total, where the unrolled per-k join+window form was one 72-Exchange
    DAG re-sorting the k x -exploded corpus per iteration.  The corpus is
    never windowed, never multiplied by k, and each sweep member
    collapses to ONE output row.  d2 folds dimensions sequentially on
    both engines, so the inertia summands are bit-identical before the
    one rounding site per k."""
    ks = list(ELBOW_KS)
    e = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))

    def packed(cent_k):
        # (k, cell, c) centroid rows -> ONE row with a sorted packed array
        # per sweep member (collect_list drops the other ks' NULLs).
        return cent_k.agg(*[
            F.array_sort(
                F.collect_list(
                    F.when(F.col("k") == k, F.struct("cell", "c"))
                )
            ).alias(f"c{k}")
            for k in ks
        ])

    cent = packed(
        e.filter(F.col("vec_id") < max(ks))
        .select(
            F.col("vec_id").alias("cell"),
            F.col("emb").alias("c"),
            F.explode(F.array(*[F.lit(k) for k in ks])).alias("k"),
        )
        .filter(F.col("cell") < F.col("k"))
    )
    for _ in range(2):
        kcell = F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("k"),
                    _argmin_cell(F.col("emb"), F.col(f"c{k}"))["cell"]
                    .alias("cell"),
                )
                for k in ks
            ])
        )
        cent = packed(
            e.crossJoin(F.broadcast(cent))
            .select("emb", kcell.alias("kc"))
            .select("kc.k", "kc.cell", F.posexplode("emb").alias("d", "val"))
            .groupBy("k", "cell", "d")
            .agg(F.avg("val").alias("v"))
            .groupBy("k", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "v"))),
                    lambda s: s.v,
                ).alias("c")
            )
        )
    row = e.crossJoin(F.broadcast(cent)).agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                _argmin_cell(F.col("emb"), F.col(f"c{k}"))["d2"]
            ).alias(f"s{k}")
            for k in ks
        ],
    )
    out = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).cast("int").alias("k"),
                    F.col("n").cast("bigint").alias("n"),
                    F.round(F.col(f"s{k}"), 4).alias("inertia"),
                    F.round(F.col(f"s{k}") / F.col("n"), 4).alias("mean_d2"),
                )
                for k in ks
            ])
        ).alias("r")
    ).select("r.*")
    return out.orderBy("k")


# -- IVF index quality: per-cell label purity ---------------------------------


@query(
    "q_embed_cell_purity",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb
      FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT vec_id AS cell, emb AS c FROM e
             WHERE vec_id < {SCALED_CELLS_SQL}),
    assigned AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
        FROM (
          SELECT e.vec_id, cent.cell,
                 round(list_cosine_similarity(e.emb, cent.c), 4) AS cc
          FROM e CROSS JOIN cent)) WHERE rn = 1),
    lab AS (
      SELECT a.cell, emb2.label FROM assigned a
      JOIN embeddings emb2 USING (vec_id)),
    cl AS (SELECT cell, label, count(*) AS cnt FROM lab GROUP BY cell, label),
    tot AS (SELECT cell, sum(cnt) AS n FROM cl GROUP BY cell),
    top AS (
      SELECT cell, label, cnt,
             row_number() OVER (PARTITION BY cell
                                ORDER BY cnt DESC, label) AS rn
      FROM cl),
    ent AS (
      SELECT cl.cell,
             round(-sum((cnt * 1.0 / tot.n) * ln(cnt * 1.0 / tot.n)), 4)
               AS entropy
      FROM cl JOIN tot ON cl.cell = tot.cell GROUP BY cl.cell)
    SELECT CAST(top.cell AS BIGINT) AS cell, CAST(tot.n AS BIGINT) AS n_vecs,
           CAST(top.label AS INT) AS top_label,
           round(top.cnt * 1.0 / tot.n, 4) AS top_share,
           ent.entropy
    FROM top JOIN tot ON top.cell = tot.cell
    JOIN ent ON ent.cell = top.cell
    WHERE top.rn = 1 ORDER BY cell
    """,
)
def q_embed_cell_purity(spark, sf_dir):
    """Per-IVF-cell label purity audit: for every cell of the ANN index's
    coarse quantizer (the SCALED assignment geometry used by
    q_sim_knn_batch and its siblings — since round 11 q_sim_ann_ivf too —
    cell count = ivf_cells_for(corpus)), the
    population, the majority label and its
    share, and the Shannon entropy of the cell's label mix.  This is the
    index-quality diagnostic BETWEEN clustering and retrieval: cells that
    mix many labels at high entropy mark regions where the coarse
    quantizer cuts across semantic boundaries — exactly where IVF probes
    miss neighbors and q_sim_recall_eval loses recall — while
    single-label cells certify that label-stratified negative sampling
    can trust the cell structure.

    Scale shape: assignment is the family's broadcast-centroid plan (a
    bounded x|cells| fan-out, rn=1 window per vector — never corpus x
    corpus); labels join back on vec_id (same key, co-partitioned); the
    rest is two partial-agg collapses to <=|cells| x |labels| rows and
    windows over that tiny frame.  Output is |cells| rows whatever the
    corpus size.  Entropy follows the q_agg_entropy convention (natural
    log, exact integer ratios inside, one 4-dp rounding site); the
    majority label breaks count ties on label id ascending in both
    engines.

    Reference scope: no vector surface in the reference facade; sibling
    of q_sim_ann_ivf (shared assignment) and q_cluster_kmeans /
    q_embed_kmeans_elbow (learned-centroid cousins)."""
    from pyspark.sql import Window as W

    n_cells = ivf_cells_for(_emb_count(spark, sf_dir))
    e = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))
    cent = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("c")
    )
    cw = W.partitionBy("vec_id").orderBy(F.desc("cc"), "cell")
    assigned = (
        e.join(F.broadcast(cent))
        .withColumn("cc", F.round(_cos(F.col("emb"), F.col("c")), 4))
        .withColumn("rn", F.row_number().over(cw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    labels = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    cl = (
        assigned.join(labels, "vec_id")
        .groupBy("cell", "label")
        .agg(F.count("*").alias("cnt"))
    )
    tot = cl.groupBy("cell").agg(F.sum("cnt").alias("n"))
    tw = W.partitionBy("cell").orderBy(F.desc("cnt"), "label")
    top = cl.withColumn("rn", F.row_number().over(tw)).filter(F.col("rn") == 1)
    p = F.col("cnt") * 1.0 / F.col("n")
    ent = (
        cl.join(tot, "cell")
        .groupBy("cell")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy"))
    )
    return (
        top.join(tot, "cell")
        .join(ent, "cell")
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("n").cast("bigint").alias("n_vecs"),
            F.col("label").cast("int").alias("top_label"),
            F.round(F.col("cnt") * 1.0 / F.col("n"), 4).alias("top_share"),
            "entropy",
        )
        .orderBy("cell")
    )


# -- hard-negative mining -----------------------------------------------------

HN_K = 5  # hard negatives mined per anchor


def _hard_negatives_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE embedding IS NOT NULL
),
cent AS (SELECT vec_id AS cell, emb AS c FROM e WHERE vec_id < {SCALED_CELLS_SQL}),
ascore AS (
  SELECT e.vec_id, e.label, e.emb, cent.cell,
         round(list_cosine_similarity(e.emb, cent.c), 4) AS cc
  FROM e CROSS JOIN cent),
assigned AS (
  SELECT vec_id, label, emb, cell FROM (
    SELECT vec_id, label, emb, cell,
           row_number() OVER (
             PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
    FROM ascore
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS q_vec_id, label AS q_label, emb AS qe FROM e
      WHERE vec_id % {KNN_QSTEP} = 0),
qscore AS (
  SELECT q.q_vec_id, q.q_label, q.qe, cent.cell,
         round(list_cosine_similarity(q.qe, cent.c), 4) AS cc
  FROM q CROSS JOIN cent),
probed AS (
  SELECT q_vec_id, q_label, qe, cell FROM (
    SELECT q_vec_id, q_label, qe, cell,
           row_number() OVER (
             PARTITION BY q_vec_id ORDER BY cc DESC, cell) AS rn
    FROM qscore
  ) WHERE rn <= {N_PROBE}
),
pscore AS (
  SELECT p.q_vec_id, p.q_label, a.vec_id AS neg_vec_id,
         a.label AS neg_label,
         round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
  FROM probed p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.q_vec_id AND a.label <> p.q_label)
SELECT q_vec_id, CAST(q_label AS INT) AS q_label, neg_vec_id,
       CAST(neg_label AS INT) AS neg_label,
       CAST(rank AS BIGINT) AS rank, cos FROM (
  SELECT q_vec_id, q_label, neg_vec_id, neg_label, cos,
         row_number() OVER (
           PARTITION BY q_vec_id
           ORDER BY cos DESC, neg_vec_id) AS rank
  FROM pscore
) WHERE rank <= {HN_K}
"""


@query("q_sim_hard_negatives", oracle=_hard_negatives_oracle())
def q_sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for every anchor in
    the deterministic query set (vec_id % {KNN_QSTEP} == 0), the top-{HN_K}
    most-similar corpus vectors carrying a DIFFERENT label — the negatives
    that sit just across the decision boundary, which is what makes
    embedding/reranker fine-tuning converge (random negatives are too easy
    to produce gradient; in-batch negatives rarely land this close).  The
    standard pipeline step between embedding generation and contrastive
    batch assembly.

    Plan shape is q_sim_knn_batch's IVF join with the label threaded
    through: broadcast centroids assign the corpus and give each anchor
    its {N_PROBE} probe cells; candidates come from an EQUI join on cell
    (each anchor meets ~N_PROBE/cells of the corpus, never all of it, and
    the cell count is the ivf_cells_for scale knob — per-cell population
    pinned as the corpus grows, oracle computing the identical count(*)
    formula); the label-mismatch filter runs on the bounded candidate set
    BEFORE the per-anchor top-{HN_K} window.  Ranking uses the 4dp-ROUNDED
    cosine with vec_id tiebreaks — both engines rank identically.  Caveat
    documented for consumers: cell-local mining can under-sample negatives
    whose nearest cells weren't probed — the recall trade q_sim_recall_eval
    quantifies for this exact index geometry.

    Reference scope: no vector surface in the reference facade; sibling of
    q_sim_knn_batch (shared IVF join) and q_embed_cell_purity (whose
    high-entropy cells are where this op finds its richest negatives)."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", "label", _dbl("embedding").alias("emb")
    )
    n_cells = ivf_cells_for(_emb_count(spark, sf_dir))
    cent = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("c")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("cc"), "cell")
    assigned = (
        e.join(F.broadcast(cent))
        .withColumn("cc", r4(_cos(F.col("emb"), F.col("c"))))
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "emb", "cell")
    )
    q = e.filter(F.col("vec_id") % KNN_QSTEP == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("qe"),
    )
    pw = Window.partitionBy("q_vec_id").orderBy(F.desc("qc"), "cell")
    probed = (
        q.join(F.broadcast(cent))
        .withColumn("qc", r4(_cos(F.col("qe"), F.col("c"))))
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= N_PROBE)
        .select("q_vec_id", "q_label", "qe", "cell")
    )
    kw = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), "neg_vec_id")
    return (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(
            (F.col("vec_id") != F.col("q_vec_id"))
            & (F.col("label") != F.col("q_label"))
        )
        .select(
            "q_vec_id",
            F.col("q_label").cast("int").alias("q_label"),
            F.col("vec_id").alias("neg_vec_id"),
            F.col("label").cast("int").alias("neg_label"),
            r4(_cos(F.col("emb"), F.col("qe"))).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(kw).cast("long"))
        .filter(F.col("rank") <= HN_K)
        .select("q_vec_id", "q_label", "neg_vec_id", "neg_label", "rank", "cos")
    )


# -- hierarchical (two-level) IVF: the next-decade assignment knob ------------
# (N_COARSE_MIN and _coarse_sql live next to the assignment_two_level knob
# above, shared with the branch-guarded ivf_ranked_ctes oracles)


def _flat_within(spark, sf_dir, n_cells: int, pred=None):
    """FLAT ranking frame ``(vec_id, emb, cell, rn)``: every vector's
    cells ranked by rounded cosine against the broadcast centroid table —
    rn==1 is the assignment, rn<=N_PROBE the probe set.  The
    below-ASSIGN_FLAT_MAX arm shared by q_sim_ann_ivf / q_sim_range_ivf
    (the batched operators build assigned/probed separately but
    identically).

    ``pred`` restricts the RANKED side to a subset (the incremental-index
    delta batch, q_sim_index_update) while the centroid table is still
    drawn from the FULL corpus — a vector's assignment depends only on
    its own embedding and the shared centroids, so subset assignments are
    bit-identical to the full-corpus pass (the merge==rebuild property)."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))
    cent = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cc"), "cell")
    return (
        (e if pred is None else e.filter(pred)).join(F.broadcast(cent))
        .withColumn("cc", r4(_cos(F.col("emb"), F.col("c"))))
        .withColumn("rn", F.row_number().over(w))
        .select("vec_id", "emb", "cell", "rn")
    )


def _two_level_within(spark, sf_dir, n_cells: int, pred=None):
    """Hierarchical two-level ranking frame ``(vec_id, emb, cell, rn)``:
    each vector's fine cells ranked WITHIN its coarse group — rn==1 is
    the cell assignment, rn<=N_PROBE the probe set.  Shared by the
    two-level arm of every IVF-family operator (q_sim_knn_batch_2level,
    and q_sim_ann_ivf / q_sim_knn_batch / q_sim_recall_eval above
    ASSIGN_FLAT_MAX vectors).  2n*sqrt(cells) cosines vs flat's n*cells;
    the corpus only ever meets broadcast centroid tables.

    ``pred`` restricts the RANKED side (the incremental-index delta
    batch); coarse/fine centroid tables stay full-corpus so subset
    assignments equal the full pass row-for-row (see _flat_within)."""
    import math

    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select("vec_id", _dbl("embedding").alias("emb"))
    n_coarse = max(N_COARSE_MIN, math.isqrt(n_cells))
    coarse = e.filter(F.col("vec_id") < n_coarse).select(
        F.col("vec_id").alias("g"), F.col("emb").alias("cg")
    )
    fine = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("c")
    )
    fw = Window.partitionBy("cell").orderBy(F.desc("gc"), "g")
    f2c = (
        fine.join(F.broadcast(coarse))
        .withColumn("gc", r4(_cos(F.col("c"), F.col("cg"))))
        .withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") == 1)
        .select("cell", "c", "g")
    )
    vw = Window.partitionBy("vec_id").orderBy(F.desc("gc"), "g")
    v2c = (
        (e if pred is None else e.filter(pred)).join(F.broadcast(coarse))
        .withColumn("gc", r4(_cos(F.col("emb"), F.col("cg"))))
        .withColumn("rn", F.row_number().over(vw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "g")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("fc"), "cell")
    return (
        v2c.join(F.broadcast(f2c), "g")
        .withColumn("fc", r4(_cos(F.col("emb"), F.col("c"))))
        .withColumn("rn", F.row_number().over(aw))
        .select("vec_id", "emb", "cell", "rn")
    )


def _knn_batch_2level(spark, sf_dir, qstep: int, n_cells: int | None = None):
    """Core of q_sim_knn_batch_2level with the probe stride and fine-cell
    count as parameters — also the two-level arm the REGISTERED
    q_sim_knn_batch/_recall_eval take above ASSIGN_FLAT_MAX vectors
    (assignment_two_level)."""
    from pyspark.sql import Window

    if n_cells is None:
        n_cells = ivf_cells_for(_emb_count(spark, sf_dir))
    within = _two_level_within(spark, sf_dir, n_cells)
    assigned = within.filter(F.col("rn") == 1).select("vec_id", "emb", "cell")
    probed = (
        within.filter(
            (F.col("vec_id") % qstep == 0) & (F.col("rn") <= N_PROBE)
        )
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("emb").alias("qe"),
            "cell",
        )
    )
    kw = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), "nn_vec_id")
    return (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col("vec_id").alias("nn_vec_id"),
            r4(_cos(F.col("emb"), F.col("qe"))).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(kw).cast("long"))
        .filter(F.col("rank") <= KNN_K)
        .select("q_vec_id", "nn_vec_id", "rank", "cos")
    )


_KNN_2LEVEL_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb
  FROM embeddings WHERE embedding IS NOT NULL
),
coarse AS (SELECT vec_id AS g, emb AS cg FROM e WHERE vec_id < {_coarse_sql()}),
fine AS (SELECT vec_id AS cell, emb AS c FROM e WHERE vec_id < {SCALED_CELLS_SQL}),
fs AS (
  SELECT f.cell, f.c, coarse.g,
         round(list_cosine_similarity(f.c, coarse.cg), 4) AS gc
  FROM fine f CROSS JOIN coarse),
f2c AS (
  SELECT cell, c, g FROM (
    SELECT cell, c, g,
           row_number() OVER (PARTITION BY cell ORDER BY gc DESC, g) AS rn
    FROM fs
  ) WHERE rn = 1
),
vs AS (
  SELECT e.vec_id, e.emb, coarse.g,
         round(list_cosine_similarity(e.emb, coarse.cg), 4) AS gc
  FROM e CROSS JOIN coarse),
v2c AS (
  SELECT vec_id, emb, g FROM (
    SELECT vec_id, emb, g,
           row_number() OVER (PARTITION BY vec_id ORDER BY gc DESC, g) AS rn
    FROM vs
  ) WHERE rn = 1
),
cs AS (
  SELECT v.vec_id, v.emb, f.cell,
         round(list_cosine_similarity(v.emb, f.c), 4) AS cc
  FROM v2c v JOIN f2c f USING (g)),
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT vec_id, emb, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
    FROM cs
  ) WHERE rn = 1
),
probed AS (
  SELECT q_vec_id, qe, cell FROM (
    SELECT vec_id AS q_vec_id, emb AS qe, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
    FROM cs WHERE vec_id % {KNN_QSTEP} = 0
  ) WHERE rn <= {N_PROBE}
),
pscore AS (
  SELECT p.q_vec_id, a.vec_id AS nn_vec_id,
         round(list_cosine_similarity(a.emb, p.qe), 4) AS cos
  FROM probed p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.q_vec_id)
SELECT q_vec_id, nn_vec_id, CAST(rank AS BIGINT) AS rank, cos FROM (
  SELECT q_vec_id, nn_vec_id, cos,
         row_number() OVER (
           PARTITION BY q_vec_id
           ORDER BY cos DESC, nn_vec_id) AS rank
  FROM pscore
) WHERE rank <= {KNN_K}
"""


@query("q_sim_knn_batch_2level", oracle=_KNN_2LEVEL_ORACLE)
def q_sim_knn_batch_2level(spark, sf_dir):
    """Batched IVF k-NN join under HIERARCHICAL (two-level) coarse
    quantization — the next-decade version of q_sim_knn_batch's
    assignment stage.  The ×100 measurement (SCALE.md round 9) showed the
    flat design's one remaining super-linear term: with cells =
    ivf_cells_for(n) ≈ n/512, assigning every vector by scoring EVERY
    centroid costs n²/512 cosines (78M at 200k vectors, ~2e9 at 1M).
    Two-level assignment routes each vector through ~sqrt(cells) coarse
    groups first, then ranks only its group's fine centroids:
    n·(sqrt(cells) + cells/sqrt(cells)) = 2n·sqrt(cells) ≈ n^1.5/11 —
    the standard IMI/IVF-HNSW coarse-stage shape, here as a pure
    DataFrame plan.

    Determinism and the oracle twin: coarse centroids are vec_id <
    max({N_COARSE_MIN}, isqrt(cells)) (a SUBSET of the fine centroids, so
    every coarse group owns at least itself); every argmin ranks the
    4dp-ROUNDED cosine with id tiebreaks; the DuckDB oracle unrolls the
    same two chained argmins (f2c, v2c → group-scoped fine assignment)
    from the same count(*) formulas, so the value-hash twin is exact at
    any corpus size.  Results differ from the flat operator by
    construction (different cell geometry near group boundaries — the
    recall trade q_sim_recall_eval quantifies); both stay registered
    because at fixture scale flat assignment IS optimal and the flat
    operator is the production shape until the n²/512 term binds.

    Plan shape: coarse table broadcasts (≤ sqrt(65536) = 256 rows); f2c
    is a cells×coarse fan-out (bounded by 65,536×256); the corpus meets
    ONLY broadcast tables and its own group's fine centroids (equi join
    on g) — never all centroids, never other vectors except through the
    final cell equi-join, which is q_sim_knn_batch's candidate stage
    unchanged.

    Reference scope: no vector surface in the reference facade; sibling
    of q_sim_knn_batch (flat assignment) and q_sim_ann_ivf.  Since round
    10 this geometry is also the REGISTERED default of the whole IVF
    family above ASSIGN_FLAT_MAX vectors (assignment_two_level); this
    unconditional registration stays so the two-level shape remains
    driver-verified at fixture scale, where the siblings take the flat
    branch."""
    return _knn_batch_2level(spark, sf_dir, KNN_QSTEP)


_INDEX_STATS_ORACLE = f"""
WITH {ivf_ranked_ctes()},
pc AS (SELECT cell, count(*) AS pop FROM assigned GROUP BY cell)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_vectors,
       CAST({SCALED_CELLS_SQL} AS BIGINT) AS n_cells,
       CAST(count(*) AS BIGINT) AS n_cells_used,
       CAST(min(pop) AS BIGINT) AS pop_min,
       CAST(max(pop) AS BIGINT) AS pop_max,
       round(sum(pop) * 1.0 / count(*), 4) AS pop_avg,
       round(max(pop) * count(*) * 1.0 / sum(pop), 4) AS balance
FROM pc
"""


@query("q_sim_index_stats", oracle=_INDEX_STATS_ORACLE)
def q_sim_index_stats(spark, sf_dir):
    """IVF index OBSERVABILITY: per-cell population profile of the
    assignment — used cells, min/max/avg population and the balance
    factor (max/avg) — the manifest an ANN service monitors to catch
    centroid drift (hot cells make probe latency quadratic in the skew)
    and wasted cells (empty cells burn probe budget).  The operational
    twin of q_embed_cell_purity (which audits semantic quality; this
    audits LOAD).

    Scale shape: the assignment is the family's shared broadcast-
    centroid plan; the profile is one |cells|-row aggregate of it.

    Reference scope: index observability mirrors the reference's
    metadata-stats surface (q_meta_partition_stats) applied to the ANN
    index; no vector surface in the facade
    (api/router/router.go:9-55)."""
    n = _emb_count(spark, sf_dir)
    n_cells = ivf_cells_for(n)
    if assignment_two_level(n):
        within = _two_level_within(spark, sf_dir, n_cells)
    else:
        within = _flat_within(spark, sf_dir, n_cells)
    pc = (
        within.filter(F.col("rn") == 1)
        .groupBy("cell")
        .agg(F.count("*").alias("pop"))
    )
    return pc.agg(
        F.lit(n).cast("long").alias("n_vectors"),
        F.lit(n_cells).cast("long").alias("n_cells"),
        F.count("*").alias("n_cells_used"),
        F.min("pop").alias("pop_min"),
        F.max("pop").alias("pop_max"),
        F.round(F.sum("pop") * 1.0 / F.count("*"), 4).alias("pop_avg"),
        F.round(F.max("pop") * F.count("*") * 1.0 / F.sum("pop"), 4).alias(
            "balance"
        ),
    )
