"""Embedding compression for vector-heavy training corpora.

Serving ANN or shipping a 100 TB embedding column is dominated by vector
bytes; int8 scalar quantization cuts them 4x with ~no recall loss, and is
the standard first step before IVF/PQ indexing. The operator here is the
per-dimension symmetric (max-abs) quantizer:

    scale_d = max(|x_d|) over the corpus;  q_d = floor(x_d * 127 / scale_d + .5)

Spark shape (the part that must survive 100 TB):

- the calibration pass is ONE 64-wide ``max(abs(...))`` aggregate — fully
  codegen'd, map-side partial aggregation, a single 1-row result regardless
  of corpus size;
- the 1-row scale vector is broadcast back (same broadcast-join pattern as
  q_sim_topk's query vector), so quantization itself is MAP-ONLY — no
  shuffle ever touches the corpus;
- all arithmetic is JVM-side higher-order functions (zip_with/aggregate);
  no Python in the path.

Floor-based rounding (`floor(x + 0.5)`) is used instead of round() so the
oracle computes the bit-identical double expression: both engines evaluate
the same IEEE ops in the same order, making the integer codes exactly
comparable (the per-doc code checksum is an exact BIGINT match, not a
tolerance check).

Reference parity note: the reference (a metadata REST catalog) has no
vector surface; this extends SURVEY.md §2.C's similarity family
(llm/similarity.py) with the compression step a production pipeline runs
between embedding generation and index build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.common import r4, t
from ..registry import query

# Quantize: identical double expression on both engines -> identical codes.
_Q = "CAST(floor((CASE WHEN m <> 0.0D THEN v * 127.0D / m ELSE 0.0D END) + 0.5D) AS BIGINT)"


@query(
    "q_embed_quantize",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ), dims AS (
      SELECT d, max(abs(v)) AS m FROM ex GROUP BY d
    ), qq AS (
      SELECT vec_id, label, v, m,
             CAST(floor((CASE WHEN m <> 0.0 THEN v * 127.0 / m
                               ELSE 0.0 END) + 0.5) AS BIGINT) AS q
      FROM ex JOIN dims USING (d)
    )
    SELECT vec_id, label,
           CAST(sum(q) AS BIGINT) AS q_checksum,
           round(sum(v * (q * m / 127.0)) /
                 (sqrt(sum(v * v)) * sqrt(sum((q * m / 127.0) * (q * m / 127.0)))),
                 4) AS cos_dequant
    FROM qq GROUP BY vec_id, label
    """,
)
def q_embed_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column: per-dimension
    max-abs calibration (one 1-row aggregate), broadcast scales, map-only
    encode; emits each vector's exact code checksum plus the cosine between
    the original and the dequantized vector (the recall proxy — ~0.999 at
    64 dims, so int8 candidates rank nearly identically)."""
    # Lazy import: keeps similarity's own @query registrations out of this
    # module's slot in the registry order (the driver's 50-entry window).
    from .similarity import DIM, _dbl, _emb

    e = _emb(spark, sf_dir).select(
        "vec_id", "label", _dbl("embedding").alias("x")
    )
    # calibration: 64 codegen'd max(abs) aggregates -> one broadcast row
    scales = e.agg(
        F.array(*[F.max(F.abs(F.col("x")[i])) for i in range(DIM)]).alias("mx")
    )
    q8 = F.expr(f"zip_with(x, mx, (v, m) -> {_Q})")
    dq = "zip_with(q8, mx, (q, m) -> q * m / 127.0D)"
    dot = f"aggregate(zip_with(x, {dq}, (a, b) -> a * b), 0.0D, (s, p) -> s + p)"
    nx = "sqrt(aggregate(transform(x, a -> a * a), 0.0D, (s, p) -> s + p))"
    ndq = f"sqrt(aggregate(transform({dq}, b -> b * b), 0.0D, (s, p) -> s + p))"
    return (
        e.join(F.broadcast(scales))
        .withColumn("q8", q8)
        .select(
            "vec_id",
            "label",
            F.expr("aggregate(q8, CAST(0 AS BIGINT), (s, q) -> s + q)").alias(
                "q_checksum"
            ),
            F.round(F.expr(f"{dot} / ({nx} * {ndq})"), 4).alias("cos_dequant"),
        )
    )


N_SUB = 8   # subspaces
SUB_DIM = 8  # dims per subspace (N_SUB * SUB_DIM == similarity.DIM)
K_CODES = 16  # codewords per subspace (first K corpus vectors, like IVF)

_PQ_SUBS = "(SELECT unnest(range(0, 8)) AS s)"
_PQ_D2 = (
    "round(list_sum(list_transform(range(1, 9), "
    "i -> (sub[i] - csub[i]) * (sub[i] - csub[i]))), 4)"
)

_PQ_CTES = f"""e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings WHERE embedding IS NOT NULL
),
sub AS (
  SELECT vec_id, label, s, list_slice(emb, s * 8 + 1, s * 8 + 8) AS sub
  FROM e, {_PQ_SUBS}
),
cb AS (
  SELECT vec_id AS code, s, list_slice(emb, s * 8 + 1, s * 8 + 8) AS csub
  FROM e, {_PQ_SUBS} WHERE vec_id < {K_CODES}
),
a AS (
  SELECT vec_id, label, s, code,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY {_PQ_D2} ASC, code ASC) AS rn
  FROM sub JOIN cb USING (s)
)"""

_PQ_ORACLE = f"""
WITH {_PQ_CTES}
SELECT vec_id, label,
       {", ".join(f"CAST(max(CASE WHEN s = {s} THEN code END) AS BIGINT) AS c{s}" for s in range(8))}
FROM a WHERE rn = 1
GROUP BY vec_id, label
"""


@query("q_embed_pq", oracle=_PQ_ORACLE)
def q_embed_pq(spark, sf_dir):
    """Product quantization (PQ) encode: split each 64-dim vector into 8
    subvectors of 8 dims and replace each with the id of its nearest
    codeword in that subspace's 16-entry codebook — 64 floats become 8
    small codes (32x compression), the standard memory layout for
    billion-scale ANN (IVF-PQ). Codebooks are deterministic (subvectors of
    the first K_CODES corpus vectors, the same convention as
    q_sim_ann_ivf's centroids; production would k-means them offline).

    Plan shape: the codebook (8 x 16 rows) is BROADCAST; each vector
    explodes into its 8 subvectors map-side, meets only its subspace's 16
    codewords in the broadcast equi-join on s, and a (vec_id, s) window
    takes the argmin — O(vectors x 8 x 16) work, one narrow shuffle for
    the final per-vector pivot. Distances are ranked on the ROUNDED
    squared L2 with code-asc tiebreak so both engines rank identically
    (the q_sim_knn_batch convention)."""
    assigned = _pq_assignments(spark, sf_dir)
    return assigned.groupBy("vec_id", "label").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("code")))
            .cast("long")
            .alias(f"c{s}")
            for s in range(N_SUB)
        ]
    )


def _pq_subframes(spark, sf_dir):
    """(sub, cb): the per-vector subvector explode and the broadcastable
    8x16 codebook frame — shared by PQ encode and ADC search."""
    from .similarity import _dbl, _emb

    e = _emb(spark, sf_dir).select("vec_id", "label", _dbl("embedding").alias("x"))
    subs = F.array(*[F.slice("x", s * SUB_DIM + 1, SUB_DIM) for s in range(N_SUB)])
    sub = e.select("vec_id", "label", F.posexplode(subs).alias("s", "sub"))
    cb = e.filter(F.col("vec_id") < K_CODES).select(
        F.col("vec_id").alias("code"), F.posexplode(subs).alias("s", "csub")
    )
    return sub, cb


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_assignments(spark, sf_dir, pred=None):
    """(vec_id, label, s, code) — each vector's nearest codeword per
    subspace, ranked on rounded squared L2 with code-asc tiebreak.

    ``pred`` restricts the ENCODED side to a subset (the incremental-index
    delta batch, q_sim_index_update); the codebook is always the full-
    corpus convention (vec_id < K_CODES), so subset codes equal the
    full-pass codes row-for-row."""
    from pyspark.sql import Window

    sub, cb = _pq_subframes(spark, sf_dir)
    if pred is not None:
        sub = sub.filter(pred)
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    return (
        sub.join(F.broadcast(cb), "s")
        .withColumn("d2", F.round(_sq_l2(F.col("sub"), F.col("csub")), 4))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "s", "code")
    )


ADC_TOP_K = 10

# query subvector table + per-(subspace, code) distance lookup table:
# the entire ADC score of a vector is 8 table lookups + a sum.
def _adc_oracle() -> str:
    from .similarity import QUERY_VEC_ID

    qd2 = (
        "round(list_sum(list_transform(range(1, 9), "
        "i -> (qsub[i] - csub[i]) * (qsub[i] - csub[i]))), 4)"
    )
    return f"""
    WITH {_PQ_CTES},
    q AS (SELECT s, sub AS qsub FROM sub WHERE vec_id = {QUERY_VEC_ID}),
    lut AS (
      SELECT cb.s, cb.code, {qd2} AS d2
      FROM cb JOIN q USING (s)
    ),
    scored AS (
      SELECT a.vec_id, a.label, round(sum(lut.d2), 4) AS adc_d2
      FROM a JOIN lut ON a.s = lut.s AND a.code = lut.code
      WHERE a.rn = 1 AND a.vec_id <> {QUERY_VEC_ID}
      GROUP BY a.vec_id, a.label
    )
    SELECT vec_id, label, adc_d2 FROM scored
    ORDER BY adc_d2 ASC, vec_id ASC LIMIT {ADC_TOP_K}
    """


@query("q_sim_ann_pq", oracle=_adc_oracle())
def q_sim_ann_pq(spark, sf_dir):
    """ANN search over PQ codes with ASYMMETRIC DISTANCE COMPUTATION
    (ADC) — the FAISS IndexPQ query shape, completing the compression
    family: q_embed_pq builds the codes, this searches them. The query
    stays in full precision; each corpus vector's approximate distance is
    the sum of 8 precomputed lookups d2(query_sub[s], codeword[s, code]),
    so the scan reads 8 small codes per vector instead of 64 floats — at
    100 TB that is the difference between a memory-resident index and a
    disk-bound one.

    Plan shape: the 8x16-entry lookup table is built from the broadcast
    codebook and the 1-row query (tiny), broadcast again, and joined to
    the code assignments on (s, code) — map-only scoring, one partial-
    aggregated sum per vector, TakeOrdered for the top-k. Final ranking
    on the ROUNDED ADC distance with vec_id tiebreak (the engine-parity
    convention)."""
    from .similarity import QUERY_VEC_ID

    sub, cb = _pq_subframes(spark, sf_dir)
    assigned = _pq_assignments(spark, sf_dir)
    q = sub.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "s", F.col("sub").alias("qsub")
    )
    lut = cb.join(F.broadcast(q), "s").select(
        "s", "code", F.round(_sq_l2(F.col("csub"), F.col("qsub")), 4).alias("d2")
    )
    return (
        assigned.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(lut), ["s", "code"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sum("d2"), 4).alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(ADC_TOP_K)
    )


@query(
    "q_embed_dim_stats",
    oracle="""
    WITH u AS (
      SELECT vec_id, CAST(d.i - 1 AS INT) AS dim, CAST(d.x AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS i) AS d
      WHERE embedding IS NOT NULL
    )
    SELECT dim,
           round(avg(x), 4) AS mean_x,
           round(stddev_samp(x), 4) AS std_x,
           round(min(x), 4) AS min_x,
           round(max(x), 4) AS max_x,
           CAST(count(*) FILTER (x = 0.0) AS BIGINT) AS n_zero
    FROM u GROUP BY dim
    """,
)
def q_embed_dim_stats(spark, sf_dir):
    """Embedding-health profile: per-DIMENSION mean / std / min / max and
    zero counts across the corpus — the QA pass that catches dead
    dimensions (std ~ 0), collapsed encoders (all dims correlated), and
    truncation bugs (hard zeros past some index) before a similarity
    index is built on bad vectors.

    Scale shape: posexplode is map-only (|corpus| x 64 rows, never
    materialized — it feeds straight into a partial aggregate), and the
    shuffle carries at most 64 pre-combined rows per map partition. The
    output is always exactly |dims| rows, independent of corpus size."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    u = e.select(
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "dim", "x"
        )
    )
    return u.groupBy("dim").agg(
        r4(F.avg("x")).alias("mean_x"),
        r4(F.stddev_samp("x")).alias("std_x"),
        r4(F.min("x")).alias("min_x"),
        r4(F.max("x")).alias("max_x"),
        F.count(F.when(F.col("x") == 0.0, 1)).alias("n_zero"),
    )


@query(
    "q_embed_coverage",
    oracle="""
    SELECT CASE WHEN d.doc_id IS NULL THEN '<no-doc>'
                ELSE coalesce(d.source, '<null-source>') END AS source,
           CAST(count(d.doc_id) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN e.vec_id IS NOT NULL
                            AND e.embedding IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_with_vec,
           CAST(count(CASE WHEN d.doc_id IS NOT NULL
                            AND (e.vec_id IS NULL OR e.embedding IS NULL)
                           THEN 1 END) AS BIGINT) AS n_missing_vec,
           CAST(count(CASE WHEN d.doc_id IS NULL THEN 1 END) AS BIGINT)
               AS n_orphan_vec
    FROM documents d
    FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY 1
    """,
)
def q_embed_coverage(spark, sf_dir):
    """Referential-integrity audit between the document corpus and its
    embedding table — the data-quality gate a pipeline runs BEFORE building
    any vector index: per source, how many docs exist, how many carry a
    usable vector, how many are missing one (no row OR NULL embedding —
    those rows silently vanish from every ANN/cluster/dedup result, see
    _emb's NULL contract), and how many vectors are orphaned (no backing
    doc — stale index entries after deletes). '<no-doc>' collects orphans;
    '<null-source>' keeps NULL-source docs distinct from them.

    Scale shape: ONE full outer hash join on the id keys (AQE handles
    skew; both sides shuffle once) feeding a map-combined count aggregate
    whose output is |sources|+2 rows. No vector arithmetic — the embedding
    COLUMN is only null-checked, so column pruning keeps vector bytes out
    of the shuffle entirely (ReadSchema carries vec_id + a null bit)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").isNotNull().alias("has_vec")
    )
    j = d.join(e, d.doc_id == e.vec_id, "full_outer")
    src = F.when(F.col("doc_id").isNull(), F.lit("<no-doc>")).otherwise(
        F.coalesce("source", F.lit("<null-source>"))
    )
    return (
        j.groupBy(src.alias("source"))
        .agg(
            F.count("doc_id").alias("n_docs"),
            F.count(
                F.when(F.col("vec_id").isNotNull() & F.col("has_vec"), 1)
            ).alias("n_with_vec"),
            F.count(
                F.when(
                    F.col("doc_id").isNotNull()
                    & (F.col("vec_id").isNull() | ~F.col("has_vec")),
                    1,
                )
            ).alias("n_missing_vec"),
            F.count(F.when(F.col("doc_id").isNull(), 1)).alias("n_orphan_vec"),
        )
    )


@query(
    "q_embed_norm_outliers",
    oracle="""
    WITH nrm AS (
      SELECT vec_id, label,
             round(sqrt(list_sum(list_transform(embedding,
                                                x -> CAST(x AS DOUBLE) * x))),
                   4) AS nrm
      FROM embeddings WHERE embedding IS NOT NULL
    ), st AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n,
             round(avg(nrm), 4) AS mean_norm,
             round(stddev_samp(nrm), 4) AS std_norm,
             round(min(nrm), 4) AS min_norm,
             round(max(nrm), 4) AS max_norm
      FROM nrm GROUP BY label
    )
    SELECT st.label, st.n, st.mean_norm, st.std_norm, st.min_norm, st.max_norm,
           CAST(count(*) FILTER (abs(nrm.nrm - st.mean_norm)
                                 > 2 * st.std_norm) AS BIGINT) AS n_outliers
    FROM nrm JOIN st USING (label)
    GROUP BY st.label, st.n, st.mean_norm, st.std_norm, st.min_norm, st.max_norm
    ORDER BY st.label
    """,
)
def q_embed_norm_outliers(spark, sf_dir):
    """Vector-norm QA per label: count, mean/std/min/max of the L2 norm,
    and |z| > 2 outlier counts — the embedding-health screen that catches
    unnormalized batches, near-zero (dead-encoder) vectors, and exploding
    outputs before an index or clustering run inherits them (the per-ROW
    complement of q_embed_dim_stats' per-DIMENSION profile).

    Scale shape: the norm is a map-only array fold (sequential over the
    array on both engines, so bit-identical), per-label stats collapse to
    |labels| rows, and the outlier pass re-joins those stats by BROADCAST
    — two scans, zero corpus shuffles beyond the |labels|-row aggregates.
    The z comparison runs on 4-dp-ROUNDED norms and stats on both engines
    (the q_sim_mmr argmax discipline), so ulp-level aggregate drift
    cannot flip a boundary row."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    xs = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    nrm = e.select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(F.aggregate(xs, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("nrm"),
    )
    st = nrm.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("nrm"), 4).alias("mean_norm"),
        F.round(F.stddev_samp("nrm"), 4).alias("std_norm"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
    )
    return (
        nrm.join(F.broadcast(st), "label")
        .groupBy("label", "n", "mean_norm", "std_norm", "min_norm", "max_norm")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("nrm") - F.col("mean_norm"))
                    > 2 * F.col("std_norm"),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .orderBy("label")
    )


@query(
    "q_embed_centroid_shift",
    oracle="""
    WITH u AS (
      SELECT vec_id % 2 AS half, label,
             CAST(d.i - 1 AS INT) AS dim, CAST(d.x AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS i) AS d
      WHERE embedding IS NOT NULL
    ), m AS (
      SELECT label, dim,
             round(avg(x) FILTER (half = 0), 4) AS a,
             round(avg(x) FILTER (half = 1), 4) AS b
      FROM u GROUP BY label, dim
    ), agg AS (
      SELECT label, sum(a * b) AS ab, sum(a * a) AS aa, sum(b * b) AS bb
      FROM m GROUP BY label
    ), cnt AS (
      SELECT label,
             CAST(count(*) FILTER (vec_id % 2 = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (vec_id % 2 = 1) AS BIGINT) AS n_b
      FROM embeddings WHERE embedding IS NOT NULL GROUP BY label
    )
    SELECT agg.label, cnt.n_a, cnt.n_b,
           round(ab / (sqrt(aa) * sqrt(bb)), 4) AS cos_shift
    FROM agg JOIN cnt USING (label) ORDER BY agg.label
    """,
)
def q_embed_centroid_shift(spark, sf_dir):
    """Embedding-drift monitor: split the corpus into two halves (vec_id
    parity — deterministic stand-in for snapshot A/B), compute each
    label's mean vector per half, and report the cosine between the two
    half-centroids — cos ~ 1.0 means the encoder/source is stable for
    that label, a drop marks the label whose distribution moved (the
    alarm run between crawl snapshots or encoder versions before anyone
    re-clusters 100 TB on shifted vectors).

    Scale shape: posexplode is map-only and feeds straight into a partial
    aggregate (the q_embed_dim_stats plan); the per-(label, dim) mean
    frame is |labels| x 64 rows, the cosine collapses it to |labels|
    rows, and the half counts ride a second tiny aggregate joined at
    |labels| rows.  Per-dim means are 4-dp-rounded on both engines
    BEFORE the dot product, so the cosine is computed from identical
    inputs."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    u = e.select(
        (F.col("vec_id") % 2).alias("half"),
        "label",
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "dim", "x"
        ),
    )
    m = u.groupBy("label", "dim").agg(
        F.round(F.avg(F.when(F.col("half") == 0, F.col("x"))), 4).alias("a"),
        F.round(F.avg(F.when(F.col("half") == 1, F.col("x"))), 4).alias("b"),
    )
    agg = m.groupBy("label").agg(
        F.sum(F.col("a") * F.col("b")).alias("ab"),
        F.sum(F.col("a") * F.col("a")).alias("aa"),
        F.sum(F.col("b") * F.col("b")).alias("bb"),
    )
    cnt = e.groupBy("label").agg(
        F.count(F.when(F.col("vec_id") % 2 == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("vec_id") % 2 == 1, 1)).cast("bigint").alias("n_b"),
    )
    return (
        agg.join(cnt, "label")
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(F.col("ab") / (F.sqrt("aa") * F.sqrt("bb")), 4).alias(
                "cos_shift"
            ),
        )
        .orderBy("label")
    )


PCA_ITERS = 3  # fixed power-iteration rounds (the oracle unrolls exactly these)


def _pca_oracle() -> str:
    """Centered covariance + {PCA_ITERS} unrolled power-iteration rounds.

    The iteration runs in EXACT INTEGER arithmetic (covariance and
    iterate scaled by 1e4, matvec an exact BIGINT dot product, 4-dp
    half-away rounding as +5000 // 10000) — the differential-fuzz
    family-6 discipline: sums of 4-dp decimals land exactly ON the next
    rounding midpoint, where binary summation ORDER (numpy pairwise vs
    SQL sequential) decides the ulp and flips the rounded trajectory.
    Norms/divisions go through doubles, but both engines divide the SAME
    exact integers, so the doubles are bit-identical."""
    ctes = [
        """e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb
      FROM embeddings WHERE embedding IS NOT NULL
    ), n AS (SELECT count(*) AS n FROM e),
    u AS (
      SELECT vec_id, CAST(d.i - 1 AS INT) AS dim, CAST(d.x AS DOUBLE) AS x
      FROM e, LATERAL (SELECT unnest(emb) AS x,
                              generate_subscripts(emb, 1) AS i) AS d
    ), mu AS (SELECT dim, round(avg(x), 4) AS m FROM u GROUP BY dim),
    c AS (
      SELECT a.dim AS i, b.dim AS j,
             CAST(round(round(sum((a.x - ma.m) * (b.x - mb.m))
                              / ((SELECT n FROM n) - 1), 4) * 10000, 0)
                  AS BIGINT) AS cv
      FROM u a JOIN u b USING (vec_id)
      JOIN mu ma ON ma.dim = a.dim JOIN mu mb ON mb.dim = b.dim
      GROUP BY a.dim, b.dim
    ), v0 AS (SELECT dim, CAST(1250 AS BIGINT) AS vi FROM mu)"""
    ]
    prev = "v0"
    for k in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""s{k} AS (
      SELECT c.i AS dim, sum(c.cv * p.vi) AS sv
      FROM c JOIN {prev} p ON p.dim = c.j GROUP BY c.i
    ), w{k} AS (
      SELECT dim, (CASE WHEN sv < 0 THEN -1 ELSE 1 END)
                  * ((abs(sv) + 5000) // 10000) AS w4 FROM s{k}
    ), nw{k} AS (SELECT floor(sqrt(CAST(sum(w4 * w4) AS DOUBLE)) + 0.5)
                        AS nwi FROM w{k}),
    v{k} AS (
      SELECT dim, (CASE WHEN w4 < 0 THEN -1 ELSE 1 END)
                  * CAST(floor(abs(CAST(w4 AS DOUBLE)
                                   / (SELECT nwi FROM nw{k})) * 10000 + 0.5)
                         AS BIGINT) AS vi
      FROM w{k})"""
        )
        prev = f"v{k}"
    k = PCA_ITERS + 1
    ctes.append(
        f"""s{k} AS (
      SELECT c.i AS dim, sum(c.cv * p.vi) AS sv
      FROM c JOIN {prev} p ON p.dim = c.j GROUP BY c.i
    ), w{k} AS (
      SELECT dim, (CASE WHEN sv < 0 THEN -1 ELSE 1 END)
                  * ((abs(sv) + 5000) // 10000) AS w4 FROM s{k}
    ), lam AS (SELECT floor(sqrt(CAST(sum(w4 * w4) AS DOUBLE)) + 0.5)
                      / 10000.0 AS top_eig FROM w{k}),
    tr AS (SELECT sum(cv) / 10000.0 AS trace_var FROM c WHERE i = j)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
           tr.trace_var, lam.top_eig,
           floor(lam.top_eig / tr.trace_var * 10000 + 0.5) / 10000.0
             AS var_share
    FROM lam, tr"""
    )


@query("q_embed_pca_var", oracle=_pca_oracle())
def q_embed_pca_var(spark, sf_dir):
    """Embedding anisotropy audit: total variance (covariance trace), the
    top principal eigenvalue via {PCA_ITERS} fixed power-iteration
    rounds, and the variance share it explains — the one-number encoder
    health check (a share near 1 means the embedding space collapsed to
    a line and every cosine is ~1 regardless of content; the known
    anisotropy failure of contextual encoders).  Run before trusting any
    cosine-based dedup/ANN pipeline on a new encoder.

    Scale shape: per-dim means are one posexplode partial aggregate
    (64 rows broadcast back); the covariance is computed as PER-BATCH
    numpy outer products inside mapInPandas — each Arrow batch emits at
    most 64x64 pre-combined (i, j, s) rows whatever its row count, so
    the shuffle carries O(partitions x 4096) rows, never O(corpus) — and
    the 64x64 matrix (4096 rows, ~100 KB) is collected to the driver
    (bounded by DIMENSION, not corpus) where numpy runs the fixed
    {PCA_ITERS}-round power iteration.  Every intermediate (means,
    covariance entries, matvec, norms, iterate) is rounded to 4 dp on
    both engines — the q_cluster_kmeans iterative-oracle discipline — so
    the trajectory is bit-stable."""
    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    u = e.select(
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "dim", "x"
        )
    )
    mu_rows = u.groupBy("dim").agg(F.round(F.avg("x"), 4).alias("m")).collect()
    dim = len(mu_rows)
    mu = np.zeros(dim)
    for r in mu_rows:
        mu[r.dim] = r.m
    n = e.count()

    def _partial_cov(batches):
        for pdf in batches:
            X = np.stack(pdf["emb"].values).astype(np.float64) - mu
            S = X.T @ X
            ii, jj = np.indices(S.shape)
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": S.ravel()}
            )

    parts = (
        e.selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS emb")
        .mapInPandas(_partial_cov, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.round(F.sum("s") / (n - 1), 4).alias("cov"))
        .collect()  # BOUNDED: 64x64 = 4096 rows whatever the corpus size
    )
    C = np.zeros((dim, dim))
    for r in parts:
        C[r.i, r.j] = r.cov

    # exact-integer power iteration (scale 1e4): see _pca_oracle docstring
    Ci = np.round(C * 1e4).astype(np.int64)
    vi = np.full(dim, 1250, dtype=np.int64)
    for _ in range(PCA_ITERS):
        sv = Ci @ vi
        w4 = np.sign(sv) * ((np.abs(sv) + 5000) // 10000)
        nwi = float(np.floor(np.sqrt(float(np.sum(w4 * w4))) + 0.5))
        q = w4.astype(np.float64) / nwi
        vi = (np.sign(q) * np.floor(np.abs(q) * 10000 + 0.5)).astype(np.int64)
    sv = Ci @ vi
    w4 = np.sign(sv) * ((np.abs(sv) + 5000) // 10000)
    top_eig = float(np.floor(np.sqrt(float(np.sum(w4 * w4))) + 0.5)) / 1e4
    trace = float(int(np.sum(np.diag(Ci)))) / 1e4
    var_share = float(np.floor(top_eig / trace * 10000 + 0.5)) / 1e4
    return spark.createDataFrame(
        [(n, trace, top_eig, var_share)],
        "n bigint, trace_var double, top_eig double, var_share double",
    )


RP_K = 16  # Johnson-Lindenstrauss target dimension


def _rp_signs() -> list[list[int]]:
    """The deterministic +-1 projection matrix: sign(j, i) = parity of the
    first hex digit of md5("j|i").  Computed here with hashlib; the
    DuckDB oracle RE-DERIVES every sign with SQL md5(), so the value-hash
    cross-checks the generation recipe itself."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{j}|{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(64)
        ]
        for j in range(RP_K)
    ]


def _rp_oracle() -> str:
    comps = ",\n           ".join(
        f"""round(list_sum(list_transform(generate_series(1, 64),
               i -> emb[i] * (CASE WHEN ('0x' || substr(md5({j} || '|' ||
                    CAST(i - 1 AS VARCHAR)), 1, 1))::INT % 2 = 0
                    THEN 1 ELSE -1 END))) / 4.0, 4) AS y{j}"""
        for j in range(2)
    )
    ys = " , ".join(
        f"""list_sum(list_transform(generate_series(1, 64),
               i -> emb[i] * (CASE WHEN ('0x' || substr(md5({j} || '|' ||
                    CAST(i - 1 AS VARCHAR)), 1, 1))::INT % 2 = 0
                    THEN 1 ELSE -1 END))) / 4.0"""
        for j in range(RP_K)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb
      FROM embeddings WHERE embedding IS NOT NULL
    ), p AS (
      SELECT vec_id, emb, [{ys}] AS y FROM e
    )
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(y, v -> v * v)))
                 / sqrt(list_sum(list_transform(emb, x -> x * x))), 4)
             AS norm_ratio,
           {comps}
    FROM p ORDER BY vec_id
    """


@query("q_embed_random_projection", oracle=_rp_oracle())
def q_embed_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 -> {RP_K} dims with a
    deterministic +-1 matrix (md5-parity signs, scale 1/sqrt(k)) — the
    cheap-index / sketch-level dimensionality reduction (4x fewer floats
    than PQ's trained codebooks, zero training), reported per vector as
    the norm-preservation ratio (JL: concentrates near 1) plus the first
    two components.  The oracle RE-DERIVES every sign with SQL md5, so
    the value-hash checks the matrix generation recipe, not just the
    arithmetic.

    Scale shape: map-only — the sign matrix is a PLAN CONSTANT (16
    literal 64-arrays; no md5 per row on the Spark side, no broadcast,
    no shuffle) and each component is one sequential zip_with fold, the
    same list order DuckDB's list_sum uses, so the doubles are
    bit-identical before the single 4-dp rounding site."""
    from ..operators.common import widen

    signs = _rp_signs()
    # widen(): the 16 sequential 64-term folds are compute-heavy map work;
    # a few-split parquet input would serialize them onto 1-2 tasks
    # (operators/common.py widen — no-op on any real many-split scan)
    e = (
        widen(t(spark, sf_dir, "embeddings"), "vec_id")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("emb"))
    )
    def comp(j):
        arr = ", ".join(str(v) for v in signs[j])
        return F.expr(
            f"aggregate(zip_with(emb, array({arr}), (x, s) -> x * s), "
            "0D, (acc, v) -> acc + v) / 4.0"
        )

    p = e.select(
        "vec_id",
        "emb",
        F.array(*[comp(j) for j in range(RP_K)]).alias("y"),
    )
    sq = "aggregate({0}, 0D, (acc, v) -> acc + v * v)"
    return (
        p.select(
            "vec_id",
            F.round(
                F.sqrt(F.expr(sq.format("y"))) / F.sqrt(F.expr(sq.format("emb"))),
                4,
            ).alias("norm_ratio"),
            F.round(F.element_at("y", 1), 4).alias("y0"),
            F.round(F.element_at("y", 2), 4).alias("y1"),
        )
        .orderBy("vec_id")
    )
