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

from ..operators.common import t
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

_PQ_ORACLE = f"""
WITH e AS (
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
)
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
    from pyspark.sql import Window

    from .similarity import _dbl, _emb

    e = _emb(spark, sf_dir).select("vec_id", "label", _dbl("embedding").alias("x"))
    subs = F.array(*[F.slice("x", s * SUB_DIM + 1, SUB_DIM) for s in range(N_SUB)])
    sub = e.select("vec_id", "label", F.posexplode(subs).alias("s", "sub"))
    cb = (
        e.filter(F.col("vec_id") < K_CODES)
        .select(F.col("vec_id").alias("code"), F.posexplode(subs).alias("s", "csub"))
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with("sub", "csub", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        4,
    )
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    assigned = (
        sub.join(F.broadcast(cb), "s")
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return assigned.groupBy("vec_id", "label").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("code")))
            .cast("long")
            .alias(f"c{s}")
            for s in range(N_SUB)
        ]
    )
