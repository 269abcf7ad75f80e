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
