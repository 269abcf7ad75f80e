"""Multimodal column plumbing (SURVEY §2.C q_multimodal_cols).

Images/audio/video ride as opaque ``binary`` payload columns with a typed
metadata struct next to them. This module exercises the full Spark-side
pipeline a real multimodal corpus needs:

1. construct binary payloads + typed metadata,
2. round-trip them through a partitioned parquet write/read (binary, struct
   and array columns must survive the sink),
3. run a "decode / feature-extract" stage as an Arrow-batched
   ``mapInPandas`` — the exact batch shape (iterator of pandas DataFrames)
   a real image decoder would use.

The decode step is a DETERMINISTIC FAKE (byte length, first byte, evenly
sampled frame offsets): the real image/audio libraries are not in this
container. Swap ``_fake_decode_batch`` for a real decoder without touching
any Spark plumbing — schema, partitioning and batch iteration stay as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from ..operators.common import scratch_dir, t
from ..registry import query

_MIMES = ("image/png", "audio/wav", "video/mp4")

_DECODE_SCHEMA = (
    "doc_id long, mime string, n_bytes int, first_byte int, frame_offsets string"
)


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode/resize/frame-sample.

    A real decoder would open payload bytes with PIL/ffmpeg here; the Arrow
    batch shape (columnar pandas in, columnar pandas out) is identical.
    Empty payloads decode to first_byte = -1 (the oracle mirrors the
    sentinel); first_byte is the first PAYLOAD byte — the oracle computes
    it from hex(encode(text)), so multi-byte UTF-8 first characters agree
    byte-for-byte with the decoder.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": n_bytes,
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "frame_offsets": n_bytes.map(
                    lambda n: ",".join(str(i * (n // 4)) for i in range(4))
                ),
            }
        )


@query(
    "q_multimodal_cols",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'video/mp4' END          AS mime,
           octet_length(encode(text))                    AS n_bytes,
           CASE WHEN text = '' THEN -1
                ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
           END                                           AS first_byte,
           array_to_string(list_transform(generate_series(0, 3),
                           i -> i * (octet_length(encode(text)) // 4)), ',')
                                                         AS frame_offsets
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def q_multimodal_cols(spark, sf_dir):
    """Binary payload + typed metadata: parquet round-trip, then an
    Arrow-batched mapInPandas decode stage. Map-only end to end — at 100 TB
    the decode parallelism equals the input partition count; no shuffle.
    NULL payloads (missing objects) are filtered before the decode stage —
    a real decoder would crash on them exactly like the fake one does."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    mm = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.element_at(F.array(*[F.lit(m) for m in _MIMES]), (F.col("doc_id") % 3 + 1).cast("int"))
            .alias("mime"),
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
        F.array(F.col("n_chars"), F.col("doc_id")).alias("dims"),
    )
    # Round-trip: binary + struct + array columns must survive the sink.
    path = scratch_dir(sf_dir, "multimodal")
    mm.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).select(
        "doc_id", "payload", F.col("meta.mime").alias("mime")
    )
    return back.mapInPandas(_fake_decode_batch, schema=_DECODE_SCHEMA)


# `feature` is serialized as a comma-joined 4-decimal string rather than
# array<double>: downstream value-hash harnesses canonicalize rows with
# pandas sort_values, which cannot factorize list cells. The numeric
# vector is recovered with split(feature, ',') when needed.
_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, feature string"
)


def _fake_resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for resize + feature extraction. A real
    implementation decodes the payload, resizes to fit 224 on the long
    side, and runs an encoder; here the geometry is integer-exact (so the
    oracle reproduces it) and the 8-dim "embedding" is a fixed function of
    the first payload byte. Arrow batch shape identical to production."""
    for pdf in batches:
        w, h = pdf["width"], pdf["height"]
        long_side = w.combine(h, max)
        scale_needed = long_side > 224
        out_w = (w * 224 // long_side).where(scale_needed, w)
        out_h = (h * 224 // long_side).where(scale_needed, h)
        fb = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w,
                "height": h,
                "out_w": out_w,
                "out_h": out_h,
                "feature": fb.map(
                    lambda x: ",".join(
                        f"{((x * 31 + i) % 97) / 97.0:.4f}" for i in range(8)
                    )
                ),
            }
        )


@query(
    "q_multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(100 + doc_id % 1200 AS INT)       AS width,
           CAST(100 + (doc_id * 7) % 900 AS INT)  AS height,
           CAST(CASE WHEN greatest(100 + doc_id % 1200, 100 + (doc_id * 7) % 900) > 224
                THEN (100 + doc_id % 1200) * 224 // greatest(100 + doc_id % 1200, 100 + (doc_id * 7) % 900)
                ELSE 100 + doc_id % 1200 END AS INT) AS out_w,
           CAST(CASE WHEN greatest(100 + doc_id % 1200, 100 + (doc_id * 7) % 900) > 224
                THEN (100 + (doc_id * 7) % 900) * 224 // greatest(100 + doc_id % 1200, 100 + (doc_id * 7) % 900)
                ELSE 100 + (doc_id * 7) % 900 END AS INT) AS out_h,
           array_to_string(
               list_transform(range(0, 8),
                              i -> printf('%.4f',
                                   (((CASE WHEN text = '' THEN 0
                                      ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
                                      END) * 31 + i) % 97) / 97.0)),
               ',') AS feature
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def q_multimodal_resize(spark, sf_dir):
    """Resize + feature-extract stage over multimodal payloads: typed
    (width, height) metadata rides next to the binary column, an
    Arrow-batched mapInPandas computes fit-to-224 output geometry
    (integer-exact, so the oracle reproduces it) and a deterministic fake
    8-dim feature vector — swap `_fake_resize_batch` for a PIL/encoder
    implementation without touching the Spark plumbing.

    Scale: mapInPandas streams Arrow batches; geometry/feature output is
    O(docs), payload bytes never shuffle (the stage is map-only). NULL
    payloads are filtered before decode, like q_multimodal_cols."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        (F.lit(100) + F.col("doc_id") % 1200).cast("int").alias("width"),
        (F.lit(100) + (F.col("doc_id") * 7) % 900).cast("int").alias("height"),
    )
    return d.mapInPandas(_fake_resize_batch, _RESIZE_SCHEMA)
