"""Corpus curation: shard layout, mixture weighting, tokenizer statistics.

Three ops that sit between a cleaned corpus and a training run:

- q_shard_assign: the webdataset/shard-creation step — a deterministic
  pseudo-random permutation (md5 order) bucketed into fixed shards, with
  per-shard size accounting. Hash-modulo assignment is the only shard
  strategy that needs NO global coordination: every writer computes its
  rows' shards locally, shards are balanced in expectation, and the same
  doc lands in the same shard on every run and any partitioning (unlike
  row_number-based striping, which needs a global sort and re-deals every
  doc whenever the corpus changes).
- q_data_mixture_temperature: temperature-scaled source weights
  (w_s ∝ share_s^α, α = 0.7) — the standard flattening used to upsample
  small domains when composing a training mixture. Reduces the corpus to
  one |sources|-row aggregate; everything after is arithmetic on that
  broadcastable table.
- q_text_bpe_pairs: the counting kernel of BPE/WordPiece vocabulary
  training — global adjacent-token-pair frequencies. One explode of
  per-doc pair lists into a count aggregate: the map side emits partial
  counts, so the shuffle carries |distinct pairs|, not |token positions|;
  top-k returns via TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.common import r4, t
from ..registry import query

N_SHARDS = 16
ALPHA = 0.7  # mixture temperature (DoReMi/unimax-style flattening)
TOP_PAIRS = 20


@query(
    "q_shard_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS toks,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                  % {N_SHARDS} AS INT) AS shard
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           min(doc_id) AS first_doc
    FROM assigned GROUP BY shard
    """,
)
def q_shard_assign(spark, sf_dir):
    """Deterministic training-shard assignment: shard = md5(doc_id)
    prefix mod N — a coordination-free pseudo-random deal — plus the
    per-shard doc/token/char accounting a shard writer emits. The 16-bit
    hex prefix (0..65535) is well past the modulus, so shards are uniform;
    the aggregate is one map-side-combined groupBy on a 16-value key."""
    d = t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % N_SHARDS
    ).cast("int")
    return (
        d.select(
            shard.alias("shard"),
            F.size(F.split("text", " ")).alias("toks"),
            "n_chars",
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("tokens"),
            F.sum("n_chars").alias("chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@query(
    "q_data_mixture_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_docs) AS total, sum(pow(n_docs * 1.0 / (SELECT sum(n_docs) FROM s),
                                           {ALPHA})) AS z
      FROM s
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 1.0 / total, 4) AS share,
           round(pow(n_docs * 1.0 / total, {ALPHA}) / z, 4) AS weight,
           round(pow(n_docs * 1.0 / total, {ALPHA}) / z / (n_docs * 1.0 / total),
                 4) AS upsample
    FROM s, tot
    """,
)
def q_data_mixture_temperature(spark, sf_dir):
    """Temperature-scaled mixture weights: each source's training weight is
    share^0.7 renormalized — flattens the natural distribution so small
    domains are upsampled (upsample = weight/share > 1 for small sources).

    The corpus collapses to a |sources|-row aggregate first; the
    normalizer is a 1-row aggregate of THAT table broadcast back, so no
    data-sized shuffle follows the first count."""
    s = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    # whole-frame window over the |sources|-row AGGREGATE, never the corpus
    share = F.col("n_docs") * 1.0 / F.sum("n_docs").over(Window.partitionBy())
    s = s.withColumn("share", share)
    z = s.agg(F.sum(F.pow("share", F.lit(ALPHA))).alias("z"))
    weight = F.pow("share", F.lit(ALPHA)) / F.col("z")
    return s.join(F.broadcast(z)).select(
        "source",
        "n_docs",
        r4("share").alias("share"),
        r4(weight).alias("weight"),
        r4(weight / F.col("share")).alias("upsample"),
    )


@query(
    "q_text_bpe_pairs",
    oracle=f"""
    WITH pairs AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS pair
      FROM (SELECT string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair
    LIMIT {TOP_PAIRS}
    """,
)
def q_text_bpe_pairs(spark, sf_dir):
    """Global adjacent-token-pair frequencies, top {TOP_PAIRS} — the
    counting step a BPE/WordPiece trainer iterates. Pair lists are built
    per-doc with a higher-order transform (JVM-side, no Python), partial
    counts combine map-side, and the top-k is TakeOrderedAndProject with
    the pair string as the deterministic tiebreak."""
    d = (
        t(spark, sf_dir, "documents")
        .select(F.split("text", " ").alias("t"))
        # guard: Spark's sequence(1, 0) DESCENDS instead of returning empty
        .filter(F.size("t") >= 2)
    )
    pairs = d.select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "pair")
        .limit(TOP_PAIRS)
    )
