"""Training-data pipeline utilities beyond the SURVEY §2.C core.

The ops a 100 TB corpus pipeline runs daily: deterministic held-out
splitting, fixed-size chunking with overlap, PII redaction, and corpus
statistics. All map-only or single-aggregate shapes; everything is
hash-deterministic so runs are reproducible across clusters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.common import r4, t
from ..registry import query


@query(
    "q_sample_hash",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ('0','1','2') THEN 'eval' ELSE 'train' END AS split
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3','4','5')
    """,
)
def q_sample_hash(spark, sf_dir):
    """Deterministic hash sampling + train/eval split assignment.

    Content-hash bucketing (not rand()): the same document lands in the same
    split on every run, every cluster, any partitioning — the only sound way
    to hold out eval data at scale."""
    d = t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return (
        d.filter(bucket.isin(*"012345"))
        .select(
            "doc_id",
            "lang",
            F.when(bucket.isin(*"012"), "eval").otherwise("train").alias("split"),
        )
    )


@query(
    "q_doc_chunk",
    oracle="""
    SELECT doc_id,
           CAST(c.i AS INT) AS chunk_idx,
           array_to_string(list_slice(string_split(text, ' '),
                                      c.i * 24 + 1, c.i * 24 + 32), ' ') AS chunk
    FROM documents,
         LATERAL (SELECT unnest(generate_series(
                    0, greatest(CAST(ceil((len(string_split(text, ' ')) - 32)
                                          / 24.0) AS BIGINT), 0))) AS i) c
    WHERE text IS NOT NULL
    """,
)
def q_doc_chunk(spark, sf_dir):
    """Fixed-size token chunking with overlap (window 32 tokens, stride 24 —
    8-token overlap), the standard pre-tokenization shard step. Higher-order
    sequence + one explode; chunk count scales with text length, not corpus
    row count. NULL-text docs chunk to nothing by contract (without the
    filter, Spark would emit one '' chunk per NULL doc and SQL one NULL
    chunk — engine-specific NULL propagation, found by the NULL-injection
    audit)."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(32)) / F.lit(24.0)).cast("long"), F.lit(0)
    )  # last index; chunks = idx 0..n_chunks
    idx = F.sequence(F.lit(0).cast("long"), n_chunks)
    return (
        d.select("doc_id", "text", F.explode(idx).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.split("text", " "), (F.col("chunk_idx") * 24 + 1).cast("int"), 32)
            ).alias("chunk"),
        )
    )


@query(
    "q_text_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
             '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g') AS redacted,
           len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails
    FROM documents
    """,
)
def q_text_redact(spark, sf_dir):
    """PII redaction pass (email + SSN patterns) with per-doc match counts —
    map-only regexp_replace, the canonical pre-training scrub step."""
    d = t(spark, sf_dir, "documents")
    email = r"[a-z0-9.]+@[a-z0-9.]+"
    ssn = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), ssn, "<SSN>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(email), 0)).alias("n_emails"),
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark, sf_dir):
    """Exact percentiles per group (continuous interpolation) — corpus
    length/score distribution reporting. Spark's percentile() is an exact
    sort-based aggregate; for 100 TB dashboards swap to percentile_approx
    (t-digest, single pass, mergeable)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r4(F.expr("percentile(l_extendedprice, 0.5)")).alias("p50"),
        r4(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90"),
        r4(F.expr("percentile(l_extendedprice, 0.99)")).alias("p99"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 4)      AS qty_price_corr,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_discount), 4)                AS disc_stddev,
           round(var_samp(l_tax), 4)                        AS tax_var,
           round(skewness(l_extendedprice), 4)              AS price_skew
    FROM lineitem
    """,
)
def q_agg_stats(spark, sf_dir):
    """Second-moment statistics (corr/covar/stddev/variance/skewness) in one
    partial+final aggregate pass."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        r4(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        r4(F.covar_pop("l_quantity", "l_extendedprice")).alias("qty_price_covar"),
        r4(F.stddev_samp("l_discount")).alias("disc_stddev"),
        r4(F.var_samp("l_tax")).alias("tax_var"),
        r4(F.skewness("l_extendedprice")).alias("price_skew"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderstatus,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 4) AS urgent,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 0), 4)   AS high,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 0), 4) AS medium
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot (long->wide) with an explicit value list — explicit values keep
    the plan one pass (no extra distinct-scan to discover columns)."""
    o = t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .sum("o_totalprice")
    )
    return out.select(
        "o_orderstatus",
        r4(F.coalesce(F.col("1-URGENT"), F.lit(0.0))).alias("urgent"),
        r4(F.coalesce(F.col("2-HIGH"), F.lit(0.0))).alias("high"),
        r4(F.coalesce(F.col("3-MEDIUM"), F.lit(0.0))).alias("medium"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(val, 4) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val
      FROM lineitem WHERE l_orderkey <= 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey <= 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey <= 500
    )
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot (wide->long) via the native melt/unpivot operator."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    out = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    mapping = {"l_extendedprice": "price", "l_discount": "discount", "l_tax": "tax"}
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        m[F.col("metric")].alias("metric"),
        r4("val").alias("val"),
    )


@query(
    "q_pipeline_e2e",
    oracle="""
    WITH filtered AS (
      SELECT doc_id, lang,
             regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g') AS text
      FROM documents
      WHERE n_chars BETWEEN 100 AND 450 AND lang IN ('en', 'fr', 'es')
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, text FROM filtered GROUP BY md5(text), text
    ),
    scored AS (
      SELECT d.doc_id, f.lang, d.text,
             len(string_split(d.text, ' ')) AS n_tokens
      FROM deduped d JOIN filtered f USING (doc_id)
    )
    SELECT doc_id, lang,
           CAST(c.i AS INT) AS chunk_idx,
           array_to_string(list_slice(string_split(text, ' '),
                                      c.i * 24 + 1, c.i * 24 + 32), ' ') AS chunk
    FROM scored,
         LATERAL (SELECT unnest(generate_series(
                    0, greatest(CAST(ceil((n_tokens - 32) / 24.0) AS BIGINT), 0))) AS i) c
    WHERE n_tokens >= 24
    """,
)
def q_pipeline_e2e(spark, sf_dir):
    """End-to-end training-corpus pipeline in ONE composed plan:
    quality filter -> PII redaction -> exact dedup (keep min doc_id) ->
    token accounting -> overlapping chunking. Catalyst fuses the map-side
    stages; the only shuffles are the dedup aggregate and its join back —
    the whole preprocessing pass stays scan-shaped at 100 TB."""
    d = t(spark, sf_dir, "documents")
    filtered = d.filter(
        F.col("n_chars").between(100, 450) & F.col("lang").isin("en", "fr", "es")
    ).select(
        "doc_id",
        "lang",
        F.regexp_replace("text", r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>").alias("text"),
    )
    deduped = filtered.groupBy(F.md5("text").alias("h"), "text").agg(
        F.min("doc_id").alias("doc_id")
    )
    scored = deduped.join(filtered.select("doc_id", "lang"), "doc_id").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    chunked = scored.filter(F.col("n_tokens") >= 24)
    n_chunks = F.greatest(
        F.ceil((F.col("n_tokens") - F.lit(32)) / F.lit(24.0)).cast("long"), F.lit(0)
    )
    return (
        chunked.select(
            "doc_id",
            "lang",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "lang",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ",
                F.slice(F.split("text", " "), (F.col("chunk_idx") * 24 + 1).cast("int"), 32),
            ).alias("chunk"),
        )
    )


@query(
    "q_pack_sequences",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS tok,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS blk
      FROM documents),
    c AS (
      SELECT blk, doc_id, tok,
             sum(tok) OVER (PARTITION BY blk ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM tk)
    SELECT blk, CAST(floor((cum - tok) / 512.0) AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens
    FROM c GROUP BY blk, bin_id ORDER BY blk, bin_id
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing for training-batch assembly: documents are packed
    in deterministic order into 512-token bins (bin = the context-window
    budget), reported as per-bin (n_docs, total_tokens).

    Scale shape: packing is a sequential recurrence, so it CANNOT be a
    global window at 100 TB — documents are first split into 16 md5 blocks
    and packed within blocks (bins never cross executors, the window
    partitions by block). Bin assignment is offset-based
    (floor(preceding_tokens / capacity)) — the streaming-friendly
    approximation of greedy packing: a document may straddle a boundary
    instead of opening a fresh bin, which at training time is handled by
    truncation/continuation, never by a cross-partition dependency."""
    C = 512
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tok"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("blk"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.withColumn("cum", F.sum("tok").over(w))
    return (
        c.withColumn(
            "bin_id", F.floor((F.col("cum") - F.col("tok")) / float(C))
        )
        .groupBy("blk", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("long").alias("total_tokens"),
        )
        .orderBy("blk", "bin_id")
    )


@query(
    "q_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bkt,
             string_split(text, ' ') AS s
      FROM documents),
    grams AS (
      SELECT doc_id, bkt,
             array_to_string(list_slice(s, i.i, i.i + 7), ' ') AS sh
      FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(s) - 7, 1)))
                          AS i) i),
    ev AS (SELECT DISTINCT sh FROM grams WHERE bkt IN ('0','1')),
    tr AS (SELECT DISTINCT doc_id, sh FROM grams WHERE bkt NOT IN ('0','1'))
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM tr JOIN ev USING (sh)
    GROUP BY tr.doc_id ORDER BY tr.doc_id
    """,
)
def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination: training documents sharing any verbatim
    8-gram with the held-out split (the standard benchmark-leakage check
    run before every training-corpus release), with the shared-gram count
    as the contamination score.

    The held-out gram set is |eval|-sized — tiny next to the corpus — so it
    BROADCASTS and the check is one map-side semi-ish join over the train
    grams: no shuffle of the corpus, cost linear in train tokens at any
    scale. Split assignment reuses the deterministic md5 bucketing of
    q_sample_hash (same doc → same split, everywhere, forever)."""
    from .dedup import _shingles

    d = t(spark, sf_dir, "documents")
    # _shingles keeps only (doc_id, sh); the split bucket is recomputed from
    # doc_id afterwards (deterministic, no extra join). dedup="doc" gives the
    # per-document distinct the count needs map-side — a global .distinct()
    # here would shuffle the whole shingled corpus.
    g = _shingles(d, n=8, dedup="doc").withColumn(
        "bkt", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    )
    ev = g.filter(F.col("bkt").isin("0", "1")).select("sh").distinct()
    tr = g.filter(~F.col("bkt").isin("0", "1")).select("doc_id", "sh")
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


@query(
    "q_data_mixture",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
               % 100 AS pct
      FROM documents),
    rates(lang, keep_pct) AS (VALUES
      ('en', 100), ('zh', 80), ('de', 50), ('fr', 50), ('es', 25))
    SELECT b.lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(b.doc_id) AS BIGINT) AS first_doc
    FROM b JOIN rates USING (lang)
    WHERE b.pct < rates.keep_pct
    GROUP BY b.lang ORDER BY b.lang
    """,
)
def q_data_mixture(spark, sf_dir):
    """Domain-weighted mixture sampling: each language keeps a different
    deterministic fraction (en 100%, zh 80%, de/fr 50%, es 25%) — the
    up/down-sampling step that sets a training corpus's domain mix.

    Hash-based (md5 prefix mod 100), NOT rand(): the kept set is identical
    across runs, partitionings and clusters, and composes with the
    q_sample_hash split (different hash positions → independent). The rate
    table is a literal broadcast; the corpus scan is map-only — one filter,
    no shuffle before the final tiny aggregate."""
    rates = spark.createDataFrame(
        [("en", 100), ("zh", 80), ("de", 50), ("fr", 50), ("es", 25)],
        "lang string, keep_pct int",
    )
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    pct = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return (
        d.withColumn("pct", pct)
        .join(F.broadcast(rates), "lang")
        .filter(F.col("pct") < F.col("keep_pct"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


@query(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
          < CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 4 ELSE 2 END
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: per-stratum (language) keep
    rates applied via a content-hash bucket, so the sample is reproducible
    across runs/clusters AND independent of the train/eval split hash
    (different md5 hex position). The rate table joins as a broadcast —
    at 100 TB the corpus never shuffles; this is a map-only filter."""
    rates = spark.createDataFrame(
        [("en", 8), ("de", 4), ("es", 2), ("fr", 2), ("zh", 2)],
        "lang string, keep_16 int",
    )
    d = t(spark, sf_dir, "documents")
    bucket = F.expr(
        "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
    )
    return (
        d.join(F.broadcast(rates), "lang", "left")
        .filter(bucket < F.coalesce("keep_16", F.lit(2)))
        .select("doc_id", "lang")
    )


@query(
    "q_text_chunk_dedup",
    oracle="""
    WITH c AS (
      SELECT doc_id, c.i AS chunk_idx,
             array_to_string(list_slice(toks, c.i * 10 + 1, c.i * 10 + 10), ' ')
                 AS chunk
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL (SELECT unnest(range(0,
                      CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS i) c
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id, chunk
                                   ORDER BY chunk_idx) AS rn
      FROM c
    )
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY chunk_idx) AS dedup_text,
           CAST(count(*) AS BIGINT) AS n_chunks_kept
    FROM r WHERE rn = 1
    GROUP BY doc_id
    """,
)
def q_text_chunk_dedup(spark, sf_dir):
    """Intra-document dedup: split each doc into 10-token chunks, drop
    repeated chunks WITHIN the doc (keep first occurrence), reassemble in
    order — the paragraph-dedup step for boilerplate-heavy corpora.

    Shape at scale: explode is per-doc (chunk count ~ text length), the
    only shuffle is the (doc_id, chunk) window + the doc_id re-aggregate;
    both partition by doc_id, so AQE coalesces them over one exchange."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    n_chunks = F.ceil(F.size("toks") / F.lit(10.0)).cast("long")
    chunks = (
        d.select(
            "doc_id", "toks",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id", "chunk_idx",
            F.concat_ws(
                " ",
                F.slice("toks", (F.col("chunk_idx") * 10 + 1).cast("int"), 10),
            ).alias("chunk"),
        )
    )
    w = Window.partitionBy("doc_id", "chunk").orderBy("chunk_idx")
    kept = chunks.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s.chunk,
            ),
            " ",
        ).alias("dedup_text"),
        F.count("*").alias("n_chunks_kept"),
    )


@query(
    "q_agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
           TRUE AS approx_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile(spark, sf_dir):
    """Approximate percentile (the single-pass mergeable sketch behind
    100 TB dashboards, vs q_agg_percentile's exact sort-based aggregate).
    Self-asserting oracle pattern: the sketch estimate cannot be reproduced
    in DuckDB, so the query emits the EXACT value as checkable ground truth
    plus a boolean asserting its own approximation lands within 2% — the
    oracle emits the exact value and literal TRUE."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
    )
    return agg.select(
        "l_returnflag",
        r4(F.col("exact")).alias("exact_p50"),
        (F.abs(F.col("approx") - F.col("exact")) <= 0.02 * F.abs("exact")).alias(
            "approx_within_2pct"
        ),
    )


@query(
    "q_sample_importance",
    oracle="""
    SELECT doc_id, lang,
           round(least(1.0, n_chars / 1500.0), 4) AS weight
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
          / 16777216.0 < least(1.0, n_chars / 1500.0)
    """,
)
def q_sample_importance(spark, sf_dir):
    """Importance sampling with a continuous per-document weight: accept a
    doc with probability proportional to its quality proxy (here length,
    capped at 1.0) — the quality-weighted downsampling step modern corpus
    pipelines run between filtering and mixing.

    The acceptance draw is hash-uniform (md5 prefix / 16^6), NOT rand():
    the kept set is reproducible across runs/clusters and independent of
    the q_sample_hash split and q_data_mixture draws (different hash
    positions). Map-only — one filter over the scan, no shuffle; both the
    weight and the draw are computed from the SAME integer inputs in every
    engine, so the boundary comparison is bit-deterministic."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = F.least(F.lit(1.0), F.col("n_chars") / 1500.0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        / 16777216.0
    )
    return d.filter(u < w).select("doc_id", "lang", F.round(w, 4).alias("weight"))


@query(
    "q_sample_balanced",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang FROM documents WHERE text IS NOT NULL
    ), nmin AS (
      SELECT min(c) AS n FROM (SELECT count(*) AS c FROM d GROUP BY lang)
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM d
    )
    SELECT r.doc_id, r.lang FROM ranked r, nmin WHERE r.rk <= nmin.n
    """,
)
def q_sample_balanced(spark, sf_dir):
    """Class-balanced downsample: every language keeps exactly n_min docs
    (n_min = the smallest class's size), selected by md5 priority — the
    rebalancing step before training a classifier (language-ID, quality)
    on skewed corpus labels, deterministic across runs and partitionings.

    Scale shape: class counts are a |classes|-row aggregate; n_min is a
    1-ROW broadcast (scalar-distribution BNLJ, see q_agg_histogram); the
    per-class row_number sorts WITHIN class partitions only. At 100 TB
    with huge classes the same hash column supports a sort-free variant —
    keep rows whose hash falls below the class's n_min/|class| quantile —
    because the md5 priority is uniform; row_number is kept here for
    exact-count semantics the oracle can pin."""
    from pyspark.sql import Window

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang")
    )
    nmin = (
        d.groupBy("lang")
        .agg(F.count("*").alias("c"))
        .agg(F.min("c").alias("n"))
    )
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(nmin))
        .filter(F.col("rk") <= F.col("n"))
        .select("doc_id", "lang")
    )


@query(
    "q_text_ngram_coverage",
    oracle="""
    WITH toks AS (
      SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bkt,
             string_split(coalesce(text, ''), ' ') AS s
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, bkt,
             array_to_string(list_slice(s, i.i, i.i + 7), ' ') AS sh
      FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(s) - 7, 1)))
                          AS i) i),
    ev AS (SELECT doc_id, sh FROM grams WHERE bkt IN ('0','1')),
    tr AS (SELECT DISTINCT sh FROM grams WHERE bkt NOT IN ('0','1')),
    hit AS (
      SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS covered
      FROM ev JOIN tr USING (sh) GROUP BY ev.doc_id),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      FROM ev GROUP BY doc_id)
    SELECT tot.doc_id, tot.n_grams,
           CAST(coalesce(hit.covered, 0) AS BIGINT) AS covered,
           round(coalesce(hit.covered, 0) * 1.0 / tot.n_grams, 4) AS coverage
    FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
    ORDER BY tot.doc_id
    """,
)
def q_text_ngram_coverage(spark, sf_dir):
    """Eval-set n-gram SUPPORT: for every held-out document, the fraction
    of its verbatim 8-grams that appear anywhere in the training split —
    q_decontaminate's measurement INVERTED (that op flags train docs to
    drop; this one scores how much of each eval doc the training corpus
    already spells out, the memorization-risk / benchmark-difficulty
    number reported next to every eval score).  Same gram unit, same
    deterministic md5 split as q_sample_hash/q_decontaminate.

    Scale shape: the held-out per-doc gram table is |eval|-sized and
    BROADCASTS; train grams stream past it in one map-side join — the
    corpus never shuffles (the q_decontaminate plan with the join
    direction inverted). Matched (doc, gram) pairs collapse via a
    map-side-combined aggregate (bounded by eval grams × their train
    presence, i.e. by the contamination level itself), and the final
    per-doc frame is |eval| rows."""
    from .dedup import _shingles

    # coalesce(text,'') so a NULL-text doc still contributes its one empty
    # gram on BOTH engines (explode of a NULL shingle array would silently
    # drop the doc Spark-side while the oracle's greatest(len-7,1) path
    # keeps it) — same defensive convention as q_split_assign.
    d = t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    g = _shingles(d, n=8, dedup="doc").withColumn(
        "bkt", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    )
    ev = g.filter(F.col("bkt").isin("0", "1")).select("doc_id", "sh")
    tr = g.filter(~F.col("bkt").isin("0", "1")).select("sh")
    hit = (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("doc_id", "sh")
        .agg(F.lit(1).alias("one"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("covered"))
    )
    tot = ev.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    return (
        tot.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("covered", F.lit(0)).cast("bigint").alias("covered"),
            F.round(
                F.coalesce("covered", F.lit(0)) * 1.0 / F.col("n_grams"), 4
            ).alias("coverage"),
        )
        .orderBy("doc_id")
    )


HASH_DIM = 256  # hashing-trick feature dimension (2^8 buckets)


@query(
    "q_text_hashing_features",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 11))::BIGINT % {HASH_DIM} AS idx,
             count(*) AS c
      FROM tok GROUP BY doc_id, idx
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS nnz,
           CAST(min(CASE WHEN rk = 1 THEN idx END) AS BIGINT) AS top_idx,
           CAST(min(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS top_count,
           round(sqrt(sum(c * c)), 4) AS l2norm
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY c DESC, idx) AS rk
          FROM feat)
    GROUP BY doc_id ORDER BY doc_id LIMIT 50
    """,
)
def q_text_hashing_features(spark, sf_dir):
    """HASHING-TRICK featurization (feature hashing / "the hashing
    vectorizer"): each token maps to one of {HASH_DIM} buckets via the
    portable md5 hash, giving every document a FIXED-dimension sparse
    count vector with no vocabulary pass at all — the featurization that
    scales to unbounded vocabularies (new tokens never resize anything)
    and the standard front-end of large-scale linear/quality models.
    Reported per doc (first 50 by id): token mass, nnz, the argmax
    bucket (count DESC, idx tiebreak) and the exact L2 norm.

    Determinism: bucket ids come from the engine-portable md5 44-bit
    prefix mod {HASH_DIM}; counts are integers; the one float (L2) is
    sqrt of an exact integer, 4dp.

    Scale shape: explode + ONE map-combined (doc, bucket) count — the
    shuffle carries at most {HASH_DIM} rows per doc whatever the
    vocabulary; the per-doc rollup re-aggregates on doc_id.  No
    vocabulary broadcast, no dictionary state: the property that makes
    feature hashing THE 100 TB featurizer.

    Reference scope: no featurization surface in the reference (Go
    metadata facade, api/router/router.go:9-55); vocabulary-free sibling
    of q_text_tfidf (exact vocab) and q_tokenizer_apply (fixed vocab)."""
    from pyspark.sql import Window as W

    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    feat = (
        tok.withColumn(
            "idx",
            F.conv(F.substring(F.md5("w"), 1, 11), 16, 10).cast("long")
            % HASH_DIM,
        )
        .groupBy("doc_id", "idx")
        .agg(F.count("*").alias("c"))
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("c"), "idx")
    )
    return (
        feat.withColumn("rk", rk)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("nnz"),
            F.min(F.when(F.col("rk") == 1, F.col("idx")))
            .cast("long")
            .alias("top_idx"),
            F.min(F.when(F.col("rk") == 1, F.col("c")))
            .cast("long")
            .alias("top_count"),
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias("l2norm"),
        )
        .orderBy("doc_id")
        .limit(50)
    )
