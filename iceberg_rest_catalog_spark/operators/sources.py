"""Multi-format sources/sinks (SURVEY §2.B scans family, format axis).

The reference's data model is format-pluggable (iceberg FileIO: parquet /
ORC / Avro — reference go.mod:44,99); the engine mirrors that with Spark's
native readers. Each op round-trips a fixture table through the format with
an EXPLICIT schema on read-back (cataloged tables never infer — SURVEY
§1.2) and is verified value-exact against the original table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import scratch_dir, t


@query("q_source_csv", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def q_source_csv(spark, sf_dir):
    """CSV sink + source round trip (explicit schema, header on)."""
    out = scratch_dir("src_csv", sf_dir)
    base = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    base.write.mode("overwrite").option("header", True).csv(out)
    return (
        spark.read.schema("n_nationkey long, n_name string, n_regionkey long")
        .option("header", True)
        .csv(out)
    )


@query(
    "q_source_json",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 4) AS s_acctbal
    FROM supplier
    """,
)
def q_source_json(spark, sf_dir):
    """JSON-lines sink + source round trip (explicit schema)."""
    out = scratch_dir("src_json", sf_dir)
    base = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 4).alias("s_acctbal")
    )
    base.write.mode("overwrite").json(out)
    return spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
    ).json(out)


@query("q_source_orc", oracle="SELECT r_regionkey, r_name FROM region")
def q_source_orc(spark, sf_dir):
    """ORC sink + source round trip (columnar alternative to parquet)."""
    out = scratch_dir("src_orc", sf_dir)
    base = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    base.write.mode("overwrite").orc(out)
    return spark.read.schema("r_regionkey long, r_name string").orc(out)


@query(
    "q_source_binaryfile",
    oracle="""
    SELECT 'doc_' || doc_id || '.bin' AS fname,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < 20 AND text IS NOT NULL
      AND strlen(text) > 0
    """,
)
def q_source_binaryfile(spark, sf_dir):
    """``binaryFile`` source — the ingestion format for multimodal
    payloads (images/audio/model checkpoints): each file becomes one row
    of (path, modificationTime, length, content BINARY), feeding the
    mapInPandas decode stage (llm/multimodal.py) without any parsing.

    The round trip writes one file per small doc (bytes = the utf-8
    text), reads the directory back through binaryFile, and proves
    length+md5 of every payload — which the oracle recomputes from the
    source strings (md5 of a string hashes its utf-8 bytes on both
    engines).

    Scale notes: binaryFile parallelizes per-file (one row each, files
    never split), so millions of small payloads need the usual
    small-file hygiene (tar/shard containers — q_shard_assign's layout —
    or compaction); spark.sql.files.maxPartitionBytes groups small files
    per task."""
    import os as _os
    import shutil as _shutil

    docs = [
        (r.doc_id, r.text)
        for r in t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 20)
            & F.col("text").isNotNull()
            # a 0-byte payload is not a meaningful binary, and the
            # binaryFile source skips empty files entirely (found by the
            # perturbed audit's emptied-doc injection) — exclude on BOTH
            # engines
            & (F.octet_length("text") > 0)
        )
        # driver-side ONLY to build the ≤20-file test fixture; the
        # production ingest path is binaryFile over an EXISTING object
        # store prefix — payloads never materialize on the driver
        .collect()
    ]
    out = scratch_dir("source_binary", sf_dir)
    # self-clean: a doc excluded since the last run must not linger as a
    # stray payload file
    _shutil.rmtree(out, ignore_errors=True)
    _os.makedirs(out, exist_ok=True)
    for doc_id, text in docs:
        with open(_os.path.join(out, f"doc_{doc_id}.bin"), "wb") as f:
            f.write(text.encode("utf-8"))
    raw = spark.read.format("binaryFile").load(out)
    return raw.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@query(
    "q_source_text",
    oracle="""
    SELECT n_nationkey, n_name, CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation
    """,
)
def q_source_text(spark, sf_dir):
    """Line-oriented TEXT source: write the nation table as delimited
    lines, read it back with ``spark.read.text`` (one `value` column per
    line — the raw-log-ingest shape) and parse with an EXPLICIT split +
    casts (cataloged tables never infer, SURVEY §1.2).  The format every
    log/landing-zone pipeline starts from; the parse stage is exactly
    where a real ingest attaches its schema contract.

    Scale shape: text read is splittable by line ranges; the parse is
    map-only codegen (split + element_at + cast) — no shuffle at all.

    Delimiter safety: the write stage uses '\\x1f' (ASCII unit
    separator) — guaranteed absent from any printable column, unlike
    '|' which merely HAPPENS to be absent from TPC-H n_name (ADVICE
    r12).

    Reference scope: FileIO format plurality (reference go.mod:44,99);
    the text axis next to csv/json/orc/binaryfile."""
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = scratch_dir("source_text", sf_dir)
    (
        n.select(
            F.concat_ws(
                "\x1f", "n_nationkey", "n_name", "n_regionkey"
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(out)
    )
    raw = spark.read.text(out)
    p = F.split("value", "\x1f")
    return raw.select(
        F.element_at(p, 1).cast("long").alias("n_nationkey"),
        F.element_at(p, 2).alias("n_name"),
        F.element_at(p, 3).cast("int").alias("n_regionkey"),
    )


@query(
    "q_source_schema_merge",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_source_schema_merge(spark, sf_dir):
    """SCHEMA-MERGED parquet read: two file generations under one
    dataset — an old writer emitting (o_orderkey, o_totalprice) and an
    evolved writer that ADDED o_orderstatus — read back in one scan with
    ``mergeSchema=true``: Spark reconciles the file footers by NAME and
    nulls the missing column for old files.  This is the schema-on-read
    half of schema evolution (the catalog-tracked half is
    q_schema_evolution_read); every long-lived landing zone accumulates
    exactly this layout.

    Scale note: mergeSchema footer reconciliation reads every file's
    footer at planning time — acceptable for a bounded generation count,
    which is why production promotes the merged schema into the catalog
    (the q_schema_evolution_read path) once evolution settles.

    Reference scope: the reference reads parquet client-side with a
    static schema (tables.go:94-148); merge-on-read is the Spark-native
    upgrade."""
    import os as _os

    o = t(spark, sf_dir, "orders")
    root = scratch_dir("schema_merge", sf_dir)
    pa, pb = _os.path.join(root, "gen_a"), _os.path.join(root, "gen_b")
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(pa)
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(pb)
    )
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(pa, pb)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
