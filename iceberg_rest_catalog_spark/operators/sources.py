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
