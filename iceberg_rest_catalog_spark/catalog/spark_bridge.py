"""Spark-session integration for the catalog.

A full Spark CatalogPlugin (``spark.sql.catalog.<name>``) is a JVM
interface and cannot be implemented from Python; this bridge provides the
practical equivalent: every cataloged table is registered on the session as
a (global) temp view named ``<ns>__<table>`` (levels joined by ``__`` —
dots are illegal in view names), after which the full Spark SQL surface
(joins, windows, CTEs, SHOW TABLES on the view catalog) works against
catalog-managed, snapshot-isolated data.

Views are bound to the metadata AT REGISTRATION TIME (an explicit-schema
file-list read), so a reader keeps its snapshot until re-registration —
the same isolation an Iceberg engine gives a running query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog, Ident


def view_name(ident: Ident) -> str:
    return "__".join(ident)


def register_table(
    spark: SparkSession,
    catalog: Catalog,
    ident: Ident,
    snapshot_id: int | None = None,
    global_view: bool = False,
) -> str:
    """Register one table as a temp view; returns the view name."""
    df = catalog.load_table(ident).df(spark, snapshot_id=snapshot_id)
    name = view_name(tuple(ident))
    if global_view:
        df.createOrReplaceGlobalTempView(name)
    else:
        df.createOrReplaceTempView(name)
    return name


def register_all(
    spark: SparkSession, catalog: Catalog, namespace: Ident | None = None
) -> list[str]:
    """Register every table (of one namespace, or the whole catalog)."""
    spaces = [tuple(namespace)] if namespace else catalog.list_namespaces()
    out = []
    for ns in spaces:
        for ident in catalog.list_tables(ns):
            out.append(register_table(spark, catalog, ident))
        for child in catalog.list_namespaces(ns):
            for ident in catalog.list_tables(child):
                out.append(register_table(spark, catalog, ident))
    return out


def register_metadata_views(
    spark: SparkSession, catalog: Catalog, ident: Ident
) -> list[str]:
    """Expose a table's metadata tables to Spark SQL, mirroring Iceberg's
    ``db.table.snapshots`` family: views named
    ``<ns>__<table>__{snapshots,history,files,partitions}``."""
    t = catalog.load_table(ident)
    base = view_name(tuple(ident))
    out = []
    for suffix, df in (
        ("snapshots", t.snapshots_df(spark)),
        ("history", t.history_df(spark)),
        ("files", t.files_df(spark)),
        ("partitions", t.partitions_df(spark)),
    ):
        name = f"{base}__{suffix}"
        df.createOrReplaceTempView(name)
        out.append(name)
    return out


def sql(spark: SparkSession, catalog: Catalog, query: str) -> DataFrame:
    """Convenience: sync all views, then run a Spark SQL query against them."""
    register_all(spark, catalog)
    return spark.sql(query)
