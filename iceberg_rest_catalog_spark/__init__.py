"""iceberg_rest_catalog_spark — a PySpark-native analytics engine with the
capability surface of xixipi-lining/iceberg-rest-catalog.

The reference (/root/reference, read-only) is a Go implementation of the
Apache Iceberg REST Catalog API v1: a metadata plane (namespaces, table
schemas, partition specs, sort orders, optimistic snapshot commits) that
exists to serve query engines. This package re-expresses that surface
Spark-first:

- ``catalog/``   — the reference's executed surface [REF]: namespace/table
  CRUD, schema evolution, optimistic commits, Iceberg-style versioned
  metadata JSON — mapped onto atomic filesystem CAS + Spark reads.
- ``operators/`` — the relational query surface the catalog exists to serve
  [CAP]: scans, joins, aggregations, windows, set ops, subqueries, scalar
  functions, TPC-H composites — all stock DataFrame/Catalyst plans.
- ``streaming/`` — Structured Streaming over append tables (tumbling /
  sliding / session windows, watermarks, streaming dedup, stateful aggs).
- ``llm/``       — 100 TB-scale LLM-data-pipeline extensions [EXT]:
  exact/fuzzy dedup, similarity search, text analysis, multimodal columns.

See SURVEY.md for the full blueprint and reference file:line citations.
"""

__version__ = "0.1.0"
