"""Streaming SOURCE over a cataloged table: incremental snapshot reads.

The dual of ``q_stream_catalog_sink`` (micro-batch append = snapshot
commit): here each APPEND snapshot becomes one micro-batch of exactly the
rows that snapshot added — Iceberg's incremental append scan, the shape
Spark's own Iceberg source exposes via ``stream-from-timestamp``.

Offsets are snapshot ids, checkpointed to a JSON file with the same
write-temp-then-atomic-rename discipline the catalog uses for metadata, so
a crashed consumer resumes from the last committed snapshot. The offset is
committed AFTER the sink callback returns: at-least-once delivery, upgraded
to exactly-once when the sink is idempotent per snapshot id (e.g. the
catalog sink keyed on snapshot id, or a MERGE) — the same contract
Structured Streaming's foreachBatch gives with its epoch id.

At 100 TB the incremental scan is the point: a consumer processes only the
files each new snapshot ADDED (O(new data)), never rescans the table.
Non-append snapshots are surfaced explicitly: ``replace`` (compaction)
rewrites history it already delivered, so it is skipped with its id
recorded; ``overwrite``/``delete`` (row-level DML) change already-delivered
rows and either skip (default, append-only consumers) or raise under
``fail_on_changes=True`` (consumers that must not miss retractions).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..catalog import errors as E


class CatalogStreamReader:
    """Incremental micro-batch reader for one cataloged table."""

    def __init__(self, catalog, identifier, checkpoint_dir: str,
                 fail_on_changes: bool = False):
        self.catalog = catalog
        self.identifier = tuple(identifier)
        self.checkpoint_dir = checkpoint_dir
        self.fail_on_changes = fail_on_changes
        os.makedirs(checkpoint_dir, exist_ok=True)

    # -- offset log ---------------------------------------------------------
    @property
    def _offset_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "offset.json")

    def last_committed(self) -> int:
        """Highest snapshot id already delivered (0 = nothing yet)."""
        try:
            with open(self._offset_path) as f:
                return json.load(f)["snapshot-id"]
        except (OSError, ValueError, KeyError):
            return 0

    def _commit_offset(self, snapshot_id: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.checkpoint_dir)
        with os.fdopen(fd, "w") as f:
            json.dump({"snapshot-id": snapshot_id}, f)
        os.replace(tmp, self._offset_path)  # atomic on POSIX

    # -- incremental plan ---------------------------------------------------
    def pending_snapshots(self) -> list[dict]:
        """Snapshots on the current lineage with id > the committed offset,
        oldest first. Lineage-based (not id-sorted): WAP branch snapshots
        never leak into the stream until fast-forwarded."""
        tbl = self.catalog.load_table(self.identifier)
        cur = tbl.metadata.get("current-snapshot-id")
        if cur is None:
            return []
        off = self.last_committed()
        return [s for s in tbl._ancestors(cur) if s["snapshot-id"] > off]

    def _batch_df(self, spark: SparkSession, tbl, snap: dict) -> DataFrame | None:
        entries = tbl._manifest_entries(snap)
        if not entries:
            return None
        files = [os.path.join(tbl.location, e["path"]) for e in entries]
        # read each batch under its write-time schema, projected to current
        # (same field-id contract as the batch scan)
        gid = entries[0].get("schema-id")
        cur_sid = tbl.metadata["current-schema-id"]
        if gid is not None and gid != cur_sid:
            ws = tbl._schema_by_id(gid)
            df = spark.read.schema(ws.to_spark()).parquet(*files)
            return tbl._project_to_current(df, ws)
        return spark.read.schema(tbl.schema().to_spark()).parquet(*files)

    # -- drain --------------------------------------------------------------
    def run_available_now(self, spark: SparkSession, sink) -> list[int]:
        """Process every pending snapshot (availableNow semantics): call
        ``sink(batch_df, snapshot_id)`` per APPEND snapshot in commit order,
        committing the offset after each sink return. Returns the processed
        snapshot ids. Skipped non-append snapshots also advance the offset
        (their changes are visible only through a fresh batch scan)."""
        done: list[int] = []
        for snap in self.pending_snapshots():
            sid = snap["snapshot-id"]
            op = snap.get("operation", "append")
            if op != "append":
                if self.fail_on_changes and op in ("overwrite", "delete"):
                    raise E.BadRequestException(
                        f"snapshot {sid} is {op!r}: row-level changes cannot "
                        "be streamed as appends (fail_on_changes=True)"
                    )
                self._commit_offset(sid)
                continue
            tbl = self.catalog.load_table(self.identifier)
            df = self._batch_df(spark, tbl, snap)
            if df is not None:
                sink(df, sid)
            self._commit_offset(sid)
            done.append(sid)
        return done
