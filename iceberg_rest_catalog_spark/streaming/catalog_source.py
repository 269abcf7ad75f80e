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

    def _entries_df(self, spark, tbl, entries, apply_deletes=None) -> DataFrame | None:
        """Rows of specific manifest entries, projected to the current
        schema by write-time schema id (same contract as Table.scan).
        ``apply_deletes``: position-delete files to subtract BEFORE the
        projection (needed when reconstructing a logical view of old
        files for a changelog diff)."""
        if not entries:
            return None
        cur_sid = tbl.metadata["current-schema-id"]
        groups: dict = {}
        for e in entries:
            gid = e.get("schema-id")
            groups.setdefault(None if gid == cur_sid else gid, []).append(
                os.path.join(tbl.location, e["path"])
            )
        parts = []
        for gid in sorted(groups, key=lambda g: -1 if g is None else g):
            ws = tbl._schema_by_id(gid) if gid is not None else None
            df = spark.read.schema(
                (ws or tbl.schema()).to_spark()
            ).parquet(*groups[gid])
            if apply_deletes:
                df = tbl._apply_position_deletes(spark, df, apply_deletes)
            parts.append(tbl._project_to_current(df, ws) if ws else df)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def _deleted_rows_df(self, spark, tbl, delete_rel_paths, sid) -> DataFrame | None:
        """Resolve position-delete tuples back to the ROWS they delete —
        the retraction half of a changelog batch. Reads only the data
        files the tuples reference (their distinct file list is collected;
        it is bounded by touched-file count, not row count). Entries are
        resolved AT the snapshot being processed — later rewrites may have
        removed the touched files from the current view."""
        from pyspark.sql import functions as F

        ddf = spark.read.parquet(
            *[os.path.join(tbl.location, p) for p in delete_rel_paths]
        )
        # driver-side bound: O(|files churned this micro-batch|) paths —
        # metadata-plane only, never row data
        touched = [r.file_path for r in ddf.select("file_path").distinct().collect()]
        if not touched:
            return None
        by_path = {
            os.path.normpath(e["path"]): e for e in tbl._entries_at(sid)
        }
        entries = [by_path[os.path.normpath(p)] for p in touched if os.path.normpath(p) in by_path]
        if not entries:
            return None
        # keyed semi-join: keep exactly the rows the tuples point at.
        # Needs _metadata, so read per schema group manually.
        cur_sid = tbl.metadata["current-schema-id"]
        parts = []
        groups: dict = {}
        for e in entries:
            gid = e.get("schema-id")
            groups.setdefault(None if gid == cur_sid else gid, []).append(
                os.path.join(tbl.location, e["path"])
            )
        for gid in sorted(groups, key=lambda g: -1 if g is None else g):
            ws = tbl._schema_by_id(gid) if gid is not None else None
            df = spark.read.schema(
                (ws or tbl.schema()).to_spark()
            ).parquet(*groups[gid])
            keyed = df.withColumn("__f", tbl._rel_file_path_col()).withColumn(
                "__p", F.col("_metadata.row_index")
            )
            hit = keyed.join(
                F.broadcast(ddf),
                on=(F.col("__f") == ddf["file_path"]) & (F.col("__p") == ddf["pos"]),
                how="left_semi",
            ).drop("__f", "__p")
            parts.append(tbl._project_to_current(hit, ws) if ws else hit)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def run_changelog(self, spark: SparkSession, sink) -> list[int]:
        """CDC drain: per pending snapshot, call ``sink(batch_df, sid)``
        where batch_df carries a ``_change_type`` column — the Iceberg
        changelog scan shape. appends emit inserts; merge-on-read DML
        emits exact deletes (tuples resolved to rows) plus inserts;
        copy-on-write overwrites emit the content DIFF of the rewritten
        files (exceptAll both ways — bounded by candidate-file size);
        compactions emit nothing (no logical change)."""
        from pyspark.sql import functions as F

        done: list[int] = []
        for snap in self.pending_snapshots():
            sid = snap["snapshot-id"]
            op = snap.get("operation", "append")
            tbl = self.catalog.load_table(self.identifier)
            doc = tbl._manifest_doc(snap)
            batch = None

            def _tag(df, kind):
                return df.withColumn("_change_type", F.lit(kind))

            if op == "append":
                df = self._entries_df(spark, tbl, tbl._manifest_entries(snap))
                if df is not None:
                    batch = _tag(df, "insert")
            elif op == "replace":
                pass  # compaction: no logical change
            else:
                dels = doc.get("position-deletes") or []
                if dels:
                    gone = self._deleted_rows_df(spark, tbl, dels, sid)
                    if gone is not None:
                        batch = _tag(gone, "delete")
                    add = self._entries_df(spark, tbl, tbl._manifest_entries(snap))
                    if add is not None:
                        ins = _tag(add, "insert")
                        batch = ins if batch is None else batch.union(ins)
                elif doc.get("removed"):
                    by_path = {
                        os.path.normpath(e["path"]): e
                        for a in tbl._ancestors(sid)
                        for e in tbl._manifest_entries(a)
                    }
                    removed_entries = [
                        by_path[os.path.normpath(p)]
                        for p in doc["removed"]
                        if os.path.normpath(p) in by_path
                    ]
                    # the LOGICAL old view: raw removed files minus the
                    # MoR deletes pending at the parent — already-retracted
                    # rows must not retract twice
                    parent = snap.get("parent-snapshot-id")
                    pending = tbl._deletes_at(parent) if parent else []
                    old = self._entries_df(
                        spark, tbl, removed_entries, apply_deletes=pending
                    )
                    new = self._entries_df(spark, tbl, tbl._manifest_entries(snap))
                    if old is not None:
                        deleted = old.exceptAll(new) if new is not None else old
                        batch = _tag(deleted, "delete")
                    if new is not None:
                        inserted = new.exceptAll(old) if old is not None else new
                        ins = _tag(inserted, "insert")
                        batch = ins if batch is None else batch.union(ins)
            if batch is not None:
                sink(batch, sid)
            self._commit_offset(sid)
            done.append(sid)
        return done

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
