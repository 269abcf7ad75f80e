"""Shared helpers for query definitions."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

SCRATCH_ROOT = os.path.join(tempfile.gettempdir(), "icsb_scratch")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def r4(c: Column | str) -> Column:
    """Round a floating aggregate to 4 decimals (oracle stability)."""
    return F.round(c, 4)


def ntz(s: str) -> Column:
    """TZ-naive timestamp literal (matches DuckDB TIMESTAMP literals)."""
    return F.expr(f"TIMESTAMP_NTZ '{s}'")


def scratch_dir(*parts: str) -> str:
    """Per-query scratch dir for sink/partition round-trip queries."""
    d = os.path.join(SCRATCH_ROOT, *[p.replace("/", "_").strip("_") for p in parts])
    os.makedirs(d, exist_ok=True)
    return d


def publish_parquet_atomic(df: DataFrame, cache: str) -> None:
    """Materialize ``df`` into the cache directory ATOMICALLY: write to a
    unique temp sibling, then rename into place.  Readers key on the
    ``_SUCCESS`` marker, which only ever appears inside a fully-written
    directory; two concurrent builders race harmlessly (the loser removes
    its temp and reads the winner's).  rename() is atomic on one
    filesystem — the check-then-overwrite pattern it replaces could serve
    a torn cache to a concurrent session (r13 ADVICE).

    Only ENOTEMPTY/EEXIST on the rename mean "lost the race" (the winner's
    populated directory is in the way); any other errno — permissions, a
    stray file where the directory should be — is a REAL failure and
    re-raises instead of silently leaving an empty cache dir for the
    caller to read with a confusing downstream error (r14 ADVICE).  The
    publish is verified by asserting ``_SUCCESS`` exists before return."""
    import errno
    import shutil
    import uuid

    tmp = f"{cache}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rmdir(cache)  # scratch_dir pre-creates it empty
    except OSError:
        pass  # non-empty: another builder already published
    try:
        os.rename(tmp, cache)
    except OSError as exc:
        shutil.rmtree(tmp, ignore_errors=True)
        if exc.errno not in (errno.ENOTEMPTY, errno.EEXIST):
            raise  # genuine failure, not a concurrent-builder race
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise RuntimeError(
            f"publish_parquet_atomic: no _SUCCESS in {cache} after publish"
        )


def widen(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to the session's shuffle parallelism when the
    incoming split count is LOWER — otherwise a no-op.

    Spark sizes input splits by scan BYTES, so a compute-heavy or
    fanning-out map stage (per-shingle md5, per-vector float math) over a
    corpus that arrives in fewer splits than cores serializes onto those
    few tasks until the first shuffle (round-8 profiling: the whole LSH
    family bottlenecked on ONE task this way at bench scale — single
    parquet files well under maxPartitionBytes). One small shuffle of the
    raw rows buys full-width execution of the expensive stage. At 100 TB
    the scan already yields thousands of splits and this returns the
    input unchanged — no extra shuffle. Hash partitioning on ``key``
    keeps the layout deterministic; results are partition-invariant
    either way (the oracle harness re-proves it)."""
    want = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want, key)
    return df


def release_persistent_state(spark: SparkSession) -> int:
    """Unpersist every cached plan and persistent RDD in the session;
    returns how many RDDs were released.

    Iterative operators (pagerank, connected components, k-means, BFS,
    LSH signature reuse) truncate lineage with ``localCheckpoint()``,
    whose backing RDDs are NOT tracked by the SQL cache manager and stay
    resident until the Python DataFrame is garbage-collected AND the
    ContextCleaner gets around to them.  In a long-lived session running
    many queries back-to-back this accumulates silently — round-8
    profiling measured 21 leaked persistent RDDs after six graph/dedup
    queries, and the eviction pressure they exert made later
    storage-heavy queries (q_graph_triangles) run 2.5x slower inside the
    bench suite than standalone.  Callers that run MANY INDEPENDENT
    queries on one session (the bench harness, a query service draining
    a queue) should call this between queries; within one query the
    operators' own unpersist discipline bounds the working set.

    SIDE EFFECT (r16-OPT, flagged by r16 ADVICE): this also DROPS every
    ``icsb_stream_*`` memory-sink temp view.  A caller still holding an
    unconsumed DataFrame returned by a ``_run_memory``-based streaming
    query (``spark.table(name)`` is lazy) will hit
    TABLE_OR_VIEW_NOT_FOUND on first use after the release — fully
    consume (collect / write) memory-sink results before calling this.
    Every in-repo call site does; the constraint is part of the
    function's contract.

    :func:`release_persistent_state_deep` additionally triggers one
    driver-JVM GC.  Shuffle files, broadcast blocks and RDD registrations
    are reclaimed by ContextCleaner only when their JVM objects are
    weak-reference collected — unpersist() alone just marks them.  Across
    a long suite the backlog grows monotonically and taxes exactly the
    memory-heaviest queries (round-9 bench: q_graph_triangles sampled
    10.6 → 12.6 → 16.9 s across three otherwise-identical suite passes;
    q_dedup_semantic grew the same way, every light query stayed flat —
    the growth, not the plans, was being measured).  A driver System.gc()
    between queries drains the weak-ref queue so each query starts from
    the same cleaned state.  Costs one GC pause on an idle heap
    (~100 ms) — harness hygiene, not something a production query should
    pay per call, hence the separate deep variant."""
    spark.catalog.clearCache()
    # Memory-sink temp views leak the same way (r16-OPT): every
    # _run_memory streaming drain registers a fresh icsb_stream_<uid>
    # view whose MemorySink holds the ENTIRE drained result in memory and
    # is referenced by the catalog forever — across a 102-query x 4-pass
    # suite that is dozens of full stream-join results resident at once,
    # eviction pressure charged to whichever memory-heavy query runs
    # next (q_stream_join_outer read 8.6 s in-suite vs 3.7 s standalone
    # before this).  Dropping the view releases the sink buffer at the
    # next driver GC; each query invocation registers a new uid, so a
    # re-run never reads a dropped view.
    try:
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith("icsb_stream_"):
                spark.catalog.dropTempView(tbl.name)
    except Exception:
        pass  # catalog listing unavailable (exotic session) — skip hygiene
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in list(jmap.values()):
        jrdd.unpersist()
        n += 1
    return n


def release_persistent_state_deep(spark: SparkSession) -> int:
    """release_persistent_state + one driver-JVM GC (see its docstring's
    driver_gc paragraph) — the between-queries call for suite harnesses."""
    n = release_persistent_state(spark)
    spark.sparkContext._jvm.System.gc()
    return n


def fixed_width(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition on ``keys`` at the session's FULL shuffle
    parallelism, pinned against AQE coalescing.

    The complement of :func:`widen` for the POST-shuffle side of the same
    disease: AQE sizes coalesced partitions by shuffle BYTES, so a join or
    grouped stage whose input is small but whose per-row work fans out
    (bucket-quantized interval joins: ~MBs of session rows explode into
    tens of millions of candidate pairs inside the join task) gets
    coalesced onto one or two tasks and serializes (round-8 profiling:
    the co-presence pair join ran 9.5s single-task, 1.6s at width 32).
    An EXPLICIT numPartitions repartition is marked user-specified, which
    AQE honors — the join runs at full width.  At real scale the shuffle
    is large, AQE would not have coalesced, and this is the exchange the
    planner would have inserted anyway (same key, same width), so the
    pin costs nothing.  Trade-off: a user-specified exchange also opts
    out of AQE's skew-split for that side — use only where the per-key
    fan-out is bounded (e.g. hour buckets), not on skew-prone keys."""
    want = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(want, *keys)
