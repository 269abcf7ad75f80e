"""Query registry — the single source of truth for ``__spark_entry__``.

Every operator from SURVEY.md §2 registers itself here with an id, a
callable ``(spark, sf_dir) -> DataFrame``, and (when DuckDB-expressible) an
oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
views over this registry.

Conventions (oracle-stability, SURVEY.md §7 watch-list):
- every computed/aggregate column is aliased identically in the Spark code
  and the oracle SQL (the driver sorts columns BY NAME before hashing);
- every floating-point aggregate is rounded to 4 decimals in BOTH texts;
- window orderings always include a unique tiebreak key so row_number /
  frame contents are deterministic across engines.
"""

from __future__ import annotations

import functools
import glob
import importlib
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Entry:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, Entry] = {}

# Modules that contribute queries; imported lazily by collect().
#
# ORDER MATTERS for external verification: the grading driver checks the
# first ~50 registry entries in registration order per round.  Rounds 1-2
# driver-confirmed catalog / scan / source / filter / join; round 3
# confirmed TPC-H / dedup / similarity / text; round 4 confirmed
# multimodal / streaming / pipeline / embedding / graph / curation /
# events / most aggregates (CORRECTNESS_r0{2,3,4}.json).
#
# Module order alone cannot express the round-5 window: the 49 remaining
# never-driver-checked ids plus the 3 ids whose last driver status was ERR
# (q_dedup_fuzzy / q_dedup_simhash / q_dedup_cluster, fixed in r4) are
# scattered across modules that are otherwise fully driver-green.  collect()
# therefore reorders the registry by the explicit id list below; module
# import order only breaks ties for ids not named there.
_QUERY_MODULES = (
    "iceberg_rest_catalog_spark.llm.multimodal",
    "iceberg_rest_catalog_spark.streaming.queries",
    "iceberg_rest_catalog_spark.llm.pipeline",
    "iceberg_rest_catalog_spark.llm.embedding",
    "iceberg_rest_catalog_spark.operators.graph",
    "iceberg_rest_catalog_spark.llm.curation",
    "iceberg_rest_catalog_spark.operators.events",
    "iceberg_rest_catalog_spark.operators.aggregates",
    "iceberg_rest_catalog_spark.operators.windows",
    "iceberg_rest_catalog_spark.operators.sorts",
    "iceberg_rest_catalog_spark.operators.setops",
    "iceberg_rest_catalog_spark.operators.subqueries",
    "iceberg_rest_catalog_spark.operators.functions",
    "iceberg_rest_catalog_spark.operators.udfs",
    "iceberg_rest_catalog_spark.catalog.queries",
    "iceberg_rest_catalog_spark.catalog.data_queries",
    "iceberg_rest_catalog_spark.operators.scans",
    "iceberg_rest_catalog_spark.operators.sources",
    "iceberg_rest_catalog_spark.operators.filters",
    "iceberg_rest_catalog_spark.operators.joins",
    "iceberg_rest_catalog_spark.operators.skew",
    "iceberg_rest_catalog_spark.operators.quality",
    "iceberg_rest_catalog_spark.operators.tpch",
    "iceberg_rest_catalog_spark.llm.dedup",
    "iceberg_rest_catalog_spark.llm.similarity",
    "iceberg_rest_catalog_spark.llm.text",
    # round-13 composition module — imports similarity + embedding at top
    # level, so it must come after both
    "iceberg_rest_catalog_spark.llm.ann_ivfpq",
)

# Driver-window rotation — MECHANICAL since round 8 (VERDICT r7 item 2).
#
# Rounds 5-7 maintained an explicit id tuple (_ROUND{N}_WINDOW) plus a test
# that recomputed the expected set from the CORRECTNESS artifacts and
# checked the tuple against it.  Round 8 removes the tuple entirely: the
# registry itself derives the ordering from the committed
# CORRECTNESS_r*.json artifacts, so the rotation can never drift from the
# policy.  The policy (unchanged since r5, staleness-first):
#
#   1. ids with NO driver row yet (new operators) lead, in registration
#      order — never-checked beats stale;
#   2. then ids whose LAST driver row was red (FAIL/ERR) — they must
#      re-earn a green row;
#   3. then everything else, oldest last-evidence round first (ties break
#      by id, so catalog c_* siblings — one shared implementation,
#      catalog/queries.py:62 — cluster together and a driver cap cuts
#      whole families, not random ids).
#
# The driver checks the first ~50 queries() entries per round and writes
# CORRECTNESS_r0{N}.json at round end; committing that artifact is what
# rotates the next round's window.  For round 8 the computed head is the
# 7 catalog ids the r7 50-cap cut (last evidence r2) followed by the 45
# r3-stale ids (TPC-H / dedup-verify / similarity / text families) —
# pinned concretely in tests/test_entry.py.

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@functools.lru_cache(maxsize=1)
def driver_evidence() -> tuple[dict[str, int], frozenset[str]]:
    """Parse every committed CORRECTNESS_r*.json into (last_seen_round,
    currently-red ids).  A row is green iff rows+schema+hash all match and
    there is no error; a later green row supersedes an earlier red one."""
    last_seen: dict[str, int] = {}
    failed: set[str] = set()
    paths = []
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            paths.append((int(m.group(1)), path))
    for rnd, path in sorted(paths):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for qid, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_seen[qid] = rnd
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if ok:
                failed.discard(qid)
            else:
                failed.add(qid)
    return last_seen, frozenset(failed)


def staleness_order(ids: list[str]) -> list[str]:
    """Order ids for the driver window: never-checked (registration order),
    then red, then oldest-evidence-first with id tiebreak."""
    last_seen, failed = driver_evidence()
    reg_pos = {qid: i for i, qid in enumerate(ids)}

    def key(qid: str):
        if qid not in last_seen:
            return (0, reg_pos[qid], "")
        if qid in failed:
            return (1, last_seen[qid], qid)
        return (2, last_seen[qid], qid)

    return sorted(ids, key=key)


def query(name: str, oracle: str | None = None):
    """Decorator: register fn as queries()[name], with optional DuckDB oracle.

    Every oracle passes through :func:`detvec.rewrite` (r16): vector-kernel
    calls (list_cosine_similarity / list_dot_product / list_distance) are
    expanded into unrolled, fixed-order float64 arithmetic so the oracle's
    rank-feeding scores cannot depend on the grading environment's DuckDB
    kernel build — the r14/r15 q_graph_modularity driver-red class."""
    from .detvec import rewrite

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = Entry(
            name=name,
            fn=fn,
            oracle=rewrite(oracle) if oracle is not None else None,
            doc=fn.__doc__ or "",
        )
        return fn

    return deco


def collect() -> dict[str, Entry]:
    """Import every query module that exists; missing modules are simply
    not-yet-implemented (the registry degrades gracefully as modules land).

    The returned dict is ordered by ``staleness_order`` — never-checked ids
    first, then red rows, then oldest driver evidence first — so the grading
    driver (which verifies the first ~50 entries each round) always sees the
    ids most in need of fresh evidence."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Only swallow "the query module itself (or its parent package)
            # is missing" — a bad import *inside* an existing module must
            # still surface loudly.
            if e.name is None or not (mod == e.name or mod.startswith(e.name + ".")):
                raise
    return {name: _REGISTRY[name] for name in staleness_order(list(_REGISTRY))}


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in collect().items()}


def oracles() -> dict[str, str]:
    return {name: e.oracle for name, e in collect().items() if e.oracle is not None}
