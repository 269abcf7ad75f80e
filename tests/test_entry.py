"""Driver-contract regression tests for ``__spark_entry__``.

The grading driver may call ``queries()`` / ``oracle_sql()`` BEFORE it builds
a SparkSession, so the whole registry import chain must not need one (string
DDL return types on udf/pandas_udf/udtf are parsed through the active
SparkContext at decoration time — the bug these tests pin down).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_collect_without_spark_session():
    """registry.collect() must succeed in a fresh interpreter with no JVM."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import pyspark.sql.utils as u\n"
        "import __spark_entry__ as e\n"
        "qs, osql = e.queries(), e.oracle_sql()\n"
        "assert len(qs) > 130, len(qs)\n"
        "assert set(osql) <= set(qs), sorted(set(osql) - set(qs))\n"
        "print('OK', len(qs), len(osql))\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.startswith("OK")


def test_every_oracle_has_query():
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    dangling = [k for k in osql if k not in qs]
    assert not dangling, dangling


def test_round7_window_leads_registration_order():
    """The driver verifies the first ~50 queries() entries per round; the
    explicit rotation list must lead the dict exactly, with every listed id
    actually registered (a typo would silently waste a window slot)."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    window = list(registry._ROUND7_WINDOW)
    assert ids[: len(window)] == window
    assert len(set(window)) == len(window)
    # 6 round-6 additions + q_fn_math (red r6 row) + 50 r2-stale ids
    assert len(window) == 57


def test_round7_window_is_staleness_first():
    """The r7 window must be exactly: every id with NO driver row yet
    (the round-6 additions), plus every driver-FAIL id, plus every id whose
    last driver evidence is the oldest round present — computed from the
    CORRECTNESS artifacts themselves so the rotation policy is mechanical,
    not hand-maintained."""
    import json

    sys.path.insert(0, REPO)
    from iceberg_rest_catalog_spark import registry

    last_seen: dict[str, int] = {}
    failed: set[str] = set()
    for r in (2, 3, 4, 5, 6):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        if not os.path.exists(path):
            continue
        rows = json.load(open(path))
        for qid, row in rows.items():
            last_seen[qid] = r
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

    all_ids = set(registry.queries())
    never_checked = all_ids - set(last_seen)
    oldest = min(last_seen.values())
    stalest = {q for q, r in last_seen.items() if r == oldest and q in all_ids}
    expected = never_checked | failed | stalest
    window = set(registry._ROUND7_WINDOW)
    assert window == expected, (
        sorted(window - expected),
        sorted(expected - window),
    )
    # never-checked ids lead the list (driver cap cuts from the tail)
    head = list(registry._ROUND7_WINDOW)[: len(never_checked)]
    assert set(head) == never_checked, head
