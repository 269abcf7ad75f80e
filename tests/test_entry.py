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


def test_round6_window_leads_registration_order():
    """The driver verifies the first ~50 queries() entries per round; the
    explicit rotation list must lead the dict exactly, with every listed id
    actually registered (a typo would silently waste a window slot)."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    window = list(registry._ROUND6_WINDOW)
    assert ids[: len(window)] == window
    assert len(set(window)) == len(window)
    assert len(window) == 50


def test_round6_window_is_exactly_the_never_driver_checked_ids():
    """The r6 window must cover precisely the ids with no prior driver row:
    the r5 overflow pair plus the 48 round-5 additions — i.e. zero overlap
    with any CORRECTNESS_r0{2..5} window."""
    import json

    sys.path.insert(0, REPO)
    from iceberg_rest_catalog_spark import registry

    window = set(registry._ROUND6_WINDOW)
    seen = set()
    for r in (2, 3, 4, 5):
        path = os.path.join(REPO, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            seen |= set(json.load(open(path)))
    overlap = window & seen
    assert not overlap, sorted(overlap)
    # and together they cover the whole registry, except ids registered
    # after the window froze — those must be EXACTLY the declared round-6
    # additions (the staged r7 rotation seed), nothing anonymous
    all_ids = set(registry.queries())
    assert window <= all_ids, sorted(window - all_ids)
    post_window = all_ids - seen - window
    assert post_window == set(registry._ROUND6_ADDITIONS), sorted(post_window)
