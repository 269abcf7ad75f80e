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


def test_round5_window_leads_registration_order():
    """The driver verifies the first ~50 queries() entries per round; the
    explicit rotation list must lead the dict exactly, with every listed id
    actually registered (a typo would silently waste a window slot)."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from iceberg_rest_catalog_spark import registry

    ids = list(e.queries())
    window = list(registry._ROUND5_WINDOW)
    assert ids[: len(window)] == window
    assert len(set(window)) == len(window)
