"""Pins for tools/check_queries.py — the local gate must be AT LEAST as
strict as the driver harness (VERDICT r11 item 7).

The r11 miss: the driver's canonicalizer sorts pandas object columns and
crashes on unhashable values (lists), while this checker used to
stringify lists itself — so q_fn_regexp's raw ARRAY<STRING> column passed
locally and shipped red.  The checker now REJECTS any non-scalar output
column; the repo convention is to stringify arrays inside the query
(q_fn_array, operators/functions.py).
"""

import numpy as np
import pandas as pd

from tools.check_queries import _kind, nonscalar_columns


def test_list_column_is_rejected():
    df = pd.DataFrame({"doc_id": [1, 2], "nums": [["1", "2"], []]})
    assert nonscalar_columns(df) == ["nums"]


def test_ndarray_and_map_columns_are_rejected():
    # DuckDB fetchdf renders LIST as np.ndarray; Spark MapType as dict
    df = pd.DataFrame(
        {
            "a": [np.array([1, 2]), np.array([], dtype=int)],
            "m": [{"k": 1}, {}],
            "ok": [1, 2],
        }
    )
    assert nonscalar_columns(df) == ["a", "m"]


def test_scalar_columns_pass():
    df = pd.DataFrame(
        {
            "i": [1, 2],
            "f": [1.5, float("nan")],
            "s": ["a", None],
            "b": [True, False],
            "t": pd.to_datetime(["2026-01-01", "2026-01-02"]),
        }
    )
    assert nonscalar_columns(df) == []
    assert _kind(df["i"]) == "int" and _kind(df["s"]) == "str"


def test_struct_row_is_rejected():
    # Spark StructType reaches pandas as Row (a tuple subclass) -> "array"
    from pyspark.sql import Row

    df = pd.DataFrame({"st": [Row(x=1), Row(x=2)]})
    assert nonscalar_columns(df) == ["st"]


def test_registry_queries_emit_no_nonscalar_columns(spark):
    """Every registered query's OUTPUT SCHEMA must be scalar-only — the
    schema-level sweep that would have caught q_fn_regexp at registration
    time, without executing anything (schemas resolve lazily)."""
    import __spark_entry__ as entry

    SF = "/root/testdata/sf0.001"
    bad = {}
    for name, fn in entry.queries().items():
        try:
            schema = fn(spark, SF).schema
        except Exception:
            continue  # execution-path queries are covered by the full checker
        cols = [
            f.name
            for f in schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if cols:
            bad[name] = cols
    assert not bad, bad
