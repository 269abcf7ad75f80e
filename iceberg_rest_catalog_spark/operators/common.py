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
