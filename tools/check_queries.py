"""Local correctness harness: run each queries() entry vs its oracle_sql() in DuckDB at sf0.01.

Dtype-strict by default (set CHECK_LAX_DTYPES=1 to disable): the driver's
value-hash is dtype-aware — Spark DOUBLE `1.0` vs DuckDB TINYINT `1`
hash-diverge there even though the 4-dp canonicalization below collapses
them ("q_fn_math", red in CORRECTNESS_r06).  Each column is classified
into a coarse kind (int / float / bool / str / datetime / array / binary)
on BOTH engines and any int-vs-float style mismatch is a FAIL, so local
green reproduces driver-level strictness.
"""
import sys, hashlib, math, os, datetime, decimal
import numpy as np
import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from iceberg_rest_catalog_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
STRICT_DTYPES = os.environ.get("CHECK_LAX_DTYPES", "") != "1"
only = set(sys.argv[1:])


def _kind(series: pd.Series) -> str:
    """Coarse cross-engine type class for one result column.

    int+NULL promotes to float64 on BOTH engines (Spark toPandas and DuckDB
    fetchdf), so comparing coarse kinds is stable; the divergence this
    catches is a genuinely-typed DOUBLE on one side vs integer on the other.
    """
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "datetime"
    # object column: classify by first non-null value
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, decimal.Decimal):
            # Spark DecimalType reaches pandas as object(Decimal); DuckDB
            # fetchdf renders DECIMAL as float64.  Both are "float" for the
            # coarse kind — the 4-dp canonicalization compares the values
            # (ADVICE r7: a Decimal falling through to "str" would
            # false-FAIL every DecimalType-returning query).
            return "float"
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return "datetime"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array"
        if isinstance(v, (bytes, bytearray)):
            return "binary"
        if isinstance(v, dict):
            return "map"
        return "str"
    return "empty"  # all-NULL column: no evidence either way


def dtype_mismatches(spdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    out = []
    for col in sorted(set(spdf.columns) & set(odf.columns)):
        a, b = _kind(spdf[col]), _kind(odf[col])
        if a != b and "empty" not in (a, b):
            out.append(f"{col}: spark={a} oracle={b}")
    return out


def nonscalar_columns(df: pd.DataFrame) -> list[str]:
    """Columns holding arrays/maps/structs — the driver's canonicalizer
    sorts object columns and CRASHES on unhashable values (q_fn_regexp,
    red in CORRECTNESS_r11).  This checker used to stringify lists
    itself (masking exactly that miss), so it must be at least as
    strict as the driver: any non-scalar output column is a FAIL; the
    repo convention is to stringify arrays in the query itself
    (q_fn_array, operators/functions.py)."""
    return [c for c in df.columns if _kind(df[c]) in ("array", "map")]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)): return "NULL"
        if isinstance(v, decimal.Decimal): v = float(v)  # render like DuckDB's float64
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15: return str(int(v))
            return f"{v:.4f}"
        if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(canon(v) for v in row) for row in df.itertuples(index=False, name=None))
    df2 = pd.DataFrame({"r": rows})
    return df2

def main():
    spark = get_spark("check")
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs = entry.queries()
    os_ = entry.oracle_sql()
    fails = []
    for name in sorted(qs):
        if only and name not in only: continue
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
            bad_cols = nonscalar_columns(spdf)
            if bad_cols:
                fails.append(name)
                print(f"{name}: FAIL non-scalar output columns {bad_cols} "
                      "(driver canonicalizer rejects arrays/maps — stringify in the query)")
                continue
            if name not in os_:
                print(f"{name}: rows-only {len(spdf)}")
                continue
            odf = con.execute(os_[name]).fetchdf()
            a, b = norm(spdf), norm(odf)
            ok_rows = len(spdf) == len(odf)
            ha = hashlib.md5("\n".join(a["r"]).encode()).hexdigest()
            hb = hashlib.md5("\n".join(b["r"]).encode()).hexdigest()
            dmm = dtype_mismatches(spdf, odf) if STRICT_DTYPES else []
            status = "PASS" if (ok_rows and ha == hb and not dmm) else "FAIL"
            if status == "FAIL":
                fails.append(name)
                print(f"{name}: FAIL rows={len(spdf)}/{len(odf)} cols={sorted(spdf.columns)}/{sorted(odf.columns)}")
                for m in dmm: print("  dtype:", m)
                amm = set(a["r"]); bmm = set(b["r"])
                for x in list(amm - bmm)[:3]: print("  spark-only:", x[:200])
                for x in list(bmm - amm)[:3]: print("  oracle-only:", x[:200])
            else:
                print(f"{name}: PASS ({len(spdf)} rows)")
        except Exception as ex:
            fails.append(name)
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    print("FAILED:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
