"""Local correctness harness: run each queries() entry vs its oracle_sql() in DuckDB at sf0.01."""
import sys, hashlib, math, os
import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from iceberg_rest_catalog_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
only = set(sys.argv[1:])

spark = get_spark("check")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)): return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15: return str(int(v))
            return f"{v:.4f}"
        if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(canon(v) for v in row) for row in df.itertuples(index=False, name=None))
    df2 = pd.DataFrame({"r": rows})
    return df2

qs = entry.queries()
os_ = entry.oracle_sql()
fails = []
for name in sorted(qs):
    if only and name not in only: continue
    try:
        sdf = qs[name](spark, SF_DIR)
        spdf = sdf.toPandas()
        if name not in os_:
            print(f"{name}: rows-only {len(spdf)}")
            continue
        odf = con.execute(os_[name]).fetchdf()
        a, b = norm(spdf), norm(odf)
        ok_rows = len(spdf) == len(odf)
        ha = hashlib.md5("\n".join(a["r"]).encode()).hexdigest()
        hb = hashlib.md5("\n".join(b["r"]).encode()).hexdigest()
        status = "PASS" if (ok_rows and ha == hb) else "FAIL"
        if status == "FAIL":
            fails.append(name)
            print(f"{name}: FAIL rows={len(spdf)}/{len(odf)} cols={sorted(spdf.columns)}/{sorted(odf.columns)}")
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
