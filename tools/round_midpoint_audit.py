"""Registry-wide audit of the F.round/DuckDB round() midpoint cliff
(VERDICT r9 item 4).

The class (SCALE.md round 9): Spark ``F.round`` rounds the EXACT binary
value half-up via BigDecimal, DuckDB ``round()`` rounds the double product
``x*1e4`` — and the driver's value-hash canonicalizes floats to 4 decimals
the same way.  When a raw double sits within ~1 ulp of a 4-dp decimal
midpoint, a 1-ulp cross-engine computation difference (summation order,
fused ops) is amplified into a 1e-4 output difference, flipping the hash.
The recurrence family already rounds in-loop with the multiply-floor
convention; this tool measures how much of the REST of the registry sits
on that cliff for the current fixture.

Method: run every queries() entry at sf0.01 (the driver's gate input),
pull the result, and for every float column flag values whose ``x*1e4``
lands within TOL_ULPS ulps of an exact ``k + 0.5``.  Values that are
exact 4-dp multiples (already-rounded outputs — the common case) are
never midpoints, so a clean, fully-pre-rounded registry reports zero.

Usage: python tools/round_midpoint_audit.py [query ...]   (default: all)
Output: one JSON line per exposed (query, column) + a summary line.
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry
from iceberg_rest_catalog_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TOL_ULPS = 4  # 1-ulp engine noise + headroom for the *1e4 product itself


def exposed_mask(vals: np.ndarray) -> np.ndarray:
    """True where v*1e4 is within TOL_ULPS ulps of an exact half-integer."""
    v = vals[np.isfinite(vals)]
    y = v * 1e4
    frac = y - np.floor(y)
    dist = np.abs(frac - 0.5)
    # also catch y a hair BELOW k+0.5 from the other side (frac ~ 0.5-eps
    # is covered; frac ~ 0.5+eps likewise by the abs)
    return dist <= TOL_ULPS * np.spacing(np.abs(y) + 1.0)


def main() -> None:
    spark = get_spark("round-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = sys.argv[1:] or list(qs)
    n_exposed_cols = 0
    failures = []
    for name in names:
        try:
            pdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001 - audit must finish the sweep
            failures.append(name)
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
            continue
        for col in pdf.columns:
            s = pdf[col]
            if s.dtype.kind != "f":
                continue
            vals = s.to_numpy(dtype="float64", na_value=math.nan)
            m = exposed_mask(vals)
            if m.any():
                n_exposed_cols += 1
                hits = vals[np.isfinite(vals)][m]
                print(
                    json.dumps(
                        {
                            "query": name,
                            "column": col,
                            "n_exposed": int(m.sum()),
                            "n_rows": int(len(vals)),
                            "examples": [float(x) for x in hits[:3]],
                        }
                    )
                )
    print(
        json.dumps(
            {
                "summary": True,
                "n_queries": len(names),
                "n_exposed_columns": n_exposed_cols,
                "errors": failures,
                "tol_ulps": TOL_ULPS,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
