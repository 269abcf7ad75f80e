"""Rank-margin floor audit (VERDICT r15 item 2).

Every rank/threshold in the IVF/kNN family is built on a cosine rounded
to 4 dp; the ranking is environment-stable only while every RAW cosine
stays far enough from a .5 rounding boundary that cross-engine float64
arithmetic differences cannot flip the rounded value.  Since r16 both
engines evaluate the SAME unrolled float64 expression (detvec.rewrite on
the DuckDB side, the fixed-order folds / det kernels on the Spark side),
so the cross-engine delta is bounded by summation-order noise —
<= ~1e-13 on unit-norm 64-dim data.

Residual cross-engine deltas after r16, by surface:

- mirrored-op surfaces (JVM fold / det kernels vs the unrolled SQL):
  BIT-IDENTICAL — same IEEE op sequence, delta exactly 0;
- the normalize-then-dot variants (_block_pairs) and the gb_gram_cos
  GEMM bulk pass: <= ~1e-15 / ~1e-14 cosine units respectively, and the
  guard band (GB_BAND = 1e-7 cosine units) det-re-scores every entry
  whose value sits nearer a boundary than that, collapsing those to the
  bit-identical det value too.

So the only margin that must hold is: no RAW cosine within ~1e-15 of a
boundary (where even the normalize-variant could flip).  The floor below
is 1e-13 cosine units — two orders above that worst case — and the
committed fixtures measure minima of ~5e-10 (sf0.001) / ~2.9e-8 (sf0.01,
r15 verdict) cosine units, three-plus orders above the floor.

A failure here means a regenerated fixture landed a cosine essentially
ON a boundary: regenerate with another seed (tools/regen_fixture.py)
rather than shipping a rank one ulp from flipping.
"""

import os

import duckdb
import numpy as np
import pytest

from iceberg_rest_catalog_spark.detvec import rewrite
from iceberg_rest_catalog_spark.llm.similarity import ivf_ranked_ctes

SF_DIR = os.environ.get("MARGIN_SF_DIR", "/root/testdata/sf0.001")

# minimum |cos|*1e4 distance to a .5 boundary, in cos*1e4 units
# (1e-9 here = 1e-13 cosine units = ~100 x the normalize-variant noise,
# the only non-bit-identical arithmetic left after the guard band)
MARGIN_FLOOR = 1e-9

# RAW (unrounded) rank-feeding cosine surfaces over the shared CTE family.
SURFACES = {
    "assign_cc": "SELECT list_cosine_similarity(e.emb, cent.c) AS x "
    "FROM e CROSS JOIN cent",
    "coarse_gc": "SELECT list_cosine_similarity(e.emb, coarse.cg) AS x "
    "FROM e CROSS JOIN coarse",
    "pair_cos": "SELECT list_cosine_similarity(a.emb, p.qe) AS x "
    "FROM probed p JOIN assigned a USING (cell) "
    "WHERE a.vec_id <> p.q_vec_id",
}


def _margins(vals: np.ndarray) -> np.ndarray:
    b = np.abs(vals) * 1e4
    return np.abs(b - np.floor(b) - 0.5)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixture missing")
def test_rank_feeding_cosine_margins_above_floor():
    con = duckdb.connect()
    con.execute("SET threads=8")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    report = {}
    for name, sel in SURFACES.items():
        sql = rewrite("WITH " + ivf_ranked_ctes(None) + " " + sel)
        vals = con.execute(sql).fetchnumpy()["x"]
        vals = vals[~np.isnan(vals)]
        assert len(vals) > 0, f"{name}: no values"
        report[name] = float(_margins(vals).min())
    con.close()
    offenders = {k: v for k, v in report.items() if v <= MARGIN_FLOOR}
    assert not offenders, (
        f"rank-feeding cosine margin below floor {MARGIN_FLOOR} "
        f"(cos*1e4 units): {offenders}; full report {report} — regenerate "
        "the fixture with a different seed"
    )
