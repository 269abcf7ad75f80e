"""Round-8 IVF cell-count knob measurement for q_graph_knn_bfs.

The claim under test: with N_CELLS FIXED, a 10x corpus makes every cell
10x more populous, so the kNN edge build's cell-equi-join candidate
volume (|corpus| x per-cell population x N_PROBE) grows quadratically —
measured 8.84x for the x10 decade step with fixed cells. Scaling cells
~ n/IVF_TARGET_CELL (ivf_cells_for) pins per-cell population and the
edge build returns toward the linear band.

Unlike the probe-stride knob, this one moves the APPROXIMATION point:
fixed N_PROBE over more, smaller cells sees a smaller corpus fraction
per query, so the kNN graph gets sparser cells-local. The tool therefore
reports, alongside runtimes, the edge-build output structure (reachable
nodes within the fixed BFS round budget and the hop-distance histogram)
under both settings so the trade is measured, not asserted.

Runs _knn_bfs warm (noop sink, one warm + one timed pass, the
decade_step convention) at:
  sf0.1  cells=N_CELLS(16)       -- the registered/oracle shape
  x10    cells=N_CELLS(16)       -- knob OFF: quadratic candidate growth
  x10    cells=ivf_cells_for(n)  -- knob ON

Usage: python tools/ivf_cells_knob.py   (expects /tmp/scale_x10 from
       tools/adversarial_corpus.py, like tools/decade_step.py)
"""

import json
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

from iceberg_rest_catalog_spark import registry  # noqa: F401  (module import wiring)
from iceberg_rest_catalog_spark.llm.similarity import N_CELLS, _emb, ivf_cells_for
from iceberg_rest_catalog_spark.operators.graph import _knn_bfs
from iceberg_rest_catalog_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
X10 = "/tmp/scale_x10"


def timed(spark, sf_dir, cells):
    _knn_bfs(spark, sf_dir, cells).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    t0 = time.perf_counter()
    _knn_bfs(spark, sf_dir, cells).write.format("noop").mode("overwrite").save()
    sec = round(time.perf_counter() - t0, 2)
    rows = _knn_bfs(spark, sf_dir, cells).collect()
    hist = Counter(r.dist for r in rows)
    return sec, len(rows), dict(sorted(hist.items()))


def main() -> None:
    spark = get_spark("ivf-cells")
    spark.sparkContext.setLogLevel("ERROR")
    n10 = _emb(spark, X10).count()
    c_scaled = ivf_cells_for(n10)

    base = timed(spark, BASE, N_CELLS)
    off = timed(spark, X10, N_CELLS)
    on = timed(spark, X10, c_scaled)
    print(
        json.dumps(
            {
                "sf0.1_cells": N_CELLS,
                "sf0.1": dict(zip(("sec", "reached", "hops"), base)),
                "x10_cells_fixed": N_CELLS,
                "x10_fixed": dict(zip(("sec", "reached", "hops"), off)),
                "x10_cells_scaled": c_scaled,
                "x10_scaled": dict(zip(("sec", "reached", "hops"), on)),
                "ratio_fixed": round(off[0] / max(base[0], 1e-9), 2),
                "ratio_scaled": round(on[0] / max(base[0], 1e-9), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
