"""Composed IVF-PQ approximate nearest-neighbour search (VERDICT r12
item 3).

q_sim_ann_ivf routes queries through coarse cells but scores candidates
in FULL precision; q_sim_ann_pq ADC-scores compressed codes but scans
the WHOLE corpus's codes.  A billion-vector index does both at once —
the FAISS IVFPQ layout: PQ codes live in per-cell inverted lists, a
query picks its N_PROBE closest cells, and only THOSE cells' codes are
ADC-scored through the 8x16 broadcast lookup table.  Memory per scored
candidate is 8 bytes of codes instead of 512 bytes of floats, and the
scan fraction is N_PROBE/cells instead of 1.

Spark shape (the part that must survive 100 TB):

- index build = the existing IVF assignment (broadcast centroids, one
  row_number window) + the existing PQ encode (broadcast codebook), glued
  by ONE equi-join on vec_id that keys the code table by cell — the
  inverted-list layout, written once, read per query;
- search = broadcast the <=N_PROBE-row probed-cell frame onto the code
  table (cell equi-join — the plan-pinned "no corpus-wide scan" shape),
  broadcast the 8x16 ADC lookup table onto the survivors (s, code
  equi-join), one partial-aggregated sum per candidate, TakeOrdered for
  the top-k;
- ranking on the ROUNDED ADC distance with vec_id tiebreak (the
  engine-parity convention), so the DuckDB twin value-hash-matches.

Reference parity note: the reference (a metadata REST catalog,
api/router/router.go:9-55) has no vector surface; this completes
SURVEY.md §2.C's ANN family (q_sim_ann_ivf + q_sim_ann_pq -> their
composition).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query

# The composed oracle reuses similarity's IVF CTE block (assignment +
# probe, scale-knobbed) and embedding's PQ geometry.  Top-level imports
# are safe: both modules precede this one in registry._QUERY_MODULES,
# import no third sibling at module scope, and rotation order for
# checked ids is keyed on driver evidence, not registration order.
from .embedding import ADC_TOP_K, K_CODES, N_SUB, SUB_DIM, _pq_subframes, _sq_l2
from .similarity import N_PROBE, QUERY_VEC_ID, ivf_ranked_ctes

_SUBS = f"(SELECT unnest(range(0, {N_SUB})) AS s)"
_D2 = (
    f"round(list_sum(list_transform(range(1, {SUB_DIM + 1}), "
    "i -> (sub[i] - csub[i]) * (sub[i] - csub[i]))), 4)"
)
_QD2 = (
    f"round(list_sum(list_transform(range(1, {SUB_DIM + 1}), "
    "i -> (qs[i] - csub[i]) * (qs[i] - csub[i]))), 4)"
)

_IVFPQ_ORACLE = f"""
WITH {ivf_ranked_ctes()},
sub AS (
  SELECT vec_id, s,
         list_slice(emb, s * {SUB_DIM} + 1, s * {SUB_DIM} + {SUB_DIM}) AS sub
  FROM e, {_SUBS}
),
cb AS (
  SELECT vec_id AS code, s,
         list_slice(emb, s * {SUB_DIM} + 1, s * {SUB_DIM} + {SUB_DIM}) AS csub
  FROM e, {_SUBS} WHERE vec_id < {K_CODES}
),
pa AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, cb.code,
           row_number() OVER (PARTITION BY sub.vec_id, sub.s
                              ORDER BY {_D2} ASC, cb.code ASC) AS rn
    FROM sub JOIN cb USING (s)
  ) WHERE rn = 1
),
qsub AS (SELECT s, sub AS qs FROM sub WHERE vec_id = {QUERY_VEC_ID}),
lut AS (
  SELECT cb.s, cb.code, {_QD2} AS d2
  FROM cb JOIN qsub USING (s)
),
cand AS (
  SELECT a.vec_id, a.cell
  FROM assigned a JOIN probed p USING (cell)
  WHERE p.q_vec_id = {QUERY_VEC_ID} AND a.vec_id <> {QUERY_VEC_ID}
),
scored AS (
  SELECT c.vec_id, c.cell, round(sum(l.d2), 4) AS adc_d2
  FROM cand c
  JOIN pa ON pa.vec_id = c.vec_id
  JOIN lut l ON l.s = pa.s AND l.code = pa.code
  GROUP BY c.vec_id, c.cell
)
SELECT sc.vec_id, lbl.label, sc.cell, sc.adc_d2
FROM scored sc JOIN embeddings lbl ON lbl.vec_id = sc.vec_id
ORDER BY sc.adc_d2 ASC, sc.vec_id ASC
LIMIT {ADC_TOP_K}
"""


@query("q_sim_ann_ivf_pq", oracle=_IVFPQ_ORACLE)
def q_sim_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ composed ANN search: coarse-route the query to its N_PROBE
    nearest cells (q_sim_ann_ivf's scale-knobbed assignment — flat below
    ASSIGN_FLAT_MAX vectors, two-level above), then ADC-score ONLY the
    probed cells' PQ codes through the broadcast 8x16 lookup table
    (q_sim_ann_pq's query shape).  The corpus-wide term drops from
    |corpus| ADC sums to |corpus| * N_PROBE / cells, and each scored
    candidate reads 8 one-byte codes, not 64 floats — the actual
    billion-scale memory layout (FAISS IVFPQ).

    Plan shape: the code table is keyed by cell via one vec_id equi-join
    (index build); search is a broadcast cell equi-join (<=N_PROBE rows)
    followed by a broadcast (s, code) equi-join — NO corpus-wide ADC
    scan, pinned by tests/test_plans.py.  Recall vs the exact-L2 top-k is
    measured in tests/test_analytics_ops.py
    (test_ivfpq_recall_vs_exact_l2); the operating point trades the PQ
    quantization error ON TOP of the IVF probe miss rate, both bounded by
    the same knobs the parents expose (cells, N_PROBE, codebook size).

    Reference scope: no vector surface in the reference facade
    (api/router/router.go:9-55); composition of q_sim_ann_ivf
    (llm/similarity.py) and q_sim_ann_pq (llm/embedding.py)."""
    from .embedding import _pq_assignments
    from .similarity import (
        _emb,
        _emb_count,
        _flat_within,
        _two_level_within,
        assignment_two_level,
        ivf_cells_for,
    )

    n = _emb_count(spark, sf_dir)
    n_cells = ivf_cells_for(n)
    if assignment_two_level(n):
        within = _two_level_within(spark, sf_dir, n_cells)
    else:
        within = _flat_within(spark, sf_dir, n_cells)
    assigned = within.filter(F.col("rn") == 1).select("vec_id", "cell")
    # the ONE query vector's top-N_PROBE cells — a <=N_PROBE-row frame
    probed = within.filter(
        (F.col("vec_id") == QUERY_VEC_ID) & (F.col("rn") <= N_PROBE)
    ).select("cell")

    # inverted-list layout: PQ codes keyed by cell (one vec_id equi-join;
    # at scale this is the materialized index, built once)
    codes = _pq_assignments(spark, sf_dir).join(assigned, "vec_id")

    # ADC lookup table: 8 query subvectors x 16 codewords = 128 rows
    sub, cb = _pq_subframes(spark, sf_dir)
    q = sub.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "s", F.col("sub").alias("qs")
    )
    lut = cb.join(F.broadcast(q), "s").select(
        "s", "code", F.round(_sq_l2(F.col("csub"), F.col("qs")), 4).alias("d2")
    )

    topk = (
        codes.join(F.broadcast(probed), "cell")  # ONLY probed cells' codes
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(lut), ["s", "code"])
        .groupBy("vec_id", "label", "cell")
        .agg(F.round(F.sum("d2"), 4).alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(ADC_TOP_K)
    )
    return topk.select("vec_id", "label", "cell", "adc_d2")
