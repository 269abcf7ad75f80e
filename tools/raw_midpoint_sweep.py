"""RAW rational-midpoint sweep (VERDICT r15 item 7).

tools/round_midpoint_audit.py measures how far each EXPOSED float column
sits from a 4-dp rounding midpoint — but (by design) it cannot see
PRE-ROUNDED outputs: a query that emits round(num/den, 4) exposes only
the already-quantized value, so the audit reports nothing even if the
raw quotient sits exactly ON a midpoint (the r13 q_dq_rules class:
ratios of ROUND fixture counts land exactly on .00005 boundaries and the
two engines' round() conventions then disagree).

This sweep closes that blind spot for the queries whose final float is
an EXACT-RATIONAL division of integers: for each such query a companion
SQL emits the integer (num, den) pair per output row with the convention
``output_value * 1e4 == num / den`` exactly, and the midpoint distance
is then computed EXACTLY in integer arithmetic:

    r    = |num| mod den
    dist = |2*r - den| / (2*den)        # in output*1e4 units
    ON-midpoint  <=>  2*r == den

No floats anywhere in the measurement, so the sweep itself cannot have
the error class it hunts.  Queries whose rounded ratio has a CONSTANT
denominator d are cleared analytically instead of by scan: y = h*1e4/d,
r = (h*1e4) mod d; when 1e4 % d == 0 the fraction is always 0 (distance
0.5 — maximal); otherwise distance >= 1/(2d) >> any float noise.  The
analytic notes are included in the report for the record.

Usage: python tools/raw_midpoint_sweep.py [sf_dir]   (default sf0.01)
Exit 1 if any measured distance is below TOL (or exactly on a midpoint).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_rest_catalog_spark.operators.graph import (  # noqa: E402
    LPA_ROUNDS,
    _knn_edges_ctes,
    _lpa_ctes,
)

TOL = 1e-4  # min allowed distance, in output*1e4 units (= 1e-8 output units)

_MOD_PREFIX = (
    _lpa_ctes(LPA_ROUNDS)
    + f""",
    com AS (SELECT lbl, count(*) AS n_nodes FROM l{LPA_ROUNDS} GROUP BY lbl),
    ein AS (
      SELECT lu.lbl, count(*) AS e_in
      FROM edges ed
      JOIN l{LPA_ROUNDS} lu ON ed.u = lu.node
      JOIN l{LPA_ROUNDS} lv ON ed.v = lv.node
      WHERE lu.lbl = lv.lbl GROUP BY lu.lbl),
    dg AS (SELECT u AS node, count(*) AS d FROM edges GROUP BY u),
    ds AS (
      SELECT l.lbl, sum(d.d) AS d_sum
      FROM l{LPA_ROUNDS} l JOIN dg d ON d.node = l.node GROUP BY l.lbl),
    percom AS (
      SELECT com.lbl, com.n_nodes,
             coalesce(ein.e_in, 0) AS e_in,
             coalesce(ds.d_sum, 0) AS d_sum
      FROM com LEFT JOIN ein ON ein.lbl = com.lbl
               LEFT JOIN ds ON ds.lbl = com.lbl),
    tot AS (
      SELECT (SELECT count(*) FROM edges) AS ecnt,
             sum(e_in) AS sum_e, sum(d_sum * d_sum) AS sum_d2
      FROM percom)"""
)

# name -> SQL yielding (col VARCHAR, num BIGINT, den BIGINT) rows with
# output_value * 1e4 == num/den exactly.
SWEEPS = {
    "q_graph_modularity": _MOD_PREFIX
    + """
    SELECT 'contribution' AS col,
           CAST((t.ecnt * p.e_in - p.d_sum * p.d_sum) * 10000 AS BIGINT)
             AS num,
           CAST(t.ecnt * t.ecnt AS BIGINT) AS den
    FROM percom p CROSS JOIN tot t
    UNION ALL
    SELECT 'modularity',
           CAST((t.ecnt * t.sum_e - t.sum_d2) * 10000 AS BIGINT),
           CAST(t.ecnt * t.ecnt AS BIGINT)
    FROM tot t""",
    "q_graph_jaccard_neighbors": "WITH "
    + _knn_edges_ctes()
    + """,
    deg AS (SELECT u AS node, count(*) AS deg FROM edges GROUP BY u),
    wed AS (
      SELECT e1.u AS a, e2.v AS c, count(*) AS common
      FROM edges e1 JOIN edges e2 ON e2.u = e1.v AND e1.u < e2.v
      GROUP BY e1.u, e2.v),
    nonedge AS (
      SELECT w.a, w.c, w.common
      FROM wed w LEFT JOIN edges ed ON ed.u = w.a AND ed.v = w.c
      WHERE ed.u IS NULL)
    SELECT 'jaccard' AS col,
           CAST(n.common * 10000 AS BIGINT) AS num,
           CAST(da.deg + dc.deg - n.common AS BIGINT) AS den
    FROM nonedge n
    JOIN deg da ON da.node = n.a
    JOIN deg dc ON dc.node = n.c""",
    "q_graph_clustering_coeff": "WITH "
    + _knn_edges_ctes()
    + """,
    deg AS (SELECT u AS node, count(*) AS deg FROM edges GROUP BY u),
    tri AS (
      SELECT e1.u AS node, count(*) AS triangles
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.u AND e1.v < e2.v
      JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
      GROUP BY e1.u)
    SELECT 'coeff' AS col,
           CAST(coalesce(t.triangles, 0) * 2 * 10000 AS BIGINT) AS num,
           CAST(d.deg * (d.deg - 1) AS BIGINT) AS den
    FROM deg d LEFT JOIN tri t ON t.node = d.node
    WHERE d.deg >= 2""",
    "q_graph_triangles": """
    WITH sess AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE user_id IS NOT NULL),
    s2 AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM sess),
    s AS (SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
          FROM s2 GROUP BY user_id, sid),
    e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM s a JOIN s b
        ON a.user_id < b.user_id
       AND a.s_start <= b.s_end AND b.s_start <= a.s_end),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT 'closure_rate' AS col,
           CAST((SELECT count(*) FROM tri) * 10000 AS BIGINT) AS num,
           CAST((SELECT count(*) FROM e e1 JOIN e e2 ON e2.u = e1.v)
                AS BIGINT) AS den""",
    "q_evt_srm": """
    WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    c AS (SELECT count(*) FILTER (user_id % 2 = 0) AS n_a,
                 count(*) FILTER (user_id % 2 = 1) AS n_b FROM u)
    SELECT 'chi2' AS col,
           CAST((n_a - n_b) * (n_a - n_b) * 10000 AS BIGINT) AS num,
           CAST(n_a + n_b AS BIGINT) AS den
    FROM c""",
    "q_evt_ltv": """
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL),
    anchor AS (SELECT min(d) AS d0 FROM p),
    pw AS (SELECT p.user_id, datediff('day', a.d0, p.d) // 7 AS w, p.value
           FROM p CROSS JOIN anchor a),
    fw AS (SELECT user_id, min(w) AS cohort_week FROM pw GROUP BY user_id),
    coh AS (SELECT cohort_week, count(*) AS n_users FROM fw
            GROUP BY cohort_week),
    rev AS (
      SELECT f.cohort_week, pw.w - f.cohort_week AS age_week,
             round(sum(pw.value), 4) AS rev
      FROM pw JOIN fw f USING (user_id)
      GROUP BY f.cohort_week, pw.w - f.cohort_week),
    cum AS (
      SELECT cohort_week, age_week,
             sum(rev) OVER (PARTITION BY cohort_week ORDER BY age_week
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM rev)
    SELECT 'ltv' AS col,
           CAST(round(c.cum_rev * 10000) AS BIGINT) AS num,
           CAST(h.n_users AS BIGINT) AS den
    FROM cum c JOIN coh h USING (cohort_week)""",
}

# Constant-denominator ratio columns cleared analytically (see module doc).
ANALYTIC = {
    "q_sim_recall_eval.recall": "den=3: 1e4%3=1 -> dist >= 1/6 exactly",
    "q_sim_graph_search.recall": "den=3: dist >= 1/6 exactly",
    "q_sim_ivf_pq_recall_eval.recall": "den=3: dist >= 1/6 exactly",
    "q_graph_knn_bfs (dist)": "integer output, no rounding",
    "q_embed_matryoshka.recall_at_10": "den=10 divides 1e4 -> dist = 0.5",
    "q_evt_retention_matrix.retention": "pure-LONG half-up form, no float",
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    worst = []
    bad = False
    for name, sql in SWEEPS.items():
        rows = con.execute(sql).fetchall()
        per_col: dict[str, tuple] = {}
        for col, num, den in rows:
            if not den:
                continue
            r = abs(num) % den
            on_mid = 2 * r == den
            dist = abs(2 * r - den) / (2 * den)
            cur = per_col.get(col)
            if cur is None or dist < cur[0]:
                per_col[col] = (dist, on_mid, len(rows))
        for col, (dist, on_mid, n) in per_col.items():
            worst.append(
                {
                    "query": name,
                    "col": col,
                    "n_rows": n,
                    "min_dist_1e4_units": dist,
                    "on_midpoint": on_mid,
                }
            )
            if on_mid or dist < TOL:
                bad = True
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf,
                "tol_1e4_units": TOL,
                "measured": worst,
                "analytic": ANALYTIC,
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
