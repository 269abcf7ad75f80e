"""Build bench_runs/birth_baselines.json: each headline query's FIRST
recorded per-query wall time (its "birth baseline") and the round it was
recorded in (VERDICT r7 item 6 — the 2x perf gate compares each query
against the number recorded when it first entered the bench suite).

Sources, oldest first, so the earliest appearance wins:
  1. BENCH_r0{N}.json driver artifacts — the driver captures the stdout
     TAIL, so per-query values are recovered from the line-oriented
     ``BENCH name=sec`` records and/or the final JSON object embedded in
     the tail (whichever survived the driver's byte window);
  2. bench_runs/r{N}_local_idle_*.json — locally recorded full artifacts
     (used when a query entered the suite mid-round).

Stat drift note: rounds 3-4 reported min-of-2; round 5+ report
median-of-3 (and round 7+ add an untimed warm pass).  The baseline
records which stat its number used; ratios across stats are still the
gate convention (they differ by a few %, far from the 2x threshold).

Usage: python tools/birth_baselines.py   (writes the file; commit it)
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "bench_runs", "birth_baselines.json")

# Adjudicated pin MOVES (BASELINE.md is the ledger): a written drift
# adjudication may re-pin a query whose measured steady state changed for
# a DOCUMENTED reason (e.g. a guard permanently added to the op).  The
# earliest-appearance rule below would silently revert such moves on a
# rebuild — entries here win over every source.  Keep this list short;
# the default is the dbscan precedent (pins stay at birth even after a
# speedup fix, for drift comparability).
OVERRIDES: dict[str, dict] = {
    # r15 drift adjudication: the oracle-structure guard (r14 ADVICE)
    # permanently adds two count jobs; pin reflects the new steady state.
    "q_stream_late_audit": {
        "sec": 4.704,
        "round": 15,
        "stat": "median4",
        "source": "r15 drift adjudication standalone 4-pass"
                  " (incl. the r15 oracle-structure guard)",
    },
    # r15 newborns: pinned at their STANDALONE 3-pass idle medians, not
    # the deep-warm suite-run values — the r15 adjudication established
    # that suite-context births run 1.2-1.5x low and generate recurring
    # false drift flags (the q_dq_referential lesson).
    "q_sim_graph_search": {
        "sec": 3.954, "round": 15, "stat": "median3",
        "source": "r15 newborn 3-pass idle standalone",
    },
    "q_tokenizer_bpe_apply": {
        "sec": 4.221, "round": 15, "stat": "median3",
        "source": "r15 newborn 3-pass idle standalone",
    },
    "q_stream_drift_psi": {
        "sec": 4.36, "round": 15, "stat": "median3",
        "source": "r15 newborn 3-pass idle standalone",
    },
    "q_sample_bootstrap": {
        "sec": 2.532, "round": 15, "stat": "median3",
        "source": "r15 newborn 3-pass idle standalone",
    },
    "q_sim_ann_ivf_filtered": {
        "sec": 2.466, "round": 15, "stat": "median3",
        "source": "r15 newborn 3-pass idle standalone",
    },
    # r16 adjudication (VERDICT r15 item 5): q_graph_triangles' wall is
    # variance-dominated — two same-code standalone 5-pass idle runs one
    # hour apart medianed 7.45 s and 10.44 s (samples 5.6-17.4 s) with a
    # stable interleaved control (q_agg_group 0.28-0.93 s), no
    # triangle-path commit since r13, plan pinned, and the r13 phase
    # bisect's ~3.7 s compute share re-confirmed (edge build 1.9-2.9 s).
    # The r6 pin (8.368) sat at the envelope's FAVORABLE third and
    # red-flagged host noise two rounds running.  Re-pin at the center of
    # today's measured envelope; the memory-staged edge relation (r16,
    # _MEM_STAGE_MAX_NODES) removes the small-regime disk round trip
    # going forward.  See BASELINE.md round-16 adjudication.
    "q_graph_triangles": {
        "sec": 9.5, "round": 16, "stat": "center of 2x5-pass envelope",
        "source": "r16 adjudication: medians 7.45/10.44, samples 5.6-17.4",
    },
    # r16 newborns above the tracking floor: standalone 3-pass idle
    # medians (the r15 convention — suite-context births run 1.2-1.5x
    # low and draw false drift flags).
    "q_graph_edge_audit": {
        "sec": 3.914, "round": 16, "stat": "median3",
        "source": "r16 newborn 3-pass idle standalone",
    },
    "q_text_rake": {
        "sec": 2.586, "round": 16, "stat": "median3",
        "source": "r16 newborn 3-pass idle standalone",
    },
    "q_graph_eccentricity": {
        "sec": 3.380, "round": 16, "stat": "median3",
        "source": "r16 newborn 3-pass idle standalone (wave 4)",
    },
}


def from_tail(tail: str) -> dict[str, float]:
    vals: dict[str, float] = {}
    # the final JSON object (if the window kept it) is the most complete
    for m in re.finditer(r'\{"metric":.*\}', tail):
        try:
            obj = json.loads(m.group(0))
            vals.update({k: float(v) for k, v in obj.get("queries", {}).items()})
        except ValueError:
            pass
    # line-oriented records fill anything the JSON window lost
    for m in re.finditer(r"BENCH (q_\w+|c_\w+)=([0-9.]+)", tail):
        vals.setdefault(m.group(1), float(m.group(2)))
    return vals


def main() -> None:
    birth: dict[str, dict] = {}

    rounds = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r0*.json"))):
        rnd = int(re.search(r"BENCH_r0*(\d+)\.json", p).group(1))
        try:
            d = json.load(open(p))
        except ValueError:
            continue
        rounds.append((rnd, from_tail(d.get("tail", "")), f"BENCH_r{rnd:02d}"))
    for p in sorted(glob.glob(os.path.join(REPO, "bench_runs", "r*_local_idle_*.json"))):
        rnd = int(re.search(r"r(\d+)_local_idle", p).group(1))
        d = json.load(open(p))
        # round 9+ artifacts split the frozen HEADLINE set from TRACKED
        # later additions (bench.py, VERDICT r8 item 8) — births come
        # from both.
        vals = dict(d.get("queries", {}), **d.get("tracked", {}))
        rounds.append((rnd, {k: float(v) for k, v in vals.items()},
                       os.path.basename(p)))

    # stat convention per round (see module docstring)
    stat = {1: "single", 2: "single", 3: "min2", 4: "min2"}

    for rnd, vals, src in sorted(rounds, key=lambda t: t[0]):
        for q, sec in vals.items():
            if q not in birth:
                birth[q] = {
                    "sec": sec,
                    "round": rnd,
                    "stat": stat.get(rnd, "median3"),
                    "source": src,
                }

    birth.update(OVERRIDES)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(dict(sorted(birth.items())), f, indent=1)
    print(f"wrote {OUT}: {len(birth)} queries")


if __name__ == "__main__":
    main()
