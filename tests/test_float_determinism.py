"""Float-determinism tripwire, static half (VERDICT r14 item 4).

The bitten class — twice now (the r14 q_graph_modularity driver red; the
reverted r14 Arrow dot experiment): a float REDUCTION computed by a
backend whose accumulation order is environment-dependent (BLAS GEMM's
thread/SIMD blocking, einsum's CPU-dispatched SIMD lane grouping) flows
into a round(..., 4) whose output gates a rank/threshold/integer.  A
1-ulp cross-environment difference at a 4-dp midpoint then flips a whole
output row, and only in environments the builder cannot see.

Repo convention: pairwise vector scoring in Python/Arrow stages goes
through the DETERMINISTIC kernels ``det_gram`` / ``det_rowdot`` /
``det_norm`` (llm/similarity.py) — fixed sequential dim-order
accumulation of IEEE-exact elementwise ops, bit-identical on every
CPU/BLAS and matching the JVM zip_with fold's operation order.  This test
statically bans the non-deterministic reduction spellings in package
source; every surviving occurrence must be allowlisted below WITH a
written invariance argument.  The dynamic half lives in
tests/test_plans.py::test_global_plan_hygiene (FLOAT_RANK_OK).
"""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "iceberg_rest_catalog_spark")

# Non-deterministic float-reduction spellings: BLAS-backed products,
# einsum-family reductions, and the infix matmul operator.
BANNED = re.compile(
    r"np\.(dot|matmul|einsum|inner|tensordot|vdot)\(|np\.linalg\.norm\(|\S\s@\s\S"
)

# (basename, exact stripped line) -> written invariance argument.
ALLOWED = {
    # Guard-band two-pass scoring (r16, VERDICT r15 item 4): this GEMM is
    # the BULK pass of gb_gram_cos only — every entry within GB_BAND
    # (1e-7 cosine units, four orders above GEMM-vs-fixed-order summation
    # noise) of a 4-dp rounding boundary is re-scored with det_rowdot and
    # overwritten, so the function's output is provably identical to
    # det_gram-everywhere on every environment.  See gb_gram_cos docstring.
    ("similarity.py", "S = Q @ M.T  # BLAS bulk pass; near-boundary entries re-scored below"):
        "guard-band two-pass: det re-score covers every near-boundary entry",
    # q_embed_pca partial covariance: the per-batch GEMM feeds
    # F.round(F.sum(s)/(n-1), 4) with NO rank; the Spark shuffle float-sum
    # over batch partials is ALREADY order-nondeterministic within one
    # environment, so the GEMM adds no new variance class — invariance
    # rests on the 4-dp round with midpoint-audited cov entries (14 rounds
    # of driver greens + per-round tools/round_midpoint_audit.py), and the
    # downstream eigen iteration is EXACT INT64 on the pre-rounded matrix.
    ("embedding.py", "S = X.T @ X"):
        "round-only sink (no rank); exact-int64 power iteration downstream",
    # Exact int64 matmul: integer accumulation is associative without
    # rounding, so any summation order yields the identical bits.
    ("embedding.py", "sv = Ci @ vi"): "exact int64 matmul — order-invariant",
}


def test_no_unadjudicated_blas_reductions():
    offenders = []
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as fh:
                for lineno, line in enumerate(fh, 1):
                    if not BANNED.search(line):
                        continue
                    # decorators / string '@' are not matmul: require the
                    # ' @ ' infix or a np.* call to have matched
                    key = (fname, line.strip())
                    if key in ALLOWED:
                        continue
                    offenders.append(f"{path}:{lineno}: {line.strip()}")
    assert not offenders, (
        "non-deterministic float reduction outside the adjudicated "
        "allowlist — use det_gram/det_rowdot/det_norm "
        "(llm/similarity.py) or add a written invariance argument:\n"
        + "\n".join(offenders)
    )


def test_allowlist_entries_still_exist():
    """An ALLOWED entry whose line vanished is stale — prune it so the
    allowlist can't silently cover future regressions."""
    seen = set()
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            with open(os.path.join(root, fname)) as fh:
                for line in fh:
                    key = (fname, line.strip())
                    if key in ALLOWED:
                        seen.add(key)
    assert seen == set(ALLOWED), f"stale allowlist entries: {set(ALLOWED) - seen}"
