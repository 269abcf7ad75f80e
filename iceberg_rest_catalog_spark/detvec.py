"""Engine-invariant vector arithmetic for DuckDB oracle SQL.

Problem (VERDICT r15 item 2): every rank/threshold built on a rounded
cosine assumed DuckDB's ``list_cosine_similarity`` and Spark's fold
compute the same float64 value.  On the build of DuckDB we test against
they do (agreement to ~1 ulp), but the r14/r15 driver-environment red on
``q_graph_modularity`` is consistent with a foreign DuckDB build whose
vector kernel differs at the ~1e-7 level (e.g. a float32 distance
kernel) — below the fixture's tightest rank margin (2.9e-8 cosine units
on the assignment cosines, measured in the r15 verdict).

Fix: stop calling the kernel.  :func:`rewrite` textually expands every
``list_cosine_similarity`` / ``list_dot_product`` / ``list_distance``
call in an oracle into an explicit, unrolled, left-associative float64
expression over the list elements::

    list_cosine_similarity(a.emb, p.qe)
      -->  ( (a.emb)[1]*(p.qe)[1] + ... + (a.emb)[64]*(p.qe)[64] )
           / (sqrt((a.emb)[1]*(a.emb)[1] + ...) * sqrt(...))

Why this is immune: IEEE-754 float64 ``+``/``*``/``/``/``sqrt`` are
exactly specified, and an explicit expression tree fixes the operation
order — DuckDB and Spark both evaluate it without reassociation, so the
two engines produce results within ~1e-14 of each other on ANY build
(identical inputs, identical op sequence up to the documented
normalize-then-dot vs dot-then-normalize site variants, all of which
agree to a few ulps — eight orders of magnitude inside the 2.9e-8
fixture margin, vs a foreign kernel's unbounded freedom).  The Spark
side already computes cosines as fixed-order folds (``zip_with`` +
``aggregate``) or the det_* numpy kernels (llm/similarity.py), both
dim-order left-associative — the unrolled SQL is their operation-order
mirror.

Applied automatically by the ``@query`` registry decorator to every
oracle, so no oracle author has to remember it and a future operator
cannot reintroduce the kernel dependency.

Operand forms understood (everything the registered oracles use):

- a DOUBLE[] column/expression        -> ``(expr)[i]``
- ``expr::DOUBLE[]``                  -> ``CAST((expr)[i] AS DOUBLE)``
  (indexing the FLOAT list then casting the element is value-identical
  to casting the list first — float->double is exact)
- ``list_slice(expr, 1, K)``          -> prefix of K dims (recursing on
  expr), e.g. the Matryoshka truncated cosine
- a literal list ``[x, y, ...]``      -> the i-th literal inlined
"""

from __future__ import annotations

import re

DIM = 64  # embeddings.embedding dimensionality (TESTDATA.md)

_FN = re.compile(
    r"\b(list_cosine_similarity|list_dot_product|list_distance)\s*\("
)
_SLICE = re.compile(r"list_slice\((.*),\s*1\s*,\s*(\d+)\s*\)\Z", re.S)


def _split_top_args(s: str) -> list[str]:
    """Split the inside of a call's parens on top-level commas (bracket-
    and quote-aware)."""
    args, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 1
        elif c == "," and depth == 0:
            args.append(s[start:i])
            start = i + 1
        i += 1
    args.append(s[start:])
    return args


def _operand(expr: str):
    """Return (elem(i) renderer, dim-or-None) for one vector operand."""
    e = expr.strip()
    m = _SLICE.fullmatch(e)
    if m:
        inner, _ = _operand(m.group(1))
        return inner, int(m.group(2))
    if e.endswith("::DOUBLE[]"):
        base = e[: -len("::DOUBLE[]")].strip()
        return (lambda i, b=base: f"CAST(({b})[{i}] AS DOUBLE)"), None
    if e.startswith("[") and e.endswith("]"):
        elems = [x.strip() for x in _split_top_args(e[1:-1])]
        return (lambda i, el=elems: f"({el[i - 1]})"), len(elems)
    return (lambda i, b=e: f"({b})[{i}]"), None


def _dims(da, db) -> int:
    if da is not None and db is not None and da != db:
        raise ValueError(f"vector-op operand dims disagree: {da} vs {db}")
    return da or db or DIM


def _dot(ea, eb, dim: int) -> str:
    return "(" + " + ".join(f"{ea(i)}*{eb(i)}" for i in range(1, dim + 1)) + ")"


def _render(fn: str, args: list[str]) -> str:
    if len(args) != 2:
        raise ValueError(f"{fn} expects 2 args, got {len(args)}")
    ea, da = _operand(args[0])
    eb, db = _operand(args[1])
    dim = _dims(da, db)
    if fn == "list_dot_product":
        return _dot(ea, eb, dim)
    if fn == "list_cosine_similarity":
        return (
            f"({_dot(ea, eb, dim)} / (sqrt({_dot(ea, ea, dim)})"
            f" * sqrt({_dot(eb, eb, dim)})))"
        )
    # list_distance: L2 — mirrors the Spark (x-y)*(x-y) zip_with fold
    sq = " + ".join(
        f"({ea(i)}-{eb(i)})*({ea(i)}-{eb(i)})" for i in range(1, dim + 1)
    )
    return f"sqrt({sq})"


def rewrite(sql: str) -> str:
    """Expand every vector-kernel call in ``sql`` into unrolled float64
    arithmetic.  Idempotent on SQL without those calls."""
    out, pos = [], 0
    while True:
        m = _FN.search(sql, pos)
        if m is None:
            break
        i, depth, n = m.end(), 1, len(sql)
        while i < n and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "'":
                i += 1
                while i < n and sql[i] != "'":
                    i += 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced parens after {m.group(1)}")
        args = [rewrite(a) for a in _split_top_args(sql[m.end() : i - 1])]
        out.append(sql[pos : m.start()])
        out.append(_render(m.group(1), args))
        pos = i
    out.append(sql[pos:])
    return "".join(out)
