"""Latent-divergence audit: re-run the full Spark-vs-DuckDB comparison on a
PERTURBED copy of the sf0.001 fixture.

The clean fixture can mask divergences where the Spark plan and the oracle
SQL differ semantically but coincide on the data at hand (the round-3
PageRank sink-node bug was exactly this shape). This tool deterministically
degrades the fixture —

- 20% of rows deleted from the TPC-H tables (dangling foreign keys),
- one whole event_type removed (sink nodes, missing funnel steps/domains),
- events given NULL user_id / value / props (anonymous events),
- documents truncated to one token / emptied / NULLed / prefixed with
  multi-byte UTF-8 / given an unknown or NULL lang,
- a slice of embeddings negated, another NULLed (missing vectors)

— then runs tools/check_queries.py against the copy. Any FAIL/ERROR is a
real latent bug, not fixture noise. Round-4 catches: divide-by-zero in the
three trigram-verify dedup ops on empty-shingle candidate pairs; a
first_byte sentinel mismatch in q_multimodal_cols; an empty-string
tokenization off-by-one in q_udtf; and from the NULL injection — NULL-text
docs all pairing up at est 1.0 in q_dedup_fuzzy (Spark's size(NULL) = -1 +
never-null concat_ws vs SQL NULL propagation), a '' vs NULL chunk in
q_doc_chunk, and len(None) crashes in both multimodal decode stages.

Usage: python tools/perturbed_check.py [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("PERTURB_SRC", "/root/testdata/sf0.001")
DST = os.environ.get("PERTURB_DST", "/tmp/perturb/sf")

if not os.path.isdir(SRC):
    sys.exit(
        f"perturbed_check: source fixture dir {SRC!r} does not exist — "
        "set PERTURB_SRC to a directory containing the ten "
        "region/nation/.../embeddings parquet fixtures"
    )

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        n = t.num_rows
        if name in ("customer", "supplier", "part", "orders", "lineitem"):
            t = t.filter(pa.array([i % 5 != 0 for i in range(n)]))
        elif name == "events":
            t = t.filter(pc.not_equal(t["event_type"], pa.scalar("click")))
            cols = t.to_pydict()
            m = t.num_rows
            for i in range(3, m, 89):
                cols["user_id"][i] = None   # anonymous events
            for i in range(5, m, 97):
                cols["value"][i] = None
            for i in range(7, m, 103):
                cols["props"][i] = None
            schema = pa.schema(
                [pa.field(f.name, f.type, nullable=True) for f in t.schema]
            )
            t = pa.table(cols, schema=schema)
        elif name == "documents":
            cols = t.to_pydict()
            for i in range(0, n, 97):
                cols["text"][i] = "single"  # < 3 tokens: shingle edge
            for i in range(11, n, 67):      # multi-byte UTF-8 (first char too)
                cols["text"][i] = "héllo wörld日本語 🎉 " + cols["text"][i]
            for i in range(1, n, 131):
                cols["text"][i] = ""        # empty doc
            for i in range(2, n, 151):
                cols["lang"][i] = "xx"      # unknown language
            for i in range(3, n, 101):
                cols["text"][i] = None      # missing document body
            for i in range(5, n, 113):
                cols["lang"][i] = None      # missing language tag
            schema = pa.schema(
                [pa.field(f.name, f.type, nullable=True) for f in t.schema]
            )
            t = pa.table(cols, schema=schema)
        elif name == "embeddings":
            cols = t.to_pydict()
            for i in range(1, n, 41):       # keep the vec_id=0 query vector
                cols["embedding"][i] = [-x for x in cols["embedding"][i]]
            for i in range(7, n, 59):
                cols["embedding"][i] = None  # missing vector
            schema = pa.schema(
                [pa.field(f.name, f.type, nullable=True) for f in t.schema]
            )
            t = pa.table(cols, schema=schema)
        pq.write_table(t, f"{DST}/{name}.parquet")


def main() -> int:
    build()
    env = dict(os.environ, CHECK_SF_DIR=DST)
    here = os.path.dirname(os.path.abspath(__file__))
    return subprocess.call(
        [sys.executable, os.path.join(here, "check_queries.py"), *sys.argv[1:]],
        env=env,
    )


if __name__ == "__main__":
    raise SystemExit(main())
