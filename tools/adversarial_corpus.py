"""Build synthetic N× scale-step corpora behind SCALE.md's measurements,
deterministically.

Documents: N-1 extra copies of the source table, each with doc_ids offset
by k*10_000_000 and every 3rd token replaced by a copy marker ``cp{k}`` —
token volume scales exactly N×, near-dup structure survives within each
copy, and cross-copy trigram similarity collapses (every trigram contains
a replaced position), so candidate structure stays per-copy. The marker is
simultaneously a 1/3-boilerplate injection: ~33% of each copy's tokens are
one shared token, the shape that collapses unigram SimHash signatures.

With ``--all-tables`` the same N× step also applies to the other
data-proportional inputs, matching how the TPC-H-ish generator itself
scales (more entities, same value distributions and time window):

- embeddings: vec_ids offset k*10_000_000, each vector cyclically rolled
  by k positions (norms and pairwise structure within a copy preserved;
  cell assignment differs across copies, so IVF/kNN candidate volume
  scales with corpus size, not with duplicate collisions);
- events: event_ids and user_ids offset k*10_000_000, timestamps kept —
  N× the users inside the SAME window, exactly the density axis the
  interval-overlap co-presence matrix is quadratic in.

Everything round-trips at the Arrow level so column types (including the
events timestamp unit) survive bit-for-bit.

Usage: python tools/adversarial_corpus.py [src_sf_dir] [dst_dir] [n_total]
           [--all-tables]
Defaults: /root/testdata/sf0.1 -> /tmp/scale_x4, n_total=4, documents only
(other tables symlinked) — the round-5 corpus, unchanged.
Round-6 decade step: python tools/adversarial_corpus.py /root/testdata/sf0.1
/tmp/scale_x10 10 --all-tables
"""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]

OFFSET = 10_000_000


def _write_like(src_path: str, dst_path: str, df: pd.DataFrame) -> None:
    """Write df with the SOURCE file's arrow schema (type round-trip)."""
    schema = pq.ParquetFile(src_path).schema_arrow
    schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False), dst_path
    )


def build_documents(src: str, dst: str, n_total: int) -> int:
    d = pq.read_table(f"{src}/documents.parquet").to_pandas()
    parts = [d]
    for k in range(1, n_total):
        c = d.copy()
        c["doc_id"] = c["doc_id"] + k * OFFSET
        c["text"] = c["text"].map(
            lambda t, k=k: " ".join(
                (w if i % 3 else f"cp{k}") for i, w in enumerate(str(t).split(" "))
            )
            if isinstance(t, str)
            else t
        )
        parts.append(c)
    big = pd.concat(parts, ignore_index=True)
    _write_like(f"{src}/documents.parquet", f"{dst}/documents.parquet", big)
    return len(big)


def build_embeddings(src: str, dst: str, n_total: int) -> int:
    d = pq.read_table(f"{src}/embeddings.parquet").to_pandas()
    parts = [d]
    for k in range(1, n_total):
        c = d.copy()
        c["vec_id"] = c["vec_id"] + k * OFFSET
        c["embedding"] = c["embedding"].map(
            lambda v, k=k: np.roll(np.asarray(v), k) if v is not None else v
        )
        parts.append(c)
    big = pd.concat(parts, ignore_index=True)
    _write_like(f"{src}/embeddings.parquet", f"{dst}/embeddings.parquet", big)
    return len(big)


def build_events(src: str, dst: str, n_total: int) -> int:
    d = pq.read_table(f"{src}/events.parquet").to_pandas()
    parts = [d]
    for k in range(1, n_total):
        c = d.copy()
        c["event_id"] = c["event_id"] + k * OFFSET
        c["user_id"] = c["user_id"] + k * OFFSET
        parts.append(c)
    big = pd.concat(parts, ignore_index=True)
    _write_like(f"{src}/events.parquet", f"{dst}/events.parquet", big)
    return len(big)


def build_long_documents(src: str, dst: str, n_rep: int) -> int:
    """Doc-LENGTH axis (VERDICT r11 item 4): same document COUNT, each
    text n_rep× LONGER.  The count-axis corpora above are structurally
    blind to per-doc super-linear terms (a |grams|×|anchors| band join
    looks linear when only doc count grows); this corpus varies exactly
    the length term.  Construction: n_rep concatenated variants of the
    doc's own tokens, every 3rd token of variant k replaced by marker
    ``lg{k}`` — gram vocabulary stays per-variant distinct (no trivial
    within-doc duplicate-gram collapse), shared-passage structure across
    near-dup docs survives inside each variant."""
    d = pq.read_table(f"{src}/documents.parquet").to_pandas()

    def stretch(t):
        if not isinstance(t, str):
            return t
        ws = t.split(" ")
        return " ".join(
            w if i % 3 else f"lg{k}"
            for k in range(n_rep)
            for i, w in enumerate(ws)
        )

    d = d.assign(text=d["text"].map(stretch))
    _write_like(f"{src}/documents.parquet", f"{dst}/documents.parquet", d)
    return len(d)


def build(src: str, dst: str, n_total: int = 4, all_tables: bool = False) -> int:
    os.makedirs(dst, exist_ok=True)
    n = build_documents(src, dst, n_total)
    scaled = {"documents"}
    if all_tables:
        build_embeddings(src, dst, n_total)
        build_events(src, dst, n_total)
        scaled |= {"embeddings", "events"}
    for t in TABLES:
        if t in scaled:
            continue
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    return n


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/tmp/scale_x4"
    n_total = int(args[2]) if len(args) > 2 else 4
    if not os.path.isdir(src):
        sys.exit(f"adversarial_corpus: source fixture dir {src!r} does not exist")
    if "--long-docs" in flags:
        os.makedirs(dst, exist_ok=True)
        n = build_long_documents(src, dst, n_total)
        for t_name in TABLES:
            link = f"{dst}/{t_name}.parquet"
            if not os.path.exists(link):
                os.symlink(f"{src}/{t_name}.parquet", link)
        print(f"wrote {n} documents to {dst} (length x{n_total})")
    else:
        n = build(src, dst, n_total, "--all-tables" in flags)
        print(
            f"wrote {n} documents to {dst} "
            f"(x{n_total}, all_tables={'--all-tables' in flags})"
        )
