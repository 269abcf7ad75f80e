"""Build the adversarial 4x boilerplate corpus behind SCALE.md's round-5
SimHash measurements, deterministically.

Three extra copies of sf0.1's documents, each with doc_ids offset by
k*10_000_000 and every 3rd token replaced by a copy marker ``cp{k}`` —
token volume scales exactly 4x, near-dup structure survives within each
copy, and cross-copy trigram similarity collapses (every trigram contains
a replaced position), so candidate structure stays per-copy. The marker is
simultaneously a 1/3-boilerplate injection: ~33% of each copy's tokens are
one shared token, the shape that collapses unigram SimHash signatures.

Usage: python tools/adversarial_corpus.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/scale_x4 (other tables symlinked).
Then e.g.:
  python - <<'PY'
  from iceberg_rest_catalog_spark import registry
  from iceberg_rest_catalog_spark.session import get_spark
  qs = registry.queries()
  print(qs["q_dedup_simhash_shingle"](get_spark(), "/tmp/scale_x4").count())
  PY
"""

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]


def build(src: str, dst: str) -> int:
    os.makedirs(dst, exist_ok=True)
    d = pq.read_table(f"{src}/documents.parquet").to_pandas()
    parts = [d]
    for k in (1, 2, 3):
        c = d.copy()
        c["doc_id"] = c["doc_id"] + k * 10_000_000
        c["text"] = c["text"].map(
            lambda t, k=k: " ".join(
                (w if i % 3 else f"cp{k}") for i, w in enumerate(str(t).split(" "))
            )
            if isinstance(t, str)
            else t
        )
        parts.append(c)
    big = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        f"{dst}/documents.parquet",
    )
    for t in TABLES:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)
    return len(big)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_x4"
    if not os.path.isdir(src):
        sys.exit(f"adversarial_corpus: source fixture dir {src!r} does not exist")
    n = build(src, dst)
    print(f"wrote {n} documents to {dst}")
