"""LLM-data-pipeline extensions (SURVEY.md §2.C, BASELINE north_star).

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + IVF), text analysis (stats, tokens,
quality, language-ID, fingerprinting) and multimodal column plumbing —
all shaped as shuffle-parallel DataFrame ops (groupBy / join / window),
never driver-side loops, so they scale from the sf fixtures to 100 TB.
"""
