"""Corpus curation: shard layout, mixture weighting, tokenizer statistics.

Three ops that sit between a cleaned corpus and a training run:

- q_shard_assign: the webdataset/shard-creation step — a deterministic
  pseudo-random permutation (md5 order) bucketed into fixed shards, with
  per-shard size accounting. Hash-modulo assignment is the only shard
  strategy that needs NO global coordination: every writer computes its
  rows' shards locally, shards are balanced in expectation, and the same
  doc lands in the same shard on every run and any partitioning (unlike
  row_number-based striping, which needs a global sort and re-deals every
  doc whenever the corpus changes).
- q_data_mixture_temperature: temperature-scaled source weights
  (w_s ∝ share_s^α, α = 0.7) — the standard flattening used to upsample
  small domains when composing a training mixture. Reduces the corpus to
  one |sources|-row aggregate; everything after is arithmetic on that
  broadcastable table.
- q_text_bpe_pairs: the counting kernel of BPE/WordPiece vocabulary
  training — global adjacent-token-pair frequencies. One explode of
  per-doc pair lists into a count aggregate: the map side emits partial
  counts, so the shuffle carries |distinct pairs|, not |token positions|;
  top-k returns via TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.common import r4, t
from ..registry import query

N_SHARDS = 16
ALPHA = 0.7  # mixture temperature (DoReMi/unimax-style flattening)
TOP_PAIRS = 20


@query(
    "q_shard_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS toks,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
                  % {N_SHARDS} AS INT) AS shard
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           min(doc_id) AS first_doc
    FROM assigned GROUP BY shard
    """,
)
def q_shard_assign(spark, sf_dir):
    """Deterministic training-shard assignment: shard = md5(doc_id)
    prefix mod N — a coordination-free pseudo-random deal — plus the
    per-shard doc/token/char accounting a shard writer emits. The 16-bit
    hex prefix (0..65535) is well past the modulus, so shards are uniform;
    the aggregate is one map-side-combined groupBy on a 16-value key."""
    d = t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % N_SHARDS
    ).cast("int")
    return (
        d.select(
            shard.alias("shard"),
            F.size(F.split("text", " ")).alias("toks"),
            "n_chars",
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("tokens"),
            F.sum("n_chars").alias("chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@query(
    "q_data_mixture_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n_docs) AS total, sum(pow(n_docs * 1.0 / (SELECT sum(n_docs) FROM s),
                                           {ALPHA})) AS z
      FROM s
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 1.0 / total, 4) AS share,
           round(pow(n_docs * 1.0 / total, {ALPHA}) / z, 4) AS weight,
           round(pow(n_docs * 1.0 / total, {ALPHA}) / z / (n_docs * 1.0 / total),
                 4) AS upsample
    FROM s, tot
    """,
)
def q_data_mixture_temperature(spark, sf_dir):
    """Temperature-scaled mixture weights: each source's training weight is
    share^0.7 renormalized — flattens the natural distribution so small
    domains are upsampled (upsample = weight/share > 1 for small sources).

    The corpus collapses to a |sources|-row aggregate first; the
    normalizer is a 1-row aggregate of THAT table broadcast back, so no
    data-sized shuffle follows the first count."""
    s = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    # whole-frame window over the |sources|-row AGGREGATE, never the corpus
    share = F.col("n_docs") * 1.0 / F.sum("n_docs").over(Window.partitionBy())
    s = s.withColumn("share", share)
    z = s.agg(F.sum(F.pow("share", F.lit(ALPHA))).alias("z"))
    weight = F.pow("share", F.lit(ALPHA)) / F.col("z")
    return s.join(F.broadcast(z)).select(
        "source",
        "n_docs",
        r4("share").alias("share"),
        r4(weight).alias("weight"),
        r4(weight / F.col("share")).alias("upsample"),
    )


E_MAX = 3  # per-source epoch cap (UniMax's single hyperparameter)
# token budget = 14/5 (2.8x) corpus tokens — a FRACTIONAL multiplier so
# the water level lands strictly inside the capacity range and BOTH arms
# (capped small sources, level-shared large ones) are exercised at every
# fixture SF (7/13 at sf0.001, 4/16 at sf0.01, 1/19 at sf0.1); an integer
# multiple of E_MAX degenerates to everyone-capped
BUDGET_NUM, BUDGET_DEN = 14, 5


@query(
    "q_data_epochs",
    oracle=f"""
    WITH s AS (
      SELECT source, sum(len(string_split(text, ' '))) AS toks
      FROM documents GROUP BY source
    ), ranked AS (
      SELECT source, toks, {E_MAX} * toks AS cap,
             row_number() OVER (ORDER BY {E_MAX} * toks, source) AS i,
             sum({E_MAX} * toks) OVER (ORDER BY {E_MAX} * toks, source
                 ROWS UNBOUNDED PRECEDING) AS p,
             count(*) OVER () AS n,
             {BUDGET_NUM} * sum(toks) OVER () * 1.0 / {BUDGET_DEN} AS b
      FROM s
    ), flagged AS (
      SELECT *,
             CAST(min(CASE WHEN cap * (n - i + 1) + (p - cap) < b
                           THEN 1 ELSE 0 END)
                  OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS BOOLEAN)
               AS capped
      FROM ranked
    ), lvl AS (
      SELECT coalesce(sum(CASE WHEN capped THEN cap END), 0) AS p_k,
             count(*) FILTER (capped) AS k
      FROM flagged
    )
    SELECT source, CAST(toks AS BIGINT) AS toks,
           round(CASE WHEN capped THEN cap
                      ELSE (b - p_k) * 1.0 / (n - k) END, 4) AS alloc_tokens,
           round(CASE WHEN capped THEN cap
                      ELSE (b - p_k) * 1.0 / (n - k) END / toks, 4) AS epochs,
           capped
    FROM flagged, lvl
    ORDER BY source
    """,
)
def q_data_epochs(spark, sf_dir):
    """UniMax-style epoch allocation (Chung et al. 2023): spread a total
    token budget ({BUDGET_NUM}/{BUDGET_DEN}x the corpus) as UNIFORMLY as
    possible across sources, but never repeat any source more than
    E_MAX={E_MAX}
    epochs — the standard fix for temperature mixing's failure mode of
    over-repeating tiny domains.  Classic water-filling, computed
    RELATIONALLY: sources sorted by capacity ascending, a prefix-AND of
    `cap_i*(N-i+1) + P_(i-1) < B` marks the capped prefix (the
    water-filling invariant: once a source can absorb its fair share of
    the remaining budget, so can every larger one), and every uncapped
    source gets the common level (B - P_k)/(N - k).  Small sources bind
    at exactly E_MAX epochs; large ones share the remainder equally in
    TOKENS (so their epoch counts fall below E_MAX).

    Scale shape: the corpus collapses to the |sources|-row token table in
    one map-combined aggregate (the only data-sized pass); the ordering,
    prefix sums, prefix-AND and level computation are windows over that
    broadcast-sized frame.  All comparisons and prefix sums are INTEGER
    (tokens) except the budget itself — the one shared double.  The
    determinism argument is NOT that the budget is fractional (14*T/5 is
    an exact integer whenever T % 5 == 0): it is that both engines
    compute the IDENTICAL binary64 value from the same integers (exact
    up to 2^53 before the one division) and apply the same strict <, so
    the capped-prefix decision is bit-identical cross-engine even when
    the budget exactly ties a capacity; divisions happen once at output,
    rounded to 4dp.

    Reference scope: no mixture surface in the reference (Go metadata
    facade, api/router/router.go:9-55); north-star curation sibling of
    q_data_mixture_temperature (soft weights) and q_data_mixture (hard
    allocation)."""
    from pyspark.sql import Window as W

    s = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("toks"))
        .withColumn("cap", F.lit(E_MAX) * F.col("toks"))
    )
    # windows over the |sources|-row aggregate, never the corpus
    ow = W.orderBy("cap", "source")
    ranked = (
        s.withColumn("i", F.row_number().over(ow))
        .withColumn(
            "p", F.sum("cap").over(ow.rowsBetween(W.unboundedPreceding, 0))
        )
        .withColumn("n", F.count("*").over(W.partitionBy()))
        .withColumn(
            "b",
            F.lit(BUDGET_NUM)
            * F.sum("toks").over(W.partitionBy())
            * 1.0
            / F.lit(BUDGET_DEN),
        )
    )
    cond = (
        F.col("cap") * (F.col("n") - F.col("i") + 1)
        + (F.col("p") - F.col("cap"))
        < F.col("b")
    )
    flagged = ranked.withColumn(
        "capped",
        F.min(F.when(cond, 1).otherwise(0))
        .over(W.orderBy("i").rowsBetween(W.unboundedPreceding, 0))
        .cast("boolean"),
    )
    lvl = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap"))), F.lit(0)
        ).alias("p_k"),
        F.count(F.when(F.col("capped"), 1)).alias("k"),
    )
    alloc = F.when(F.col("capped"), F.col("cap")).otherwise(
        (F.col("b") - F.col("p_k")) * 1.0 / (F.col("n") - F.col("k"))
    )
    return (
        flagged.join(F.broadcast(lvl))
        .select(
            "source",
            F.col("toks").cast("long").alias("toks"),
            r4(alloc).alias("alloc_tokens"),
            r4(alloc / F.col("toks")).alias("epochs"),
            "capped",
        )
        .orderBy("source")
    )


@query(
    "q_text_bpe_pairs",
    oracle=f"""
    WITH pairs AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS pair
      FROM (SELECT string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair
    LIMIT {TOP_PAIRS}
    """,
)
def q_text_bpe_pairs(spark, sf_dir):
    """Global adjacent-token-pair frequencies, top {TOP_PAIRS} — the
    counting step a BPE/WordPiece trainer iterates. Pair lists are built
    per-doc with a higher-order transform (JVM-side, no Python), partial
    counts combine map-side, and the top-k is TakeOrderedAndProject with
    the pair string as the deterministic tiebreak."""
    d = (
        t(spark, sf_dir, "documents")
        .select(F.split("text", " ").alias("t"))
        # guard: Spark's sequence(1, 0) DESCENDS instead of returning empty
        .filter(F.size("t") >= 2)
    )
    pairs = d.select(
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "pair")
        .limit(TOP_PAIRS)
    )


N_MERGES = 8  # fixed merge-round budget (the kmeans/pagerank loop contract)


def _bpe_round_ctes(k: int) -> str:
    """One unrolled BPE merge round: pair counts from s{k-1}, the argmax
    pair t{k}, run-parity merge starts, and the re-numbered symbol table
    s{k}.  Left-to-right non-overlapping merge semantics, relationally:
    two (lhs,rhs) occurrences can only overlap when lhs = rhs (a run of
    the same symbol), where the greedy scan merges at even offsets within
    each maximal run — so `merge every occurrence` + the run-parity guard
    IS the classic sequential rule, with no sequential scan."""
    p = k - 1
    return f"""p{k} AS MATERIALIZED (
      SELECT sym AS lhs, nxt AS rhs, sum(freq) AS f FROM (
        SELECT freq, sym,
               lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM s{p})
      WHERE nxt IS NOT NULL GROUP BY sym, nxt),
    t{k} AS MATERIALIZED (SELECT lhs, rhs, f FROM p{k} ORDER BY f DESC, lhs, rhs LIMIT 1),
    m{k} AS MATERIALIZED (
      SELECT s.word, s.freq, s.pos, s.sym,
             lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt,
             t.lhs, t.rhs
      FROM s{p} s CROSS JOIN t{k} t),
    o{k} AS (
      SELECT word, pos,
             row_number() OVER (PARTITION BY word, rid ORDER BY pos) - 1 AS off
      FROM (SELECT word, pos,
                   pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS rid
            FROM m{k} WHERE sym = lhs)),
    x{k} AS (
      SELECT m.word, m.freq, m.pos, m.sym, m.lhs, m.rhs,
             CASE WHEN m.sym = m.lhs AND m.nxt = m.rhs
                       AND (m.lhs <> m.rhs OR o.off % 2 = 0)
                  THEN 1 ELSE 0 END AS start
      FROM m{k} m LEFT JOIN o{k} o ON o.word = m.word AND o.pos = m.pos),
    s{k} AS MATERIALIZED (
      SELECT word, freq,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
             CASE WHEN start = 1 THEN lhs || rhs ELSE sym END AS sym
      FROM (SELECT *, lag(start) OVER (PARTITION BY word ORDER BY pos) AS pstart
            FROM x{k})
      WHERE coalesce(pstart, 0) = 0)"""


def _bpe_train_oracle() -> str:
    ctes = [
        """w AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL)
      WHERE word <> '' GROUP BY word),
    s0 AS MATERIALIZED (
      SELECT word, freq, i AS pos, substr(word, i, 1) AS sym
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) g)"""
    ]
    selects = []
    for k in range(1, N_MERGES + 1):
        ctes.append(_bpe_round_ctes(k))
        selects.append(
            f"""SELECT CAST({k} AS INTEGER) AS step, lhs, rhs,
             lhs || rhs AS merged, CAST(f AS BIGINT) AS pair_freq,
             (SELECT CAST(sum(freq) AS BIGINT) FROM s{k}) AS tokens_after
      FROM t{k}"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + " UNION ALL ".join(selects)
        + " ORDER BY step"
    )


BPE_BATCH_M = 1  # registered contract: m=1 (exact sequential selection)


def _apply_merge(syms, wlead, lhs: str, rhs: str):
    """One relational merge application over the (word, freq, pos, sym)
    symbol table: every adjacent (lhs, rhs) occurrence fuses (for
    lhs == rhs the greedy left-to-right rule = run-offset parity),
    positions renumber.  Lazy — callers checkpoint."""
    m = syms.withColumn("nxt", F.lead("sym").over(wlead))
    if lhs == rhs:
        runs = m.filter(F.col("sym") == lhs).select(
            "word",
            "pos",
            (F.col("pos") - F.row_number().over(wlead)).alias("rid"),
        )
        off = runs.select(
            "word",
            "pos",
            (
                F.row_number().over(
                    Window.partitionBy("word", "rid").orderBy("pos")
                )
                - 1
            ).alias("off"),
        )
        m = m.join(off, ["word", "pos"], "left")
        start = (
            (F.col("sym") == lhs)
            & (F.col("nxt") == rhs)
            & (F.col("off") % 2 == 0)
        )
    else:
        start = (F.col("sym") == lhs) & (F.col("nxt") == rhs)
    m = m.withColumn("start", F.when(start, 1).otherwise(0)).withColumn(
        "pstart", F.lag("start").over(wlead)
    )
    return m.filter(F.coalesce("pstart", F.lit(0)) == 0).select(
        "word",
        "freq",
        F.row_number().over(wlead).alias("pos"),
        F.when(F.col("start") == 1, F.lit(lhs + rhs))
        .otherwise(F.col("sym"))
        .alias("sym"),
    )


def _bpe_train(
    spark, sf_dir, n_merges: int = N_MERGES, batch_m: int = 1,
    return_syms: bool = False,
):
    """Core of q_text_bpe_train with the merge-round budget and the
    SELECTION BATCH SIZE as parameters (VERDICT r10 item 5).

    batch_m = 1 is the registered contract: classic sequential BPE, one
    pair-counting shuffle per merge.  batch_m = m > 1 is the scale path
    for real vocab sizes (30k+ merges): ONE counting shuffle selects the
    top-m MUTUALLY NON-INTERFERING pairs (no shared symbol, and no
    symbol equal to an earlier pick's concatenation), which are then all
    applied before the next count — so the counting rounds drop from
    n_merges to n_merges/m.  Non-interference makes the batch exact in
    the values it records: a pair that shares no symbol with (and is not
    produced by) an earlier in-batch merge has provably identical
    adjacency counts, run structure and merge events before and after
    that merge, so each recorded pair_freq / tokens_after equals its
    sequential value.  The one semantic trade (documented, knob-gated):
    a pair CONTAINING a just-merged symbol cannot be selected until the
    next batch, so the merge ORDER can differ from strict
    highest-frequency-first across batch boundaries — the standard
    batched-trainer relaxation.

    tokens_after is maintained arithmetically (tokens -= merge events;
    events = pair_freq for lhs != rhs since occurrences can never
    overlap, and sum over runs of floor(len/2) * freq for lhs == rhs),
    removing the per-merge recount job — per batch the driver runs one
    counting TakeOrdered pull plus at most one run-length aggregate."""
    wlead = Window.partitionBy("word").orderBy("pos")

    words = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    syms = words.select(
        "word",
        "freq",
        F.posexplode(
            F.expr(
                "transform(sequence(1, char_length(word)),"
                " i -> substring(word, i, 1))"
            )
        ).alias("p0", "sym"),
    ).select("word", "freq", (F.col("p0") + 1).alias("pos"), "sym")
    syms = syms.localCheckpoint()
    tokens = int(syms.agg(F.sum("freq")).collect()[0][0])

    rows = []
    step = 0
    while step < n_merges:
        want = min(batch_m, n_merges - step)
        # one counting shuffle per BATCH; over-fetch 4x so the
        # driver-side non-interference filter can still fill the batch
        # (bounded pull: 4*want rows of (sym, nxt, f))
        cand = (
            syms.withColumn("nxt", F.lead("sym").over(wlead))
            .filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), "sym", "nxt")
            .limit(4 * want)
            .collect()
        )
        if not cand:
            break
        used: set = set()
        picked = []
        for r in cand:
            if len(picked) == want:
                break
            if r.sym in used or r.nxt in used or (r.sym + r.nxt) in used:
                continue
            picked.append((r.sym, r.nxt, int(r.f)))
            used.update((r.sym, r.nxt, r.sym + r.nxt))

        # merge events per picked pair (exact, computed at batch start —
        # valid under non-interference): lhs != rhs -> pair_freq;
        # lhs == rhs -> run parity, one bounded aggregate for all such picks
        events = {(l, r): f for l, r, f in picked if l != r}
        eq_syms = [l for l, r, _ in picked if l == r]
        if eq_syms:
            ev = (
                syms.filter(F.col("sym").isin(eq_syms))
                .withColumn(
                    "rid",
                    F.col("pos")
                    - F.row_number().over(
                        Window.partitionBy("word", "sym").orderBy("pos")
                    ),
                )
                .groupBy("word", "sym", "rid")
                .agg(F.count("*").alias("len"), F.first("freq").alias("freq"))
                .groupBy("sym")
                .agg(
                    F.sum(F.floor(F.col("len") / 2) * F.col("freq")).alias("ev")
                )
                .collect()
            )
            for r in ev:
                events[(r.sym, r.sym)] = int(r.ev)

        for lhs, rhs, fcnt in picked:
            syms = _apply_merge(syms, wlead, lhs, rhs)
            step += 1
            tokens -= events[(lhs, rhs)]
            rows.append((step, lhs, rhs, lhs + rhs, fcnt, tokens))
        syms = syms.localCheckpoint()

    out = spark.createDataFrame(
        rows,
        "step int, lhs string, rhs string, merged string,"
        " pair_freq long, tokens_after long",
    ).orderBy("step")
    if return_syms:
        # the post-merge (word, freq, pos, sym) table — q_tokenizer_bpe_apply
        # consumes it as the trained segmentation of every corpus word
        return out, syms
    return out


@query("q_text_bpe_train", oracle=_bpe_train_oracle())
def q_text_bpe_train(spark, sf_dir):
    """BPE merge TRAINING: the iterative loop between q_text_bpe_pairs
    (one round of pair counting) and q_tokenizer_apply (executing a
    finished vocabulary).  {N_MERGES} fixed rounds of the classic
    algorithm — count adjacent symbol pairs over the corpus, merge the
    most frequent pair everywhere, repeat — emitting the merge table a
    tokenizer trainer produces: per round the chosen pair, its adjacency
    frequency at selection time, and the corpus token count after the
    merge (the compression curve).  Ties break (freq DESC, lhs, rhs) —
    both engines compare strings binary, so the merge sequence is
    bit-stable.

    Scale shape: the corpus collapses ONCE to the distinct-word frequency
    table (one shuffle; Heaps'-law-bounded — vocabulary, not corpus), and
    every round runs over that word-keyed symbol table: one lead() window
    + a map-combined pair count, argmax as a TakeOrdered pull (the
    Lloyd's-iteration driver scalar), then the merge applied with literal
    lhs/rhs — window functions only, no Python in the loop,
    localCheckpoint per round (the PageRank/CC lineage discipline).
    Merge application is RELATIONAL, not a sequential scan: for
    lhs <> rhs adjacent occurrences can never overlap, so all merge; for
    lhs = rhs the greedy left-to-right rule is exactly `offset within the
    run is even` (gaps-and-islands parity) — the oracle unrolls the
    identical rounds as chained CTEs.  At real vocab sizes (30k+ merges)
    the sequencing cost is the round count, not the corpus: the
    _bpe_train batch_m knob selects the top-m non-interfering pairs per
    counting round (see its docstring for the exactness argument and the
    ordering trade); the registered query pins batch_m = {BPE_BATCH_M}
    so the oracle contract stays strictly sequential.

    Reference scope: no tokenizer surface in the reference (Go metadata
    facade, api/router/router.go:9-55); north-star LLM-pipeline operator
    completing the q_text_bpe_pairs -> q_text_bpe_train ->
    q_tokenizer_apply chain."""
    return _bpe_train(spark, sf_dir, N_MERGES, BPE_BATCH_M)


def _bpe_apply_oracle() -> str:
    """The q_text_bpe_train CTE chain extended one step: the final symbol
    table s{N_MERGES} collapses to per-word token counts, which join back
    onto the per-doc word multiset (the shared-oracle family documented
    in tools/ORACLE_SIMILARITY.md)."""
    ctes = [
        """w AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL)
      WHERE word <> '' GROUP BY word),
    s0 AS MATERIALIZED (
      SELECT word, freq, i AS pos, substr(word, i, 1) AS sym
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) g)"""
    ]
    for k in range(1, N_MERGES + 1):
        ctes.append(_bpe_round_ctes(k))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    wtok AS (SELECT word, count(*) AS k FROM s{N_MERGES} GROUP BY word),
    dw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL)
      WHERE word <> ''),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(k) AS BIGINT) AS n_bpe_tokens,
             CAST(sum(len(word)) AS BIGINT) AS n_chars
      FROM dw JOIN wtok USING (word) GROUP BY doc_id)
    SELECT doc_id, n_words, n_bpe_tokens, n_chars,
           ((n_bpe_tokens * 20000 + n_words) // (2 * n_words)) / 1e4
             AS bpe_per_word,
           ((n_chars * 20000 + n_bpe_tokens) // (2 * n_bpe_tokens)) / 1e4
             AS chars_per_token
    FROM agg ORDER BY doc_id"""
    )


@query("q_tokenizer_bpe_apply", oracle=_bpe_apply_oracle())
def q_tokenizer_bpe_apply(spark, sf_dir):
    """Apply the TRAINED BPE merge table to the corpus (VERDICT r14
    item 6): q_text_bpe_train's merge table finally has a downstream
    consumer — per document, the token count under the trained
    {N_MERGES}-merge vocabulary, alongside the whitespace token count and
    character count, plus the two ratios a tokenizer report quotes:
    BPE tokens per whitespace word and characters per BPE token (the
    compression the merges bought).  This is the fertility/compression
    audit every tokenizer change ships with.

    Scale shape: BPE segmentation is a pure function of the WORD, so the
    corpus collapses once to the Heaps'-bounded distinct-word table, the
    merge loop runs over that vocabulary (q_text_bpe_train's plan,
    window functions only), and per-doc readout is one broadcast join of
    the exploded doc words against the |vocab|-row token-count table +
    one doc-keyed aggregate — corpus rows are touched exactly twice
    (vocab build, readout join), never per merge round.  At 100 TB the
    loop cost is unchanged (vocabulary-bounded); only the two linear
    passes scale.

    Ratios use the pure-LONG half-up form ((num*20000 + den) DIV
    (2*den))/1e4 on both engines — fixture-size ratios land exactly on
    4-dp midpoints where round() diverges cross-engine (the q_dq_rules
    lesson).

    Reference scope: no tokenizer surface in the reference facade
    (api/router/router.go:9-55); completes the q_text_bpe_pairs ->
    q_text_bpe_train -> q_tokenizer_bpe_apply chain (shared CTE family
    with the train oracle, documented in tools/ORACLE_SIMILARITY.md)."""
    _, syms = _bpe_train(spark, sf_dir, N_MERGES, BPE_BATCH_M, return_syms=True)
    wtok = syms.groupBy("word").agg(F.count("*").alias("k"))
    dw = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    agg = (
        dw.join(F.broadcast(wtok), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("k").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_bpe_tokens",
        "n_chars",
        (
            F.expr("(n_bpe_tokens * 20000 + n_words) DIV (2 * n_words)") / 1e4
        ).alias("bpe_per_word"),
        (
            F.expr("(n_chars * 20000 + n_bpe_tokens) DIV (2 * n_bpe_tokens)")
            / 1e4
        ).alias("chars_per_token"),
    ).orderBy("doc_id")


VOCAB_K = 64


@query(
    "q_tokenizer_apply",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE text IS NOT NULL
    ), w2 AS (
      SELECT doc_id, word FROM w WHERE word <> ''
    ), vocab AS (
      SELECT word FROM (
        SELECT word, count(*) AS c FROM w2 GROUP BY word
        ORDER BY c DESC, word LIMIT {VOCAB_K})
    ), tok AS (
      SELECT w2.doc_id,
             CASE WHEN v.word IS NOT NULL THEN 1 ELSE len(w2.word) END AS cost,
             CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
      FROM w2 LEFT JOIN vocab v ON w2.word = v.word
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(cost) AS BIGINT) AS n_tokens,
           round(sum(oov) * 1.0 / count(*), 4) AS oov_rate
    FROM tok GROUP BY doc_id
    """,
)
def q_tokenizer_apply(spark, sf_dir):
    """Apply a corpus-derived vocabulary to the corpus — the tokenizer
    EXECUTION step that follows q_text_bpe_pairs' vocabulary TRAINING:
    in-vocab words cost 1 token, OOV words fall back to characters (the
    WordPiece/byte-fallback degradation), yielding per-doc token budget
    and OOV rate — the two numbers that size a training run and flag
    out-of-domain shards.

    Scale shape: vocab is a {VOCAB_K}-row TakeOrdered aggregate (at real
    vocab sizes, 32k-256k rows — still broadcast territory), the corpus
    joins against it BROADCAST hash (no shuffle of the exploded words by
    join key; their only shuffle is the per-doc re-aggregate keyed by
    doc_id), and everything is JVM codegen — no Python in the loop."""
    words = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "word")
        .limit(VOCAB_K)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    tok = words.join(F.broadcast(vocab), "word", "left").select(
        "doc_id",
        F.when(F.col("in_vocab").isNotNull(), 1)
        .otherwise(F.length("word"))
        .alias("cost"),
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return tok.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("cost").cast("long").alias("n_tokens"),
        r4(F.sum("oov") / F.count("*")).alias("oov_rate"),
    )


from .similarity import _lsh_bucket_sql  # noqa: E402  (shared SRP family)


@query(
    "q_caption_pairs",
    oracle=f"""
    WITH p AS (
      SELECT d.doc_id, d.text, e.embedding, {_lsh_bucket_sql()} AS bucket
      FROM documents d
      JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e
        ON d.doc_id = e.vec_id
      WHERE d.text IS NOT NULL
    ), r AS (
      SELECT doc_id, bucket, len(text) AS cap_len,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY len(text) DESC, doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT)
               AS n_candidates
      FROM p
    )
    SELECT bucket, doc_id AS kept_doc_id, cap_len, n_candidates
    FROM r WHERE rn = 1
    """,
)
def q_caption_pairs(spark, sf_dir):
    """Image-text pair curation (the LAION/DataComp dedup-and-keep-best
    step): captions join their image embeddings 1:1, near-duplicate
    images collapse into SRP-LSH buckets (visually-similar images land in
    the same sign-bit bucket), and ONE caption survives per bucket — the
    longest (proxy for richest), doc_id as tiebreak.

    Scale shape: the doc<->embedding equi-join is one co-partitionable
    shuffle (both sides keyed by id; bucketed storage makes it
    shuffle-free), the bucket key is map-only HOF arithmetic (shared with
    q_sim_lsh — srp_bucket), and keep-best is a windowed row_number over
    buckets whose size LSH bounds. No pairwise comparison ever
    materializes — the bucket IS the near-dup verdict here; chain
    q_dedup_embedding after it when exact cosine verification is needed."""
    from .similarity import _dbl, srp_bucket

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.length("text").alias("cap_len"))
    )
    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", _dbl("embedding").alias("emb"))
    )
    p = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "cap_len", srp_bucket("emb").alias("bucket")
    )
    w = Window.partitionBy("bucket")
    r = p.select(
        "bucket",
        "doc_id",
        "cap_len",
        F.row_number()
        .over(w.orderBy(F.desc("cap_len"), "doc_id"))
        .alias("rn"),
        F.count("*").over(w).alias("n_candidates"),
    )
    return r.filter(F.col("rn") == 1).select(
        F.col("bucket"),
        F.col("doc_id").alias("kept_doc_id"),
        "cap_len",
        "n_candidates",
    )


CURRICULUM_BUCKETS = 4
CURRICULUM_BLOCKS = 16


@query(
    "q_curriculum_order",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             round(n_chars * 1.0 / len(string_split(text, ' ')), 4)
               AS difficulty,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
               % {CURRICULUM_BLOCKS} AS block,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents WHERE text IS NOT NULL),
    th AS (
      SELECT round(quantile_cont(difficulty, 0.25), 4) AS t1,
             round(quantile_cont(difficulty, 0.50), 4) AS t2,
             round(quantile_cont(difficulty, 0.75), 4) AS t3
      FROM d),
    b AS (
      SELECT d.*,
             1 + CAST(difficulty > t1 AS INT) + CAST(difficulty > t2 AS INT)
               + CAST(difficulty > t3 AS INT) AS bucket
      FROM d, th),
    rn AS (
      SELECT doc_id, difficulty, bucket, block,
             row_number() OVER (PARTITION BY bucket, block
                                ORDER BY ord, doc_id) AS r
      FROM b),
    cnt AS (SELECT bucket, block, count(*) AS c FROM b GROUP BY bucket, block),
    off AS (
      SELECT bucket, block,
             sum(c) OVER (ORDER BY bucket, block
                          ROWS UNBOUNDED PRECEDING) - c AS o
      FROM cnt)
    SELECT CAST(off.o + rn.r AS BIGINT) AS step,
           CAST(rn.bucket AS INT) AS bucket, rn.doc_id, rn.difficulty
    FROM rn JOIN off ON off.bucket = rn.bucket AND off.block = rn.block
    """,
)
def q_curriculum_order(spark, sf_dir):
    """Curriculum schedule for a training run: every document gets a global
    step number such that difficulty quartile 1 streams first, then 2, 3,
    4 — but WITHIN a quartile the order is a deterministic md5 shuffle, so
    no spurious correlation (source adjacency, ingest order) leaks into
    the batch sequence. difficulty = mean chars per whitespace token, the
    cheap long-word-density proxy. Returns (step, bucket, doc_id,
    difficulty). Docs without text are unschedulable and excluded (the
    uniform text contract; Spark's size(split(NULL)) = -1 would otherwise
    diverge from SQL NULL propagation — perturbed-fixture catch).

    A global row_number is the WRONG shape at corpus scale (one partition
    sorts everything), so the step number is assembled the
    q_pack_sequences way from pieces that each stay bounded or
    distributed: (1) quartile thresholds are ONE exact-percentile
    aggregate reduced to a 3-number broadcast — the corpus is never
    globally sorted, bucket assignment is three comparisons per row; (2)
    within (bucket, md5-block) the row_number window is as parallel as
    the block count; (3) global offsets per (bucket, block) come from a
    |buckets|x|blocks|-row count aggregate cumsum'd on the driver-sized
    frame and broadcast back. step = offset + local rank: total order,
    zero global sorts, the widest window is corpus/(buckets*blocks) rows.

    Reference scope: no curation family in the reference; sibling of
    q_shard_assign (same md5-deal idiom) on the training-pipeline side.
    """
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).select(
        "doc_id",
        r4(F.col("n_chars") * 1.0 / F.size(F.split("text", " "))).alias(
            "difficulty"
        ),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int")
            % CURRICULUM_BLOCKS
        ).alias("block"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    )
    th = d.agg(
        r4(F.expr("percentile(difficulty, 0.25)")).alias("t1"),
        r4(F.expr("percentile(difficulty, 0.50)")).alias("t2"),
        r4(F.expr("percentile(difficulty, 0.75)")).alias("t3"),
    )
    b = d.join(F.broadcast(th)).select(
        "doc_id",
        "difficulty",
        "block",
        "ord",
        (
            F.lit(1)
            + (F.col("difficulty") > F.col("t1")).cast("int")
            + (F.col("difficulty") > F.col("t2")).cast("int")
            + (F.col("difficulty") > F.col("t3")).cast("int")
        ).alias("bucket"),
    )
    rn = b.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("bucket", "block").orderBy("ord", "doc_id")
        ),
    )
    cnt = b.groupBy("bucket", "block").agg(F.count("*").alias("c"))
    off = cnt.select(
        "bucket",
        "block",
        (
            F.sum("c").over(
                Window.partitionBy().orderBy("bucket", "block")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("c")
        ).alias("o"),
    )
    return rn.join(F.broadcast(off), ["bucket", "block"]).select(
        (F.col("o") + F.col("r")).cast("bigint").alias("step"),
        F.col("bucket").cast("int").alias("bucket"),
        "doc_id",
        "difficulty",
    )


@query(
    "q_sample_fixed_k",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS samp_rank,
             count(*) OVER (PARTITION BY source) AS n_stratum
      FROM documents)
    SELECT source, doc_id, samp_rank, CAST(n_stratum AS BIGINT) AS n_stratum
    FROM ranked WHERE samp_rank <= 50
    """,
)
def q_sample_fixed_k(spark, sf_dir):
    """Deterministic stratified sample: exactly min(K, |stratum|) docs per
    source, K = 50, chosen by md5-of-id order — the eval-set / ablation
    draw a curator makes from every source before a training run.

    Hash order (not ingest order, not random()) makes the draw (a)
    deterministic across engines and re-runs, (b) uniform within the
    stratum, (c) STABLE under corpus growth: a doc's md5 never changes, so
    adding new docs only ever displaces the tail of the selection, and the
    same doc_id draws identically on every run and partitioning.

    Scale shape: one shuffle on `source`, exact-K via row_number within
    each stratum. A pathologically hot stratum serializes its sort into
    one task; at 100 TB swap the exact-K gate for the hash-THRESHOLD
    variant (keep rows with md5(id) < K/|stratum| of the key space —
    map-only, approximate-K, same stability) once per-stratum exactness
    stops mattering — that variant IS the registered q_sample_stratified
    (llm/pipeline.py), whose rate table broadcasts and whose filter is
    map-only; this op is its exact-K sibling. n_stratum rides the same window, so the draw and the
    stratum size come from a single pass."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(w).alias("samp_rank"),
            F.count("*").over(Window.partitionBy("source")).alias("n_stratum"),
        )
        .filter(F.col("samp_rank") <= 50)
    )


@query(
    "q_split_assign",
    oracle="""
    WITH cl AS (
      SELECT doc_id, md5(substr(lower(coalesce(text, '')), 1, 64)) AS h
      FROM documents
    ), rep AS (
      SELECT h, min(doc_id) AS rep FROM cl GROUP BY h
    ), asg AS (
      SELECT cl.doc_id, cl.h,
             CASE WHEN CAST('0x' || substr(md5(CAST(rep.rep AS VARCHAR)), 1, 4)
                        AS INTEGER) < 52429 THEN 'train'
                  WHEN CAST('0x' || substr(md5(CAST(rep.rep AS VARCHAR)), 1, 4)
                        AS INTEGER) < 58982 THEN 'val'
                  ELSE 'test' END AS split,
             CASE WHEN CAST('0x' || substr(md5(CAST(cl.doc_id AS VARCHAR)), 1, 4)
                        AS INTEGER) < 52429 THEN 'train'
                  WHEN CAST('0x' || substr(md5(CAST(cl.doc_id AS VARCHAR)), 1, 4)
                        AS INTEGER) < 58982 THEN 'val'
                  ELSE 'test' END AS naive_split
      FROM cl JOIN rep USING (h)
    ), leaky AS (
      SELECT h, count(DISTINCT naive_split) AS ns FROM asg GROUP BY h
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(count(DISTINCT asg.h) AS BIGINT) AS clusters,
           round(count(*) * 1.0 / (SELECT count(*) FROM documents), 4)
             AS doc_share,
           CAST(count(DISTINCT CASE WHEN leaky.ns > 1 THEN asg.h END)
                AS BIGINT) AS naive_leaky_clusters
    FROM asg JOIN leaky USING (h)
    GROUP BY split ORDER BY split
    """,
)
def q_split_assign(spark, sf_dir):
    """Leakage-safe train/val/test assignment (80/10/10 by md5 threshold):
    duplicate clusters — keyed here on the boilerplate-prefix family
    (first 64 lowercased chars, the q_dedup_prefix key; swap in any
    dedup family's cluster id) — are assigned AS A UNIT by hashing the
    cluster representative (min doc_id), so two near-copies of one
    template can never straddle train and test.  The report counts, per
    split, docs / clusters / doc share, plus how many clusters a NAIVE
    per-doc hash split would have leaked across splits — the number that
    justifies cluster-aware splitting (0 for the safe split by
    construction, >0 for naive whenever any cluster has >1 member).

    Scale shape: one text-hash shuffle elects representatives (the
    q_dedup_exact plan), the split decision is a map-side md5 threshold
    (the q_sample_hash family — stable under corpus growth), and the
    report collapses to 3 rows.  The leakage flag is a second aggregate
    over the same hash key, so the whole plan rides one shuffle family."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.substring(F.lower(F.coalesce("text", F.lit(""))), 1, 64)).alias(
            "h"
        ),
    )

    def bucket(col):
        return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast(
            "int"
        )

    def split_of(col):
        b = bucket(col)
        return (
            F.when(b < 52429, "train").when(b < 58982, "val").otherwise("test")
        )

    wh = Window.partitionBy("h")
    asg = d.select(
        "doc_id",
        "h",
        split_of(F.min("doc_id").over(wh)).alias("split"),
        split_of(F.col("doc_id")).alias("naive_split"),
    ).withColumn(
        "ns", F.size(F.collect_set("naive_split").over(wh))
    )
    total = d.select(F.count("*").alias("total"))
    return (
        asg.join(F.broadcast(total))
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.count_distinct("h").cast("bigint").alias("clusters"),
            F.round(F.count("*") * 1.0 / F.first("total"), 4).alias("doc_share"),
            F.count_distinct(F.when(F.col("ns") > 1, F.col("h")))
            .cast("bigint")
            .alias("naive_leaky_clusters"),
        )
        .orderBy("split")
    )


NEYMAN_BUDGET = 200  # total sample size allocated across strata


@query(
    "q_sample_neyman",
    oracle=f"""
    WITH x AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS toks
      FROM documents
    ),
    st AS (
      SELECT source, count(*) AS n_pop,
             sum(toks) AS s, sum(toks * toks) AS q
      FROM x GROUP BY source
    ),
    sg AS (
      SELECT source, n_pop, s, q,
             sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_pop) / n_pop)
               AS sigma
      FROM st
    ),
    w AS (
      -- deterministic left fold over the SORTED per-stratum weights:
      -- order-independent of engine partial-aggregation order (ADVICE
      -- r12); matches the Spark side's aggregate(array_sort(...)) fold
      SELECT list_reduce(list_sort(list(n_pop * sigma)), (a, b) -> a + b)
               AS wtot
      FROM sg
    ),
    alloc AS (
      SELECT sg.source, sg.n_pop, sg.sigma, sg.s,
             least(sg.n_pop,
                   greatest(1, CAST(floor({NEYMAN_BUDGET} * sg.n_pop * sg.sigma
                                          / w.wtot) AS BIGINT))) AS n_alloc
      FROM sg CROSS JOIN w
    ),
    ranked AS (
      SELECT doc_id, source, toks,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM x
    ),
    samp AS (
      SELECT r.source, count(*) AS n_sampled, sum(r.toks) AS s_samp
      FROM ranked r JOIN alloc a ON a.source = r.source AND r.rk <= a.n_alloc
      GROUP BY r.source
    )
    SELECT a.source, CAST(a.n_pop AS BIGINT) AS n_pop,
           round(a.sigma, 4) AS sigma,
           CAST(a.n_alloc AS BIGINT) AS n_alloc,
           CAST(sp.n_sampled AS BIGINT) AS n_sampled,
           round(CAST(a.s AS DOUBLE) / a.n_pop, 4) AS pop_avg_toks,
           round(CAST(sp.s_samp AS DOUBLE) / sp.n_sampled, 4) AS samp_avg_toks
    FROM alloc a JOIN samp sp ON sp.source = a.source
    ORDER BY a.source
    """,
)
def q_sample_neyman(spark, sf_dir):
    """NEYMAN (optimal-allocation) stratified sampling: a fixed budget of
    {NEYMAN_BUDGET} docs is allocated across source strata proportional
    to N_h * sigma_h — high-variance strata get proportionally MORE
    sample than proportional allocation would give, the
    minimum-estimator-variance design from survey statistics (and the
    principled upgrade of q_sample_stratified's fixed per-stratum
    rates).  The sample itself is the deterministic bottom-n_h of the
    stratum by content hash, so it is reproducible across runs and
    clusters.

    Determinism: stratum moments are EXACT LONG sums (token counts are
    small integers, so Q fits long at any realistic stratum size);
    sigma, the allocation weights and floor() are one shared binary64
    expression — both engines floor the identical double.  Selection
    ranks on the portable md5 hash with doc_id tiebreak.

    Scale shape: moments are one map-combined aggregate; the allocation
    table is |strata| rows (broadcast); selection is a per-stratum
    top-n_h window — the one per-stratum sort, keyed and partitionable.
    The report is |strata| rows.

    Reference scope: no sampling surface in the reference (Go metadata
    facade, api/router/router.go:9-55); allocation sibling of
    q_sample_stratified (fixed rates) and q_sample_fixed_k (fixed k)."""
    x = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("toks")
    )
    st = x.groupBy("source").agg(
        F.count("*").alias("n_pop"),
        F.sum("toks").alias("s"),
        F.sum(F.col("toks").cast("long") * F.col("toks")).alias("q"),
    )
    sigma = F.sqrt(
        (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_pop"))
        / F.col("n_pop")
    )
    sg = st.withColumn("sigma", sigma)
    # wtot as a deterministic left fold over the SORTED |strata|-row
    # weight list — a plain F.sum's partial-aggregation addition order
    # could differ from DuckDB's sequential sum by an ulp, flipping
    # floor() at an integer boundary (ADVICE r12).  0.0 + w1 == w1
    # exactly, so the fold matches DuckDB's list_reduce pairing.
    w = sg.select((F.col("n_pop") * F.col("sigma")).alias("wi")).agg(
        F.aggregate(
            F.array_sort(F.collect_list("wi")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("wtot")
    )
    alloc = sg.join(F.broadcast(w)).withColumn(
        "n_alloc",
        F.least(
            F.col("n_pop"),
            F.greatest(
                F.lit(1),
                F.floor(
                    NEYMAN_BUDGET * F.col("n_pop") * F.col("sigma") / F.col("wtot")
                ),
            ),
        ),
    )
    ranked = x.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    samp = (
        ranked.join(
            F.broadcast(alloc.select("source", "n_alloc")), "source"
        )
        .filter(F.col("rk") <= F.col("n_alloc"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.sum("toks").alias("s_samp"))
    )
    return (
        alloc.join(samp, "source")
        .select(
            "source",
            F.col("n_pop").cast("long").alias("n_pop"),
            F.round("sigma", 4).alias("sigma"),
            F.col("n_alloc").cast("long").alias("n_alloc"),
            F.col("n_sampled").cast("long").alias("n_sampled"),
            F.round(F.col("s").cast("double") / F.col("n_pop"), 4).alias(
                "pop_avg_toks"
            ),
            F.round(
                F.col("s_samp").cast("double") / F.col("n_sampled"), 4
            ).alias("samp_avg_toks"),
        )
        .orderBy("source")
    )


SHARD_TARGET_CHARS = 32_768  # WebDataset-style shard size target


@query(
    "q_doc_shard_pack",
    oracle=f"""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents),
    s AS (
      SELECT source, doc_id, n_chars,
             CAST((cum - n_chars) // {SHARD_TARGET_CHARS} AS BIGINT) AS shard
      FROM c)
    SELECT source, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS shard_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM s GROUP BY source, shard ORDER BY source, shard
    """,
)
def q_doc_shard_pack(spark, sf_dir):
    """Training-shard PACKING (the WebDataset/tar-shard build): assign
    each document to a ~{SHARD_TARGET_CHARS}-char shard within its
    source, in deterministic doc_id order, by bucketing the running size
    prefix — shard i holds the docs whose preceding cumulative size is in
    [i*T, (i+1)*T).  The report (docs, chars, id range per shard) is what
    the downstream loader consumes as its shard manifest.

    Scale shape: ONE per-source window cumsum (keyed shuffle — sources
    partition the corpus, so no global sort) + a map-side bucketing and
    a (source, shard) aggregate.  All arithmetic exact integers.

    Reference scope: no curation surface in the reference facade
    (api/router/router.go:9-55); packing sibling of q_pack_sequences
    (token-budget packing) and q_shard_assign (hash sharding)."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = d.withColumn("cum", F.sum("n_chars").over(w)).withColumn(
        "shard", F.expr(f"(cum - n_chars) DIV {SHARD_TARGET_CHARS}")
    )
    return (
        s.groupBy("source", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "shard")
    )


# -- round-15 wave 2: deterministic Poisson bootstrap --------------------------

BOOT_B = 16  # bootstrap replicas
# Exact Poisson(1) CDF thresholds (e^-1 * sum 1/k!), written as full-
# precision literals so both engines parse the IDENTICAL doubles; the
# weight is the count of a row's appearances in a replica (Poisson
# bootstrap: multinomial resampling decomposes to independent Poisson(1)
# counts when n is large — Chamandy et al., "Estimating Uncertainty for
# Massive Data Streams", Google 2012).
_POISSON_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
)
_HASH_SCALE = 4294967296.0  # 2^32: one 8-hex md5 slice -> uniform
# One md5 digest carries FOUR independent 32-bit uniforms (128 bits / 32):
# replica b reads slice (b%4) of md5(id:b//4), so the 16 replicas draw from
# only 4 DISTINCT hash inputs per row.  That is a determinism/uniformity
# design (each replica's uniform is a disjoint digest slice), NOT a 4x
# reduction in hash evaluations — in the kept exploded plan each
# (row, replica) pair evaluates its own md5 expression (no CSE across
# exploded rows; r16 ADVICE corrected the earlier claim here).


def _boot_weight_sql(u: str) -> str:
    """CASE ladder mapping a uniform [0,1) value to a Poisson(1) count."""
    arms = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    return f"CASE {arms} ELSE 5 END"


@query(
    "q_sample_bootstrap",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, value FROM events WHERE value IS NOT NULL),
    rep AS (
      SELECT b.b, e.value,
             ('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':'
                                 || CAST(b.b // 4 AS VARCHAR)),
                             (b.b % 4) * 8 + 1, 8))::BIGINT
               / {_HASH_SCALE} AS u
      FROM ev e
      CROSS JOIN (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) b),
    reps AS (
      SELECT b, sum(wt * value) / sum(wt) AS rm
      FROM (SELECT b, value, {_boot_weight_sql("u")} AS wt FROM rep)
      GROUP BY b),
    stats AS (
      SELECT avg(rm) AS bm, stddev_samp(rm) AS bs,
             min(rm) AS lo, max(rm) AS hi
      FROM reps),
    pt AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(value) AS pm FROM ev)
    SELECT n, round(pm, 4) AS point_mean, round(bm, 4) AS boot_mean,
           round(bs, 4) AS boot_sd, round(lo, 4) AS ci_lo,
           round(hi, 4) AS ci_hi
    FROM pt CROSS JOIN stats
    """,
)
def q_sample_bootstrap(spark, sf_dir):
    """DETERMINISTIC Poisson bootstrap of the mean event value: every
    (row, replica) pair draws its resample count from the exact
    Poisson(1) CDF evaluated at a portable md5-derived uniform — the
    error bar every pipeline metric should ship with, computed WITHOUT
    randomness (re-runs and both engines agree bit-for-bit on every
    weight) and WITHOUT data movement (no resampled copies of the data
    exist — only weights).  Reports the point estimate, the
    {BOOT_B}-replica bootstrap mean and sd, and the replica envelope
    [min, max] as the CI (at B={BOOT_B} the percentile bootstrap's
    2.5/97.5 cut IS the envelope).

    Poisson bootstrap (Chamandy et al. 2012): for large n the
    multinomial resample factorizes into independent Poisson(1) counts
    per row, which is exactly what makes it single-pass and
    shuffle-free — the estimator never needs to know n in advance.

    Scale shape: ONE corpus scan exploded x{BOOT_B} (map-side, no
    pre-shuffle), map-combined into {BOOT_B} (sum wx, sum w) partials —
    the only shuffle moves {BOOT_B} x |partitions| partial rows; replica
    stats are a {BOOT_B}-row aggregate.  At 100 TB this is the textbook
    streaming-bootstrap plan: linear scan, constant state.

    Reference scope: no sampling surface in the reference facade
    (api/router/router.go:9-55); uncertainty sibling of q_sample_hash /
    q_evt_error_rate_ci."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    # Plan-shape note (measured r15, 3-pass medians at sf0.1): the
    # explode-x{BOOT_B} + 16-group hash aggregate form runs 2.4 s; a
    # "wide" variant computing all 16 weights as projection columns over
    # one scan measured 2.8 s, and binding the uniforms to columns first
    # 6.1 s — CollapseProject re-inlines such bindings, so the CASE
    # ladder's repeated hash expression cannot be CSE'd away by hand and
    # the exploded form's map-side-combined aggregate is simply the
    # cheapest evaluation schedule.  Kept: explode.
    rep = ev.select(
        "value",
        F.explode(F.array(*[F.lit(b) for b in range(BOOT_B)])).alias("b"),
        "event_id",
    ).select(
        "b",
        "value",
        (
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(event_id AS STRING),"
                " ':', CAST(b DIV 4 AS STRING))), (b % 4) * 8 + 1, 8),"
                " 16, 10) AS BIGINT)"
            )
            / _HASH_SCALE
        ).alias("u"),
    )
    w = rep.withColumn("wt", F.expr(_boot_weight_sql("u")))
    reps = w.groupBy("b").agg(
        (F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias("rm")
    )
    stats = reps.agg(
        F.avg("rm").alias("bm"),
        F.stddev_samp("rm").alias("bs"),
        F.min("rm").alias("lo"),
        F.max("rm").alias("hi"),
    )
    pt = ev.agg(
        F.count("*").cast("long").alias("n"), F.avg("value").alias("pm")
    )
    return pt.crossJoin(F.broadcast(stats)).select(
        "n",
        F.round("pm", 4).alias("point_mean"),
        F.round("bm", 4).alias("boot_mean"),
        F.round("bs", 4).alias("boot_sd"),
        F.round("lo", 4).alias("ci_lo"),
        F.round("hi", 4).alias("ci_hi"),
    )
