"""Trainable byte-pair-encoding tokenizer — token counting in REAL
tokenizer units instead of the whitespace/`bpe_ish` regex approximations
(`textops.doc_stats`), so token budgets (`pack_sequences`,
`export_training_shards`, `temperature_mix`) can be denominated in the
units the training job will actually see.

Training is the classic word-frequency formulation (Sennrich et al.;
the arrangement GPT-2/sentencepiece use): merge statistics depend only
on the corpus's WORD-FREQUENCY table, so the corpus-sized work is one
distributed explode + groupBy count — exactly one shuffle — and the
driver learns merges over the (bounded) word-type table, never the
corpus.  ``max_word_types`` caps the driver table by frequency rank; at
100 TB the top 50k word types carry the overwhelming mass of merge
statistics and the tail adds noise-rank merges only (documented
truncation, logged via the returned stats).

Encoding is an Arrow-batched pandas UDF (GPT-2-style rank-greedy merge
loop) with per-word memoization — natural text repeats words heavily,
so the amortized cost per token is a dict hit.  Persistence mirrors the
other model artifacts (``lm_write``): ``{path}/merges`` parquet +
``{path}/meta``, so a production pipeline trains ONCE and encodes every
batch/stream from disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel appended to every word's symbol sequence —
#: standard BPE device so merges can't cross word boundaries and a
#: word-final symbol differs from the same symbol mid-word
EOW = "</w>"

#: the word splitter (lowercase + split on non-alphanumeric, matching
#: textops.LM_TOKEN_SPLIT so LM features and BPE units share a notion
#: of "word")
WORD_SPLIT = r"[^a-z0-9']+"


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — one explode + one counted groupBy
    (map-side partials); the only corpus-sized stage of training."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT)).alias("w")
    ).filter(F.length("w") > 0)
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))


def bpe_train(
    df: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    max_word_types: int = 50_000,
) -> tuple[list[tuple[str, str]], dict]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, stats)`` — merges in rank order (most frequent
    pair first; ties broken lexicographically so training is
    DETERMINISTIC regardless of partitioning), and stats recording the
    word-type truncation so a capped run never silently reads as
    exhaustive (`log what was dropped` — the repo's no-silent-caps
    rule)."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    wc = bpe_word_counts(df, text_col)
    total_types = wc.count()
    top = (
        wc.orderBy(F.desc("cnt"), F.col("w"))
        .limit(int(max_word_types))
        .collect()
    )
    word_freq = {r["w"]: int(r["cnt"]) for r in top}
    merges = _train_merges(word_freq, num_merges)
    stats = {
        "word_types_total": int(total_types),
        "word_types_used": len(word_freq),
        "truncated": int(total_types) > len(word_freq),
        "merges_learned": len(merges),
    }
    return merges, stats


def _train_merges(word_freq: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge learning over the word-frequency table: classic
    indexed BPE — a pair→{word ids} inverted index makes each merge touch
    only the words containing the merged pair, and the per-merge argmax
    is a LAZY MAX-HEAP with stale-entry discard (r7: the earlier
    full-scan argmax was O(#pairs) per merge — fine at 1k merges, ~10¹⁰
    comparisons at a production 32k; the heap makes each merge
    O(touched·log) and 32k merges train in seconds, measured in
    BASELINE.md).  Determinism is unchanged: heap order is (-count,
    pair), i.e. count desc then pair lexicographic."""
    import heapq

    words = [list(w) + [EOW] for w in word_freq]
    freqs = list(word_freq.values())
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def add_word_pairs(i: int, sign: int) -> None:
        syms, f = words[i], freqs[i]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            c = pair_counts.get(p, 0) + sign * f
            pair_counts[p] = c
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)
                heapq.heappush(heap, (-c, p))
            # decrements don't push: the stale larger entry is discarded
            # at pop time; a pair whose count later GROWS pushes then

    for i in range(len(words)):
        add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            c = pair_counts.get(p, 0)
            if c > 0 and -negc == c:
                best = p
                break
            if c > 0:
                # stale entry for a still-live pair: re-queue its true
                # count so it stays findable (lazy decrement repair)
                heapq.heappush(heap, (-c, p))
                # the pushed entry may be the max: loop pops it next
                if heap[0] == (-c, p):
                    heapq.heappop(heap)
                    best = p
                    break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            syms = words[i]
            if best not in zip(syms, syms[1:]):
                continue
            add_word_pairs(i, -1)
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            add_word_pairs(i, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style rank-greedy merge loop for one word."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                out.append(merged)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list → ``out_col``
    (array<string>).  Arrow-batched kernel, per-word memoized; narrow
    per-row map — no shuffle, no state, streaming-safe."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    word_re = _re.compile(WORD_SPLIT)

    def _enc(texts):
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in word_re.split((t or "").lower()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    _enc.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    kernel = pandas_udf(_enc, "array<string>")
    from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import (
        LIGHT_KERNEL_MIN_BYTES,
        fan_out,
    )

    # the per-row merge loop is the expensive part, not the shuffle: fan
    # out a narrow input so the Arrow kernel runs at cluster parallelism
    # (r15; no-op on an already-wide input, streaming passes through;
    # r16: inputs under the light-kernel byte floor skip the exchange)
    return fan_out(df, min_bytes=LIGHT_KERNEL_MIN_BYTES).withColumn(
        out_col, kernel(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document token count in trained-BPE units — the budget column
    to feed ``pack_sequences`` / ``export_training_shards``."""
    enc = bpe_encode(df, merges, text_col, out_col="_bpe")
    return enc.withColumn(out_col, F.size("_bpe").cast("long")).drop("_bpe")


def bpe_write(spark, merges: list[tuple[str, str]], path: str, stats: dict | None = None) -> None:
    """Persist a trained merge list: ``{path}/merges`` = (rank, first,
    second); ``{path}/meta`` = one row (num_merges + training stats)."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, first string, second string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    s = stats or {}
    spark.createDataFrame(
        [(len(merges), int(s.get("word_types_total", -1)),
          int(s.get("word_types_used", -1)), bool(s.get("truncated", False)))],
        "num_merges int, word_types_total long, word_types_used long, truncated boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def bpe_load(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge list in rank order."""
    rows = spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    return [(r["first"], r["second"]) for r in rows]


def bpe_vocab(
    merges: list[tuple[str, str]],
    words=None,
) -> list[str]:
    """The token inventory to pair with :func:`bpe_encode` output as an
    id table, in a stable order: base symbols first (sorted), then
    merged tokens in rank order.

    ``bpe_encode`` emits raw single characters (and bare ``EOW``) for
    any character never involved in a learned merge, so the base
    alphabet must come from the CORPUS, not just the merge list —
    pass ``words`` (an iterable of word types, e.g.
    ``bpe_word_counts(df)`` keys or the training ``word_freq``) to
    cover every emittable symbol (ADVICE r6).  Without ``words`` the
    base set is merge-derived plus ``EOW`` and covers only text whose
    characters all appear in some merge; encoding OOV-character text
    against that table produces lookup misses — callers on open text
    must supply ``words`` or add a byte/char fallback alphabet."""
    base = {EOW}
    for a, b in merges:
        base.add(a)
        base.add(b)
    if words is not None:
        for w in words:
            base.update(w.lower())
    merged_tokens = [a + b for a, b in merges]
    base -= set(merged_tokens)
    return sorted(base) + merged_tokens


def tokenizer_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    lang_col: str = "lang",
    text_col: str = "text",
    token_count_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-language tokenizer FERTILITY report — tokens/word and
    tokens/char under a given tokenizer: the number a data-mix owner
    reads before setting ``temperature_mix`` weights (a language whose
    fertility is 3× English's eats 3× the token budget per word, so
    mixing by document count silently under-trains it).

    Output: ``(lang, n_docs, n_tokens, n_words, n_chars,
    tokens_per_word, tokens_per_char)`` — one row per language (NULL
    lang groups as ``'unknown'``); ratios are corpus-level
    (sum/sum, not per-doc means), rounded to ``round_to``; a language
    with zero words/chars reports NULL ratios rather than a fake 0.

    Token source, in precedence order:

    - ``token_count_col`` — a precomputed per-doc count column (e.g.
      ``bpe_token_count`` output persisted by an earlier run): the
      production shape, where encoding happened once at export time.
    - ``merges`` — a trained merge list (``bpe_load``): counts in true
      trained-BPE units via the Arrow-batched encode kernel.
    - neither — the deterministic BPE-ish regex proxy
      (``functions.text.bpe_ish_count``): same order of magnitude,
      fully SQL-replayable (the oracle-paired registry lane).

    Scale: the token source is a narrow per-row projection (regex) or
    the memoized Arrow kernel (BPE) — the report itself is ONE
    partial-aggregated groupBy on a language key whose cardinality is
    ~dozens, so the exchange carries one short row per (task, lang).
    The input is fanned out first (functions/partitioning): a few-file
    corpus scans at file-split width, which left the regex pass running
    ~3-wide on 32 cores (measured r10: 12.2× on the ×100 decade before
    the guard); at real scale the scan is already wide and the guard is
    a no-op.
    """
    from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import (
        fan_out,
    )
    from dbc_informed_socketcan_to_parquet_spark.functions.text import (
        bpe_ish_count,
        tokens,
    )

    t = F.coalesce(F.col(text_col), F.lit(""))
    if token_count_col is not None:
        # precomputed counts: no per-row text work, scan width is fine
        work = df
        n_tok = F.coalesce(F.col(token_count_col), F.lit(0)).cast("long")
    elif merges is not None:
        work = bpe_token_count(fan_out(df), merges, text_col, out_col="_n_bpe")
        n_tok = F.col("_n_bpe")
    else:
        work = fan_out(df)
        n_tok = bpe_ish_count(t).cast("long")

    grouped = work.groupBy(
        F.coalesce(F.col(lang_col), F.lit("unknown")).alias("lang")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
        F.sum(F.size(tokens(t)).cast("long")).alias("n_words"),
        F.sum(F.length(t).cast("long")).alias("n_chars"),
    )
    return grouped.select(
        "lang", "n_docs", "n_tokens", "n_words", "n_chars",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") / F.col("n_words"), round_to),
        ).alias("tokens_per_word"),
        F.when(
            F.col("n_chars") > 0,
            F.round(F.col("n_tokens") / F.col("n_chars"), round_to),
        ).alias("tokens_per_char"),
    )
