"""Text analysis operators: quality scoring, language ID, token counting,
document fingerprinting — the corpus-curation layer over ``documents``.

All scalar Column algebra except fingerprinting (higher-order functions);
everything stays in WholeStageCodegen.  Regexes use only syntax with
identical Java-regex / RE2 semantics so DuckDB oracles can mirror them.
"""

from __future__ import annotations

import re
from collections import Counter

try:
    # needed only by the repetition kernel lane; module-level (rather
    # than deferred like the other pandas uses in this file) because the
    # kernel UDF's string type hints resolve 'pd.Series' against MODULE
    # globals — but kept soft so importing textops on a pandas-less
    # driver still works for every non-kernel operator (r13 review)
    import pandas as pd
except ImportError:  # pragma: no cover — pandas is baked into this env
    pd = None  # type: ignore[assignment]

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.functions.checkpoints import durable_checkpoint
from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long
from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import (
    LIGHT_KERNEL_MIN_BYTES,
    fan_out,
)
from dbc_informed_socketcan_to_parquet_spark.functions.text import (
    STOPWORD_LIST,
    bpe_ish_count,
    tokens,
)


def doc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document statistics + a composite quality score.

    Quality heuristic (public-domain-style corpus filtering features):
    penalize very short docs, high punctuation density, low stopword
    density, and extreme mean word length.
    """
    # heavy per-row regex/HOF work: a single-file corpus must not run on
    # one core (functions/partitioning)
    return fan_out(df).select(F.col(id_col), *_doc_stat_cols(F.col(text_col)))


def doc_quality_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """:func:`doc_stats` + :func:`repetition_stats` in ONE shuffle-free
    projection — the full per-document quality battery as a single scan
    with no join (both column families are row-local).

    Caller warning (measured r5): if you FILTER on these columns,
    predicate pushdown substitutes the full stat DERIVATIONS into the
    filter condition (one copy per referenced column; CASE WHEN branches
    defeat codegen CSE), which is ~20× the work when ``text_col`` is
    itself an expensive expression (e.g. a scrub chain).  Materialize
    the stats first — ``.localCheckpoint(eager=False)`` locally, a table
    write at cluster scale — as :func:`~...operators.curate.curate`
    does; its semi-join went 57 s → 6 s at sf1 with the barrier."""
    t = F.col(text_col)
    return fan_out(df).select(F.col(id_col), *_doc_stat_cols(t), *_repetition_cols(t))


def _doc_stat_cols(t: Column) -> list[Column]:
    toks = tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    lowered = F.transform(toks, lambda x: F.lower(x))
    n_stop = F.size(F.filter(lowered, lambda x: x.isin(*STOPWORD_LIST)))
    tok_chars = F.aggregate(F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x)
    avg_tok_len = F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))

    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))

    quality = (
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        - F.least(digit_ratio, F.lit(0.25))
        + F.least(stop_ratio, F.lit(0.25))
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        bpe_ish_count(t).alias("n_bpe_ish"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    ]


#: Marker tokens per language for the n-gram/stopword heuristic.  Tiny by
#: design: the goal is a deterministic, cross-engine-reproducible signal,
#: not a production langid model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "una"),
}


def _marker_score(text_lower: Column, words: tuple[str, ...]) -> Column:
    """Count of marker-word occurrences, word-bounded."""
    padded = F.concat(F.lit(" "), F.regexp_replace(text_lower, r"[^a-zÀ-ɏ一-鿿]+", " "), F.lit(" "))
    score: Column = F.lit(0)
    for w in words:
        # occurrences of " w " — overlapping not possible for distinct words
        hits = (F.length(padded) - F.length(F.replace(padded, F.lit(f" {w} "), F.lit("")))) / F.lit(len(w) + 2)
        score = score + hits.cast("int")
    return score


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK char detection + stopword-marker voting.

    Returns (id, predicted_lang, score).  Deterministic tie-break: higher
    score wins, then lexicographic language code.
    """
    t = F.lower(F.col(text_col))
    has_cjk = F.regexp_count(F.col(text_col), F.lit("[一-鿿]")) > 0
    codes = sorted(LANG_MARKERS)
    # Expression-shape note (measured 30 s → 1 s on 5k docs): the marker
    # scores live in ONE array evaluated unconditionally, and the heavy
    # subtrees never appear inside a CASE *branch* — large branch
    # expressions force a codegen fallback to interpreted evaluation,
    # which re-evaluates every subtree with no sharing.  The CASE here
    # selects only a small integer index; array_position also gives the
    # first-lexicographic-code tie-break for free.
    scores_arr = F.array(*[_marker_score(t, LANG_MARKERS[c]) for c in codes])
    best = F.array_max(scores_arr)
    pos = F.array_position(scores_arr, best).cast("int")
    lits = F.array(F.lit("zh"), F.lit("unknown"), *[F.lit(c) for c in codes])
    idx = F.when(has_cjk, F.lit(1)).when(best <= 0, F.lit(2)).otherwise(pos + 2)
    pred = F.element_at(lits, idx)
    # CJK sentinel via greatest() (both operands unconditional); marker
    # counts are bounded by ~len/4 ≤ ~5k per word, far below the sentinel
    score = F.greatest(best, F.when(has_cjk, F.lit(1_000_000)).otherwise(F.lit(0))).cast("int")
    return fan_out(df).select(F.col(id_col), pred.alias("predicted_lang"), score.alias("lang_score"))


def doc_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_chars: int = 4096,
) -> DataFrame:
    """Winnowing fingerprints: k-gram hashes → per-window minimum →
    distinct set (public winnowing scheme: Schleimer/Wilkerson/Aiken).

    Physical shape: position explode + codegen'd substring/md5 (see
    operators/dedup.shingle_hashes for why not HOF arrays), then the
    sliding minimum as a ``min() OVER (PARTITION BY doc ORDER BY pos ROWS
    BETWEEN CURRENT ROW AND window-1 FOLLOWING)`` — one shuffle on the
    doc id, sort is per-document local.
    """
    from pyspark.sql import Window

    t = F.substring(F.lower(F.col(text_col)), 1, max_chars)
    positions = F.sequence(F.lit(1), F.length(t) - F.lit(k - 1))
    hashed = (
        fan_out(df.filter(F.length(t) >= k))
        .select(F.col(id_col), t.alias("_t"), F.explode(positions).alias("_i"))
        .select(
            F.col(id_col),
            (F.length(F.col("_t")) - F.lit(k - 1)).alias("_np"),
            F.col("_i"),
            md5_long(F.col("_t").substr(F.col("_i"), F.lit(k))).alias("_h"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("_i").rowsBetween(Window.currentRow, window - 1)
    return (
        hashed.withColumn("_m", F.min("_h").over(w))
        .filter(F.col("_i") <= F.col("_np") - F.lit(window - 1))
        .select(F.col(id_col), F.col("_m").alias("fingerprint"))
        .distinct()
    )


# -- repetition metrics (Gopher-style quality rules) -------------------------

def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics — the curation rules that catch
    boilerplate and spam which length/punctuation heuristics miss:

    - ``dup_line_ratio``: fraction of lines that are repeats of an
      earlier identical line.
    - ``top_bigram_ratio``: fraction of all word-bigram occurrences taken
      by the single most frequent bigram.

    Both metrics are ROW-LOCAL — no explode, no shuffle: duplicate lines
    via ``size − size(array_distinct)``; the modal bigram via
    ``array_sort`` + a max-run-length fold (the mode of an array is the
    longest run after sorting).  Earlier rounds exploded the bigrams
    through two decomposable groupBys — correct, but it shuffled one row
    per bigram OCCURRENCE (~700× the document count) where this form
    shuffles nothing; on 100 TB that explode is the whole cost.
    """
    return fan_out(df).select(
        F.col(id_col),
        *_repetition_cols(F.col(text_col)),
    )


def _repetition_cols(t: Column) -> list[Column]:
    """dup_line_ratio / top_bigram_ratio as row-local expressions."""
    lines_arr = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines_arr)
    dup_lines = n_lines - F.size(F.array_distinct(lines_arr))
    dup_ratio = F.when(n_lines > 0, dup_lines.cast("double") / n_lines).otherwise(F.lit(0.0))

    toks = tokens(F.lower(t))
    n_keep = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n_keep), F.slice(toks, 2, n_keep),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    # modal count = longest run of equals in the sorted array; the fold
    # state is (prev, current run, best run).  x == NULL-prev is NULL →
    # the otherwise(1) branch starts the first run correctly.
    srt = F.array_sort(bigrams)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(srt, init, step, lambda acc: acc["best"])
    n_bigrams = F.size(bigrams)
    top_ratio = F.when(n_bigrams > 0, top.cast("double") / n_bigrams).otherwise(F.lit(0.0))
    return [
        F.round(dup_ratio, 6).alias("dup_line_ratio"),
        F.round(top_ratio, 6).alias("top_bigram_ratio"),
    ]


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    kernel: bool = True,
    dup_char: bool = False,
) -> DataFrame:
    """The FULL published Gopher repetition battery (Rae et al. 2021,
    Table A1) per document — the within-doc boilerplate signals that
    :func:`repetition_stats` samples (dup lines, top bigram) completed
    to the paper's table (r12):

    - ``dup_line_frac`` / ``dup_line_char_frac``: fraction of non-blank
      lines that repeat an earlier identical line, and the fraction of
      line characters contributed by those repeat occurrences.
    - ``dup_para_frac`` / ``dup_para_char_frac``: the same on blank-line
      separated paragraphs (``\\n{2,}``).
    - ``top_{n}gram_char_frac`` for n in ``top_ns``: characters covered
      by the single most frequent word n-gram (count × gram length over
      the space-joined token stream's length, clamped at 1 — the paper
      marks chars overlap-aware; self-overlapping grams overcount).
      Ties break to the lexicographically smallest gram in both engines.
    - ``dup_{n}gram_frac`` for n in ``dup_ns``: fraction of n-gram
      OCCURRENCES that repeat an earlier identical n-gram.  (The paper
      marks duplicated characters overlap-aware; this count-based form
      keeps the operator row-local and is the common reimplementation —
      the thresholds just shift.)

    Scale: every metric is ROW-LOCAL — two chained shuffle-free
    projections, no explode, no groupBy, 15 columns in a single corpus
    scan.  The modal n-gram comes from the same sorted-run fold as
    :func:`repetition_stats`, extended to carry the argmax gram so its
    character length is available (the mode of an array is the longest
    run after sorting; strict ``>`` keeps the first = smallest gram on
    ties).  On 100 TB the alternative explode+groupBy shape shuffles one
    row per n-gram occurrence per n — ~6 000× the document count for
    the nine n values here — where this form shuffles nothing.

    ``kernel=True`` (default, r13) computes the battery in ONE
    Arrow-batched struct UDF — a single Python pass per document with
    C-backed Counter/set gram counting — instead of the interpreted
    higher-order-function battery (~12 gram-array walks per row; the
    expression lane survives as ``kernel=False``, the shape the DuckDB
    oracle replays term-for-term).  Both lanes produce bit-identical
    values: the kernel mirrors every arithmetic step (int counts, one
    final double division) and the ``round(…, 6)`` wrapper is applied
    Spark-side in both, so parity is by construction, and pinned in
    ``tests/test_corpus_ops.py::test_gopher_repetition_kernel_parity``.

    ``dup_char=True`` (kernel-only) appends the PAPER's duplicated-
    character fraction per dup-n (``dup_{n}gram_char_frac``) — Table
    A1's thresholds measure characters inside duplicated n-grams, not
    occurrence counts — in the reference reproduction's semantics
    (repeated non-overlapping occurrences only; first occurrence free —
    see :func:`_doc_repetition`, r14); the gate
    (:func:`gopher_repetition_flags`) thresholds the char-frac columns.

    The expression lane's two-stage shape is load-bearing: higher-order
    functions are evaluated interpreted (no codegen subexpression
    elimination across output columns), so a single projection would
    re-split the text for every one of the 15 columns (measured ~10×
    slower at sf0.1: 34.8 s vs 3.4 s warm).  Catalyst's CollapseProject
    keeps the stages separate because the aliases are referenced by
    multiple non-cheap expressions.
    """
    if kernel:
        names = _metric_names(top_ns, dup_ns, dup_char)
        udf = _repetition_kernel_udf(top_ns, dup_ns, dup_char)
        staged = fan_out(df).select(
            F.col(id_col), udf(F.col(text_col)).alias("_rep"))
        return staged.select(
            F.col(id_col),
            *[F.round(F.col("_rep")[n], 6).alias(n) for n in names],
        )
    if dup_char:
        raise ValueError("dup_char requires the kernel lane (kernel=True)")
    # stage one: every split/gram/sort array ONCE per row, as attributes
    staged = fan_out(df).select(
        F.col(id_col),
        *_repetition_stage_cols(text_col, top_ns, dup_ns),
    )
    return staged.select(
        F.col(id_col), *_repetition_metric_cols(top_ns, dup_ns),
    )


def _repetition_stage_cols(text_col: str, top_ns, dup_ns) -> list[Column]:
    """Stage-one arrays for the repetition battery (evaluate-once
    attributes: lines, paragraphs, joined-token char count, sorted gram
    lists for the top rules, gram lists for the dup rules)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.lower(t))

    def grams(nn: int) -> Column:
        # ascending index list filtered to the valid window starts —
        # never sequence(1, k) directly: Spark's sequence DESCENDS when
        # k < 1, fabricating grams on short docs
        k = F.size(toks) - F.lit(nn - 1)
        idx = F.filter(
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
            lambda i: i <= k,
        )
        return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, nn), " "))

    return [
        F.filter(F.split(t, "\n"),
                 lambda x: F.length(F.trim(x)) > 0).alias("_ls"),
        F.filter(F.split(t, r"\n{2,}"),
                 lambda x: F.length(F.trim(x)) > 0).alias("_ps"),
        F.length(F.array_join(toks, " ")).alias("_tc"),
        *[F.array_sort(grams(nn)).alias(f"_s{nn}") for nn in top_ns],
        *[grams(nn).alias(f"_g{nn}") for nn in dup_ns],
    ]


def _repetition_metric_cols(top_ns, dup_ns) -> list[Column]:
    """Stage-two metric expressions over the staged attributes."""
    total_chars = F.col("_tc")

    def _seg_cols(arr: Column, name: str) -> list[Column]:
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        ch = F.aggregate(F.transform(arr, F.length), F.lit(0), lambda a, x: a + x)
        chd = F.aggregate(
            F.transform(F.array_distinct(arr), F.length), F.lit(0), lambda a, x: a + x
        )
        return [
            F.round(
                F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0)), 6
            ).alias(f"dup_{name}_frac"),
            F.round(
                F.when(ch > 0, (ch - chd).cast("double") / ch).otherwise(F.lit(0.0)), 6
            ).alias(f"dup_{name}_char_frac"),
        ]

    def _top_char_frac(nn: int) -> Column:
        srt = F.col(f"_s{nn}")
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("bg"),
        )

        def step(acc: Column, x: Column) -> Column:
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            better = run > acc["best"]
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, x).otherwise(acc["bg"]).alias("bg"),
            )

        res = F.aggregate(
            srt, init, step,
            lambda acc: F.struct(acc["best"].alias("best"), acc["bg"].alias("bg")),
        )
        # count × gram length over doc length, clamped at 1: overlapping
        # occurrences ("w w w…") overcount vs the paper's char-marking
        frac = F.when(
            (res["best"] > 0) & (total_chars > 0),
            F.least(
                F.lit(1.0),
                (res["best"] * F.length(res["bg"])).cast("double") / total_chars,
            ),
        ).otherwise(F.lit(0.0))
        return F.round(frac, 6).alias(f"top_{nn}gram_char_frac")

    def _dup_gram_frac(nn: int) -> Column:
        g = F.col(f"_g{nn}")
        n = F.size(g)
        frac = F.when(
            n > 0, (n - F.size(F.array_distinct(g))).cast("double") / n
        ).otherwise(F.lit(0.0))
        return F.round(frac, 6).alias(f"dup_{nn}gram_frac")

    return [
        *_seg_cols(F.col("_ls"), "line"),
        *_seg_cols(F.col("_ps"), "para"),
        *[_top_char_frac(nn) for nn in top_ns],
        *[_dup_gram_frac(nn) for nn in dup_ns],
    ]


# -- Arrow kernel lane for the repetition battery (r13) ----------------------

#: Java-regex ``\s`` is the ASCII class ``[ \t\n\x0b\f\r]`` (no UNICODE
#: flag in Spark's split) — Python's ``\s`` on str is Unicode-wide, so the
#: kernel spells the class out to match the expression lane exactly.
_JAVA_WS_RE = re.compile("[ \t\n\x0b\f\r]+")
_PARA_SPLIT_RE = re.compile(r"\n{2,}")
#: control characters that can survive the whitespace split INSIDE a
#: token and sort below the space joiner (0x20) — the only case where
#: comparing token tuples diverges from comparing space-joined gram
#: strings (see the tie-break note in :func:`_doc_repetition`)
_SUB_SPACE_CTRL_RE = re.compile("[\x00-\x08\x0e-\x1f]")


def _seg_fracs(arr: list[str]) -> tuple[float, float]:
    """(dup fraction, dup char fraction) over a line/paragraph list —
    the kernel twin of ``_seg_cols`` (``array_distinct`` = ``set``;
    ``F.length`` and ``len`` both count code points)."""
    n = len(arr)
    if n == 0:
        return 0.0, 0.0
    uniq = set(arr)
    ch = sum(map(len, arr))
    chd = sum(map(len, uniq))
    return (
        (n - len(uniq)) / n,
        (ch - chd) / ch if ch > 0 else 0.0,
    )


def _doc_repetition(
    t: str | None,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
    dup_char: bool,
) -> list[float]:
    """UNROUNDED battery metrics for one document — every arithmetic step
    mirrors the expression lane operation-for-operation (int counts, one
    final double division) so the pre-round doubles are bit-identical
    and the Spark-side ``round(…, 6)`` wrapper lands on the same values.

    Tie-break parity: the expression lane takes the first max-run gram
    of the ``array_sort``-ed gram array, and Spark's string order is
    UTF8String's BYTEWISE compare = code-point order — identical to
    Python ``str`` comparison on the joined gram.  Tokens cannot
    contain the split class itself, so the space joiner (0x20) is
    normally below every token byte and comparing token TUPLES equals
    comparing the joined strings; the single exception is a token
    carrying a control char < 0x20 (``_SUB_SPACE_CTRL_RE``), where the
    joined order can flip — detected once per document (one C-speed
    regex scan) and routed to an exact joined-string tie-break.

    ``dup_char=True`` appends the paper's duplicated-CHARACTER fraction
    per dup-n (Rae et al. 2021 Table A1 measures characters inside
    duplicated n-grams, not occurrence counts), in the REFERENCE
    reproduction's form (DataTrove ``find_all_duplicate``, the lineage
    Table A1's thresholds are calibrated against): a left-to-right walk
    that counts only REPEATED occurrences — the first occurrence of a
    gram is never counted — and skips ``n`` tokens past each counted
    repeat so counted spans never overlap.  (Through r13 this counted
    ALL occurrences of any gram seen ≥2, interval-unioned — systematically
    more aggressive than the thresholds assume on gram-repetitive docs,
    e.g. ``"w "×12`` scored 1.0 vs ~0.78 here; r14 review fix.)  Char
    unit stays the single-space-joined token stream on both sides of the
    division — gram chars include internal joiners, the denominator is
    the joined stream length — consistent with every other char-frac in
    the battery.  Kernel-only — no row-local Column algebra can walk
    with a data-dependent skip.
    """
    if t is None:
        t = ""
    out: list[float] = []
    out.extend(_seg_fracs([x for x in t.split("\n") if x.strip(" ")]))
    out.extend(_seg_fracs([x for x in _PARA_SPLIT_RE.split(t) if x.strip(" ")]))
    toks = [w for w in _JAVA_WS_RE.split(t.lower().strip(" ")) if w]
    ntok = len(toks)
    total_chars = (sum(map(len, toks)) + ntok - 1) if ntok else 0
    ctrl = _SUB_SPACE_CTRL_RE.search(t) is not None
    for nn in top_ns:
        if ntok - nn + 1 <= 0 or total_chars <= 0:
            out.append(0.0)
            continue
        cnt = Counter(zip(*(toks[k:] for k in range(nn))))
        best = max(cnt.values())
        if ctrl:
            bg = min((g for g, c in cnt.items() if c == best),
                     key=" ".join)
        else:
            bg = min(g for g, c in cnt.items() if c == best)
        glen = sum(map(len, bg)) + nn - 1
        out.append(min(1.0, (best * glen) / total_chars))
    if dup_char:
        # char offset of token i in the joined stream is cum[i] + i
        cum = [0] * (ntok + 1)
        acc = 0
        for i, w in enumerate(toks):
            acc += len(w)
            cum[i + 1] = acc
    for nn in dup_ns:
        m = ntok - nn + 1
        if m <= 0:
            out.append(0.0)
            if dup_char:
                out.append(0.0)
            continue
        grams = list(zip(*(toks[k:] for k in range(nn))))
        if not dup_char:
            out.append((m - len(set(grams))) / m)
            continue
        out.append((m - len(set(grams))) / m)
        # reference walk (DataTrove find_all_duplicate): count only the
        # chars of REPEATED occurrences, skipping n past each counted
        # repeat so counted spans never overlap; first occurrences are
        # free.  Gram char length in joined-stream units: cum span + the
        # nn-1 internal joiners.
        seen: set = set()
        covered = 0
        i = 0
        while i < m:
            g = grams[i]
            if g in seen:
                covered += cum[i + nn] - cum[i] + nn - 1
                i += nn
            else:
                seen.add(g)
                i += 1
        out.append(covered / total_chars if total_chars > 0 else 0.0)
    return out


def _repetition_kernel_udf(
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
    dup_char: bool = False,
):
    """Arrow-batched struct UDF computing the whole battery in one pass
    (Counter/set are C-backed; one Python iteration per document instead
    of ~20 interpreted higher-order-function walks per row — measured
    r13 vs the expression lane: see SURVEY §17)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    if pd is None:  # pragma: no cover
        raise ImportError(
            "the repetition kernel lane needs pandas (Arrow-batched UDF); "
            "install pandas or use gopher_repetition(kernel=False)")
    top_ns, dup_ns = tuple(top_ns), tuple(dup_ns)
    names = _metric_names(top_ns, dup_ns, dup_char)
    schema = StructType([StructField(n, DoubleType(), False) for n in names])

    @F.pandas_udf(schema)
    def battery(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_doc_repetition(t, top_ns, dup_ns, dup_char) for t in texts],
            columns=names,
            dtype="float64",
        )

    return battery


# -- PII scrubbing -----------------------------------------------------------

#: Conservative public patterns: emails, international-ish phone numbers,
#: IPv4 addresses.  Java-regex syntax restricted to the RE2-compatible
#: subset so a DuckDB oracle can mirror the rewrite exactly.
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace emails / phone numbers / IPv4 literals with typed tags.

    Pure ``regexp_replace`` chain — JVM-side, codegen'd, order fixed
    (emails first so their digits don't half-match the phone pattern).
    """
    c = F.col(text_col)
    for pat, tag in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return df.withColumn(out_col or text_col, c)


def pii_report(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document PII inventory — what :func:`scrub_pii` WOULD rewrite,
    counted before anyone mutates the text (the compliance report a
    curation run publishes to decide whether scrubbing suffices or the
    document must drop).

    Returns ``(id_col, n_emails, n_phones, n_ips, n_pii)``.  Counting
    follows scrub's sequential-masking order exactly: emails are counted
    on the raw text and masked before the phone pattern runs (so an
    email's digit run can never double-count as a phone), phones are
    masked before IPs.  Pure ``regexp_count``/``regexp_replace``
    projection — JVM-side, codegen'd, no shuffle, and the patterns stay
    in the RE2-compatible subset so a DuckDB oracle mirrors the chain.
    """
    t = F.col(text_col)
    counts = []
    for pat, tag in _PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("int"))
        t = F.regexp_replace(t, pat, tag)
    n_emails, n_phones, n_ips = counts
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        (n_emails + n_phones + n_ips).alias("n_pii"),
    )


# -- n-gram LM quality scoring (CCNet-style) ---------------------------------

#: token split used by the LM — lowercase alnum/apostrophe runs.  Kept as a
#: module constant so the DuckDB oracle renders the identical regex.
LM_TOKEN_SPLIT = r"[^a-z0-9']+"


def _lm_tokens(text_col: str) -> "Column":
    """array<string> of non-empty lowercase tokens."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), LM_TOKEN_SPLIT), lambda t: t != F.lit("")
    )


def _lm_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — consecutive token pairs, built array-side (one
    slice+zip per doc, one explode) instead of a positional self-join.

    The explode multiplies rows by the per-doc token count, so the input
    is fanned out to cluster parallelism first (r15; no-op on an
    already-wide scan, guards the one-file fixture/landing case).

    The token array is materialized ONCE in a projection between the
    exchange and the Generate (r16): inlined into the generator, the
    split/lower/filter chain appeared 4× in the explode expression (two
    slices + two size() bounds), and Generate evaluates its generator
    without the codegen subexpression elimination a Project gets —
    measured 0.97 s → 0.49 s on frequent_ngrams at sf0.1 (identical
    rows).  The exchange also carries only (id, text) now."""
    toked = fan_out(
        df.select(F.col(id_col), F.col(text_col)),
        min_bytes=LIGHT_KERNEL_MIN_BYTES,
    ).select(F.col(id_col), _lm_tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    n_keep = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(toks, 1, n_keep).alias("w1"),
        F.slice(toks, 2, n_keep).alias("w2"),
    )
    return (
        toked.select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(F.col(id_col), F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def train_bigram_lm(corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Train an add-one-smoothed bigram LM on a corpus slice.

    Returns ``(bigram_counts, context_counts, vocab_size)`` where
    ``bigram_counts`` is (w1, w2, c12), ``context_counts`` is (w1, c1 =
    number of bigrams starting with w1), and ``vocab_size`` is the
    corpus-wide distinct token count — so
    ``P(w2|w1) = (c12 + 1) / (c1 + V)`` is a proper conditional
    (sums to 1 over the smoothed vocab).

    Scale: ONE hash aggregation over the exploded bigrams (map-side
    partials); context counts re-aggregate the already-counted bigram
    table — sum(c12) group by w1 — instead of a second pass over the raw
    explode; V is one countDistinct over tokens.  In production,
    threshold to the top-V bigrams so the score join broadcasts — the
    full tables are kept here for oracle parity.
    """
    bg = _lm_bigrams(corpus, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c1 = Σ_w2 c12(w1, w2): exact, and aggregates the (small) counted
    # table rather than re-exploding the corpus
    context_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab_size = (
        fan_out(corpus).select(F.explode(_lm_tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    return bigram_counts, context_counts, vocab_size


def lm_score(
    df: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-document n-gram LM quality score (the CCNet / Wikipedia-LM
    filter shape): average bigram log-probability under an add-one
    bigram LM trained on ``corpus`` (default: ``df`` itself — in
    production, train on a trusted reference slice and score the crawl).

    Output: ``(id_col, n_bigrams, avg_logp, perplexity)`` for every doc
    with ≥ 1 bigram; higher ``avg_logp`` (lower perplexity) = more
    reference-like text.  Unknown bigrams back off to the add-one floor
    ``1 / (c1 + V)`` (or ``1 / V`` for unseen contexts), so OOV-heavy
    gibberish scores low — exactly the filtering signal.

    Scale: score = one bigram explode over the scored set + a join
    against the LM tables on (w1, w2) then w1 — with ``broadcast_lm``
    the (top-V, thresholded) LM broadcasts and the score pass is
    join-shuffle-free; the aggregate is one groupBy(doc) with map-side
    partials.  Floats are rounded to ``round_to`` decimals so the score
    is engine-reproducible (ln() differs in the last ulp across libms).
    """
    bg = None
    if corpus is None:
        # self-scoring (train ON the scored set): the training counts and
        # the scoring pass consume the SAME exploded bigram table, so
        # materialize it once (lazy localCheckpoint — the DSIR
        # cache_features arrangement) instead of exploding the corpus
        # twice (r15: one full tokenize+explode pass removed).
        bg = _lm_bigrams(df, id_col, text_col).localCheckpoint(eager=False)
        bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        vocab_size = (
            fan_out(df).select(F.explode(_lm_tokens(text_col)).alias("w"))
            .agg(F.countDistinct("w").alias("v"))
            .collect()[0]["v"]
        )
    else:
        bigram_counts, _, vocab_size = train_bigram_lm(corpus, text_col, id_col)
    # the counted table feeds both the context re-aggregation and the
    # score join — materialize it ONCE via a lazy localCheckpoint (unlike
    # .cache(), the checkpoint RDD is GC-cleaned with the plan, so a
    # caller that wraps/filters the result — curate()'s LM gate — cannot
    # leak a session-lifetime cache entry), and derive the context counts
    # FROM the checkpointed frame so they share the materialization
    bigram_counts = bigram_counts.localCheckpoint(eager=False)
    context_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return _lm_score_with(
        df, bigram_counts, context_counts, vocab_size,
        id_col, text_col, round_to, broadcast_lm, bg=bg,
    )


def _lm_score_with(
    df: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    id_col: str,
    text_col: str,
    round_to: int,
    broadcast_lm: bool,
    bg: DataFrame | None = None,
) -> DataFrame:
    """Scoring half shared by :func:`lm_score` (inline-trained LM) and
    :func:`lm_score_from` (persisted LM) — identical join + aggregate, so
    the two paths are score-identical by construction (pytest-pinned).
    ``bg`` (optional) supplies an already-materialized bigram table for
    the self-scoring case so the explode is not recomputed."""
    if broadcast_lm:
        bigram_counts = F.broadcast(bigram_counts)
        context_counts = F.broadcast(context_counts)
    if bg is None:
        bg = _lm_bigrams(df, id_col, text_col)
    scored = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab_size)).cast("double")
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.avg("_lp").alias("_avg")
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.round(F.col("_avg"), round_to).alias("avg_logp"),
        F.round(F.exp(-F.col("_avg")), round_to).alias("perplexity"),
    )


def lm_write(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> int:
    """Train the bigram LM once and PERSIST it — the production curate
    arrangement (mirrors ``similarity.ivf_index_write``): a trusted
    reference corpus is scanned exactly once, and every later batch or
    micro-batch scores against the stored tables via
    :func:`lm_score_from` instead of retraining per run.

    Layout: ``{path}/bigrams`` = (w1, w2, c12), ``{path}/contexts`` =
    (w1, c1), ``{path}/meta`` = one row (vocab_size, min_count).
    ``min_count`` drops rare bigrams from the STORED bigram table so it
    broadcasts at any corpus size; context totals are computed BEFORE
    the threshold, so ``c1`` stays exact and thresholded bigrams simply
    back off to the add-one floor — the standard pruned-LM semantics.
    The DEFAULT is pruned (``min_count=2``): natural-language bigram
    counts are Zipfian, so singletons are ~half the table, and the
    row-local scorers (:func:`lm_score_rowlocal`) collect the stored
    table driver-side — an unpruned default from a large corpus is a
    silent driver-OOM path (ADVICE r6).  Pass ``min_count=1``
    explicitly for a model whose from-disk scores are bit-identical to
    the inline :func:`lm_score`.  Returns the vocab size."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    bigram_counts, context_counts, vocab_size = train_bigram_lm(
        corpus, text_col, id_col
    )
    bigram_counts = bigram_counts.localCheckpoint(eager=False)
    # exact totals first, then threshold the stored bigrams
    context_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    stored = bigram_counts
    if min_count > 1:
        stored = bigram_counts.filter(F.col("c12") >= min_count)
    stored.write.mode("overwrite").parquet(f"{path}/bigrams")
    context_counts.write.mode("overwrite").parquet(f"{path}/contexts")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(vocab_size), int(min_count))], "vocab_size long, min_count int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return int(vocab_size)


def lm_score_from(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Score ``df`` against a persisted bigram LM written by
    :func:`lm_write` — no training pass, no corpus scan; with the default
    ``broadcast_lm`` the stored (pruned) tables broadcast and the scoring
    join is shuffle-free.  Same output schema and (for ``min_count=1``
    models) bit-identical scores to :func:`lm_score`."""
    spark = df.sparkSession
    bigram_counts = spark.read.parquet(f"{path}/bigrams")
    context_counts = spark.read.parquet(f"{path}/contexts")
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return _lm_score_with(
        df, bigram_counts, context_counts, int(meta["vocab_size"]),
        id_col, text_col, round_to, broadcast_lm,
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
    approx: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """One-pass corpus health report: per-``group_col`` rows (language,
    source, shard …) PLUS the grand total via ``rollup`` — the first
    thing an operator looks at after (or before) a curation run.

    Columns: ``n_docs``, ``n_distinct`` (exact-content cardinality),
    ``dup_ratio``, ``total_chars``, ``total_tokens``, ``avg_chars``,
    ``p50_chars``/``p90_chars`` (length distribution).

    Scale shape: ONE aggregation over a narrow projection (hash, two
    lengths — the text itself never shuffles).  ``approx=True`` swaps
    the exact ``count_distinct`` (whose distinct-expand is the only
    second-pass term) for the HLL ``approx_count_distinct`` and the
    exact percentiles for ``percentile_approx`` — the 100 TB mode:
    single shuffle, bounded state per group, ~1–2% cardinality error
    that a health report never cares about.  The exact mode is the
    DuckDB-replayable one the registry entry pins (ROLLUP + quantile_cont
    agree with Spark's rollup + percentile — same interpolation).
    """
    from dbc_informed_socketcan_to_parquet_spark.functions.text import tokens

    n_chars = F.length(F.col(text_col))
    n_toks = F.size(tokens(F.col(text_col))).cast("long")
    proj = [
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_ch"),
        n_chars.alias("_nc"),
        n_toks.alias("_nt"),
    ]
    if group_col:
        proj.insert(0, F.col(group_col))
    base = df.select(*proj)
    distinct = (
        F.approx_count_distinct("_ch") if approx else F.count_distinct("_ch")
    )
    p50, p90 = (
        (F.percentile_approx("_nc", 0.5), F.percentile_approx("_nc", 0.9))
        if approx
        else (F.expr("percentile(_nc, 0.5)"), F.expr("percentile(_nc, 0.9)"))
    )
    grouped = base.rollup(group_col) if group_col else base.rollup()
    return grouped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        distinct.alias("n_distinct"),
        F.round(
            F.lit(1.0) - distinct.cast("double") / F.count(F.lit(1)), round_to
        ).alias("dup_ratio"),
        F.sum("_nc").alias("total_chars"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.avg("_nc"), round_to).alias("avg_chars"),
        F.round(p50.cast("double"), round_to).alias("p50_chars"),
        F.round(p90.cast("double"), round_to).alias("p90_chars"),
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    ppl_col: str = "perplexity",
    lang_col: str | None = None,
    labels: tuple[str, ...] | None = ("head", "middle", "tail"),
    exact: bool = False,
    id_col: str = "doc_id",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style perplexity partition: split documents into quality
    tiers by LM perplexity (lowest = ``head``), optionally per language
    (the published recipe buckets each language separately so one
    easy-to-model language doesn't absorb the whole head).

    Input is the output of :func:`lm_score` / :func:`lm_score_from`
    (any frame with ``ppl_col``).  Adds ``ppl_bucket`` (1-based int) and
    ``ppl_tier`` (label, when ``labels`` matches ``n_buckets``).

    Two physical strategies:

    * ``exact=False`` (default, the 100 TB path): per-group
      ``approx_percentile`` cut points — ONE partial-aggregated pass to
      ≤ #languages rows, broadcast back, bucket assignment as a codegen
      comparison.  No global sort, no window; the corpus shuffles zero
      times.  Cut points are approximate (Greenwald-Khanna within
      1/``accuracy``), which is exactly the trade CCNet's own
      equal-sized-thirds makes irrelevant at corpus scale.
    * ``exact=True``: ``ntile`` over a window ordered by
      (``ppl_col``, ``id_col``) — deterministic equal-count tiles, the
      DuckDB-replayable mode the oracle entry pins.  A per-language
      global sort: correct, but the small-data / validation path.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    part = [lang_col] if lang_col else []
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(*part).orderBy(ppl_col, id_col)
        out = scored.withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
    else:
        fracs = F.array(
            *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
        )
        cuts = scored.groupBy(*part).agg(
            F.percentile_approx(ppl_col, fracs, F.lit(accuracy)).alias("_cuts")
        )
        joined = (
            scored.join(F.broadcast(cuts), part, "left")
            if part else scored.crossJoin(F.broadcast(cuts))
        )
        # bucket = 1 + number of cut points strictly below this doc's ppl
        n_below = F.aggregate(
            "_cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col(ppl_col) > c, 1).otherwise(0),
        )
        out = joined.withColumn("ppl_bucket", (n_below + 1).cast("int")).drop("_cuts")
    if labels and len(labels) == n_buckets:
        mapping = F.array(*[F.lit(x) for x in labels])
        out = out.withColumn(
            "ppl_tier", F.element_at(mapping, F.col("ppl_bucket"))
        )
    return out


# -- hashed linear classifier scoring (fastText-style) -----------------------

def _clf_hashed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_features: int,
    bigrams: bool,
    seed: str,
) -> DataFrame:
    """(id, idx) hashed-feature table shared by the classifier scorer and
    trainer — one row per unigram (+ word-bigram) occurrence, hashed into
    ``num_features`` buckets.  Identical expression in both call sites so
    a model trained here scores correctly there."""
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long

    # one row per token (+bigram) occurrence: fan out before the explode so
    # the featurize pass runs at cluster parallelism even off a one-file
    # scan (r15; no-op on an already-wide input).  The token array is
    # materialized ONCE in a projection between the exchange and the
    # Generate (r16, same fix as _lm_bigrams): inlined, the split chain
    # appeared 5× in the generator expression (toks + two slices + two
    # size() bounds) where Generate gets no subexpression elimination.
    toked = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), _lm_tokens(text_col).alias("_toks")
    )
    toks = F.col("_toks")
    feats = toks
    if bigrams:
        n_keep = F.greatest(F.size(toks) - 1, F.lit(0))
        pair_strs = F.transform(
            F.arrays_zip(
                F.slice(toks, 1, n_keep).alias("a"),
                F.slice(toks, 2, n_keep).alias("b"),
            ),
            lambda p: F.concat(p["a"], F.lit(" "), p["b"]),
        )
        feats = F.concat(toks, pair_strs)
    return toked.select(F.col(id_col), F.explode(feats).alias("_f")).select(
        F.col(id_col),
        F.pmod(md5_long(F.col("_f"), salt=f"{seed}|"), F.lit(num_features)).alias("idx"),
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
    bigrams: bool = True,
    bias: float = 0.0,
    seed: str = "clf",
    round_to: int = 6,
) -> DataFrame:
    """Per-document quality-classifier score — the fastText-shaped linear
    model every curation stack runs (OH/Wikipedia-vs-crawl style): tokens
    (and optionally word bigrams) hash into ``num_features`` buckets,
    the document is the MEAN of its features' weights plus a bias, and
    the score is the logistic of that margin.

    ``weights`` is the trained model as an (idx int, w double) DataFrame —
    tiny (≤ num_features rows), so it broadcast-joins against the hashed
    feature table and the scoring pass is join-shuffle-free.  With
    ``weights=None`` a deterministic pseudo-model is derived from the
    feature index hash (w ∈ [-1, 1]) — the plumbing-complete stand-in for
    an externally trained model, and the DuckDB-reproducible oracle path
    (no join at all: the weight is a pure expression of the index).

    Output: ``(id_col, n_features, margin, prob)``, rounded to
    ``round_to`` so ln/exp engine differences wash out.

    Scale: one explode (unigram + zipped bigram arrays) + at most one
    broadcast join + one groupBy(doc) with map-side partial sums.
    """
    hashed = _clf_hashed(df, id_col, text_col, num_features, bigrams, seed)
    if weights is not None:
        weighted = hashed.join(F.broadcast(weights), "idx", "left").select(
            F.col(id_col), F.coalesce(F.col("w"), F.lit(0.0)).alias("w")
        )
    else:
        # deterministic pseudo-weights: w(idx) = (h(idx) mod 2001 - 1000)/1000
        weighted = hashed.select(
            F.col(id_col),
            ((md5_long(F.col("idx"), salt=f"{seed}-w|") % 2001 - 1000) / F.lit(1000.0)).alias("w"),
        )
    per_doc = weighted.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_features"), F.avg("w").alias("_m")
    )
    margin = F.col("_m") + F.lit(float(bias))
    return per_doc.select(
        F.col(id_col),
        F.col("n_features"),
        F.round(margin, round_to).alias("margin"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), round_to).alias("prob"),
    )


def calibration_report(
    scored: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram report for a scored corpus (r13) — the check
    to run BEFORE turning a quality classifier's probability into a
    keep/drop threshold (``curate --min-clf-prob``): a classifier can
    rank well and still be badly calibrated, and a 100 TB keep decision
    at prob ≥ 0.55 means something only if 0.55 ≈ the empirical
    positive rate at that score.

    Input: any frame with a [0, 1] probability column
    (:func:`classifier_score` / ``classifier_score_from`` output joined
    to held-out labels).  Output: one row per OCCUPIED probability bin —
    ``(bin, n, mean_prob, frac_pos, abs_gap)`` where ``bin`` =
    ``min(floor(p·n_bins), n_bins-1)`` (prob 1.0 clamps into the last
    bin), ``frac_pos`` is the empirical positive rate, and ``abs_gap``
    is the per-bin calibration error.  ECE = Σ n·abs_gap / Σ n over the
    rows; a reliability diagram is the (mean_prob, frac_pos) scatter.

    Scale: ONE hash aggregation on the bin key (≤ ``n_bins`` groups —
    map-side combine collapses everything before the shuffle); no
    window, no join, label cast + binning row-local.

    Rows whose probability is NULL, NaN, or outside [0, 1] are dropped
    up front (r14 review fix): a NULL prob formed a NULL bin row and
    out-of-range values produced negative/overflow bins that silently
    skewed the per-bin rows and the CLI's ECE aggregate.  The report
    and ECE cover well-formed scores only — malformed scores mean the
    classifier output is broken, which no binning can repair.
    """
    p = F.col(prob_col)
    valid = scored.filter(
        p.isNotNull() & ~F.isnan(p) & (p >= F.lit(0.0)) & (p <= F.lit(1.0))
    )
    b = F.least(
        F.floor(F.col(prob_col) * F.lit(int(n_bins))).cast("int"),
        F.lit(int(n_bins) - 1),
    )
    agg = (
        valid.select(
            b.alias("bin"),
            F.col(prob_col).alias("_p"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("_p"), 6).alias("mean_prob"),
            F.round(F.avg("_y"), 6).alias("frac_pos"),
        )
    )
    return agg.select(
        "bin", "n", "mean_prob", "frac_pos",
        F.round(F.abs(F.col("mean_prob") - F.col("frac_pos")), 6).alias("abs_gap"),
    )


def threshold_sweep(
    scored: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    thresholds: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Keep-threshold sweep over a scored + labeled corpus (r13) — the
    PR-curve companion to :func:`calibration_report`: for each candidate
    ``--min-clf-prob`` value, how much of the corpus survives and what
    the kept set's precision/recall against the held-out labels would
    be.  Run both BEFORE committing a threshold to a 100 TB curation.

    Output: one row per threshold — ``(threshold, n_kept, keep_frac,
    precision, recall)``; ``precision = tp / n_kept`` (0 when nothing
    kept), ``recall = tp / n_pos`` (1 when there are no positives).

    Scale: ONE corpus pass producing a single row of conditional
    aggregates (2 + 2·|thresholds| counts, all map-side combined), then
    a constant-size explode of that row — no join, no window, no
    per-threshold rescan.

    Like :func:`calibration_report` (r14), rows with NULL / NaN /
    out-of-[0, 1] probabilities are dropped up front — Spark orders NaN
    ABOVE every double, so a NaN-scored row would count as kept at
    every threshold and silently skew n_kept and precision.
    """
    pcol = F.col(prob_col)
    scored = scored.filter(
        pcol.isNotNull() & ~F.isnan(pcol)
        & (pcol >= F.lit(0.0)) & (pcol <= F.lit(1.0))
    )
    p, y = F.col(prob_col), F.col(label_col).cast("double")
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.count_if(y == 1.0).alias("_pos"),
    ]
    for i, t in enumerate(thresholds):
        aggs.append(F.count_if(p >= F.lit(float(t))).alias(f"_k{i}"))
        aggs.append(
            F.count_if((p >= F.lit(float(t))) & (y == 1.0)).alias(f"_t{i}"))
    row = scored.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(float(t)).alias("threshold"),
            F.col(f"_k{i}").cast("long").alias("n_kept"),
            F.col(f"_t{i}").cast("long").alias("_tp"),
        )
        for i, t in enumerate(thresholds)
    ])
    r = F.col("_r")
    return (
        row.select(F.explode(entries).alias("_r"), "_n", "_pos")
        .select(
            r["threshold"].alias("threshold"),
            r["n_kept"].alias("n_kept"),
            F.round(F.when(F.col("_n") > 0,
                           r["n_kept"] / F.col("_n")).otherwise(F.lit(0.0)), 6)
            .alias("keep_frac"),
            F.round(F.when(r["n_kept"] > 0,
                           r["_tp"] / r["n_kept"]).otherwise(F.lit(0.0)), 6)
            .alias("precision"),
            F.round(F.when(F.col("_pos") > 0,
                           r["_tp"] / F.col("_pos")).otherwise(F.lit(1.0)), 6)
            .alias("recall"),
        )
    )


def _broadcast_getter(spark, value):
    """Ship ``value`` to executors via ``sc.broadcast`` (ONE copy per
    executor, torrent distribution) instead of pickling it into every
    task closure; falls back to closure capture under Connect (no
    sparkContext) — the same arrangement as ``urlops.domain_filter``.
    Returns a zero-arg getter usable inside a UDF; the broadcast handle
    (or None under Connect) rides on ``getter._bcast`` so callers that
    cache getters can unpersist stale ones."""
    try:
        sc = spark.sparkContext
    except AttributeError:
        getter = (lambda v: (lambda: v))(value)
        getter._bcast = None
        return getter
    b = sc.broadcast(value)
    getter = (lambda bb: (lambda: bb.value))(b)
    getter._bcast = b
    return getter


# (context key, model path) -> (content token, getter).  Bounds
# executor broadcast accumulation (ADVICE r7): repeated rowlocal scorer
# calls in a long-lived session reuse ONE broadcast per model path, and
# a rewritten model (token change) unpersists the stale copy first.
# Keyed by SparkContext identity too (ADVICE r8): a broadcast minted by
# a stopped context must not be served to a restarted one.
_MODEL_GETTER_CACHE: dict[tuple[object, str], tuple[object, object]] = {}


def _ctx_key(spark):
    """Identity of the live SparkContext for cache keying: its
    applicationId is fresh per context (``local-<startTimeMs>`` in
    local mode), so a stop/restart cycle naturally invalidates cached
    broadcasts minted by the dead context.  Connect sessions (no
    sparkContext) key by session object identity — getters there hold
    plain closures, not broadcasts, so staleness is only a memory
    concern, not a correctness one."""
    try:
        return spark.sparkContext.applicationId
    except Exception:
        return id(spark)


def _model_token(path: str):
    """Best-effort change token for a local model directory: (file
    count, max mtime_ns).  Non-local / unstatable paths return None —
    the cache then reloads per call but still unpersists the previous
    broadcast, so at most one copy per path stays live."""
    import os

    try:
        stamps = [
            os.stat(os.path.join(root, fn)).st_mtime_ns
            for root, _dirs, files in os.walk(path)
            for fn in files
        ]
    except OSError:
        return None
    return (len(stamps), max(stamps)) if stamps else None


def _cached_model_getter(spark, path: str, loader):
    """Zero-arg getter for the model artifact at ``path``, broadcast at
    most once per (path, content token).  ``loader`` is a zero-arg
    callable doing the driver-side collect — it runs ONLY on a cache
    miss, so repeated streaming/rowlocal scorer calls skip both the
    re-collect and the re-broadcast.  Note: any call-time guards inside
    ``loader`` (e.g. ``lm_score_rowlocal``'s ``max_model_rows`` ceiling)
    run only on a miss — an unchanged artifact stays admitted once
    admitted."""
    token = _model_token(path)
    key = (_ctx_key(spark), path)
    hit = _MODEL_GETTER_CACHE.get(key)
    if hit is not None:
        if token is not None and hit[0] == token:
            return hit[1]
        old = getattr(hit[1], "_bcast", None)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
    getter = _broadcast_getter(spark, loader())
    _MODEL_GETTER_CACHE[key] = (token, getter)
    return getter


def clear_model_broadcasts() -> None:
    """Cleanup hook (ADVICE r7): unpersist every cached model broadcast
    and empty the cache.  Safe to call between jobs in a long-lived
    session; the next scorer call reloads and re-broadcasts."""
    for _token, getter in _MODEL_GETTER_CACHE.values():
        b = getattr(getter, "_bcast", None)
        if b is not None:
            try:
                b.unpersist()
            except Exception:
                pass
    _MODEL_GETTER_CACHE.clear()


def lm_score_rowlocal(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    prefix: str = "lm_",
    round_to: int = 6,
    max_model_rows: int = 5_000_000,
) -> DataFrame:
    """STREAMING-safe scoring against a persisted LM (:func:`lm_write`):
    the batch scorer's explode → join → groupBy(doc) is a streaming
    AGGREGATION (stateful, output-mode-constrained), so this form loads
    the stored tables driver-side into plain dicts and an Arrow-batched
    pandas UDF computes each document's average bigram log-probability
    row-locally: stateless, append-mode-safe, and identical arithmetic
    to :func:`lm_score_from` (same add-one floor, same tokenizer regex;
    pytest pins the scores equal).  The dicts ship to executors via
    ``sc.broadcast`` (one torrent copy per executor, not a copy per
    task closure).

    The driver-side collect is guarded, not assumed (ADVICE r6): the
    stored bigram+context row count is checked against
    ``max_model_rows`` FIRST, and an over-ceiling model — e.g. one
    written with ``min_count=1`` from a large corpus — raises with the
    fix (re-write pruned, or use the distributed
    :func:`lm_score_from`) instead of silently OOMing the driver.

    Adds columns instead of reshaping rows (streams compose by column):
    ``{prefix}n_bigrams int``, ``{prefix}avg_logp``,
    ``{prefix}perplexity`` (NULL for docs with no bigram — the batch
    scorer simply has no row for those; a perplexity-threshold filter
    drops them either way, the documented conservative gate)."""
    import math
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession

    def _load():
        bi_df = spark.read.parquet(f"{path}/bigrams")
        ctx_df = spark.read.parquet(f"{path}/contexts")
        n_model = bi_df.count() + ctx_df.count()
        if n_model > max_model_rows:
            meta_row = spark.read.parquet(f"{path}/meta").collect()[0]
            mc = meta_row["min_count"] if "min_count" in meta_row.__fields__ else 1
            raise ValueError(
                f"persisted LM at {path} has {n_model} rows (> max_model_rows="
                f"{max_model_rows}); collecting it driver-side would risk OOM. "
                f"It was written with min_count={mc} — re-write with a higher "
                f"min_count (lm_write default prunes at 2), or score with the "
                f"distributed lm_score_from() instead."
            )
        bi = {(r["w1"], r["w2"]): r["c12"] for r in bi_df.collect()}
        ctx = {r["w1"]: r["c1"] for r in ctx_df.collect()}
        V = int(spark.read.parquet(f"{path}/meta").collect()[0]["vocab_size"])
        return (bi, ctx, V)

    # one broadcast per (context, path, content token): repeated calls
    # in a long-lived session (streaming foreachBatch, notebook loops)
    # reuse the executor copy instead of re-collecting + re-broadcasting
    get_model = _cached_model_getter(spark, path, _load)
    tok_re = _re.compile(LM_TOKEN_SPLIT)

    def _score(texts):
        bi_l, ctx_l, v_l = get_model()
        n_out, a_out = [], []
        for t in texts:
            toks = [w for w in tok_re.split((t or "").lower()) if w]
            if len(toks) < 2:
                n_out.append(None)
                a_out.append(None)
                continue
            s = 0.0
            for w1, w2 in zip(toks, toks[1:]):
                s += math.log((bi_l.get((w1, w2), 0) + 1) / (ctx_l.get(w1, 0) + v_l))
            n_out.append(len(toks) - 1)
            a_out.append(s / (len(toks) - 1))
        return pd.DataFrame({"n": pd.array(n_out, dtype="Int32"),
                             "a": pd.array(a_out, dtype="Float64")})

    _score.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    kernel = pandas_udf(_score, "n int, a double")
    scored = df.withColumn("_lm", kernel(F.col(text_col)))
    return scored.select(
        "*",
        F.col("_lm.n").alias(f"{prefix}n_bigrams"),
        F.round(F.col("_lm.a"), round_to).alias(f"{prefix}avg_logp"),
        F.round(F.exp(-F.col("_lm.a")), round_to).alias(f"{prefix}perplexity"),
    ).drop("_lm")


def classifier_score_rowlocal(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    prefix: str = "clf_",
    round_to: int = 6,
) -> DataFrame:
    """STREAMING-safe scoring against a persisted classifier
    (:func:`classifier_write`) — same motivation and shape as
    :func:`lm_score_rowlocal`: the weight dict loads driver-side (≤
    num_features entries, tiny), feature hashing + the weight mean run
    row-locally in one Arrow-batched kernel.  Adds
    ``{prefix}n_features int``, ``{prefix}margin``, ``{prefix}prob``
    (NULL for token-less docs); scores match
    :func:`classifier_score_from` exactly (pytest-pinned)."""
    import math
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import py_md5_long

    spark = df.sparkSession

    def _load():
        w = {
            int(r["idx"]): float(r["w"])
            for r in spark.read.parquet(f"{path}/weights").collect()
        }
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        return (
            w,
            int(meta["num_features"]),
            bool(meta["bigrams"]),
            float(meta["bias"]),
            str(meta["seed"]),
        )

    # meta rides inside the broadcast payload so a cache hit skips
    # every driver-side parquet read, not just the weight collect
    get_model = _cached_model_getter(spark, path, _load)
    tok_re = _re.compile(LM_TOKEN_SPLIT)

    def _score(texts):
        w_l, nf, use_bigrams, bias, seed = get_model()
        n_out, m_out = [], []
        for t in texts:
            toks = [x for x in tok_re.split((t or "").lower()) if x]
            feats = list(toks)
            if use_bigrams:
                feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            if not feats:
                n_out.append(None)
                m_out.append(None)
                continue
            s = sum(w_l.get(py_md5_long(f, salt=f"{seed}|") % nf, 0.0) for f in feats)
            n_out.append(len(feats))
            m_out.append(s / len(feats) + bias)
        return pd.DataFrame({"n": pd.array(n_out, dtype="Int32"),
                             "m": pd.array(m_out, dtype="Float64")})

    _score.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    kernel = pandas_udf(_score, "n int, m double")
    scored = df.withColumn("_clf", kernel(F.col(text_col)))
    margin = F.col("_clf.m")
    return scored.select(
        "*",
        F.col("_clf.n").alias(f"{prefix}n_features"),
        F.round(margin, round_to).alias(f"{prefix}margin"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), round_to).alias(f"{prefix}prob"),
    ).drop("_clf")


def classifier_write(
    weights: DataFrame,
    path: str,
    num_features: int = 1 << 18,
    bigrams: bool = True,
    bias: float = 0.0,
    seed: str = "clf",
) -> None:
    """Persist a trained quality-classifier model (the (idx, w) weight
    table plus ITS featurization config) so production curate runs load
    it by path — a model scored with the wrong num_features/seed hashes
    every token into the wrong bucket, so the config rides with the
    weights instead of being re-specified per call.

    Layout: ``{path}/weights`` = (idx long, w double); ``{path}/meta`` =
    one row (num_features, bigrams, bias, seed)."""
    weights.select(
        F.col("idx").cast("long").alias("idx"), F.col("w").cast("double").alias("w")
    ).write.mode("overwrite").parquet(f"{path}/weights")
    spark = weights.sparkSession
    spark.createDataFrame(
        [(int(num_features), bool(bigrams), float(bias), str(seed))],
        "num_features int, bigrams boolean, bias double, seed string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def classifier_score_from(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Score against a persisted classifier written by
    :func:`classifier_write`: weights broadcast-join as in
    :func:`classifier_score`, and the featurization config comes from the
    stored meta — bit-identical scores to an inline call with the same
    weights/config (pytest-pinned)."""
    spark = df.sparkSession
    weights = spark.read.parquet(f"{path}/weights")
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return classifier_score(
        df,
        weights=weights,
        id_col=id_col,
        text_col=text_col,
        num_features=int(meta["num_features"]),
        bigrams=bool(meta["bigrams"]),
        bias=float(meta["bias"]),
        seed=str(meta["seed"]),
        round_to=round_to,
    )


# -- Gopher quality rules (Rae et al. 2021, table A1) ------------------------

#: the rule's fixed English indicator set — two or more must appear
def classifier_train(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 18,
    bigrams: bool = True,
    seed: str = "clf",
    n_iters: int = 5,
    lr: float = 1.0,
    l2: float = 0.0,
    round_to: int = 6,
    grad_round_to: int = 9,
) -> tuple[DataFrame, float]:
    """Train the hashed linear quality classifier IN the engine —
    full-batch logistic regression by gradient descent over the same
    unigram+bigram hashed features :func:`classifier_score` scores with,
    so the returned ``(weights, bias)`` plug straight into
    ``classifier_score(df, weights, bias=...)`` / ``classifier_write``.
    Closes the train→persist→score loop that previously needed an
    external trainer (weights had to arrive from outside).

    Model: ``margin(d) = mean(w[idx] for each feature occurrence) +
    bias``; ``p = sigmoid(margin)``; mean log-loss over the ``N``
    featureful labeled docs (rows with NULL label or zero features are
    excluded).  Per iteration: ``g[idx] = Σ_d (p_d − y_d)/n_d / N`` over
    that idx's occurrences, ``g_bias = Σ_d (p_d − y_d)/N``, then
    ``w := w − lr·(g + l2·w)``.

    DETERMINISM (the oracle contract): margins, probabilities and
    weights round to ``round_to`` and gradients to ``grad_round_to`` at
    every iteration boundary — the same resynchronization device the
    scoring entries use, so the DuckDB replay (unrolled-iteration CTEs
    at ``queries.py``) stays hash-exact instead of drifting a ulp per
    iteration.

    Scale: featurization runs ONCE and persists (reused every
    iteration); per iteration the plan is one broadcast weight join
    (weights ≤ num_features rows BY CONSTRUCTION), one groupBy(doc)
    margin aggregate, one join of the N-row error table back to the
    feature table (shuffle on the doc key — the lm_score shape), and one
    groupBy(idx) gradient aggregate whose ≤ num_features-row result
    collects to the driver (the bounded-model-table doctrine; same
    bound as the scorer's broadcast).  n_iters is small by design —
    full-batch GD on a convex loss with mean-normalized features
    converges in a handful of steps; for epoch-scale SGD training use an
    external trainer and import via ``classifier_write``.

    Returns ``(weights, bias)``: weights = (idx long, w double) for
    EVERY observed feature index (zeros included — the deterministic
    support set), bias the trained scalar.
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    spark = df.sparkSession
    labeled = df.filter(F.col(label_col).isNotNull())
    # Cluster the exploded feature table by doc id ONCE (r15, guide §2.4:
    # establish the partitioning a single time and let every keyed pass
    # reuse it): the per-doc count, the label join, every iteration's
    # margin aggregate, and the gradient join are all keyed on the id, so
    # they plan exchange-free against this layout instead of re-shuffling
    # the exploded table per iteration (n_iters extra corpus-scale
    # exchanges before; the only per-iteration exchange left is the
    # ≤ num_features-row partial-aggregated gradient).
    hashed = _clf_hashed(
        labeled, id_col, text_col, num_features, bigrams, seed
    ).repartition(F.col(id_col))
    nd = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    lab = labeled.select(F.col(id_col), F.col(label_col).cast("double").alias("_y"))
    base = hashed.join(nd, id_col).join(lab, id_col).persist()
    # the distinct per-doc (id, n, y) table is reused every time the
    # margin pass can skip base entirely (the w=0 iterations) and for the
    # doc count — persist it so those jobs never rescan the exploded base
    docs_tbl = base.select(F.col(id_col), F.col("_n"), F.col("_y")).distinct().persist()
    try:
        n_docs = docs_tbl.count()
        if n_docs == 0:
            raise ValueError("no featureful labeled documents to train on")
        w: dict[int, float] = {}
        bias = 0.0
        for _ in range(n_iters):
            if w:
                wdf = spark.createDataFrame(
                    list(w.items()), "idx long, w double"
                )
                joined = base.join(F.broadcast(wdf), "idx", "left").withColumn(
                    "w", F.coalesce(F.col("w"), F.lit(0.0))
                )
                margins = joined.groupBy(id_col, "_n", "_y").agg(
                    F.round(
                        F.sum("w") / F.col("_n") + F.lit(float(bias)), round_to
                    ).alias("_m")
                )
            else:
                # every weight is 0 ⇒ sum(w)/n ≡ 0.0 ⇒ margin is the
                # (rounded) bias for every doc — identical to the full
                # aggregate (the oracle CTEs special-case iteration 1 the
                # same way), with no pass over the exploded base (r15)
                margins = docs_tbl.withColumn(
                    "_m", F.round(F.lit(float(bias)), round_to)
                )
            errs = margins.select(
                F.col(id_col),
                F.col("_n"),
                (
                    F.round(
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))), round_to
                    )
                    - F.col("_y")
                ).alias("_err"),
            ).persist()
            try:
                # errs is exactly n_docs rows (~24 B each): broadcast it
                # below the cap so the gradient join never exchanges
                # either side; above it, the plain keyed join is still
                # exchange-free because BOTH sides carry the id
                # partitioning established once at featurize time.
                errs_j = F.broadcast(errs) if n_docs <= 2_000_000 else errs
                per_idx = (
                    base.select(id_col, "idx")
                    .join(errs_j, id_col)
                    .groupBy("idx")
                    .agg(
                        F.round(
                            F.sum(F.col("_err") / F.col("_n")) / F.lit(float(n_docs)),
                            grad_round_to,
                        ).alias("g")
                    )
                )
                # the bias gradient rides the same action as a sentinel
                # row (idx = -1; real feature indexes are pmod-nonneg) —
                # ONE collect job per iteration instead of two (r16,
                # VERDICT r15 item 2).  Both aggregates are unchanged —
                # each keeps its own sum and its own grad_round_to
                # rounding, so the trained weights are bit-identical to
                # the two-job form (the oracle CTEs pin this).
                bias_row = errs.agg(
                    F.round(
                        F.sum("_err") / F.lit(float(n_docs)), grad_round_to
                    ).alias("g")
                ).select(F.lit(-1).cast("long").alias("idx"), F.col("g"))
                g_rows = per_idx.unionByName(bias_row).collect()
            finally:
                errs.unpersist()
            g_bias = 0.0
            for r in g_rows:
                if r["idx"] == -1:
                    g_bias = r["g"]
                    continue
                old = w.get(r["idx"], 0.0)
                w[r["idx"]] = round(old - lr * (r["g"] + l2 * old), round_to)
            bias = round(bias - lr * g_bias, round_to)
    finally:
        docs_tbl.unpersist()
        base.unpersist()
    weights = spark.createDataFrame(list(w.items()), "idx long, w double")
    return weights, bias


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher corpus-filtering rule battery as NAMED per-document
    flags — the standard pre-dedup gate (word-count band, mean word
    length band, symbol density, bullet/ellipsis line shares, alphabetic
    word share, English indicator words), each reported separately so a
    pipeline can audit WHICH rule fired before dropping.

    Output: the measured features (``n_words``, ``avg_word_len``,
    ``symbol_ratio``, ``bullet_ratio``, ``ellipsis_ratio``,
    ``alpha_ratio``, ``stop_hits``), one boolean per rule
    (``ok_*``), and the conjunction ``passes_gopher``.

    Scale: one shuffle-free row-local projection — same shape as
    :func:`doc_quality_stats`, composable into the same single scan.
    The caller-warning there applies here too: materialize before
    filtering on these columns.

    Note the indicator-word rule (``ok_stop_words``) assumes ENGLISH
    text, as published — on a multilingual corpus route by language
    first or lower ``min_stop_hits`` (the synthetic test fixture fails
    this rule corpus-wide, by design of the rule).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    avg_len = F.when(n_words > 0, word_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    n_symbols = F.regexp_count(t, F.lit(r"#|\.\.\.|…"))
    symbol_ratio = F.when(n_words > 0, n_symbols.cast("double") / n_words).otherwise(F.lit(0.0))
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != F.lit(""))
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: F.regexp_count(l, F.lit(r"^\s*[-*•‣▪]")) > 0))
    n_ellip = F.size(F.filter(lines, lambda l: F.regexp_count(l, F.lit(r"(\.\.\.|…)\s*$")) > 0))
    bullet_ratio = F.when(n_lines > 0, n_bullet.cast("double") / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, n_ellip.cast("double") / n_lines).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: F.regexp_count(w, F.lit("[A-Za-z]")) > 0))
    alpha_ratio = F.when(n_words > 0, n_alpha.cast("double") / n_words).otherwise(F.lit(0.0))
    lowered = F.transform(words, lambda w: F.lower(w))
    stop_hits = sum(
        (F.array_contains(lowered, w).cast("int") for w in GOPHER_STOPS), F.lit(0)
    )

    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_avg = (avg_len >= min_avg_len) & (avg_len <= max_avg_len)
    ok_symbol = symbol_ratio <= max_symbol_ratio
    ok_bullet = bullet_ratio <= max_bullet_ratio
    ok_ellipsis = ellipsis_ratio <= max_ellipsis_ratio
    ok_alpha = alpha_ratio >= min_alpha_ratio
    ok_stops = stop_hits >= min_stop_hits
    return fan_out(df).select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(avg_len, 6).alias("avg_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        ok_words.alias("ok_word_count"),
        ok_avg.alias("ok_avg_word_len"),
        ok_symbol.alias("ok_symbol_ratio"),
        ok_bullet.alias("ok_bullet_lines"),
        ok_ellipsis.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stops.alias("ok_stop_words"),
        (ok_words & ok_avg & ok_symbol & ok_bullet & ok_ellipsis & ok_alpha & ok_stops)
        .alias("passes_gopher"),
    )


# -- unicode / whitespace normalization --------------------------------------

#: Control characters stripped by normalize_text — C0 minus tab/newline
#: (\x0d CR is handled by the newline collapse), plus DEL.  Module
#: constant so the DuckDB oracle renders the identical class.
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Canonicalize document text: unicode NFC composition, control
    characters stripped, CRLF/CR folded to LF, horizontal-whitespace
    runs collapsed to one space, space trimmed around newlines and at
    the ends — the standard first stage of a crawl-cleaning pipeline
    (differently-composed accents or stray NBSPs otherwise defeat
    exact and shingle dedup downstream).

    NFC itself has no Spark SQL builtin, so it runs as an Arrow-batched
    pandas UDF (``Series.str.normalize``, no per-row Python); every
    other rewrite is a JVM-side ``regexp_replace`` chain that codegen
    fuses into the surrounding projection.  Scale: narrow per-row map,
    no state; a single-file input is fanned out first (r15, guide §2.5
    "input skew") so the NFC kernel + regex chain never run on one core
    — on an already-wide input ``fan_out`` is a no-op under classic
    Spark and the operator stays shuffle-free there; under Spark
    Connect the partition-count probe is unavailable, so ``fan_out``
    inserts an unconditional round-robin exchange (ADVICE r15 — see
    functions/partitioning.fan_out's Connect note).
    """
    from pyspark.sql.functions import pandas_udf

    from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import (
        LIGHT_KERNEL_MIN_BYTES as _MINB,
        fan_out,
    )

    df = fan_out(df, min_bytes=_MINB)

    @pandas_udf("string")
    def _nfc(s):  # pd.Series -> pd.Series
        return s.str.normalize("NFC")

    c = _nfc(F.col(text_col))
    c = F.regexp_replace(c, r"\r\n?", "\n")           # CRLF / lone CR -> LF
    c = F.regexp_replace(c, CONTROL_CLASS, "")        # strip C0 controls + DEL
    c = F.regexp_replace(c, r"[ \t ]+", " ")     # h-space runs -> one space
    c = F.regexp_replace(c, r" ?\n ?", "\n")          # no space hugging newlines
    c = F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")   # trim document ends
    return df.withColumn(out_col or text_col, c)


def compression_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher-family
    repetition signal the n-gram rules can't see: templated or looping
    text compresses far below natural prose (ratio = compressed/raw;
    natural English ≈ 0.3–0.6, pathological repetition → 0.05, random
    bytes → 1.0).  Deterministic (zlib with a fixed level is a pure
    function of the bytes), so the gate is reproducible across runs and
    clusters.

    Output: ``(id_col, raw_bytes, zlib_bytes, compression_ratio)``.

    Scale: Arrow-batched ``mapInPandas`` (zlib is stdlib C — the kernel
    is memcpy+deflate per batch, no model, no state), embarrassingly
    parallel, no shuffle.  This is the documented slow-path tier: no
    JVM zlib expression exists, and the per-row work is real
    compression, not expressible algebra.
    """
    import pandas as pd
    import zlib

    # derive the id field's type from the actual schema (string/int ids
    # via curate --id-col must round-trip Arrow; streaming _zkernel shape)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, raw_bytes int, zlib_bytes int, compression_ratio double"
    )

    def kernel(batches):
        for pdf in batches:
            raw = pdf[text_col].fillna("").astype(str)
            enc = [t.encode("utf-8") for t in raw]
            raw_n = [len(b) for b in enc]
            zl_n = [len(zlib.compress(b, level)) for b in enc]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "raw_bytes": raw_n,
                "zlib_bytes": zl_n,
                "compression_ratio": [
                    round(z / r, 6) if r else 0.0 for z, r in zip(zl_n, raw_n)
                ],
            })

    from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import fan_out

    return fan_out(df.select(id_col, text_col)).mapInPandas(kernel, out_schema)


def vocab_coverage(
    df: DataFrame,
    top_k: int = 1000,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language VOCABULARY coverage against the corpus's own top-K
    word list (r12) — the "is my tokenizer/wordlist sized for every
    language in the mix" report: languages whose running text is poorly
    covered by the global high-frequency vocabulary are the ones that
    will fragment under a frequency-trained tokenizer (the same signal
    ``tokenizer_fertility`` measures post-BPE, available here WITHOUT a
    trained model).

    Vocabulary: the ``top_k`` (lowercased, whitespace) words by global
    occurrence count, ties broken lexicographically — deterministic in
    both engines.

    Output: one row per language value —
    ``(lang, n_tokens, n_covered, oov_rate, n_distinct, n_distinct_covered)``
    where ``oov_rate = 1 - n_covered / n_tokens`` rounded to 6.

    Scale: ONE corpus scan and ONE occurrence-scale shuffle — the
    explode feeds a single map-side-combined (lang, word) count, and
    everything else derives from that vocab-scale table: the global
    count is a second (word-keyed, vocab-scale) rollup, top-K selection
    is a distributed TakeOrdered (never a global sort), the K-row
    vocabulary broadcasts back onto the (lang, word) counts, and the
    per-language rollup keys on language cardinality (dozens).  Corpus
    text never shuffles — and never scans twice (the first cut
    referenced the exploded stream from two plan subtrees, doubling the
    corpus I/O).
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    # materialized once (eager durable_checkpoint — ContextCleaner-owned,
    # executor-loss-safe when a checkpoint dir is configured; see
    # dedup._measured_small): the vocab and coverage branches would
    # otherwise each re-run the corpus scan+explode — exchange reuse
    # does not dedupe them (verified on the executed plan)
    lw = durable_checkpoint(
        fan_out(df, min_bytes=LIGHT_KERNEL_MIN_BYTES).select(
            F.coalesce(F.col(lang_col), F.lit("unknown")).alias("lang"),
            F.explode(toks).alias("w"),
        )
        .groupBy("lang", "w").agg(F.count(F.lit(1)).alias("_c")),
        eager=True,
    )
    vocab = (
        lw.groupBy("w").agg(F.sum("_c").alias("_g"))
        .orderBy(F.desc("_g"), F.asc("w"))
        .limit(int(top_k))
        .select("w", F.lit(1).alias("_in"))
    )
    return (
        lw.join(F.broadcast(vocab), "w", "left")
        .groupBy("lang")
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNotNull(), F.col("_c"))
                  .otherwise(F.lit(0))).alias("n_covered"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.count_if(F.col("_in").isNotNull()).alias("n_distinct_covered"),
        )
        .select(
            "lang",
            F.col("n_tokens").cast("long"),
            F.col("n_covered").cast("long"),
            F.round(F.lit(1.0) - F.col("n_covered") / F.col("n_tokens"), 6)
            .alias("oov_rate"),
            F.col("n_distinct").cast("long"),
            F.col("n_distinct_covered").cast("long"),
        )
    )


#: Published per-rule DROP thresholds for the repetition battery
#: (Rae et al. 2021, Table A1) — a doc failing ANY rule is dropped.
#: The dup-n-gram rules threshold the paper's quantity, the overlap-aware
#: duplicated-CHARACTER fraction (``dup_{n}gram_char_frac``, kernel lane)
#: — NOT the count-based ``dup_{n}gram_frac`` the battery also reports
#: (r13; through r12 the count fraction was gated unshifted, a documented
#: deviation from Table A1 the kernel lane removes).
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30, "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20, "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20, "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15, "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13, "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11, "dup_10gram_char_frac": 0.10,
}


_COUNT_LANE_RE = re.compile(r"^dup_(\d+)gram_char_frac$")


def _gate_thresholds(
    kernel: bool, names: set[str] | None = None
) -> dict[str, float]:
    """The gate-able rule set for the current lane — the ONE key set
    both gates validate overrides against (r14 review fix; previously
    the streaming gate accepted count-frac overrides the batch gate
    rejected, and conjoined them with the char-frac defaults).

    Kernel lane: the published char-frac rules verbatim.  Pandas-less
    fallback (``kernel=False``): the dup-n rules remap to the count-frac
    columns at the same values — the documented pre-r13 deviation —
    so the gate still works without pandas.  Restricted to ``names``
    (the computed metrics) when given.
    """
    th: dict[str, float] = {}
    for k, v in GOPHER_REPETITION_THRESHOLDS.items():
        if not kernel:
            m = _COUNT_LANE_RE.match(k)
            if m:
                k = f"dup_{m.group(1)}gram_frac"
        if names is None or k in names:
            th[k] = v
    return th


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """:func:`gopher_repetition` thresholded into NAMED boolean rules —
    the repetition half of the Gopher gate, shaped exactly like
    :func:`gopher_quality_flags`: every measured fraction, one ``ok_*``
    boolean per rule at the paper's published drop threshold (override
    any subset via ``thresholds``), and the conjunction
    ``passes_repetition``.

    Same scale shape as the battery: two shuffle-free row-local
    projections; the flags are plain comparisons over the second.

    On a pandas-less driver the kernel lane is unavailable; the gate
    falls back to the expression lane with the dup-n rules on the
    COUNT-frac columns at the same values (the pre-r13 deviation,
    r14 review fix — previously this raised ImportError mid-plan), with
    a warning.  Override keys must name rules gate-able in the active
    lane; the batch and streaming gates validate against the SAME set.

    .. note:: the published thresholds assume the quality battery's
       ≥50-word floor runs alongside (as in the paper): on a ~25-word
       doc a SINGLETON 4-gram covers ~18% of the characters and trips
       the 0.16 ``top_4gram`` rule by construction.  Gate short docs on
       word count first (``gopher_quality_flags`` / ``min_words``).
    """
    kernel = pd is not None
    if not kernel:  # pragma: no cover — pandas is baked into this env
        import warnings

        warnings.warn(
            "pandas unavailable: repetition gate falling back to the "
            "expression lane (dup-n rules gate count fractions)",
            RuntimeWarning, stacklevel=2)
    th = _gate_thresholds(kernel)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown repetition rules: {sorted(unknown)}")
        th.update(thresholds)
    # dup_char: the dup-n-gram rules gate the paper's duplicated-character
    # fraction (kernel lane), next to the count-based battery columns
    rep = gopher_repetition(df, id_col, text_col,
                            kernel=kernel, dup_char=kernel)
    oks = [(F.col(m) <= F.lit(v)).alias(f"ok_{m}") for m, v in th.items()]
    passes = F.lit(True)
    for m, v in th.items():
        passes = passes & (F.col(m) <= F.lit(v))
    return rep.select(
        "*", *oks, passes.alias("passes_repetition"),
    )


def with_passes_repetition(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
    out_col: str = "_passes_repetition",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Append the :func:`gopher_repetition_flags` conjunction as ONE
    boolean column while PRESERVING every input column — the
    streaming-safe form of the repetition gate (two stateless
    projections, no join, no id requirement; batch curate uses the
    join-based gate, streaming curate filters on this column).

    With non-default ``top_ns``/``dup_ns`` the conjunction covers only
    the rules whose metric is computed; threshold overrides must name
    GATE-ABLE rules — the same key set :func:`gopher_repetition_flags`
    accepts (r14 review fix: a count-frac override like
    ``dup_5gram_frac`` is rejected in BOTH gates rather than silently
    conjoined with the char-frac default here).  Kernel lane (r13): one
    Arrow-batched struct UDF per row — still a stateless projection,
    streaming-safe; pandas-less drivers fall back to the expression
    lane exactly as the batch gate does.
    """
    kernel = pd is not None
    if not kernel:  # pragma: no cover — pandas is baked into this env
        import warnings

        warnings.warn(
            "pandas unavailable: repetition gate falling back to the "
            "expression lane (dup-n rules gate count fractions)",
            RuntimeWarning, stacklevel=2)
    names = set(_metric_names(top_ns, dup_ns, dup_char=kernel))
    th = _gate_thresholds(kernel, names)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown repetition rules: {sorted(unknown)}")
        th.update(thresholds)
    orig = df.columns
    if not kernel:  # pragma: no cover — expression-lane fallback
        staged = df.select("*", *_repetition_stage_cols(text_col, top_ns, dup_ns))
        metered = staged.select(*orig, *_repetition_metric_cols(top_ns, dup_ns))
        passes = F.lit(True)
        for m, v in th.items():
            passes = passes & (F.col(m) <= F.lit(v))
        return metered.select(*orig, passes.alias(out_col))
    udf = _repetition_kernel_udf(top_ns, dup_ns, dup_char=True)
    staged = df.select("*", udf(F.col(text_col)).alias("_rep"))
    passes = F.lit(True)
    for m, v in th.items():
        passes = passes & (F.round(F.col("_rep")[m], 6) <= F.lit(v))
    return staged.select(*orig, passes.alias(out_col))


def _metric_names(top_ns, dup_ns, dup_char: bool = False) -> list[str]:
    dup_cols = []
    for nn in dup_ns:
        dup_cols.append(f"dup_{nn}gram_frac")
        if dup_char:
            dup_cols.append(f"dup_{nn}gram_char_frac")
    return (
        ["dup_line_frac", "dup_line_char_frac",
         "dup_para_frac", "dup_para_char_frac"]
        + [f"top_{nn}gram_char_frac" for nn in top_ns]
        + dup_cols
    )
