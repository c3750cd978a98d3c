"""Text primitives shared by the dedup / text-analysis operators.

All pure Column algebra (split/regexp/transform) — JVM-side.  Regex
patterns are restricted to syntax with identical semantics in Java regex
(Spark) and RE2 (DuckDB) so oracle queries can mirror them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword list (public, common across IR literature).
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on as with at by from",
)
STOPWORD_LIST = STOPWORDS[0].split()

TOKEN_SPLIT_RE = r"\s+"
#: BPE-ish word/number/punct chunking for token *counting* (not a real BPE —
#: a deterministic regex proxy with the same order of magnitude).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings removed."""
    return F.filter(F.split(F.trim(text), TOKEN_SPLIT_RE), lambda t: t != "")


def bpe_ish_count(text: Column) -> Column:
    """Count of BPE-ish chunks — ``regexp_count`` keeps it scalar (no array)."""
    return F.regexp_count(text, F.lit(BPE_ISH_RE))


def char_shingles(text: Column, n: int, lowercase: bool = True, max_chars: int = 4096) -> Column:
    """Array of character n-grams (positions preserved, duplicates kept).

    ``max_chars`` bounds per-row work so one pathological document cannot
    skew a task; at 100 TB the cap is what keeps shingle explosion linear.
    """
    t = F.lower(text) if lowercase else text
    t = F.substring(t, 1, max_chars)
    count = F.length(t) - F.lit(n - 1)
    # guard: sequence(1, 0) would count DOWN in Spark — short texts must
    # yield an empty array, not bogus shingles
    return F.when(
        count >= 1,
        F.transform(F.sequence(F.lit(1), count), lambda i: t.substr(i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column, n: int) -> Column:
    """Array of word n-grams joined by single spaces."""
    toks = tokens(F.lower(text))
    count = F.size(toks) - F.lit(n - 1)
    # guard as in char_shingles: sequence(1, 0) counts DOWN and slice() at
    # index 0 raises — texts shorter than n words yield an empty array
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
