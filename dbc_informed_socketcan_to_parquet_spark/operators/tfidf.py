"""TF-IDF / BM25 term scoring over the corpus — the retrieval-shaped
layer of a training-data pipeline: per-document keyword extraction
(topic tagging, boilerplate detection via top-term inspection) and
query-against-corpus relevance (finding benchmark-like or domain-like
documents without embeddings).

The reference engine has no text layer; these extend the north-star
corpus operators with the classic sparse-retrieval primitives,
expressed in the shapes that survive 100 TB:

- term/document frequencies are ONE explode + counted groupBys with
  map-side partials (the ``bpe_word_counts`` shape);
- the DF (document-frequency) table is vocab-sized — NOT assumed
  broadcastable: the tf⋈df join shuffles on the term key, where both
  sides are already aggregated (corpus-linear with small constants),
  never the raw explode;
- per-document top-k is an aggregation (sort the per-doc term array,
  slice k) — no corpus-wide window, no per-term row explosion past the
  join;
- BM25 *search* inverts the cost: the query's terms are a LITERAL
  isin-filter over the exploded terms, so Catalyst prunes everything
  else at the first projection and the per-doc aggregation only ever
  sees query-term rows.

Tokenization matches ``textops.LM_TOKEN_SPLIT`` so LM features, BPE
words, and retrieval terms share one notion of "word"; scores round to
``round_to`` decimals so DuckDB oracles replay them hash-exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.operators.textops import _lm_tokens


def term_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf) — per-document term frequencies.  One explode +
    one counted groupBy (map-side partials): the only corpus-sized
    stage everything below reuses."""
    return (
        df.select(F.col(id_col), F.explode(_lm_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) — number of documents containing each term, derived
    from the already-counted tf table (one row per (doc, term), so a
    count of non-null ``id_col`` per term — no re-explode, no
    distinct).  ``id_col`` must name the tf frame's document column
    (ADVICE r7: the parameter now validates and counts on it instead
    of being dead surface)."""
    if id_col not in tf.columns:
        raise ValueError(
            f"doc_frequencies: id_col {id_col!r} not in tf columns {tf.columns}"
        )
    return tf.groupBy("term").agg(F.count(F.col(id_col)).alias("df"))


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF →
    ``(id_col, term, rank, tfidf)``.

    ``tfidf = tf · (ln((N + 1) / (df + 1)) + 1)`` — the sklearn-style
    smooth idf (never zero, never negative, defined for df = N).

    Execution: tf ⋈ df on the term key (both pre-aggregated), then ONE
    groupBy(doc) that sorts the per-doc term array and slices ``k`` —
    deterministic tie-break (score desc, then term asc), no corpus-wide
    window.  N comes from one count() of the input."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_docs = df.count()
    tf = term_counts(df, id_col, text_col)
    dfreq = doc_frequencies(tf, id_col)
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        F.col("term"),
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
            round_to,
        ).alias("tfidf"),
    )
    packed = scored.groupBy(id_col).agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("tfidf")).alias("ns"), F.col("term")))
            ),
            1, k,
        ).alias("_top")
    )
    return (
        packed.select(F.col(id_col), F.posexplode("_top").alias("_i", "_t"))
        .select(
            F.col(id_col),
            F.col("_t.term").alias("term"),
            (F.col("_i") + 1).cast("int").alias("rank"),
            F.round(-F.col("_t.ns"), round_to).alias("tfidf"),
        )
    )


def bm25_score(
    df: DataFrame,
    query: list[str] | tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """BM25 relevance of every document against a literal ``query`` →
    ``(id_col, n_hits, bm25)`` for documents matching ≥ 1 query term.

    ``idf(t) = ln(1 + (N − df + 0.5) / (df + 0.5))`` (the
    Robertson/Sparck-Jones form with the +1 that keeps it positive);
    ``score = Σ idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Scale shape: the query terms compile to an ``isin`` filter that
    Catalyst pushes below the tf aggregation, so the term shuffle
    carries ONLY query-term rows (|query| rows per matching doc, not
    the vocabulary).  The query-term df/idf values collect driver-side
    (|query| values) and come back as a literal map — no join at all in
    the scoring pass; doc lengths ride along from the same tf scan."""
    terms = sorted({t.lower() for t in query if t})
    if not terms:
        raise ValueError("query must contain at least one non-empty term")
    n_docs = df.count()
    toks = df.select(F.col(id_col), _lm_tokens(text_col).alias("_toks"))
    avgdl = toks.agg(F.avg(F.size("_toks"))).collect()[0][0] or 0.0
    # doc length rides THROUGH the explode (first() per group) so the
    # scoring pass needs no join back against a corpus-sized length
    # table — the only shuffle carries query-term rows
    hits = (
        toks.select(
            F.col(id_col), F.size("_toks").alias("_dl"),
            F.explode("_toks").alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("_dl").alias("_dl"))
    )
    # df per query term: |query| rows — driver-side by construction
    dfreq = {
        r["term"]: int(r["df"])
        for r in hits.groupBy("term").agg(
            F.count(F.lit(1)).alias("df")
        ).collect()
    }
    idf = {
        t: math.log(1.0 + (n_docs - dfreq.get(t, 0) + 0.5) / (dfreq.get(t, 0) + 0.5))
        for t in terms
    }
    # full-precision idf literals (no intermediate Python rounding —
    # Python's round is banker's, SQL round is half-away; only the FINAL
    # score is rounded, identically on both engines)
    idf_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(idf[t]))]
    )
    scored = hits.select(
        F.col(id_col),
        F.col("term"),
        (
            idf_map[F.col("term")]
            * (F.col("tf") * F.lit(float(k1 + 1.0)))
            / (
                F.col("tf")
                + F.lit(float(k1))
                * (
                    F.lit(1.0 - b)
                    + F.lit(float(b)) * F.col("_dl") / F.lit(float(avgdl) or 1.0)
                )
            )
        ).alias("_s"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_hits"),
        F.round(F.sum("_s"), round_to).alias("bm25"),
    )
