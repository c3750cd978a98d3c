"""TF-IDF / BM25 (operators/tfidf.py) — hand-computed semantics, edge
cases, and plan shape.  Registry-level oracle parity at sf0.01 lives in
tests/test_extra_registry.py (tfidf_topk, bm25_search)."""

from __future__ import annotations

import math

import pytest

from dbc_informed_socketcan_to_parquet_spark.operators.tfidf import (
    bm25_score,
    doc_frequencies,
    term_counts,
    tfidf_topk,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )


def test_term_and_doc_frequencies(spark, docs):
    tf = {(r.doc_id, r.term): r.tf for r in term_counts(docs).collect()}
    assert tf[(1, "apple")] == 2 and tf[(1, "banana")] == 1
    assert tf[(3, "cherry")] == 3 and tf[(3, "durian")] == 1
    df = {r.term: r.df for r in doc_frequencies(term_counts(docs)).collect()}
    assert df == {"apple": 1, "banana": 2, "cherry": 2, "durian": 1}


def test_tfidf_topk_hand_computed(spark, docs):
    # N=3; smooth idf = ln((N+1)/(df+1)) + 1
    idf = {t: math.log(4 / (d + 1)) + 1 for t, d in
           {"apple": 1, "banana": 2, "cherry": 2, "durian": 1}.items()}
    out = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in tfidf_topk(docs, k=2).collect()}
    assert out[(1, 1)][0] == "apple"
    assert out[(1, 1)][1] == pytest.approx(2 * idf["apple"], abs=1e-6)
    assert out[(1, 2)][0] == "banana"
    assert out[(3, 1)][0] == "cherry"
    assert out[(3, 1)][1] == pytest.approx(3 * idf["cherry"], abs=1e-6)
    assert out[(3, 2)][0] == "durian"
    # doc 2: tie on tf=1 — banana (idf ln(4/3)+1) < cherry? equal idf
    # (same df) -> tie broken by term asc: banana first
    assert out[(2, 1)][0] == "banana" and out[(2, 2)][0] == "cherry"
    with pytest.raises(ValueError):
        tfidf_topk(docs, k=0)


def test_bm25_hand_computed(spark, docs):
    # query = {cherry}: df=2, N=3 -> idf = ln(1 + (3-2+0.5)/(2+0.5))
    out = {r.doc_id: (r.n_hits, r.bm25) for r in bm25_score(docs, ["cherry"]).collect()}
    assert set(out) == {2, 3}          # doc 1 has no query term
    idf = math.log(1 + 1.5 / 2.5)
    avgdl = (3 + 2 + 4) / 3
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[2] == (1, pytest.approx(s(1, 2), abs=1e-6))
    assert out[3] == (1, pytest.approx(s(3, 4), abs=1e-6))
    # multi-term query sums per-term contributions
    multi = {r.doc_id: r.bm25 for r in bm25_score(docs, ["cherry", "durian"]).collect()}
    assert multi[3] > out[3][1]
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_bm25_query_filter_prunes_before_shuffle(spark, docs):
    """The query-term isin filter must sit below the aggregation — only
    query-term rows reach the exchange — and the scoring pass has no
    join (idf is a literal map)."""
    import re

    df = bm25_score(docs, ["cherry"])
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Join" not in plan
    # one aggregation exchange for (doc, term), one for the final doc agg
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) <= 2


def test_tfidf_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "apple apple"), (2, None), (3, ""), (4, "???")],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, k=3)
    assert {r.doc_id for r in out.collect()} == {1}
    assert bm25_score(df, ["apple"]).count() == 1


# -- knn_classify (operators/similarity.py, r7) ------------------------------

def test_knn_classify_separable_clusters(spark):
    """Queries near a labeled cluster inherit its label; votes and
    n_neighbors are exact; tie-break picks the smallest label."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        knn_classify,
    )

    def vec(angle):  # unit 2-d vectors by angle
        return [math.cos(angle), math.sin(angle)]

    corpus_rows = (
        [(i, vec(0.0 + 0.01 * i), 1) for i in range(5)]          # cluster A @ 0 rad
        + [(10 + i, vec(2.0 + 0.01 * i), 2) for i in range(5)]   # cluster B @ 2 rad
    )
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>, label int"
    )
    queries = spark.createDataFrame(
        [(100, vec(0.02)), (101, vec(2.02))],
        "query_id long, embedding array<double>",
    )
    out = {r.query_id: (r.predicted_label, r.votes, r.n_neighbors)
           for r in knn_classify(corpus, queries, k=3).collect()}
    assert out[100] == (1, 3, 3)
    assert out[101] == (2, 3, 3)

    # k larger than the corpus: n_neighbors caps at corpus size
    small = corpus.filter("vec_id < 2")
    capped = knn_classify(small, queries, k=5).collect()
    assert all(r.n_neighbors == 2 for r in capped)

    # exact vote tie (1 neighbor each from two labels) -> smallest label
    tie_corpus = spark.createDataFrame(
        [(1, vec(0.0), 7), (2, vec(0.04), 3)],
        "vec_id long, embedding array<double>, label int",
    )
    tie = knn_classify(tie_corpus, queries.filter("query_id = 100"), k=2).collect()
    assert tie[0].predicted_label == 3 and tie[0].votes == 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        knn_classify(corpus, queries, k=0)


def test_knn_classify_neighborless_queries_keep_rows(spark):
    """ADVICE r8: the every-query-emits-a-row contract. An EMPTY labeled
    corpus must return one (query_id, NULL, 0, 0) row per query instead
    of the old inner-join vanishing behavior; a tiny corpus (< k rows)
    keeps per-query rows exact alongside."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        knn_classify,
    )

    def vec(angle):
        return [math.cos(angle), math.sin(angle)]

    queries = spark.createDataFrame(
        [(100, vec(0.02)), (101, vec(2.02)), (102, vec(4.0))],
        "query_id long, embedding array<double>",
    )
    empty_corpus = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    out = {r.query_id: (r.predicted_label, r.votes, r.n_neighbors)
           for r in knn_classify(empty_corpus, queries, k=3).collect()}
    assert out == {100: (None, 0, 0), 101: (None, 0, 0), 102: (None, 0, 0)}

    # mixed: corpus exists but is smaller than k -> every query still
    # gets exactly one row, n_neighbors capped at |corpus|
    tiny = spark.createDataFrame(
        [(1, vec(0.0), 7)], "vec_id long, embedding array<double>, label int"
    )
    rows = knn_classify(tiny, queries, k=5).collect()
    assert len(rows) == 3
    assert all((r.predicted_label, r.votes, r.n_neighbors) == (7, 1, 1)
               for r in rows)


# -- ann_recall (operators/similarity.py, r7) ---------------------------------

def test_ann_recall_exact_partial_and_empty(spark):
    """recall(exact, exact) == 1; partial overlap counts per-query; a
    query the approx side missed entirely scores 0, not a dropped row."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(0, i) for i in range(5)] + [(1, 10 + i) for i in range(5)],
        "query_id long, vec_id long",
    )
    # query 0: 3/5 correct; query 1: nothing returned at all
    approx = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 99), (0, 98)],
        "query_id long, vec_id long",
    )
    perfect = {r.query_id: r.recall for r in ann_recall(exact, exact).collect()}
    assert perfect == {0: 1.0, 1: 1.0}

    out = {r.query_id: (r.n_exact, r.hits, r.recall)
           for r in ann_recall(exact, approx).collect()}
    assert out[0] == (5, 3, 0.6)
    assert out[1] == (5, 0, 0.0)


# -- ann_tune (operators/similarity.py, r9) ----------------------------------

def _tune_fixture(spark, n=200, dim=8, seed=7):
    """Deterministic clustered vectors: enough structure that IVF recall
    rises with nprobe, enough spread that nprobe=1 misses neighbors."""
    import math
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        center = i % 4
        base = [math.cos(center * 1.5 + d * 0.3) for d in range(dim)]
        rows.append((i, [b + rnd.uniform(-0.4, 0.4) for b in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_tune_monotone_recall_and_selection(spark):
    """Recall@k is monotone in nprobe on the fixture (each probe widens a
    SUPERSET candidate scan), and selection picks the cheapest candidate
    meeting the target — nprobe=num_clusters is exhaustive (recall 1.0),
    so a 1.0 target always selects something."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ann_tune

    emb = _tune_fixture(spark)
    queries = emb.filter("vec_id < 6").selectExpr("vec_id AS query_id", "embedding")
    out = ann_tune(
        emb, queries, dim=8, k=10, index="ivf", candidates=(1, 2, 4, 8),
        target_recall=1.0, num_clusters=8, round_to=6,
    ).collect()
    by_p = {r.param: r for r in out}
    assert sorted(by_p) == [1, 2, 4, 8]
    recalls = [by_p[p].mean_recall for p in (1, 2, 4, 8)]
    assert recalls == sorted(recalls), recalls          # monotone in nprobe
    assert by_p[8].mean_recall == 1.0                   # exhaustive probe
    assert recalls[0] < 1.0                             # nprobe=1 actually misses
    cheapest_meeting = min(p for p in by_p if by_p[p].mean_recall >= 1.0)
    assert [p for p, r in by_p.items() if r.selected] == [cheapest_meeting]
    assert all(r.meets_target == (r.mean_recall >= 1.0) for r in out)


def test_ann_tune_falls_back_to_best_recall(spark):
    """No candidate meets an impossible target -> the best-recall row is
    selected (smallest knob on ties), never zero selected rows."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ann_tune

    emb = _tune_fixture(spark)
    queries = emb.filter("vec_id < 4").selectExpr("vec_id AS query_id", "embedding")
    out = ann_tune(
        emb, queries, dim=8, k=10, index="ivf", candidates=(1, 2),
        target_recall=2.0, num_clusters=8, round_to=6,
    ).collect()
    assert not any(r.meets_target for r in out)
    sel = [r for r in out if r.selected]
    assert len(sel) == 1
    best = max(r.mean_recall for r in out)
    assert sel[0].mean_recall == best


def test_ann_tune_lsh_index_and_validation(spark):
    """The LSH variant sweeps num_tables through the same contract; bad
    arguments fail loudly."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ann_tune

    emb = _tune_fixture(spark, n=80)
    queries = emb.filter("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    out = ann_tune(
        emb, queries, dim=8, k=5, index="lsh", candidates=(1, 4),
        target_recall=0.0, num_planes=4, round_to=6,
    ).collect()
    by_p = {r.param: r for r in out}
    assert sorted(by_p) == [1, 4]
    assert by_p[1].mean_recall <= by_p[4].mean_recall   # more tables, ≥ recall
    assert by_p[1].selected                              # target 0: cheapest wins

    with _pytest.raises(ValueError, match="index"):
        ann_tune(emb, queries, dim=8, index="faiss")
    with _pytest.raises(ValueError, match="candidates"):
        ann_tune(emb, queries, dim=8, candidates=())
    with _pytest.raises(ValueError, match="distinct"):
        ann_tune(emb, queries, dim=8, candidates=(2, 2))
    with _pytest.raises(ValueError, match="dim"):
        ann_tune(emb, queries, index="lsh")
