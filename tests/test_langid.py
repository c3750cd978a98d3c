"""Trained multiclass language ID (operators/langid.py) — accuracy on a
REAL multilingual corpus (the sf fixtures' lang labels carry no textual
signal, so the registry entry only pins cross-engine parity; here the
model must actually separate languages), persisted-model equivalence,
the streaming row-local kernel, and edge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.operators.langid import (
    lang_id_from,
    lang_id_rowlocal,
    lang_id_trained,
    lang_train,
    lang_write,
)

# small but genuinely distinct corpora (train) + held-out sentences (test)
_TRAIN = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river",
        "distributed systems shuffle data between workers during wide joins",
        "she walked to the market and bought fresh bread this morning",
        "query engines optimize plans before executing them on the cluster",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund am fluss",
        "verteilte systeme mischen daten zwischen den maschinen während der verarbeitung",
        "sie ging zum markt und kaufte heute morgen frisches brot",
        "die abfragemaschine optimiert den plan bevor sie ihn ausführt",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux près de la rivière",
        "les systèmes distribués échangent des données entre les machines pendant le traitement",
        "elle est allée au marché et a acheté du pain frais ce matin",
        "le moteur de requête optimise le plan avant de l'exécuter",
    ],
    "zh": [
        "敏捷的棕色狐狸跳过了河边那只懒狗",
        "分布式系统在处理过程中在机器之间交换数据",
        "她今天早上去市场买了新鲜的面包",
        "查询引擎在执行计划之前会对其进行优化",
    ],
}

_HELD_OUT = [
    ("the engine reads the plan and sends work to every node", "en"),
    ("der hund läuft schnell über die brücke zum markt", "de"),
    ("le chat dort près de la fenêtre pendant la journée", "fr"),
    ("狐狸在桥上看着河里的鱼", "zh"),
]

_NF = 1 << 14


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (100 * li + i, text, lang)
        for li, (lang, texts) in enumerate(sorted(_TRAIN.items()))
        for i, text in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_train_separates_real_languages(spark, corpus):
    weights, priors_df = lang_train(corpus, num_features=_NF)
    priors = [(r["lang"], r["logprior"], r["floor_w"]) for r in priors_df.collect()]
    held = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(_HELD_OUT)], "doc_id long, text string"
    )
    pred = {
        r.doc_id: r.predicted_lang
        for r in lang_id_trained(held, weights, priors, num_features=_NF).collect()
    }
    assert [pred[i] for i in range(len(_HELD_OUT))] == [l for _, l in _HELD_OUT]


def test_lang_write_from_rowlocal_agree(spark, corpus, tmp_path):
    path = str(tmp_path / "langmodel")
    langs = lang_write(corpus, path, num_features=_NF)
    assert langs == ["de", "en", "fr", "zh"]

    held = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(_HELD_OUT)] + [(99, None), (98, "ab")],
        "doc_id long, text string",
    )
    batch = {r.doc_id: (r.predicted_lang, r.lang_score)
             for r in lang_id_from(held, path).collect()}
    local = {r.doc_id: (r.lang_pred, r.lang_score)
             for r in lang_id_rowlocal(held, path).collect()}
    assert set(batch) == set(local) == {0, 1, 2, 3, 98, 99}
    for k in batch:
        assert batch[k][0] == local[k][0]
        assert batch[k][1] == pytest.approx(local[k][1], abs=2e-6)
    # featureless docs (NULL text, shorter than the trigram) -> unknown
    assert batch[99] == ("unknown", 0.0) and batch[98] == ("unknown", 0.0)
    # rowlocal composes by column: original columns survive
    assert set(lang_id_rowlocal(held, path).columns) == {
        "doc_id", "text", "lang_pred", "lang_score"
    }


def test_lang_id_trained_plan_is_broadcast(spark, corpus):
    """The scoring join against the weight table must broadcast; the
    per-language fan-out is a literal-array explode, never a cross
    join (the corpus only ever shuffles on doc_id)."""
    weights, priors_df = lang_train(corpus, num_features=_NF)
    priors = [(r["lang"], r["logprior"], r["floor_w"]) for r in priors_df.collect()]
    df = lang_id_trained(corpus, weights, priors, num_features=_NF)
    plan = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    jdf = df._jdf.queryExecution().explainString(
        plan.fromString("formatted")
    )
    assert "BroadcastHashJoin" in jdf
    assert "CartesianProduct" not in jdf
    assert "BroadcastNestedLoopJoin" not in jdf


def test_curate_trained_lang_gate(spark, corpus, tmp_path):
    """curate(lang_model_path=...) routes the language gate through the
    persisted trained model instead of the stopword heuristic."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )

    model_dir = str(tmp_path / "langmodel")
    lang_write(corpus, model_dir, num_features=_NF)
    docs = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(_HELD_OUT)], "doc_id long, text string"
    )
    cfg = CurateConfig(
        min_chars=10, min_quality=0.0, jaccard_threshold=0.99,
        allowed_langs=("en", "fr"), lang_model_path=model_dir,
    )
    kept = sorted(r.doc_id for r in curate(docs, config=cfg).collect())
    want = sorted(i for i, (_, l) in enumerate(_HELD_OUT) if l in ("en", "fr"))
    assert kept == want


def test_lang_id_trained_deterministic_tiebreak(spark):
    """Equal scores resolve to the lexicographically smallest language
    code — a one-doc corpus trained on two identical-text languages."""
    corpus = spark.createDataFrame(
        [(1, "aaa bbb", "xx"), (2, "aaa bbb", "yy")],
        "doc_id long, text string, lang string",
    )
    weights, priors_df = lang_train(corpus, num_features=_NF)
    priors = [(r["lang"], r["logprior"], r["floor_w"]) for r in priors_df.collect()]
    out = lang_id_trained(
        spark.createDataFrame([(9, "aaa bbb")], "doc_id long, text string"),
        weights, priors, num_features=_NF,
    ).collect()
    assert out[0].predicted_lang == "xx"
