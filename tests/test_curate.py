"""End-to-end curation pipeline (operators/curate.py)."""

from __future__ import annotations

from dbc_informed_socketcan_to_parquet_spark.operators.curate import CurateConfig, curate


def test_curate_end_to_end_stages(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet green field while the sun is high in the clear blue sky"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                    # exact dup of 1 → dropped
            (3, base.replace("dog", "cat")),              # near dup of 1 → clustered out
            (4, "x"),                                     # too short → quality gate
            (5, "spam " * 40),                            # repetition gate
            (6, "mail bob@example.com about the totally different proposal for "
                "building a better analytics engine with many novel distributed ideas"),
        ],
        "doc_id long, text string",
    )
    kept = curate(docs, config=CurateConfig(min_chars=32, min_quality=0.3,
                                            jaccard_threshold=0.5))
    rows = {r.doc_id: r.text for r in kept.collect()}
    assert set(rows) == {1, 6}
    assert "<EMAIL>" in rows[6] and "bob@example.com" not in rows[6]


def test_curate_fixture_smoke(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = curate(docs, config=CurateConfig(min_quality=0.0, min_chars=1))
    n_in, n_out = docs.count(), kept.count()
    assert 0 < n_out <= n_in
    assert set(kept.columns) == set(docs.columns)
