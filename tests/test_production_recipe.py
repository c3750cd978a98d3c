"""The full production recipe, end-to-end in one test: every round-6
surface composed the way a real training-data pipeline would run them.

  stage 0: train quality models ONCE (lm_write, classifier_write)
  stage 1: STREAMING front door — JSONL landing dir drained through
           quarantine → normalize → quality gate → row-local model
           gates → watermarked exact dedup → parquet landing
  stage 2: BATCH curate over the landed table — URL front door
           (blocklist, canonical dedup) → quality gates → near-dup
           clustering, scoring the SAME persisted models
  stage 3: tokenize → export_training_shards → manifest verified
           lossless and reproducible under different parallelism
  stage 4: temperature_mix over the curated corpus as the sampling
           recipe
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

GOOD = [
    "a clear and well formed english paragraph about everyday cooking with enough distinct words to pass the quality rules",
    "another thoughtfully written english passage on cooking techniques and the joys of a well seasoned cast iron pan",
    "a third clean cooking essay praising fresh herbs sharp knives and the patience that good stock always demands",
    "a fourth tidy cooking note describing how gentle heat and honest cooking butter rescue almost any weekday dinner",
]
GIB = ("zxqv wkjh qpzm vbnx lkjq rtyu asdf ghjk zxcv bnml qwer tyui "
       "opas dfgh jklz xcvb nmqw erty uiop asdf ghjk lzxc vbnm qqqq")


def test_production_recipe_end_to_end(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.sampling import (
        temperature_mix,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_write,
        lm_score,
        lm_write,
    )
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import py_md5_long
    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    # ---- stage 0: models train once on a trusted slice ----
    ref = spark.createDataFrame(
        [(i, GOOD[i % len(GOOD)]) for i in range(40)], "doc_id long, text string"
    )
    lm_dir = str(tmp_path / "models" / "lm")
    lm_write(ref, lm_dir)
    probe = spark.createDataFrame(
        [(0, GOOD[0]), (1, GIB)], "doc_id long, text string"
    )
    perp = {r.doc_id: r.perplexity for r in lm_score(probe, corpus=ref).collect()}
    thr = (perp[0] + perp[1]) / 2
    nf = 1 << 12
    w = spark.createDataFrame(
        [(py_md5_long("cooking", salt="clf|") % nf, 8.0)], "idx long, w double"
    )
    clf_dir = str(tmp_path / "models" / "clf")
    classifier_write(w, clf_dir, num_features=nf)

    # ---- stage 1: streaming front door drains the landing dir ----
    land = tmp_path / "landing"
    land.mkdir()
    url = lambda i, dom: f"https://www.{dom}/p/{i}?b=2&a=1&utm_source=t"
    docs = (
        [{"doc_id": i, "text": GOOD[i % 4] + f" marker {i}",
          "lang": "en", "source": "web" if i % 2 else "books",
          "n_chars": 100, "url": url(i, "keep.org" if i % 3 else "spam.net")}
         for i in range(24)]
        + [{"doc_id": 100, "text": GIB, "lang": "en", "source": "web",
            "n_chars": len(GIB), "url": url(100, "keep.org")},
           {"doc_id": 101, "text": GOOD[1] + " marker 1", "lang": "en",
            "source": "web", "n_chars": 100, "url": url(1, "keep.org")}]
    )
    lines = [json.dumps(d) for d in docs] + ["corrupt {line"]
    (land / "shard0.jsonl").write_text("\n".join(lines) + "\n")

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("url", T.StringType()),
    ])
    landed_dir = str(tmp_path / "landed")
    quar = str(tmp_path / "quarantine")
    for q in run_streaming_curate(
        spark, str(land), landed_dir, str(tmp_path / "ckpt"), schema=schema,
        min_chars=32, min_quality=0.0, watermark="1 hour",
        quarantine_dir=quar, available_now=True,
        lm_path=lm_dir, max_perplexity=thr,
    ):
        q.awaitTermination()
    landed = spark.read.parquet(landed_dir)
    # gibberish LM-gated; doc 101 is an exact dup of doc 1's text
    ids = {r.doc_id for r in landed.collect()}
    assert 100 not in ids and len(ids & {1, 101}) == 1
    assert spark.read.json(quar).count() == 1

    # ---- stage 2: batch curate with the URL front door + same models ----
    cfg = CurateConfig(
        min_chars=32, min_quality=0.0, jaccard_threshold=0.9,
        url_col="url", url_blocklist=("spam.net",), url_dedup=True,
        lm_path=lm_dir, max_perplexity=thr,
        classifier_path=clf_dir, min_clf_prob=0.5,
    )
    curated = curate(landed.drop("_ingest_ts"), config=cfg)
    cur = curated.collect()
    assert 0 < len(cur) < 24
    hosts = {r.url for r in cur}
    assert all("spam.net" not in u for u in hosts)

    # ---- stage 3: tokenize + shard export, reproducible across widths ----
    with_tok = curated.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+")).cast("long")
    )
    m1 = export_training_shards(
        with_tok, str(tmp_path / "shards1"), "n_tokens", 128,
        num_shards=4, pack_partitions=8,
    )
    m2 = export_training_shards(
        with_tok.repartition(7), str(tmp_path / "shards2"), "n_tokens", 128,
        num_shards=4, pack_partitions=8,
    )
    assert m1["total_docs"] == len(cur)
    assert m1["shards"] == m2["shards"]
    total_tok = with_tok.agg(F.sum("n_tokens")).collect()[0][0]
    assert m1["total_tokens"] == total_tok          # lossless accounting

    # ---- stage 4: the sampling recipe over the curated corpus ----
    mixed = temperature_mix(with_tok, "n_tokens", source_col="source", alpha=0.5)
    assert 0 < mixed.count() <= len(cur)
    assert "keep_frac" in mixed.columns


def test_r9_crawl_recipe_html_plus_trained_classifier(spark, tmp_path):
    """The round-9 crawl-shaped loop end-to-end: raw HTML corpus →
    extract_text front door → in-engine classifier_train on labeled
    seeds → classifier_write → curate with BOTH --extract-html and the
    trained --classifier-path gate.  Pins that the extraction output is
    what the trained model actually scores (extraction runs before the
    gate), and that the gate separates on extracted prose, not markup."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_train,
        classifier_write,
    )

    def page(body):
        return (f"<html><head><script>var x=1;</script></head><body>"
                f"<nav><a href='/'>Home</a> <a href='/a'>About pages</a></nav>"
                f"<p>{body}</p><footer><a href='/t'>Terms</a></footer></body></html>")

    good = [
        "a clear well formed paragraph about everyday cooking with plenty of distinct words",
        "another thoughtfully written passage on cooking techniques and seasoned pans",
        "a third clean essay praising fresh herbs sharp knives and patient stock",
    ]
    bad = [
        "zxqv wkjh qpzm vbnx lkjq rtyu asdf ghjk spam spam spam spam spam click",
        "qqqq wwww eeee rrrr tttt buy now click here spam offer expires tonight",
        "asdf ghjk zxcv bnml click buy spam now qwer tyui opas dfgh free offer",
    ]
    # stage 0: train on labeled PLAIN-TEXT seeds (what extraction emits)
    seeds = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(good * 5)]
        + [(100 + i, t, 0) for i, t in enumerate(bad * 5)],
        "doc_id long, text string, label int",
    )
    w, b = classifier_train(seeds, n_iters=8, lr=4.0, num_features=2048)
    clf_dir = str(tmp_path / "clf")
    classifier_write(w, clf_dir, num_features=2048, bigrams=True, bias=b)

    # stage 1: the crawl arrives as HTML (good and spam pages, distinct)
    crawl = spark.createDataFrame(
        [(i, page(f"{t} crawl variant {i}")) for i, t in enumerate(good)]
        + [(100 + i, page(f"{t} crawl variant {i}")) for i, t in enumerate(bad)],
        "doc_id long, text string",
    )
    kept = curate(
        crawl,
        config=CurateConfig(
            html_extract=True, min_quality=0.0, min_chars=10,
            classifier_path=clf_dir, min_clf_prob=0.5,
        ),
    ).collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [0, 1, 2], ids                     # spam pages gated out
    for r in kept:
        assert "Home" not in r["text"] and "<p>" not in r["text"]
