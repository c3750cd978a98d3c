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


def _boilerplate_clique(spark, n=60):
    """n near-identical docs (a boilerplate clique) + 3 distinct ones."""
    # long base text: one changed trailing token over ~70 words → true
    # Jaccard ≈ 0.88, far above the 0.5 verify threshold (est-Jaccard
    # noise from 32 perms is σ≈0.06, so edges never flake)
    base = (
        "this legal boilerplate footer is repeated across the whole corpus "
        "verbatim except for one serial token near the end of the text body "
        "which changes per page making every copy a near duplicate of all "
        "the others and the footer further recites governing law venue "
        "severability assignment notice and entire agreement clauses in the "
        "usual order followed by a short arbitration paragraph and a final "
        "line reserving all rights not expressly granted herein serial %d"
    )
    rows = [(i, base % i) for i in range(n)]
    rows += [
        (n + 1, "a completely unrelated essay on distributed query engines and "
                "their shuffle strategies at terabyte scale with novel ideas"),
        (n + 2, "another very different document describing alpine botany and "
                "the seasonal migration of pollinators across high meadows"),
        (n + 3, "a third standalone text about maritime navigation techniques "
                "used before the invention of the marine chronometer at sea"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_dedup_stage_is_star_bounded(spark):
    """The scale guard VERDICT r4 asked for: curate's near-dup stage must
    compose the O(bucket) star-edge path, whose edge count is bounded by
    bands × docs — NOT the all-pairs path (c²/2 per boilerplate bucket,
    measured 18× superlinear at sf1 in BASELINE.md)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_signatures,
    )

    n = 60
    docs = _boilerplate_clique(spark, n)
    sigs = minhash_signatures(docs, "doc_id", "text", num_perms=16, shingle_n=5)
    star = lsh_star_edges(sigs, "doc_id", num_bands=4, rows_per_band=4).count()
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_bands=4, rows_per_band=4).count()
    assert star <= 4 * (n + 3)          # linear bound: bands × docs
    assert pairs >= n * (n - 1) // 4    # all-pairs blows up quadratically

    # and curate() itself must route through the star path
    import importlib

    curate_mod = importlib.import_module(
        "dbc_informed_socketcan_to_parquet_spark.operators.curate"
    )

    assert not hasattr(curate_mod, "minhash_dedup_pairs"), (
        "curate must not import the all-pairs LSH path"
    )
    calls = []
    real = curate_mod.minhash_star_clusters
    try:
        curate_mod.minhash_star_clusters = lambda *a, **k: calls.append(1) or real(*a, **k)
        kept = curate(docs, config=CurateConfig(min_quality=0.0, min_chars=1,
                                                jaccard_threshold=0.5,
                                                minhash_perms=32,
                                                minhash_bands=8))
        kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    finally:
        curate_mod.minhash_star_clusters = real
    assert calls, "curate() did not call minhash_star_clusters"
    # one survivor from the clique, the three distinct docs untouched
    assert kept_ids == {0, n + 1, n + 2, n + 3}


def test_curate_hash_fn_equivalence(spark):
    """md5 (oracle-parity) and xxhash (production fast path) agree on
    which documents survive curation for clear-cut dup structure."""
    docs = _boilerplate_clique(spark, 40)
    # 32 perms / 8 bands: band-collision prob ≈ 1-(1-J⁴)⁸ ≈ 0.9998 at
    # J≈0.9, so both hash families fully link the clique deterministically
    cfg = dict(min_quality=0.0, min_chars=1, jaccard_threshold=0.5,
               minhash_perms=32, minhash_bands=8)
    kept_md5 = curate(docs, config=CurateConfig(hash_fn="md5", **cfg))
    kept_xx = curate(docs, config=CurateConfig(hash_fn="xxhash", **cfg))
    ids_md5 = {r.doc_id for r in kept_md5.select("doc_id").collect()}
    ids_xx = {r.doc_id for r in kept_xx.select("doc_id").collect()}
    assert ids_md5 == ids_xx == {0, 41, 42, 43}


def test_curate_quality_filter_reads_materialized_stats(spark):
    """Regression for the r5 pushdown blowup: the quality-gate filter must
    evaluate against the MATERIALIZED stats frame (localCheckpoint
    barrier), not against stat derivations inlined into the condition —
    inlined, the scrub regex chain appears ~20x inside one Filter and the
    curate prefix ran 57 s instead of 6 s at sf1.  Guard: no Filter node
    in the plan may contain a regexp_replace (the scrub chain belongs in
    exactly one Project)."""
    import io
    import contextlib
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan_df = curate(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    for m in re.finditer(r"^\(\d+\) Filter.*?(?=^\(\d+\) )", plan, re.S | re.M):
        assert "regexp_replace" not in m.group(0), (
            "scrub chain inlined into a Filter — the stats barrier is gone:\n"
            + m.group(0)[:500]
        )


def test_curate_optional_stages(spark):
    """Opt-in paragraph dedup, classifier gate, and LM gate compose with
    the classic pipeline without disturbing the default path."""
    import hashlib

    from pyspark.sql import functions as F

    boiler = "subscribe to our newsletter for all the latest product updates today"
    body_a = ("the quick brown fox jumps over the lazy dog and keeps running "
              "through the quiet green field under the clear morning sky")
    body_b = ("an entirely separate article describing the craft of baking good "
              "sourdough bread with patience and a very well kept starter")
    gibberish = ("zxqv wkjh qpzm vbnx lkjq rtyu asdf ghjk zxcv bnml qwer tyui "
                 "opas dfgh jklz xcvb nmqw erty uiop asdf ghjk lzxc vbnm qwer")
    docs = spark.createDataFrame(
        [
            (1, f"{body_a}\n{boiler}"),
            (2, f"{boiler}\n{body_b}"),          # loses the boilerplate paragraph
            (3, gibberish),                      # LM gate drops it
        ],
        "doc_id long, text string",
    )
    # CCNet arrangement: the LM trains on a trusted in-domain reference
    # (here: the clean bodies, repeated so common bigrams accumulate
    # counts); gibberish ranks strictly worse, and a threshold between
    # the bands drops exactly it.  (Self-training on a 3-doc input is
    # degenerate — add-one smoothing flattens the signal; the operator
    # docstring spells this out.)
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import lm_score

    ref = spark.createDataFrame(
        [(i, f"{body_a} {body_b} {boiler}") for i in range(20)],
        "doc_id long, text string",
    )
    rebuilt = spark.createDataFrame(
        [(1, f"{body_a}\n{boiler}"), (2, body_b), (3, gibberish)],
        "doc_id long, text string",
    )
    perp = {r.doc_id: r.perplexity for r in lm_score(rebuilt, corpus=ref).collect()}
    assert perp[3] > max(perp[1], perp[2])
    thr = (perp[3] + max(perp[1], perp[2])) / 2

    cfg = CurateConfig(
        min_chars=32, min_quality=0.0, jaccard_threshold=0.5,
        paragraph_dedup=True, max_perplexity=thr,
    )
    kept = {r.doc_id: r.text for r in curate(docs, config=cfg, lm_corpus=ref).collect()}
    assert set(kept) == {1, 2}
    assert kept[1] == f"{body_a}\n{boiler}"      # first occurrence keeps it
    assert kept[2] == body_b                     # later copy rebuilt without it

    # classifier gate: weight the word "fox" strongly negative => doc 1 out
    nf = 1 << 18
    idx = int(hashlib.md5(b"clf|fox").hexdigest()[:15], 16) % nf
    w = spark.createDataFrame([(idx, -500.0)], "idx long, w double")
    cfg2 = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5,
                        min_clf_prob=0.4)
    kept2 = {r.doc_id for r in curate(docs.filter(F.col("doc_id") < 3),
                                      config=cfg2, classifier_weights=w).collect()}
    assert kept2 == {2}

    # misconfiguration fails loudly
    import pytest

    with pytest.raises(ValueError, match="classifier_weights"):
        curate(docs, config=cfg2)


def test_curate_hot_span_scrub_stage(spark):
    """Opt-in exact-substring scrub: a mid-paragraph template repeated
    corpus-wide is cut from every doc (paragraph dedup can't catch it —
    it is embedded inside otherwise-unique paragraphs)."""
    tmpl = ("this message and any attachments are confidential and intended "
            "solely for the use of the individual addressee named above")  # 19 tokens
    bodies = [
        ("the quarterly report shows strong growth in the analytics division "
         "with revenue climbing steadily across all regional markets"),
        ("please find attached the updated project timeline reflecting the "
         "new milestones we discussed during the planning meeting yesterday"),
        ("the engineering team completed the migration to the new cluster "
         "ahead of schedule with zero downtime reported by monitoring"),
        ("our customer satisfaction survey results improved again this "
         "quarter driven by faster response times in the support queue"),
    ]
    docs = spark.createDataFrame(
        [(i, f"{b} {tmpl}") for i, b in enumerate(bodies)],
        "doc_id long, text string",
    )
    cfg = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5,
                       hot_span_window=19, hot_span_min_count=4)
    kept = {r.doc_id: r.text for r in curate(docs, config=cfg).collect()}
    assert set(kept) == {0, 1, 2, 3}             # bodies unique → all survive
    for i, b in enumerate(bodies):
        assert kept[i] == b                      # template excised verbatim

    # stage off → default path untouched (template still present)
    kept_off = {r.doc_id: r.text for r in curate(
        docs, config=CurateConfig(min_chars=32, min_quality=0.0,
                                  jaccard_threshold=0.5)).collect()}
    for i, b in enumerate(bodies):
        assert tmpl in kept_off.get(i, "")


def test_curate_gopher_gate(spark):
    """Opt-in Gopher gate: a pure bullet-list doc passes the built-in
    quality score but fails the bullet-lines rule."""
    good = ("the report shows that revenue continued to grow with steady "
            "demand and the team plans to have further expansion of the "
            "analytics platform that customers be asking for ") * 3
    bullets = "\n".join(
        f"- item {i} in the list of things that we track here" for i in range(20)
    )
    docs = spark.createDataFrame(
        [(1, good), (2, bullets)], "doc_id long, text string"
    )
    base_cfg = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5,
                            max_top_bigram_ratio=1.0)
    kept_off = {r.doc_id for r in curate(docs, config=base_cfg).collect()}
    assert kept_off == {1, 2}                     # default gate keeps both
    gopher_cfg = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5,
                              max_top_bigram_ratio=1.0, gopher=True)
    kept_on = {r.doc_id for r in curate(docs, config=gopher_cfg).collect()}
    assert kept_on == {1}                         # bullet doc dropped


def test_curate_to_export_pipeline(spark, tmp_path):
    """The whole north-star story in one flow: curate the corpus, count
    tokens, export packed shards with a reproducible manifest."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate
    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = curate(docs)
    with_tokens = kept.select(
        "doc_id",
        F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
        .cast("long").alias("n_tokens"),
    )
    out = str(tmp_path / "shards")
    manifest = export_training_shards(with_tokens, out, "n_tokens",
                                      max_tokens=512, num_shards=4)
    n_kept = kept.count()
    assert 0 < n_kept <= docs.count()
    assert manifest["total_docs"] == n_kept          # lossless hand-off
    assert len(manifest["shards"]) == 4
    back = spark.read.parquet(out)
    assert back.agg(F.sum("n_docs")).first()[0] == n_kept


def test_curate_with_persisted_models(spark, tmp_path):
    """curate() scores persisted LM + classifier models by path (r6): the
    production arrangement where models train once (lm_write /
    classifier_write) and batches score from disk — gate decisions match
    the inline-model run exactly."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_write,
        lm_score,
        lm_write,
    )

    body = ("a clear and well formed english paragraph about everyday cooking "
            "with enough distinct words to pass every structural quality rule")
    gibberish = ("zxqv wkjh qpzm vbnx lkjq rtyu asdf ghjk zxcv bnml qwer tyui "
                 "opas dfgh jklz xcvb nmqw erty uiop asdf ghjk lzxc vbnm qwer")
    docs = spark.createDataFrame(
        [(1, body), (2, gibberish)], "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [(i, body) for i in range(20)], "doc_id long, text string"
    )
    lm_dir = str(tmp_path / "lm")
    lm_write(ref, lm_dir)
    perp = {r.doc_id: r.perplexity for r in lm_score(docs, corpus=ref).collect()}
    thr = (perp[1] + perp[2]) / 2

    # a one-weight classifier that likes "cooking": doc 1 scores > 0.5,
    # doc 2 exactly 0.5 — threshold between
    from tests.test_corpus_ops import _py_md5_long
    nf = 1 << 12
    w = spark.createDataFrame(
        [(_py_md5_long("cooking", salt="clf|") % nf, 8.0)], "idx long, w double"
    )
    clf_dir = str(tmp_path / "clf")
    classifier_write(w, clf_dir, num_features=nf, bigrams=True, bias=0.0, seed="clf")

    cfg = CurateConfig(
        min_chars=32, min_quality=0.0, jaccard_threshold=0.5,
        max_perplexity=thr, lm_path=lm_dir,
        min_clf_prob=0.51, classifier_path=clf_dir,
    )
    kept = [r.doc_id for r in curate(docs, config=cfg).collect()]
    assert kept == [1]

    # min_clf_prob without any model source still raises
    import pytest as _pytest
    bad = CurateConfig(min_chars=1, min_quality=0.0, min_clf_prob=0.5)
    with _pytest.raises(ValueError, match="classifier_weights"):
        curate(docs, config=bad).collect()


def test_curate_incremental_against_corpus(spark, tmp_path):
    """curate(against_corpus=...) drops batch docs whose content already
    exists in the historical corpus — the daily-batch production mode."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )

    seen = "an article the corpus already contains with plenty of distinct words"
    fresh = "a genuinely new essay describing columnar shuffle strategies at scale"
    corpus = spark.createDataFrame(
        [(100 + i, seen) for i in range(3)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, seen), (2, fresh)], "doc_id long, text string"
    )
    cfg = CurateConfig(min_chars=10, min_quality=0.0, jaccard_threshold=0.99, scrub=False)
    kept = curate(batch, config=cfg, against_corpus=corpus)
    assert [r.doc_id for r in kept.collect()] == [2]
    # without the corpus the duplicate-of-history doc passes
    both = {r.doc_id for r in curate(batch, config=cfg).collect()}
    assert both == {1, 2}


def test_cli_curate_against_flag(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    seen = "an article the corpus already contains with plenty of distinct words"
    fresh = "a genuinely new essay describing columnar shuffle strategies at scale"
    hist = str(tmp_path / "hist.parquet")
    spark.createDataFrame([(100, seen)], "doc_id long, text string").write.parquet(hist)
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [(1, seen), (2, fresh)], "doc_id long, text string"
    ).write.parquet(src)
    out = str(tmp_path / "kept.parquet")
    main(["curate", "--in", src, "--out", out, "--min-chars", "10",
          "--min-quality", "0.0", "--jaccard", "0.99", "--against", hist])
    assert "curated 2 -> 1 documents" in capsys.readouterr().out
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [2]


def test_cli_curate_against_embeddings(spark, tmp_path, capsys):
    """`curate --against-embeddings <index>` (r14): the vs-history
    embedding gate from the CLI — needs --embeddings, drops the
    semantically-duplicated batch doc."""
    import math

    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.__main__ import main
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    idx = str(tmp_path / "hidx")
    ivf_index_write(
        spark.createDataFrame([(100 + s, unit(s)) for s in range(12)],
                              "vec_id long, embedding array<double>"),
        idx, dim=8, num_clusters=4, n_iters=2)
    src = str(tmp_path / "b.parquet")
    spark.createDataFrame(
        [(1, "a paraphrase sharing no tokens with the historical corpus"),
         (2, "a genuinely novel essay about columnar shuffle strategies")],
        "doc_id long, text string").write.parquet(src)
    emb = str(tmp_path / "bemb.parquet")
    novel = [s / math.sqrt(8) for s in (1, 1, -1, -1, 1, 1, -1, 1)]
    spark.createDataFrame(
        [(1, unit(3)), (2, novel)],
        "doc_id long, embedding array<double>").write.parquet(emb)
    out = str(tmp_path / "kept_e.parquet")
    main(["curate", "--in", src, "--out", out, "--min-chars", "10",
          "--min-quality", "0.0", "--embeddings", emb,
          "--against-embeddings", idx, "--against-cosine", "0.95"])
    assert "curated 2 -> 1 documents" in capsys.readouterr().out
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [2]
    with _pytest.raises(SystemExit):
        main(["curate", "--in", src, "--out", out,
              "--against-embeddings", idx])


def test_curate_against_embeddings_index(spark, tmp_path):
    """curate(against_embeddings_path=) (r14): batch docs whose EMBEDDING
    near-duplicates the persisted history index drop — the semantic cell
    of the vs-history matrix (the texts share no n-grams, so the exact
    and MinHash history gates would keep them); the audit funnel carries
    the against_semantic stage; config without doc_embeddings fails
    fast."""
    import math

    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        audit_rows_from_trace,
        curate,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    history_emb = spark.createDataFrame(
        [(100 + s, unit(s)) for s in range(12)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "hist_idx")
    ivf_index_write(history_emb, idx, dim=8, num_clusters=4, n_iters=2)
    # doc 1 embeds exactly on history vector 3 (a reworded duplicate);
    # doc 2 is genuinely novel; texts share no n-grams with anything
    batch = spark.createDataFrame(
        [(1, "a complete paraphrase that shares no tokens with history"),
         (2, "a genuinely novel essay about columnar shuffle strategies")],
        "doc_id long, text string",
    )
    # doc 2's vector is near-orthogonal to EVERY history vector (max
    # |cos| ≈ 0.029 — the sin-family seeds all correlate ≥ 0.93 with
    # some history vector in 8 dims, so a fixed sign pattern is used)
    novel = [s / math.sqrt(8) for s in (1, 1, -1, -1, 1, 1, -1, 1)]
    batch_emb = spark.createDataFrame(
        [(1, unit(3)), (2, novel)], "doc_id long, embedding array<double>")
    cfg = CurateConfig(min_chars=10, min_quality=0.0, scrub=False,
                       against_embeddings_path=idx, against_cosine=0.95)
    trace: list = []
    kept = curate(batch, config=cfg, doc_embeddings=batch_emb, _trace=trace)
    assert [r.doc_id for r in kept.collect()] == [2]
    funnel = {s: (n_in, n_out)
              for _, s, n_in, n_out, _ in audit_rows_from_trace(batch, trace)}
    assert funnel["against_semantic"] == (2, 1)
    with _pytest.raises(ValueError, match="doc_embeddings not"):
        curate(batch, config=cfg)


def test_curate_language_gate(spark):
    """allowed_langs keeps only lang_id-predicted languages; off by
    default."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )

    rows = [
        (1, "the quick brown fox is running through the field and the sun is high"),
        (2, "der schnelle braune fuchs und das feld und die sonne ist hoch oben"),
        (3, "le renard brun et rapide traverse le champ et le soleil est haut"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = CurateConfig(min_chars=10, min_quality=0.0, jaccard_threshold=0.99, scrub=False)
    import dataclasses
    en_only = dataclasses.replace(base, allowed_langs=("en",))
    assert [r.doc_id for r in curate(docs, config=en_only).collect()] == [1]
    en_de = dataclasses.replace(base, allowed_langs=("en", "de"))
    assert sorted(r.doc_id for r in curate(docs, config=en_de).collect()) == [1, 2]
    # gate off: everything survives
    assert sorted(r.doc_id for r in curate(docs, config=base).collect()) == [1, 2, 3]


def test_curate_keep_ppl_tiers(spark):
    """CCNet partition gate: keep_ppl_tiers=('head',) keeps the
    best-modeled (lowest-perplexity) third; shares the LM pass with
    max_perplexity; unknown tiers raise."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import lm_score

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    # distinct per-doc tails keep pairwise Jaccard well under the
    # near-dup threshold so the dedup stage leaves all nine docs alone
    tails = [
        "while morning sunlight warms the quiet meadow grass gently",
        "as evening shadows stretch across the silent valley floor slowly",
        "when autumn breezes scatter golden leaves along winding paths",
        "frozen copper kettles whistle beside crowded market stalls daily",
        "purple mountain bicycles carry heavy wooden crates uphill",
        "ancient stone lighthouses guide weary sailors through foggy harbors",
        "zxqv wkjh qpzm vbnx lkjq rtyu asdf ghjk qwer uiop",
        "mnbv cxza sdfg hjkl poiu ytre wqas zxcv bnml kjhg",
        "qpwo eiru tyal skdj fhgz xcvb nmqw erty uias dfgh",
    ]
    docs = spark.createDataFrame(
        # 3 fluent docs (reference prose + distinct tail), 3 mid, 3 gibberish
        [(i, f"{base} {tails[i]}") for i in range(3)]
        # mid docs reuse SOME reference bigrams ("the lazy dog", "the
        # river bank") so their perplexity lands strictly between the
        # fluent docs and the all-unseen gibberish (value-distinct ppl is
        # what the approx-cut mode needs to split tiers)
        + [(10 + i, f"the lazy dog near the river bank {tails[3 + i]}")
           for i in range(3)]
        + [(20 + i, tails[6 + i] + " " + tails[6 + i]) for i in range(3)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame([(0, base)], "doc_id long, text string")
    perp = {r.doc_id: r.perplexity
            for r in lm_score(docs, corpus=ref).collect()}
    # sanity: fluent < mid < gibberish perplexity on average
    assert max(perp[i] for i in (0, 1, 2)) < min(perp[i] for i in (20, 21, 22))

    cfg = CurateConfig(min_chars=10, min_quality=0.0, jaccard_threshold=0.5,
                       keep_ppl_tiers=("head",))
    kept = {r.doc_id for r in curate(docs, config=cfg, lm_corpus=ref).collect()}
    assert kept == {0, 1, 2}, kept                 # exactly the fluent third

    cfg2 = CurateConfig(min_chars=10, min_quality=0.0, jaccard_threshold=0.5,
                        keep_ppl_tiers=("head", "middle"))
    kept2 = {r.doc_id for r in curate(docs, config=cfg2, lm_corpus=ref).collect()}
    assert kept2 == {0, 1, 2, 10, 11, 12}, kept2   # gibberish tail dropped

    import pytest

    with pytest.raises(ValueError, match="unknown ppl tiers"):
        curate(docs, config=CurateConfig(keep_ppl_tiers=("best",)),
               lm_corpus=ref).collect()


def test_curate_against_near_signature_store(spark, tmp_path):
    """curate --against-sigs: the batch near-dedups against a persisted
    MinHash signature store of history — serial-token mutations that the
    exact --against mode misses are dropped, genuinely new docs pass."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        minhash_write,
    )

    hist = (
        "this historical boilerplate document is repeated nearly verbatim "
        "across crawls with only one serial token changing near the end of "
        "the body text which makes every copy a near duplicate serial one"
    )
    history = spark.createDataFrame([(100, hist)], "doc_id long, text string")
    store = str(tmp_path / "store")
    minhash_write(
        minhash_signatures(history, "doc_id", "text", num_perms=32),
        store, num_perms=32, shingle_n=5,
    )
    batch = spark.createDataFrame(
        [(1, hist.replace("serial one", "serial two")),   # near-dup: drop
         (2, "a genuinely fresh article about maritime navigation methods "
             "used before the invention of the marine chronometer at sea")],
        "doc_id long, text string",
    )
    cfg = CurateConfig(min_chars=10, min_quality=0.0, jaccard_threshold=0.5,
                       minhash_perms=32, minhash_bands=8,
                       against_sigs_path=store)
    kept = {r.doc_id for r in curate(batch, config=cfg).collect()}
    assert kept == {2}


def test_curate_audit_funnel_default_stages(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate_audit

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet green field while the sun is high in the clear blue sky"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                       # exact dup → exact_dup stage
            (3, base.replace("dog", "cat")), # near dup → near_dup stage
            (4, "x"),                        # too short → quality stage
            (5, "mail me about the totally different proposal for building a "
                "better analytics engine with many novel distributed ideas"),
        ],
        "doc_id long, text string",
    )
    cfg = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5)
    funnel = curate_audit(docs, config=cfg)
    rows = sorted(funnel.collect(), key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == ["quality", "exact_dup", "near_dup"]
    # telescoping: rows_in of stage k == rows_out of stage k-1, from count(docs)
    assert rows[0].rows_in == docs.count() == 5
    for prev, cur in zip(rows, rows[1:]):
        assert cur.rows_in == prev.rows_out
    assert all(r.dropped == r.rows_in - r.rows_out for r in rows)
    by = {r.stage: r for r in rows}
    assert by["quality"].dropped == 1      # doc 4
    assert by["exact_dup"].dropped == 1    # doc 2
    assert by["near_dup"].dropped == 1     # doc 3
    # final funnel row matches what a plain curate run returns
    assert rows[-1].rows_out == curate(docs, config=cfg).count() == 2


def test_curate_audit_optional_stages_in_order(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate_audit

    en = ("the house and the water were there and it was a good day for all "
          "of them to walk with that one friend they have")
    docs = spark.createDataFrame(
        [
            (1, en),
            (2, "das haus und das wasser sind hier und es war ein guter tag "
                "für sie mit dem einen freund den sie haben"),
            (3, en + " entirely different tail so it is not a near duplicate "
                "of the first document in any shingle window sense"),
        ],
        "doc_id long, text string",
    )
    cfg = CurateConfig(min_chars=10, min_quality=0.0, allowed_langs=("en",),
                       jaccard_threshold=0.9)
    funnel = curate_audit(docs, config=cfg)
    rows = sorted(funnel.collect(), key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == ["quality", "language", "exact_dup", "near_dup"]
    by = {r.stage: r for r in rows}
    assert by["language"].dropped == 1     # the German doc
    assert rows[-1].rows_out == 2


def test_curate_traced_run_matches_untraced(spark):
    # tracing is observability only: the traced run keeps exactly the
    # same documents as the default (_trace=None) run, and the trace's
    # final boundary IS the returned frame
    docs = _boilerplate_clique(spark, n=10)
    cfg = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5)
    plain = {r.doc_id for r in curate(docs, config=cfg).collect()}
    trace: list = []
    traced = curate(docs, config=cfg, _trace=trace)
    assert {r.doc_id for r in traced.collect()} == plain
    assert trace and trace[-1][0] == "near_dup"
    assert {r.doc_id for r in trace[-1][1].collect()} == plain


def test_cli_curate_audit_flag(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    base = ("a long enough document with plenty of distinct words describing "
            "columnar shuffle strategies and adaptive execution at scale")
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [(1, base), (2, base), (3, "x")], "doc_id long, text string"
    ).write.parquet(src)
    out = str(tmp_path / "kept.parquet")
    main(["curate", "--in", src, "--out", out, "--min-chars", "10",
          "--min-quality", "0.0", "--audit"])
    printed = capsys.readouterr().out
    assert "audit 1 quality: 3 -> 2 (-1)" in printed
    assert "audit 2 exact_dup: 2 -> 1 (-1)" in printed
    assert "audit 3 near_dup: 1 -> 1 (-0)" in printed
    import os
    assert not os.path.exists(out)  # --audit reports, never writes


def test_curate_max_pii_gate(spark):
    """max_pii drops contact-scrape pages BEFORE scrub rewrites the
    matches; the audit funnel reports the stage."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate_audit

    clean = ("a perfectly ordinary document with enough words to pass the "
             "quality gate and the length threshold without any trouble")
    scrape = ("contact a@x.io b@x.io c@x.io or call +15550101234 and "
              "+15550105678 or visit 10.0.0.1 today for the full directory")
    docs = spark.createDataFrame(
        [(1, clean), (2, scrape)], "doc_id long, text string"
    )
    cfg = CurateConfig(min_chars=10, min_quality=0.0, max_pii=3)
    kept = curate(docs, config=cfg)
    assert [r.doc_id for r in kept.collect()] == [1]
    # without the gate the scrape survives (tags replace the PII)
    no_gate = curate(docs, config=CurateConfig(min_chars=10, min_quality=0.0))
    assert {r.doc_id for r in no_gate.collect()} == {1, 2}
    funnel = {r.stage: r.dropped for r in curate_audit(docs, config=cfg).collect()}
    assert funnel["pii"] == 1


def test_curate_survivor_quality_keeps_best_member(spark):
    """survivor='quality' keeps each near-dup cluster's highest-quality
    member instead of the min id (r9, dedup.keep_canonical_by)."""
    base = (
        "this shared boilerplate body is very nearly identical across the "
        "copies except for the trailing portion which differs a little "
        "between the two versions of the page %s"
    )
    docs = spark.createDataFrame(
        [
            # doc 1: digit-heavy tail lowers quality; doc 2 is cleaner
            (1, base % "0123456789 0123456789 0123456789"),
            (2, base % "with a clean and readable final sentence for all"),
            (9, "an entirely unrelated standalone essay about alpine botany "
                "and the seasonal migration of pollinators across meadows"),
        ],
        "doc_id long, text string",
    )
    cfg_best = CurateConfig(min_chars=10, min_quality=0.0,
                            jaccard_threshold=0.5, survivor="quality")
    best = {r.doc_id for r in curate(docs, config=cfg_best).collect()}
    assert best == {2, 9}
    cfg_min = CurateConfig(min_chars=10, min_quality=0.0, jaccard_threshold=0.5)
    assert {r.doc_id for r in curate(docs, config=cfg_min).collect()} == {1, 9}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown survivor"):
        curate(docs, config=CurateConfig(survivor="newest"))


def test_curate_dropped_lineage_matches_funnel(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        curate_audit,
        curate_dropped,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet green field while the sun is high in the clear blue sky"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                        # exact dup
            (3, base.replace("dog", "cat")),  # near dup
            (4, "x"),                         # quality
            (5, "a thoroughly different essay on distributed shuffle "
                "strategies and adaptive query execution at terabyte scale"),
        ],
        "doc_id long, text string",
    )
    cfg = CurateConfig(min_chars=32, min_quality=0.0, jaccard_threshold=0.5)
    lineage = {r.doc_id: r.dropped_at for r in curate_dropped(docs, config=cfg).collect()}
    assert lineage == {4: "quality", 2: "exact_dup", 3: "near_dup"}
    # per-stage cardinalities agree with the funnel
    funnel = {r.stage: r.dropped for r in curate_audit(docs, config=cfg).collect()}
    from collections import Counter
    assert funnel == dict(Counter(lineage.values()))
    # survivors never appear
    assert not {1, 5} & set(lineage)


def test_cli_curate_audit_dropped_out(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    base = ("a long enough document with plenty of distinct words describing "
            "columnar shuffle strategies and adaptive execution at scale")
    src = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [(1, base), (2, base), (3, "x")], "doc_id long, text string"
    ).write.parquet(src)
    lineage = str(tmp_path / "lineage.parquet")
    main(["curate", "--in", src, "--out", str(tmp_path / "k.parquet"),
          "--min-chars", "10", "--min-quality", "0.0",
          "--audit", "--dropped-out", lineage])
    assert "wrote drop lineage" in capsys.readouterr().out
    got = {(r.doc_id, r.dropped_at) for r in spark.read.parquet(lineage).collect()}
    assert got == {(3, "quality"), (2, "exact_dup")}


def test_curate_compression_gate(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate_audit

    prose = ("the migration of alpine pollinators follows snowmelt up the "
             "valley sides each spring with remarkable annual consistency")
    junk = "buy now " * 40
    docs = spark.createDataFrame([(1, prose), (2, junk)],
                                 "doc_id long, text string")
    cfg = CurateConfig(min_chars=10, min_quality=0.0,
                       max_dup_line_ratio=1.0, max_top_bigram_ratio=1.0,
                       min_compression_ratio=0.2)
    assert [r.doc_id for r in curate(docs, config=cfg).collect()] == [1]
    funnel = {r.stage: r.dropped for r in curate_audit(docs, config=cfg).collect()}
    assert funnel["compression"] == 1
    # gate off: both survive (ratio caps relaxed so repetition rules pass)
    off = CurateConfig(min_chars=10, min_quality=0.0,
                       max_dup_line_ratio=1.0, max_top_bigram_ratio=1.0)
    assert {r.doc_id for r in curate(docs, config=off).collect()} == {1, 2}


def test_curate_null_text_falls_through_pii_gate(spark):
    """NULL-text docs count zero PII (r10 ADVICE fix): the PII gate must
    not swallow them — they fall through to the quality gate, and the
    drop lineage labels them 'quality', not 'pii'."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        curate_dropped,
    )

    clean = ("a perfectly ordinary document with enough words to pass the "
             "quality gate and the length threshold without any trouble")
    docs = spark.createDataFrame(
        [(1, clean), (2, None)], "doc_id long, text string"
    )
    cfg = CurateConfig(min_chars=10, min_quality=0.0, max_pii=100)
    kept = curate(docs, config=cfg)
    assert [r.doc_id for r in kept.collect()] == [1]
    lineage = {r.doc_id: r.dropped_at
               for r in curate_dropped(docs, config=cfg).collect()}
    assert lineage == {2: "quality"}


def _staged_fixture_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running through "
        "the quiet green field while the sun is high in the clear blue sky"
    )
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),                         # exact dup
            (3, base.replace("dog", "cat")),   # near dup
            (4, "x"),                          # quality gate
            (5, "spam " * 40),                 # repetition gate
            (6, "a totally different essay about building a better analytics "
                "engine with many novel distributed ideas and clear prose"),
        ],
        "doc_id long, text string",
    )


def test_curate_stage_dir_resume_after_kill(spark, tmp_path):
    """Resumable staged curate (r10): a run that dies after stage k
    resumes from stage k's parquet boundary — the re-run produces a
    byte-identical kept-set and funnel vs the uninterrupted run, and the
    pre-kill stages are LOADED, not recomputed (their source parquet is
    removed before the resume to prove it)."""
    import shutil

    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        audit_rows_from_trace,
    )

    cfg = CurateConfig(min_chars=32, min_quality=0.3, jaccard_threshold=0.5,
                       max_pii=100)
    docs = _staged_fixture_docs(spark)

    # ground truth: one uninterrupted (unstaged) run, kept-set + funnel
    trace0: list = []
    truth = curate(docs, config=cfg, _trace=trace0)
    truth_rows = sorted(map(tuple, truth.collect()))
    truth_funnel = audit_rows_from_trace(docs, trace0)

    # "killed" run: write the input to parquet (so the resume can prove
    # it never re-reads it), run STAGES 1..k by executing a staged curate
    # but simulating the crash — materialize boundaries up to exact_dup
    # by counting the traced boundary, then abandon the python objects.
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    docs_on_disk = spark.read.parquet(src)
    stage_dir = str(tmp_path / "stages")
    trace1: list = []
    curate(docs_on_disk, config=cfg, stage_dir=stage_dir, _trace=trace1)
    # staged _mark writes each boundary EAGERLY during plan construction,
    # so by now stages 1..n are all on disk; simulate dying after stage 3
    # (exact_dup) by deleting the later boundaries + the final state
    import os

    done = sorted(os.listdir(stage_dir))
    later = [d for d in done if d.startswith(("04", "05", "06"))]
    assert any(d.endswith("exact_dup") for d in done)
    for d in later:
        shutil.rmtree(os.path.join(stage_dir, d))

    # resume: the INPUT parquet is gone — stages 1..3 must load from the
    # stage dir, never from the source
    shutil.rmtree(src)
    resumed_docs = docs  # same logical input (resume contract)
    trace2: list = []
    kept = curate(resumed_docs, config=cfg, stage_dir=stage_dir, _trace=trace2)
    assert sorted(map(tuple, kept.collect())) == truth_rows
    assert audit_rows_from_trace(resumed_docs, trace2) == truth_funnel


def test_curate_stage_dir_config_mismatch_refuses(spark, tmp_path):
    stage_dir = str(tmp_path / "stages")
    docs = _staged_fixture_docs(spark)
    curate(docs, config=CurateConfig(min_chars=32, min_quality=0.3),
           stage_dir=stage_dir)
    import pytest

    with pytest.raises(ValueError, match="different curate configuration"):
        curate(docs, config=CurateConfig(min_chars=64, min_quality=0.3),
               stage_dir=stage_dir)


def test_curate_decon_span_scrub(spark):
    """Span-level verbatim decontamination inside curate (r11): the doc
    quoting a benchmark passage SURVIVES minus the quote (a rewrite
    stage, not a drop), later gates judge the scrubbed text (a doc that
    was nothing but the quote fails min_chars), and the stage fails
    fast without the eval corpus."""
    import pytest

    quote = ("which planet is closest to the sun answer mercury because "
             "it orbits nearest among all the planets")
    essay = ("a long and thoughtful essay about cooking techniques that "
             f"quotes a benchmark question {quote} and then continues "
             "with plenty of original prose about stews and braises")
    eval_corpus = spark.createDataFrame(
        [(900, f"benchmark item {quote} expected answer")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, essay), (2, quote), (3, "a perfectly clean unrelated document "
                                     "with plenty of ordinary words here")],
        "doc_id long, text string",
    )
    cfg = CurateConfig(min_chars=32, min_quality=0.0, decon_span_window=8)
    kept = {r.doc_id: r.text for r in curate(
        docs, config=cfg, eval_corpus=eval_corpus).collect()}
    # doc 1 survives with the quote cut; doc 2 WAS the quote -> scrubbed
    # empty -> dropped by min_chars; doc 3 untouched
    assert set(kept) == {1, 3}
    assert quote not in kept[1] and "stews and braises" in kept[1]
    assert "original prose" in kept[1]
    with pytest.raises(ValueError, match="eval_corpus"):
        curate(docs, config=cfg)


def test_curate_stage_dir_side_input_change_refuses(spark, tmp_path):
    """The resume manifest fingerprints the SIDE INPUTS too (r11,
    ADVICE): resuming a staged curate after the eval-embedding table
    changed on disk (a new benchmark release) must be refused — a stale
    decontaminate boundary silently reloaded would keep the old
    contamination set."""
    import pytest

    a = ("the quick brown fox jumps over the lazy dog and keeps running "
         "through the quiet green field while the sun is high in the sky")
    docs = spark.createDataFrame([(1, a)], "doc_id long, text string")
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(emb)
    ev1 = str(tmp_path / "eval_v1.parquet")
    spark.createDataFrame(
        [(900, [0.0, 0.0, 1.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(ev1)

    cfg = CurateConfig(min_chars=32, min_quality=0.0, decon_cosine=0.9)
    stage_dir = str(tmp_path / "stages")
    curate(docs, config=cfg, stage_dir=stage_dir,
           doc_embeddings=spark.read.parquet(emb),
           eval_embeddings=spark.read.parquet(ev1))

    # same config, same paths, same files -> resume accepted
    curate(docs, config=cfg, stage_dir=stage_dir,
           doc_embeddings=spark.read.parquet(emb),
           eval_embeddings=spark.read.parquet(ev1))

    # the benchmark ships a new release (extra file in the table) ->
    # the fingerprint moves and resume is refused
    spark.createDataFrame(
        [(901, [1.0, 0.0, 0.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.mode("append").parquet(ev1)
    with pytest.raises(ValueError, match="different curate configuration"):
        curate(docs, config=cfg, stage_dir=stage_dir,
               doc_embeddings=spark.read.parquet(emb),
               eval_embeddings=spark.read.parquet(ev1))


def test_curate_decontamination_gate(spark):
    """Embedding-space decontamination in curate (r10): a doc whose
    embedding near-matches an eval-set embedding (a paraphrased
    benchmark question — no shared shingles) drops at the
    'decontaminate' stage; the funnel and lineage report it."""
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        curate_audit,
        curate_dropped,
    )

    import pytest

    a = ("the quick brown fox jumps over the lazy dog and keeps running "
         "through the quiet green field while the sun is high in the sky")
    b = ("an entirely different essay describing distributed query engines "
         "and the shuffle strategies they use for terabyte scale joins")
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    doc_emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    eval_emb = spark.createDataFrame(
        [(900, [0.99, 0.1, 0.0, 0.0])], "doc_id long, embedding array<double>"
    )
    cfg = CurateConfig(min_chars=32, min_quality=0.0, decon_cosine=0.9)
    kept = curate(docs, config=cfg,
                  doc_embeddings=doc_emb, eval_embeddings=eval_emb)
    assert [r.doc_id for r in kept.collect()] == [2]
    funnel = {r.stage: r.dropped for r in curate_audit(
        docs, config=cfg,
        doc_embeddings=doc_emb, eval_embeddings=eval_emb).collect()}
    assert funnel["decontaminate"] == 1
    lineage = {r.doc_id: r.dropped_at for r in curate_dropped(
        docs, config=cfg,
        doc_embeddings=doc_emb, eval_embeddings=eval_emb).collect()}
    assert lineage == {1: "decontaminate"}
    # fail fast without the embedding tables
    with pytest.raises(ValueError, match="doc_embeddings"):
        curate(docs, config=cfg)


def test_curate_stage_dir_partial_write_is_overwritten(spark, tmp_path):
    """A boundary dir WITHOUT the _SUCCESS marker (a run killed mid-write)
    is not resumed from — the stage recomputes and overwrites it."""
    import os

    docs = _staged_fixture_docs(spark)
    cfg = CurateConfig(min_chars=32, min_quality=0.3, jaccard_threshold=0.5)
    stage_dir = str(tmp_path / "stages")
    truth = sorted(map(tuple, curate(docs, config=cfg).collect()))
    curate(docs, config=cfg, stage_dir=stage_dir)
    # simulate a mid-write kill on the exact_dup boundary: drop _SUCCESS
    # and corrupt the contents
    target = next(d for d in os.listdir(stage_dir) if d.endswith("exact_dup"))
    tdir = os.path.join(stage_dir, target)
    os.remove(os.path.join(tdir, "_SUCCESS"))
    for f in os.listdir(tdir):
        if f.endswith(".parquet"):
            with open(os.path.join(tdir, f), "wb") as fh:
                fh.write(b"garbage")
    kept = curate(docs, config=cfg, stage_dir=stage_dir)
    assert sorted(map(tuple, kept.collect())) == truth
    assert os.path.exists(os.path.join(tdir, "_SUCCESS"))
