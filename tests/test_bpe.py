"""Trainable BPE tokenizer (operators/bpe.py): merge learning vs a naive
reference, deterministic training across partitionings, encode
semantics, persistence round-trip, and the token-budget hand-off into
the packing/export layer."""

from __future__ import annotations

import pytest

from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (
    EOW,
    _encode_word,
    _train_merges,
    bpe_encode,
    bpe_load,
    bpe_token_count,
    bpe_train,
    bpe_write,
)


def _naive_train(word_freq, num_merges):
    """Textbook BPE: recount every pair each round (O(rounds × types))."""
    words = {w: list(w) + [EOW] for w in word_freq}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + word_freq[w]
        live = [(c, p) for p, c in counts.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda cp: (-cp[0], cp[1]))[1]
        merges.append(best)
        merged = best[0] + best[1]
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def test_train_merges_matches_naive_reference():
    import random

    rng = random.Random(17)
    alphabet = "abcdef"
    for trial in range(10):
        vocab = {
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 7))):
            rng.randrange(1, 50)
            for _ in range(rng.randrange(2, 30))
        }
        n = rng.randrange(1, 40)
        assert _train_merges(dict(vocab), n) == _naive_train(dict(vocab), n), trial


def test_encode_word_applies_ranks_greedily():
    # merges learned on "low lower lowest": 'l'+'o' first, then 'lo'+'w'…
    merges = [("l", "o"), ("lo", "w"), ("low", EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("low", ranks) == ["low" + EOW]
    assert _encode_word("lower", ranks) == ["low", "e", "r", EOW]
    assert _encode_word("xyz", ranks) == ["x", "y", "z", EOW]


def test_bpe_train_encode_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, "low lower lowest low low newer new") for i in range(6)],
        "doc_id long, text string",
    )
    merges, stats = bpe_train(docs, num_merges=12)
    assert stats["merges_learned"] <= 12 and not stats["truncated"]
    # training is invariant to input partitioning (word counts are exact)
    merges2, _ = bpe_train(docs.repartition(5), num_merges=12)
    assert merges == merges2
    # 'low' is the most frequent word -> it becomes a single token
    enc = bpe_encode(docs.limit(1), merges)
    toks = enc.collect()[0].bpe_tokens
    assert "low" + EOW in toks
    # every word ends with an EOW-terminated symbol; word count preserved
    assert sum(1 for t in toks if t.endswith(EOW)) == 7

    counted = bpe_token_count(docs, merges)
    n = counted.collect()[0].n_bpe_tokens
    assert n == len(toks) > 0


def test_bpe_persistence_roundtrip_and_budget_handoff(spark, tmp_path):
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox number {i} jumps over the lazy dog") for i in range(50)],
        "doc_id long, text string",
    )
    merges, stats = bpe_train(docs, num_merges=30)
    path = str(tmp_path / "bpe")
    bpe_write(spark, merges, path, stats)
    assert bpe_load(spark, path) == merges

    # real-tokenizer budget feeds the export layer losslessly
    with_tok = bpe_token_count(docs, bpe_load(spark, path), out_col="n_tokens")
    m = export_training_shards(
        with_tok.select("doc_id", "n_tokens"), str(tmp_path / "shards"),
        "n_tokens", 64, num_shards=4, pack_partitions=4,
    )
    total = with_tok.agg(F.sum("n_tokens")).collect()[0][0]
    assert m["total_tokens"] == total and m["total_docs"] == 50


def test_bpe_train_rejects_bad_config(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(docs, num_merges=0)


def test_bpe_truncation_is_reported(spark):
    docs = spark.createDataFrame(
        [(i, f"unique{i} word{i} token{i}") for i in range(40)],
        "doc_id long, text string",
    )
    _, stats = bpe_train(docs, num_merges=5, max_word_types=10)
    assert stats["truncated"] and stats["word_types_used"] == 10
    assert stats["word_types_total"] > 10


def test_bpe_vocab_inventory():
    merges = [("l", "o"), ("lo", "w"), ("low", EOW)]
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import bpe_vocab

    v = bpe_vocab(merges)
    # base symbols sorted first, then merged tokens in rank order
    assert v == [EOW, "l", "o", "w", "lo", "low", "low" + EOW]
    assert len(v) == len(set(v))


def test_bpe_vocab_closed_over_corpus(spark):
    """With the corpus word table supplied, bpe_vocab covers EVERY token
    bpe_encode can emit — no out-of-vocabulary lookup at training time
    (ADVICE r6: merge-derived base symbols alone miss characters that
    never joined a merge)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (
        bpe_encode,
        bpe_vocab,
        bpe_word_counts,
    )

    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "zebra? quartz; jinx!"),
         (2, "the the the qqq xyzzy")],
        "doc_id long, text string",
    )
    merges, _ = bpe_train(docs, num_merges=8)
    words = [r["w"] for r in bpe_word_counts(docs).collect()]
    vocab = set(bpe_vocab(merges, words=words))
    emitted = set()
    for r in bpe_encode(docs, merges).select("bpe_tokens").collect():
        emitted.update(r.bpe_tokens)
    assert emitted <= vocab
    # merge-only base (no words) is NOT closed on this corpus — the
    # documented limitation the words= parameter exists for
    assert not emitted <= set(bpe_vocab(merges))


def test_export_cli_with_bpe_path(spark, tmp_path, capsys):
    """`export --bpe-path` tokenizes on the fly in trained units."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (
        bpe_train,
        bpe_write,
    )

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox number {i} jumps high") for i in range(30)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    merges, stats = bpe_train(docs, num_merges=20)
    model = str(tmp_path / "bpe_model")
    bpe_write(spark, merges, model, stats)

    out = str(tmp_path / "shards")
    main(["export", "--in", src, "--out", out, "--max-tokens", "256",
          "--shards", "4", "--bpe-path", model])
    captured = capsys.readouterr().out
    assert "exported 30 docs" in captured
    import json
    m = json.load(open(f"{out}/_manifest.json"))
    assert m["total_docs"] == 30 and m["total_tokens"] > 0


def test_tokenizer_fertility_bpe_lane_pins_direct_encode(spark, tmp_path):
    """The trained-BPE fertility lane (r10): per-language sums must equal
    a direct driver-side replay of the same merges (the rows-only value
    pin for the lane the SQL oracle can't reach), and higher-fertility
    languages must rank above lower ones."""
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (
        bpe_encode,
        bpe_load,
        bpe_train,
        bpe_write,
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with the hat", "en"),
            (2, "the bat and the rat ate the fat cat", "en"),
            (3, "zqx vwk jqz pfx", "xx"),   # no learnable merges -> chars
            (4, "the cat and the mat", None),  # NULL lang -> 'unknown'
        ],
        "doc_id long, text string, lang string",
    )
    merges, stats = bpe_train(docs, num_merges=30)
    model = str(tmp_path / "bpe")
    bpe_write(spark, merges, model, stats)

    fert = {r.lang: r for r in tokenizer_fertility(
        docs, merges=bpe_load(spark, model)).collect()}
    assert set(fert) == {"en", "xx", "unknown"}

    # driver-side ground truth: encode the same docs with the same merges
    enc = {r.doc_id: len(r.toks) for r in
           bpe_encode(docs, merges, out_col="toks")
           .select("doc_id", "toks").collect()}
    assert fert["en"].n_tokens == enc[1] + enc[2]
    assert fert["xx"].n_tokens == enc[3]
    assert fert["unknown"].n_tokens == enc[4]
    assert fert["en"].n_docs == 2 and fert["en"].n_words == 18

    # the signal: the merge-less language is strictly more fertile
    assert fert["xx"].tokens_per_word > fert["en"].tokens_per_word
    assert fert["xx"].tokens_per_char > fert["en"].tokens_per_char

    # precomputed-count lane agrees with the merges lane
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import bpe_token_count

    counted = bpe_token_count(docs, merges)
    fert2 = {r.lang: r for r in tokenizer_fertility(
        counted, token_count_col="n_bpe_tokens").collect()}
    assert {k: v.n_tokens for k, v in fert2.items()} == {
        k: v.n_tokens for k, v in fert.items()}


def test_report_cli_fertility(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import run_report

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "hello world of tokens", "en"), (2, "plain words here", "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(src)
    out = str(tmp_path / "rep.parquet")
    run_report(["--in", src, "--group-col", "lang", "--fertility", "--out", out])
    printed = capsys.readouterr().out
    assert "tokens_per_word" in printed
    assert "wrote fertility report" in printed
    fert = spark.read.parquet(f"{out}_fertility").collect()
    assert [r.lang for r in fert] == ["en"] and fert[0].n_words == 7


def test_fertility_feeds_temperature_mix(spark):
    """The fertility→mix capstone (r11, VERDICT item 8): per-language
    fertility converts equal WORD budgets into unequal TOKEN budgets,
    and temperature_mix's α-damping then keeps the low-fertility
    language whole while downsampling the token-hungry one by exactly
    sqrt(t_lo/t_hi) — the arithmetic a mix owner would do by hand,
    pinned end-to-end through the composed operators (the registry
    fertility_mix entry replays the same composition in DuckDB)."""
    import math

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.functions.text import tokens
    from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (
        tokenizer_fertility,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.sampling import (
        temperature_mix,
    )

    # equal word counts per doc (8 words); 'hi' text is punctuation-heavy
    # so the BPE-ish proxy counts ~3 tokens per word, 'lo' exactly 1
    lo_doc = "alpha beta gamma delta epsilon zeta eta theta"
    hi_doc = "a-b! c-d! e-f! g-h! i-j! k-l! m-n! o-p!"
    docs = spark.createDataFrame(
        [(i, lo_doc, "lo") for i in range(40)]
        + [(100 + i, hi_doc, "hi") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    fert = {r.lang: r for r in tokenizer_fertility(docs).collect()}
    assert fert["lo"].tokens_per_word == 1.0
    assert fert["hi"].tokens_per_word > 2.5  # punctuation-rich: ~3x

    # the composition: word counts x fertility -> token budgets -> mix
    fert_df = tokenizer_fertility(docs).select(
        "lang", F.col("tokens_per_word").alias("_tpw"))
    est = (
        docs.select("doc_id", "lang",
                    F.size(tokens(F.col("text"))).cast("long").alias("_n_w"))
        .join(F.broadcast(fert_df), "lang")
        .select("doc_id", "lang",
                F.round(F.col("_n_w") * F.col("_tpw"), 0).cast("long")
                .alias("est_tokens"))
    )
    mixed = temperature_mix(est, token_col="est_tokens", source_col="lang",
                            alpha=0.5, id_col="doc_id", hash_fn="md5")
    fracs = {r.lang: r.keep_frac for r in
             mixed.select("lang", "keep_frac").distinct().collect()}
    # lo anchors (smallest token total -> keep_frac 1.0); hi is damped to
    # sqrt(t_lo/t_hi) by the alpha=0.5 algebra
    assert fracs["lo"] == 1.0
    expect_hi = math.sqrt((40 * 8 * 1.0) / (40 * round(8 * fert["hi"].tokens_per_word)))
    assert abs(fracs["hi"] - expect_hi) < 1e-9
