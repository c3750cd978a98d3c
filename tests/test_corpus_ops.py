"""Dedup / similarity / text operators vs pure-Python references."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_perms,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash,
)
from dbc_informed_socketcan_to_parquet_spark.operators.similarity import cosine_topk, lsh_ann_topk
from dbc_informed_socketcan_to_parquet_spark.operators.textops import doc_stats, lang_id


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),     # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),     # near dup
    (3, "completely different content here about spark engines"),
    (4, "der schnelle braune fuchs und der faule hund ist da"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_md5_long(s: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def _py_minhash(text: str, num_perms: int, n: int = 5) -> list[int]:
    t = text.lower()[:4096]
    shingles = {t[i:i + n] for i in range(len(t) - n + 1)}
    hs = {_py_md5_long(s) for s in shingles}
    out = []
    for a, b in minhash_perms(num_perms, 42):
        out.append(min((((h >> 30) ^ (h & ((1 << 30) - 1))) * a + b) % ((1 << 31) - 1) for h in hs))
    return out


def test_exact_dedup(spark, docs_df):
    groups = {r.canonical_id: r.n_copies for r in exact_duplicates(docs_df, "doc_id", "text").collect()}
    assert groups[0] == 2                      # docs 0 and 1 identical
    assert exact_dedup(docs_df, "doc_id", "text").count() == 4
    survivors = {r.doc_id for r in exact_dedup(docs_df, "doc_id", "text").collect()}
    assert 0 in survivors and 1 not in survivors   # min-id survivor


def test_minhash_matches_python_reference(spark, docs_df):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs_df, "doc_id", "text", num_perms=8).collect()}
    for doc_id, text in DOCS:
        assert list(sigs[doc_id]) == _py_minhash(text, 8), f"doc {doc_id}"


def test_minhash_permutations_are_independent(spark):
    """Regression for the r1-r4 degenerate family: with modulus 2^61-1 the
    mod never wrapped, every permutation was monotone in the folded hash,
    and ALL slots were decided by the same argmin shingle — est Jaccard
    could only be exactly 0.0 or 1.0.  Two docs sharing roughly half
    their shingles must now get a FRACTIONAL estimate near the true J."""
    x = "the early morning express train to the coastal city leaves from platform nine "
    y = "a completely different cargo vessel crosses the southern strait before dawn today "
    docs = spark.createDataFrame([(1, x + y), (2, y + x[:0] + "entirely new padding words fill this half instead of the shared text block here now")],
                                 "doc_id long, text string")
    sigs = {r.doc_id: list(r.sig) for r in
            minhash_signatures(docs, "doc_id", "text", num_perms=64).collect()}
    agree = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 64
    # true char-5-gram Jaccard of the two texts is ~0.4; 64 perms → σ≈0.06
    assert 0.1 < agree < 0.8, f"degenerate estimator: agreement {agree}"


def test_minhash_similarity_ordering(spark, docs_df):
    sigs = {r.doc_id: list(r.sig) for r in minhash_signatures(docs_df, "doc_id", "text", num_perms=32).collect()}
    est = lambda a, b: sum(x == y for x, y in zip(sigs[a], sigs[b])) / 32  # noqa: E731
    assert est(0, 1) == 1.0                     # identical docs: identical signatures
    assert est(0, 2) > est(0, 3)                # near-dup scores above unrelated


def test_minhash_xxhash_fast_path(spark, docs_df):
    """hash_fn=xxhash60 (the non-oracle production path) must preserve the
    minhash invariants: identical docs get identical signatures, near-dups
    score above unrelated docs, and the hash domain stays non-negative."""
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import xxhash60

    sigs = {r.doc_id: list(r.sig) for r in
            minhash_signatures(docs_df, "doc_id", "text", num_perms=32, hash_fn=xxhash60).collect()}
    est = lambda a, b: sum(x == y for x, y in zip(sigs[a], sigs[b])) / 32  # noqa: E731
    assert est(0, 1) == 1.0
    assert est(0, 2) > est(0, 3)
    assert all(v >= 0 for s in sigs.values() for v in s)
    # and the raw shingle hashes themselves are 60-bit non-negative
    sh = shingle_hashes(docs_df, "doc_id", "text", hash_fn=xxhash60)
    lo, hi = sh.agg(F.min("sh_hash"), F.max("sh_hash")).first()
    assert lo >= 0 and hi < (1 << 60)


def test_jaccard_pairs(spark, docs_df):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(docs_df, "doc_id", "text", shingle_n=5, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    assert (0, 3) not in pairs


def test_simhash_hamming(spark, docs_df):
    sigs = {r.doc_id: r.simhash for r in simhash(docs_df, "doc_id", "text", num_bits=32).collect()}
    ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")  # noqa: E731
    assert ham(0, 1) == 0
    assert ham(0, 2) < ham(0, 3)


def test_cosine_topk_exact(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, embedding array<double>")
    rows = cosine_topk(corpus, q, k=2).orderBy("rank").collect()
    assert [r.vec_id for r in rows] == [0, 1]
    assert rows[0].cosine == pytest.approx(1.0)


def test_lsh_ann_recall(spark):
    """LSH-ANN must find the exact top-1 (identical vector) and achieve
    reasonable top-10 recall on the fixtures."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, q, k=10).collect()
    approx = lsh_ann_topk(emb, q, dim=64, k=10, num_planes=4, num_tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for qid in exact_sets:
        assert qid in approx_sets[qid]  # the query vector itself always found
    recall = sum(len(exact_sets[q0] & approx_sets.get(q0, set())) for q0 in exact_sets) / sum(
        len(v) for v in exact_sets.values()
    )
    assert recall >= 0.5  # multi-table LSH recovers most true neighbors


def test_doc_stats_and_langid(spark, docs_df):
    stats = {r.doc_id: r for r in doc_stats(docs_df).collect()}
    assert stats[0].n_tokens == 9
    assert stats[0].stopword_ratio == pytest.approx(2 / 9)   # 'the' twice
    assert stats[0].n_chars == len(DOCS[0][1])
    langs = {r.doc_id: r.predicted_lang for r in lang_id(docs_df).collect()}
    assert langs[0] == "en"
    assert langs[4] == "de"


def test_ivf_ann_recall(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, q, k=10).collect()
    approx = ivf_ann_topk(emb, q, k=10, num_clusters=8, nprobe=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for qid in exact_sets:
        assert qid in approx_sets[qid]      # identical vector always found
    recall = sum(len(exact_sets[i] & approx_sets.get(i, set())) for i in exact_sets) / sum(
        len(v) for v in exact_sets.values()
    )
    assert recall >= 0.5                    # nprobe=4 of 8 clusters


def test_ivf_pandas_kernel_matches_expr(spark):
    """assign_kernel='pandas' (numpy matmul scale path) must reproduce the
    expression path exactly on the fixture: same rounded distances, same
    tie-break, so same clusters, candidates, and top-k."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ivf_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    kw = dict(dim=64, k=10, num_clusters=8, nprobe=4, round_to=6)
    expr_rows = sorted(map(tuple, ivf_ann_topk(emb, q, assign_kernel="expr", **kw).collect()))
    pd_rows = sorted(map(tuple, ivf_ann_topk(emb, q, assign_kernel="pandas", **kw).collect()))
    assert expr_rows == pd_rows


def test_ivf_auto_kernel_rule_and_default_plan(spark):
    """The 'auto' default (r12, VERDICT r11 item 4) must resolve on the
    k*dim product — pandas at or above the crossover so default-args
    callers never re-inherit the Catalyst literal-tree compile tax that
    made k*dim=1024 the r10 weak component — and a default-args plan at
    the fixture shape (k*dim=512) must carry the Arrow kernel, not a
    k*dim literal tree."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        _AUTO_KERNEL_KDIM,
        _resolve_assign_kernel,
        ivf_cluster_stats,
    )

    assert _resolve_assign_kernel("auto", 8, 64) == "pandas"   # 512 >= 512
    assert _resolve_assign_kernel("auto", 4, 64) == "expr"     # 256 < 512
    assert _resolve_assign_kernel("expr", 64, 768) == "expr"   # explicit wins
    assert _resolve_assign_kernel("pandas", 2, 2) == "pandas"
    assert 8 * 64 >= _AUTO_KERNEL_KDIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = ivf_cluster_stats(
        emb, dim=64, num_clusters=8, n_iters=1
    )._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" in plan  # the Arrow-batched assignment kernel
    # the expr kernel renders one literal per centroid component; a
    # default-args plan must not embed that k*dim tree
    assert plan.count("0.") < 8 * 64 // 2


def test_frame_sample_plan_and_semi_join(spark, docs_df, tiny_spec):
    from dbc_informed_socketcan_to_parquet_spark.operators.multimodal import attach_media, frame_sample_plan
    from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler
    from dbc_informed_socketcan_to_parquet_spark.functions.text import char_shingles, word_shingles

    media = attach_media(docs_df)
    planned = frame_sample_plan(media, every_n=10).collect()
    for r in planned:
        assert r.sample_frames[0] == 0
        assert all(i % 10 == 0 for i in r.sample_frames)
        assert len(r.sample_frames) == (r.n_frames + 9) // 10

    frames = spark.createDataFrame(
        [(0x100, b"\0" * 8), (0x999, b"\0" * 8)], "can_id long, data binary"
    )
    comp = DecodeCompiler(tiny_spec)
    kept = comp.known_id_semi_join(frames, spark).collect()
    assert [r.can_id for r in kept] == [0x100]

    sh = spark.createDataFrame([("hello world spark",)], "t string").select(
        char_shingles(F.col("t"), 5).alias("c"), word_shingles(F.col("t"), 2).alias("w")
    ).first()
    assert sh.c[0] == "hello" and sh.w == ["hello world", "world spark"]

    # short inputs: fewer tokens/chars than n must yield EMPTY arrays, not
    # a descending-sequence crash (sequence(1,0) counts down in Spark)
    short = spark.createDataFrame([("hi",), ("",)], "t string").select(
        char_shingles(F.col("t"), 5).alias("c"), word_shingles(F.col("t"), 3).alias("w")
    ).collect()
    for r in short:
        assert r.c == [] and r.w == []


def test_dedup_clusters_connected_components(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import dedup_clusters

    # two components: {1,2,3,4} as a chain (diameter 3), {10,11} as a pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_keep_canonical_drops_non_representatives(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        dedup_clusters,
        keep_canonical,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    kept = keep_canonical(docs, dedup_clusters(pairs))
    assert sorted(r.doc_id for r in kept.collect()) == [1, 10, 99]  # 99: no pair
    assert kept.columns == ["doc_id", "text"]


def test_dedup_clusters_on_lsh_pairs_end_to_end(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        dedup_clusters,
        keep_canonical,
        minhash_dedup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_dedup_pairs(
        docs, "doc_id", "text", num_perms=16, shingle_n=5, num_bands=4,
        threshold=0.5, seed=42,
    )
    n_pairs = pairs.count()
    clusters = dedup_clusters(pairs)
    kept = keep_canonical(docs, clusters)
    n_docs, n_kept = docs.count(), kept.count()
    n_clustered = clusters.count()
    n_components = clusters.select("cluster_id").distinct().count()
    # every clustered doc resolves; kept = singletons + one per component
    assert n_pairs > 0 and n_components < n_clustered
    assert n_kept == n_docs - n_clustered + n_components
    # representative is a member of its own cluster
    assert clusters.filter("doc_id = cluster_id").count() == n_components


def test_star_edges_same_components_as_all_pairs(spark):
    """CC over star edges must equal CC over the all-pairs candidate
    graph (every bucket member reaches the bucket representative), while
    the edge list stays linear in corpus size."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        dedup_clusters,
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text", num_perms=16, shingle_n=5, seed=42).cache()
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_bands=4, rows_per_band=4)
    stars = lsh_star_edges(sigs, "doc_id", num_bands=4, rows_per_band=4)
    cc_pairs = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    cc_stars = {r.doc_id: r.cluster_id for r in dedup_clusters(stars).collect()}
    assert cc_pairs == cc_stars
    # linearity bound: at most one edge per (doc, band)
    assert stars.count() <= docs.count() * 4
    sigs.unpersist()


def test_lsh_max_bucket_cap(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text", num_perms=16, shingle_n=5, seed=42).cache()
    uncapped = lsh_candidate_pairs(sigs, "doc_id", num_bands=4, rows_per_band=4).count()
    # a cap above every bucket size is a no-op
    same = lsh_candidate_pairs(sigs, "doc_id", num_bands=4, rows_per_band=4,
                               max_bucket=10**9).count()
    assert same == uncapped
    # a tight cap strictly reduces pair volume on this clique-heavy corpus
    capped = lsh_candidate_pairs(sigs, "doc_id", num_bands=4, rows_per_band=4,
                                 max_bucket=5).count()
    assert capped < uncapped
    sigs.unpersist()


def test_minhash_star_clusters_fixture(spark, docs_df):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import minhash_star_clusters

    clusters = {
        r.doc_id: r.cluster_id
        for r in minhash_star_clusters(
            docs_df, "doc_id", "text", num_perms=16, shingle_n=5, num_bands=4,
            threshold=0.5,
        ).collect()
    }
    assert clusters.get(0) == 0 and clusters.get(1) == 0  # exact dups cluster
    assert clusters.get(3) != 0 and clusters.get(4) != 0  # distinct docs don't


def test_repetition_stats(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "hello world\nhello world\nhello world\nunique line"),
            (1, "spam spam spam spam spam"),
            (2, "a perfectly normal sentence with no repeats at all"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.dup_line_ratio, r.top_bigram_ratio)
           for r in repetition_stats(docs).collect()}
    assert got[0][0] == 0.5          # 4 lines, 2 dup repeats of "hello world"
    assert got[1][1] == 1.0          # "spam spam" is every bigram
    assert got[2] == (0.0, 0.125)    # 9 tokens -> 8 distinct bigrams, top = 1/8
    assert got[3] == (0.0, 0.0)      # empty doc: no lines, no bigrams


def test_scrub_pii(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import scrub_pii

    docs = spark.createDataFrame(
        [(0, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567, server 10.0.0.1 up")],
        "doc_id long, text string",
    )
    out = scrub_pii(docs).collect()[0].text
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out
    assert "example" not in out and "555" not in out and "10.0.0.1" not in out


def test_random_projection_preserves_relative_distances(spark):
    import math as _math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import random_projection

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    proj = random_projection(emb, "embedding", out_dim=16, seed=7)
    rows = {r.vec_id: r.embedding for r in proj.collect()}
    assert all(len(v) == 16 for v in rows.values())

    # determinism: same seed -> identical output
    again = {r.vec_id: r.embedding for r in
             random_projection(emb, "embedding", out_dim=16, seed=7).collect()}
    assert rows == again

    # JL property (loose): norms shrink-preserve on average within 2x
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    def norm(v):
        return _math.sqrt(sum(x * x for x in v))
    ratios = [norm(rows[k]) / norm(orig[k]) for k in rows if norm(orig[k]) > 0]
    avg = sum(ratios) / len(ratios)
    assert 0.5 < avg < 2.0

    # schema: non-vector columns pass through
    assert set(proj.columns) == {"vec_id", "embedding", "label"}


def test_random_projection_null_and_ragged_rows(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import random_projection

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, None), (2, []), (3, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.embedding for r in random_projection(df, "embedding", out_dim=4).collect()}
    assert len(got[0]) == 4 and len(got[3]) == 4   # both dims project
    assert got[1] is None and got[2] is None       # null/empty -> null


def test_dedup_clusters_warns_on_non_convergence(spark):
    import warnings as _warnings

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import dedup_clusters

    chain = spark.createDataFrame([(i, i + 1) for i in range(6)], "id_a long, id_b long")
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        # driver_threshold=0 forces the distributed loop (the r6 driver
        # fast path computes exactly and has no convergence concept)
        out = dedup_clusters(chain, max_iters=1, driver_threshold=0)
        out.collect()
        assert any("did not converge" in str(x.message) for x in w)


def test_resize_images_plumbing(spark):
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(0, bytearray(b"imgdata-0")), (1, bytearray(b"imgdata-1"))],
        "doc_id long, content binary",
    )
    out = resize_images(df, width=8, height=4).collect()
    assert {r.doc_id for r in out} == {0, 1}
    for r in out:
        assert (r.width, r.height) == (8, 4)
        assert len(r.content) == 8 * 4 * 3          # 3 bytes/pixel plumbing
    # deterministic
    again = resize_images(df, width=8, height=4).collect()
    assert sorted((r.doc_id, bytes(r.content)) for r in again) == \
           sorted((r.doc_id, bytes(r.content)) for r in out)
    with _pytest.raises(NotImplementedError):
        resize_images(df, 8, 4, real=True).collect()


def test_ivf_persisted_index_prunes_and_matches_inline(spark, tmp_path):
    """The persisted IVF index must (a) return exactly what the inline
    operator returns for the same knobs — same deterministic training —
    and (b) scan only the probed cluster partitions (partition pruning
    at file listing, the 100 TB serving property)."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_index_topk,
        ivf_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    path = str(tmp_path / "ivf_index")
    centers = ivf_index_write(emb, path, dim=64, num_clusters=8)
    assert len(centers) <= 8

    inline = sorted(map(tuple, ivf_ann_topk(
        emb, q, dim=64, k=10, num_clusters=8, nprobe=4, round_to=6).collect()))
    via_index = sorted(map(tuple, ivf_index_topk(
        spark, path, q, k=10, nprobe=4, round_to=6).collect()))
    assert inline == via_index

    # pruning: the probed scan carries the cluster predicate as a
    # PARTITION filter (pruned at file listing), not a data filter
    some = sorted(centers)[:2]
    probed = spark.read.parquet(f"{path}/data").filter(F.col("ivf_cluster").isin(some))
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = probed._jdf.queryExecution().explainString(mode)
    part_section = plan.split("PartitionFilters", 1)
    assert len(part_section) == 2, plan
    assert "ivf_cluster" in part_section[1][:200], plan


def test_embedding_near_dup_pandas_kernel_matches_expr(spark):
    """kernel='pandas' (per-block numpy Gram matmul, the scale path the r5
    sf1 study forced: the per-pair HOF expression measured 116x at x10
    data) must reproduce the expression kernel exactly: same pairs, same
    rounded cosines."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(threshold=0.25, round_to=6)
    expr_rows = sorted(map(tuple, embedding_near_dup_pairs(
        emb, "vec_id", "embedding", "label", kernel="expr", **kw).collect()))
    pd_rows = sorted(map(tuple, embedding_near_dup_pairs(
        emb, "vec_id", "embedding", "label", kernel="pandas", **kw).collect()))
    assert expr_rows == pd_rows
    assert len(pd_rows) > 0


def test_embedding_near_dup_chunked_matches_unchunked(spark):
    """The chunked Gram loop (memory bound for big blocks) must not change
    the output: force chunk << block size and compare."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def run(chunk):
        return sorted(map(tuple, embedding_near_dup_pairs(
            emb, "vec_id", "embedding", "label",
            threshold=0.25, kernel="pandas", round_to=6, chunk=chunk).collect()))

    assert run(1024) == run(7)


def test_sign_lsh_sql_build_path_matches_column_path(spark):
    """sign_lsh_signature's one-F.expr SQL build (fast driver path) must
    produce the identical signatures as the Column-API build."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import sign_lsh_signature

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
    )
    for table in (0, 3, "ivf"):
        col_rows = dict(emb.select(
            "vec_id", sign_lsh_signature(F.col("_v"), 4, 64, table).alias("s")).collect())
        sql_rows = dict(emb.select(
            "vec_id", sign_lsh_signature("_v", 4, 64, table).alias("s")).collect())
        assert col_rows == sql_rows


def test_semantic_dedup_clusters_invariants(spark):
    """Semantic dedup (k-means block -> cosine pairs -> CC): every label
    is the min id of its component (canonical-min invariant), duplicate
    vectors always share a cluster, and keep_canonical keeps exactly one
    member per cluster plus all unclustered docs."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        keep_canonical,
        semantic_dedup_clusters,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant an exact duplicate pair with fresh ids
    base = emb.limit(1).select(F.lit(900001).alias("vec_id"), "embedding", "label")
    dup = emb.limit(1).select(F.lit(900002).alias("vec_id"), "embedding", "label")
    corpus = emb.unionByName(base).unionByName(dup)
    clusters = semantic_dedup_clusters(
        corpus, "vec_id", "embedding", threshold=0.25, num_clusters=8, n_iters=1, dim=64,
        round_to=6,
    )
    rows = {r.doc_id: r.cluster_id for r in clusters.collect()}
    assert rows, "no clusters found on the fixture"
    assert all(cid <= did for did, cid in rows.items())      # min-label
    assert all(cid in rows and rows[cid] == cid for cid in set(rows.values()))
    # identical vectors: same k-means cell, cosine 1.0 → same cluster
    assert rows.get(900002) is not None
    assert rows.get(900001, 900001) == rows[900002] or rows[900002] <= 900001
    kept = keep_canonical(corpus, clusters, "vec_id")
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    # exactly the cluster representatives + unclustered singletons
    all_ids = {r.vec_id for r in corpus.select("vec_id").collect()}
    expected = (all_ids - set(rows)) | {cid for cid in rows.values()}
    assert kept_ids == expected


def test_semantic_dedup_auto_cluster_count(spark):
    """num_clusters='auto' (the r7 default) sizes k from the corpus so
    blocks stay ~target_block vectors — the fixed-k shape OOM'd at the
    ×100 point (blocks and the O(block²) pair output grow with N)."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        semantic_dedup_clusters,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    # tiny target_block forces auto-k above the 16 floor: ceil(2n/8)
    auto = semantic_dedup_clusters(
        emb, "vec_id", "embedding", threshold=0.25, n_iters=1, dim=64,
        round_to=6, nprobe=2, target_block=8,
    )
    # equivalent explicit k (rounded up to a power of two — quantizer
    # requirement) produces the identical clustering
    import math
    k = 1 << (max(16, math.ceil(2 * n / 8)) - 1).bit_length()
    explicit = semantic_dedup_clusters(
        emb, "vec_id", "embedding", threshold=0.25, num_clusters=k,
        n_iters=1, dim=64, round_to=6, nprobe=2,
    )
    got = {(r.doc_id, r.cluster_id) for r in auto.collect()}
    want = {(r.doc_id, r.cluster_id) for r in explicit.collect()}
    assert got == want
    with _pytest.raises(ValueError, match="auto"):
        semantic_dedup_clusters(emb, "vec_id", "embedding", num_clusters="huge")


def test_semantic_dedup_multiprobe_only_merges(spark):
    """Raising nprobe adds edges (each vector lands in a superset of
    blocks), so connected components can only MERGE: any two docs
    clustered together at nprobe=1 must share a cluster at nprobe=2."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import semantic_dedup_clusters

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(threshold=0.25, num_clusters=8, n_iters=1, dim=64, round_to=6)
    c1 = {r.doc_id: r.cluster_id for r in
          semantic_dedup_clusters(emb, "vec_id", "embedding", nprobe=1, **kw).collect()}
    c2 = {r.doc_id: r.cluster_id for r in
          semantic_dedup_clusters(emb, "vec_id", "embedding", nprobe=2, **kw).collect()}
    assert set(c1) <= set(c2)                 # every clustered doc stays clustered
    by_c1 = {}
    for did, cid in c1.items():
        by_c1.setdefault(cid, []).append(did)
    for members in by_c1.values():
        assert len({c2[m] for m in members}) == 1, "nprobe=2 split an nprobe=1 component"
    assert len(set(c2.values())) <= len(set(c1.values())) + (len(set(c2) - set(c1)))


def test_paragraph_dedup_first_occurrence_wins(spark):
    boiler = "subscribe to our newsletter for the latest updates today"
    rows = [
        (0, f"unique opening paragraph about spark\n{boiler}\nshort"),
        (1, f"{boiler}\nanother unique paragraph about duckdb engines"),
        (2, f"{boiler}"),                       # every paragraph a dup
        (3, "tiny"),                            # below min_chars: always kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import paragraph_dedup

    out = {r.doc_id: r for r in paragraph_dedup(df, min_chars=20).collect()}
    # doc 0 is first: keeps everything (incl. its short structural line)
    assert out[0].text_dedup == rows[0][1]
    assert (out[0].n_paras, out[0].n_kept) == (3, 3)
    # doc 1 loses the boilerplate, keeps its unique paragraph
    assert out[1].text_dedup == "another unique paragraph about duckdb engines"
    assert (out[1].n_paras, out[1].n_kept) == (2, 1)
    # doc 2 loses its only paragraph but still surfaces
    assert out[2].text_dedup == "" and out[2].n_kept == 0
    # short docs pass through untouched
    assert out[3].text_dedup == "tiny" and out[3].n_kept == 1


def test_dedup_against_corpus_exact_equivalence(spark):
    """Bloom-gated incremental dedup == plain anti-join, including under a
    deliberately tiny bitmap (forced false positives exercise the verify
    join) and a huge one (most rows skip the join entirely)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(i, f"historical document number {i}") for i in range(60)] + [(60, None)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        # 20 overlap the corpus, 20 are new; NULL text hashes as '' and
        # duplicates the corpus's NULL-text row
        [(1000 + i, f"historical document number {i}") for i in range(20)]
        + [(2000 + i, f"fresh crawl document {i}") for i in range(20)]
        + [(3000, None)],
        "doc_id long, text string",
    )
    expected = {2000 + i for i in range(20)}
    for num_bits in (1 << 6, 1 << 20):   # 64 bits => heavy false positives
        got = {
            r.doc_id
            for r in dedup_against_corpus(batch, corpus, num_bits=num_bits).collect()
        }
        assert got == expected, num_bits


def test_lm_score_ranks_oov_text_low(spark):
    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(5)],
        "doc_id long, text string",
    )
    scored_df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "zxqv wkjh qpzm vbnx lkjq zzzz yyyy xxxx wwww")],
        "doc_id long, text string",
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import lm_score

    out = {r.doc_id: r for r in lm_score(scored_df, corpus=corpus).collect()}
    assert out[0].avg_logp > out[1].avg_logp          # in-domain >> gibberish
    assert out[0].perplexity < out[1].perplexity
    assert out[0].n_bigrams == 8 and out[1].n_bigrams == 8
    # broadcast_lm is a pure physical hint: identical values
    bc = {r.doc_id: r for r in lm_score(scored_df, corpus=corpus, broadcast_lm=True).collect()}
    assert {d: (r.avg_logp, r.perplexity) for d, r in out.items()} == {
        d: (r.avg_logp, r.perplexity) for d, r in bc.items()
    }


def test_classifier_score_trained_weights_path(spark):
    """Trained-weight path: weights hit exactly the hashed indices of the
    intended features (unigram AND word-bigram), misses coalesce to 0."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import classifier_score

    nf = 1 << 18

    def idx(feat, seed="clf"):
        return _py_md5_long(feat, salt=f"{seed}|") % nf

    docs = spark.createDataFrame(
        [(0, "this text is very good indeed"), (1, "plain neutral words only here")],
        "doc_id long, text string",
    )
    w = spark.createDataFrame(
        [(idx("good"), 10.0), (idx("very good"), 4.0)], "idx long, w double"
    )
    out = {r.doc_id: r for r in classifier_score(docs, weights=w, num_features=nf).collect()}
    # doc 0: 6 unigrams + 5 bigrams = 11 features; hits = 10 + 4
    assert out[0].n_features == 11
    assert out[0].margin == pytest.approx(14.0 / 11, abs=1e-6)
    assert out[0].prob > 0.7
    # doc 1 hits nothing: margin 0, prob exactly 0.5
    assert out[1].margin == 0.0 and out[1].prob == 0.5
    # bias shifts the margin, not the feature sum
    biased = {r.doc_id: r for r in classifier_score(docs, weights=w, num_features=nf, bias=-1.0).collect()}
    assert biased[1].margin == -1.0


def test_paragraph_dedup_matches_python_reference(spark):
    """Randomized (seeded) corpus vs a direct Python replay of the
    first-occurrence-wins semantics."""
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import paragraph_dedup

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    # a small paragraph pool => genuine cross-doc collisions
    pool = [" ".join(rng.choices(vocab, k=rng.randint(1, 6))) for _ in range(12)]
    rows = [
        (i, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 5))))
        for i in range(30)
    ]
    min_chars = 15

    seen: set[str] = set()
    expected = {}
    for doc_id, text in rows:                  # rows are in (doc, pos) order
        paras = text.split("\n")
        kept = []
        for p in paras:
            if len(p) < min_chars:
                kept.append(p)
            elif p not in seen:
                seen.add(p)
                kept.append(p)
        expected[doc_id] = ("\n".join(kept), len(paras), len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_paras, r.n_kept)
        for r in paragraph_dedup(df, min_chars=min_chars).collect()
    }
    assert got == expected


def test_paragraph_dedup_null_and_empty_text(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a real paragraph that is long enough here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, min_chars=20).collect()}
    assert set(out) == {0, 1, 2}                 # nobody vanishes
    assert out[0].text_dedup == "" and out[0].n_paras == 1   # NULL → empty para
    assert out[1].text_dedup == "" and out[1].n_paras == 1
    assert out[2].n_kept == 1


def test_dedup_against_corpus_empty_sides(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import dedup_against_corpus

    docs = spark.createDataFrame(
        [(i, f"document {i}") for i in range(5)], "doc_id long, text string"
    )
    empty = docs.filter("doc_id < 0")
    # empty corpus: everything in the batch is new (all-zero bitmap)
    assert dedup_against_corpus(docs, empty).count() == 5
    # empty batch: nothing out, no crash
    assert dedup_against_corpus(empty, docs).count() == 0


def _wav_bytes(freq=440.0, sr=8000, seconds=0.25, channels=1, amplitude=0.5):
    """Minimal valid 16-bit PCM WAV, pure stdlib."""
    import math
    import struct

    n = int(sr * seconds)
    samples = b"".join(
        struct.pack("<h", int(amplitude * 32767 * math.sin(2 * math.pi * freq * t / sr)))
        * channels
        for t in range(n)
    )
    fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * channels * 2, channels * 2, 16)
    # include a LIST chunk before data to exercise the chunk walker
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data = b"data" + struct.pack("<I", len(samples)) + samples
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + lst + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_metadata_and_audio_features_real_kernels(spark):
    """Audio kernels are REAL (RIFF walk + numpy DSP), not stubs: header
    fields parse exactly; sine vs silence separate on rms/zcr; malformed
    payloads yield NULLs."""
    from dbc_informed_socketcan_to_parquet_spark.operators.multimodal import (
        audio_features,
        wav_metadata,
    )

    rows = [
        (0, bytearray(_wav_bytes(freq=1000.0, sr=8000, seconds=0.25))),
        (1, bytearray(_wav_bytes(amplitude=0.0, sr=16000, seconds=0.5, channels=2))),
        (2, bytearray(b"not a wav at all")),
        (3, None),                               # NULL payload → NULL row
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")

    meta = {r.doc_id: r for r in wav_metadata(df).collect()}
    assert (meta[0].n_channels, meta[0].sample_rate, meta[0].bits_per_sample) == (1, 8000, 16)
    assert meta[0].n_samples == 2000 and abs(meta[0].duration_s - 0.25) < 1e-9
    assert (meta[1].n_channels, meta[1].sample_rate) == (2, 16000)
    assert abs(meta[1].duration_s - 0.5) < 1e-9
    assert meta[2].sample_rate is None          # malformed → NULLs

    feat = {r.doc_id: r for r in audio_features(df).collect()}
    assert feat[0].rms == pytest.approx(0.5 / math.sqrt(2), rel=0.01)   # sine RMS
    # 1 kHz sine at 8 kHz: 2 crossings per cycle, 1/4 cycle per sample step
    assert feat[0].zero_crossing_rate == pytest.approx(0.25, abs=0.02)
    assert feat[1].rms == 0.0 and feat[1].peak == 0.0                   # silence
    assert feat[2].rms is None
    assert feat[3].rms is None and meta[3].sample_rate is None


def test_ivf_index_append_grows_index_exactly(spark, tmp_path):
    """Append assigns with the STORED quantizer (no retrain): row counts
    add up, assignments match the centroid math, and with every partition
    probed the grown index reproduces exact brute-force top-k over the
    union."""
    import numpy as np

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        cosine_topk,
        ivf_index_append,
        ivf_index_topk,
        ivf_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter("vec_id % 2 = 0")
    later = emb.filter("vec_id % 2 = 1")
    path = str(tmp_path / "ivf")
    centers = ivf_index_write(first, path, num_clusters=4, n_iters=1)
    ivf_index_append(spark, path, later)

    data = spark.read.parquet(f"{path}/data")
    assert data.count() == emb.count()

    # appended rows carry the nearest stored centroid (numpy replay)
    lab = np.array(sorted(centers))
    C = np.array([centers[b] for b in sorted(centers)], dtype=float)
    got = data.join(later.select("vec_id"), "vec_id", "left_semi").select(
        "vec_id", "embedding", "ivf_cluster").collect()
    for r in got:
        v = np.array(r.embedding, dtype=float)
        d = ((C - v) ** 2).sum(axis=1)
        assert r.ivf_cluster == lab[int(np.argmin(d))]

    # full-probe query over the grown index == exact brute force on the union
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    idx = ivf_index_topk(spark, path, queries, k=5, nprobe=4, round_to=6)
    exact = cosine_topk(emb, queries, k=5, round_to=6)
    a = {tuple(r) for r in idx.collect()}
    b = {tuple(r) for r in exact.collect()}
    assert a == b


def test_hot_window_stats_detects_planted_template(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import hot_window_stats

    template = " ".join(f"t{i}" for i in range(6))          # 6-token template
    rows = []
    for d in range(5):                                       # 5 docs share it
        unique = " ".join(f"u{d}_{i}" for i in range(6))
        rows.append((d, f"{template} {unique}"))
    rows.append((9, " ".join(f"x{i}" for i in range(12))))   # all-unique doc
    rows.append((10, "too short"))                           # < window: no rows
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r for r in hot_window_stats(df, window_tokens=6, min_count=5).collect()}
    # 12 tokens, window 6 => 7 windows/doc; only the exact template window
    # (positions 1..6) repeats across all five docs
    for d in range(5):
        assert (out[d].n_windows, out[d].n_hot) == (7, 1)
        assert out[d].hot_ratio == pytest.approx(1 / 7, abs=1e-6)
    assert out[9].n_hot == 0
    assert 10 not in out                                     # below window size


def test_remove_hot_spans_scrub_and_keep_first(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import remove_hot_spans

    tmpl = "the quick brown fox jumps over the lazy dog again and again"  # 12 tokens
    docs = [
        (1, f"alpha beta {tmpl} gamma delta"),
        (2, f"one two three {tmpl} four"),
        (3, tmpl),
        (4, "totally unique text with no repeats at all here"),
        (5, None),
        (6, "short text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    out = {r.doc_id: r for r in remove_hot_spans(df, window_tokens=12, min_count=3).collect()}
    assert len(out) == 6                       # one row per input doc, always
    # scrub: every copy of the hot span is cut, surrounding tokens survive
    assert out[1].clean_text == "alpha beta gamma delta"
    assert out[2].clean_text == "one two three four"
    assert out[3].clean_text == ""             # doc was nothing but the span
    assert out[4].clean_text == "totally unique text with no repeats at all here"
    assert out[5] .clean_text == ""            # NULL text behaves as empty
    assert out[6].clean_text == "short text"   # below window size: untouched
    for r in out.values():                     # accounting always closes
        assert r.kept_tokens + r.removed_tokens == r.n_tokens
        n_clean = len([t for t in r.clean_text.split(" ") if t])
        assert n_clean == r.kept_tokens

    # keep_first: the canonical copy (min (doc_id, start)) survives
    kf = {r.doc_id: r for r in
          remove_hot_spans(df, window_tokens=12, min_count=3, keep_first=True).collect()}
    assert kf[1].clean_text == f"alpha beta {tmpl} gamma delta"
    assert kf[2].clean_text == "one two three four"
    assert kf[3].clean_text == ""
    assert kf[1].removed_tokens == 0 and kf[2].removed_tokens == 12


def test_hot_set_join_strategy_by_measured_size(spark):
    """The hot-window-set join (r12, VERDICT r11 weak component) must pick
    its strategy from the MEASURED hot-set size: broadcast when the set is
    template-rare, SHUFFLE_HASH on the window hash when it is corpus-scale
    (crawl corpora run 30-80% duplication, where a forced broadcast OOMs
    the driver) — with identical results either way."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        duplicate_spans,
        remove_eval_spans,
        remove_hot_spans,
    )

    tmpl = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(d, f"head{d} {tmpl} tail{d}") for d in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def plan_of(out):
        return out._jdf.queryExecution().executedPlan().toString()

    kw = dict(window_tokens=12, min_count=3)
    bcast = remove_hot_spans(df, **kw)
    shuf = remove_hot_spans(df, hot_broadcast_max_rows=0, **kw)
    assert "BroadcastHashJoin" in plan_of(bcast)
    p = plan_of(shuf)
    assert "ShuffledHashJoin" in p and "CartesianProduct" not in p
    assert sorted(map(tuple, bcast.collect())) == sorted(map(tuple, shuf.collect()))

    # keep_first routes BOTH the hot join and the canon join through the
    # same measured verdict
    kf_b = remove_hot_spans(df, keep_first=True, **kw)
    kf_s = remove_hot_spans(df, keep_first=True, hot_broadcast_max_rows=0, **kw)
    assert sorted(map(tuple, kf_b.collect())) == sorted(map(tuple, kf_s.collect()))

    ds_b = duplicate_spans(df, window_tokens=12, min_count=2)
    ds_s = duplicate_spans(df, window_tokens=12, min_count=2,
                           hot_broadcast_max_rows=0)
    assert "BroadcastHashJoin" in plan_of(ds_b)
    assert "ShuffledHashJoin" in plan_of(ds_s)
    assert sorted(map(tuple, ds_b.collect())) == sorted(map(tuple, ds_s.collect()))

    # remove_eval_spans keep_schema: the corpus-derived span table obeys
    # the same gate (a train-on-test shard makes it corpus-scale)
    ev = spark.createDataFrame([(100, tmpl)], "doc_id long, text string")
    rs_b = remove_eval_spans(df, ev, window_tokens=12, keep_schema=True)
    rs_s = remove_eval_spans(df, ev, window_tokens=12, keep_schema=True,
                             span_broadcast_max_rows=0)
    assert "ShuffledHashJoin" in plan_of(rs_s)
    assert sorted(map(tuple, rs_b.collect())) == sorted(map(tuple, rs_s.collect()))


def test_remove_hot_spans_overlapping_windows_merge(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import remove_hot_spans

    # a 5-token template scanned with window 4 produces 2 overlapping hot
    # windows per doc; the cut must be their union (5 tokens), not 8
    tmpl = "p q r s t"
    docs = [(d, f"u{d} {tmpl} v{d}") for d in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_hot_spans(df, window_tokens=4, min_count=4).collect()}
    for d in range(4):
        assert out[d].clean_text == f"u{d} v{d}"
        assert out[d].removed_tokens == 5


def test_remove_eval_spans_cuts_only_the_quote(spark):
    """remove_eval_spans (r11): a corpus doc quoting a >=w-token eval
    passage at an UNALIGNED offset loses exactly the quoted tokens; an
    unrelated doc and a doc shorter than one window pass through."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        remove_eval_spans,
    )

    quote = "q1 q2 q3 q4 q5 q6"
    eval_df = spark.createDataFrame(
        [(900, f"e1 e2 {quote} e3")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, f"a1 a2 a3 {quote} z1 z2"),       # quote at 4..9
         (2, "clean text with no overlap at all whatsoever today"),
         (3, "tiny doc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in remove_eval_spans(
        corpus, eval_df, window_tokens=4).collect()}
    assert got[1].clean_text == "a1 a2 a3 z1 z2"
    assert (got[1].n_tokens, got[1].kept_tokens, got[1].removed_tokens) == (11, 5, 6)
    assert got[2].removed_tokens == 0
    assert got[3].clean_text == "tiny doc" and got[3].removed_tokens == 0


def test_remove_eval_spans_case_folds_and_broadcasts(spark):
    """Matching is case-folded (the eval hash set is lowercased on both
    sides) and the eval side plans as a broadcast join."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        remove_eval_spans,
    )

    eval_df = spark.createDataFrame(
        [(9, "THE QUICK BROWN FOX JUMPS")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "intro the quick brown fox jumps outro")],
        "doc_id long, text string")
    out = remove_eval_spans(corpus, eval_df, window_tokens=5)
    assert out.collect()[0].clean_text == "intro outro"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_chunk_documents_reconstruction_property(spark):
    """Randomized reconstruction pin for the r5 chunker (added r11):
    dropping each chunk's overlap-prefix (except chunk 0) and
    concatenating in chunk order reproduces the original token stream
    exactly — no token lost or duplicated at any (n, chunk, overlap)
    combination."""
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.sampling import (
        chunk_documents,
    )

    rng = random.Random(1111)
    cases = []
    for d in range(1, 13):
        n = rng.randint(1, 40)
        cases.append((d, " ".join(f"w{d}_{i}" for i in range(n))))
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    for c, o in [(5, 0), (5, 2), (8, 7), (3, 1)]:
        rows = chunk_documents(docs, max_tokens=c, overlap=o).collect()
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for d, text in cases:
            chunks = sorted(by_doc[d], key=lambda r: r.chunk_idx)
            rebuilt: list = []
            for r in chunks:
                toks = r.text.split(" ")
                assert len(toks) == r.n_tokens
                rebuilt.extend(toks if r.chunk_idx == 0 else toks[o:])
            assert rebuilt == text.split(" "), (d, c, o)


def test_source_overlap_pairwise_jaccard(spark):
    """source_overlap (r11): shared-distinct-shingle counts + Jaccard
    per source pair, hand-computed on a planted corpus — a copied
    passage shows up as a high-Jaccard pair, disjoint sources produce
    no row at all."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        source_overlap,
    )

    shared = "w1 w2 w3 w4"          # 2 distinct 3-grams, in A and B
    docs = spark.createDataFrame(
        [(1, f"{shared} a5", "A"),   # A: shingles {123,234,345} -> 3
         (2, f"{shared} b5", "B"),   # B: {123,234,34b} -> 3, shares 2 with A
         (3, "x1 x2 x3 x4 x5", "C")],  # C: disjoint from both
        "doc_id long, text string, source string",
    )
    rows = {(r.source_a, r.source_b): r for r in
            source_overlap(docs, shingle_n=3).collect()}
    assert set(rows) == {("A", "B")}   # C overlaps nobody -> no rows
    ab = rows[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_shared) == (3, 3, 2)
    assert ab.jaccard == round(2 / (3 + 3 - 2), 6)


def test_report_cli_overlap_and_spans(spark, tmp_path, capsys):
    """report --overlap / --dup-spans (r11): both reports print and land
    as parquet siblings of --out."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import run_report

    shared = "w1 w2 w3 w4 w5"
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, f"{shared} a6 a7", "A"), (2, f"{shared} b6 b7", "B"),
         (3, "x1 x2 x3 x4 x5 x6 x7", "C")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    out = str(tmp_path / "rep.parquet")
    run_report(["--in", src, "--group-col", "source",
                "--overlap", "--overlap-shingle-n", "3",
                "--dup-spans", "--span-window-tokens", "4", "--out", out])
    printed = capsys.readouterr().out
    assert "jaccard" in printed and "span_tokens" in printed
    ov = {(r.source_a, r.source_b): r.n_shared for r in
          spark.read.parquet(f"{out}_overlap").collect()}
    assert ov == {("A", "B"): 3}     # 3 distinct 3-grams inside the 5 shared
    spans = sorted((r.doc_id, r.span_start, r.span_end) for r in
                   spark.read.parquet(f"{out}_spans").collect())
    assert spans == [(1, 1, 5), (2, 1, 5)]


def test_duplicate_spans_reports_maximal_repeats(spark):
    """duplicate_spans (r11): maximal duplicated regions reported with
    1-based inclusive token spans — unaligned cross-doc repeats merge
    into ONE maximal span per doc; adjacent-but-distinct repeats chain;
    docs without a duplicated window produce no rows."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        duplicate_spans,
    )

    rep = "r1 r2 r3 r4 r5 r6"  # 6-token repeat, windows w=4 slide inside it
    docs = spark.createDataFrame(
        [(1, f"a1 a2 {rep} z1 z2"),          # repeat at tokens 3..8
         (2, f"b1 {rep} c1 c2 {rep}"),       # twice in one doc: 2..7, 10..15
         (3, "unique words only here today none repeated at all")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(docs, window_tokens=4, min_count=2).collect()
    )
    assert got == [(1, 3, 8, 6), (2, 2, 7, 6), (2, 10, 15, 6)]


def test_duplicate_spans_consistent_with_removal(spark):
    """The spans duplicate_spans reports are exactly the tokens
    remove_hot_spans cuts (same windows, same hot set): sum of
    span_tokens per doc == removed_tokens per doc."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        duplicate_spans,
        remove_hot_spans,
    )

    tmpl = "t1 t2 t3 t4 t5 t6 t7"
    docs = spark.createDataFrame(
        [(d, f"u{d}a u{d}b {tmpl} w{d}a {tmpl} w{d}b") for d in range(4)],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, window_tokens=5, min_count=3)
    by_doc = {r.doc_id: r.total for r in spans.groupBy("doc_id")
              .agg(F.sum("span_tokens").alias("total")).collect()}
    removed = {r.doc_id: r.removed_tokens for r in remove_hot_spans(
        docs, window_tokens=5, min_count=3).collect()}
    for d in range(4):
        assert by_doc.get(d, 0) == removed[d] > 0


def _exact_repeat_cover(token_docs, w, min_count):
    """Independent brute-force oracle for Lee-et-al exact-substring
    dedup: the set of (doc, 1-based token position) covered by ANY
    substring of length >= w tokens whose (lowercased) content occurs
    >= min_count times corpus-wide.  Enumerates every (start, length)
    substring directly — O(n^3) and fine on test corpora — with no
    shared code or shared lemma with the operator under test."""
    from collections import Counter

    occ = Counter()
    for toks in token_docs.values():
        n = len(toks)
        for length in range(w, n + 1):
            for s in range(n - length + 1):
                occ[" ".join(t.lower() for t in toks[s:s + length])] += 1
    covered = set()
    for doc, toks in token_docs.items():
        n = len(toks)
        for length in range(w, n + 1):
            for s in range(n - length + 1):
                key = " ".join(t.lower() for t in toks[s:s + length])
                if occ[key] >= min_count:
                    covered.update((doc, p) for p in range(s + 1, s + length + 1))
    return covered


def test_remove_hot_spans_matches_exact_repeat_oracle(spark):
    """EXACTNESS pin for the window method (r11, VERDICT item 6): the
    stride-1 w-token window union removes EXACTLY the tokens inside
    >= w-token substrings repeated >= min_count times — the Lee et al.
    exact-substring semantic — because every w-window of a repeated
    substring repeats with it (cover lemma) and every repeated w-window
    IS a >= w-token repeat.  Verified against an independent brute-force
    all-substrings oracle on corpora with unaligned, overlapping, and
    cross-doc repeats: recall AND precision are 1.0, not approximate."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        remove_hot_spans,
    )

    corpora = [
        # unaligned repeat: the 6-token repeat starts at offset 2 in doc
        # 1 and offset 5 in doc 2 (a tumbling window would miss this)
        {1: "a1 a2 R1 R2 R3 R4 R5 R6 z1 z2".split(),
         2: "b1 b2 b3 b4 b5 R1 R2 R3 R4 R5 R6".split()},
        # within-doc repeat + case folding
        {1: "X Y P q r s P Q R S tail1 tail2".split()},
        # overlapping repeats sharing tokens: 'm n o p q' and 'o p q r s'
        {1: "m n o p q r s u1 u2".split(),
         2: "w1 m n o p q w2 w3 w4".split(),
         3: "v1 v2 o p q r s v3".split()},
        # repeat shorter than w -> nothing removed
        {1: "c d e f g h".split(), 2: "k1 c d e k2 k3 k4".split()},
    ]
    for w, min_count, token_docs in [(4, 2, corpora[0]), (4, 2, corpora[1]),
                                     (3, 2, corpora[2]), (4, 2, corpora[3])]:
        df = spark.createDataFrame(
            [(d, " ".join(toks)) for d, toks in token_docs.items()],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in remove_hot_spans(
            df, window_tokens=w, min_count=min_count).collect()}
        expect_cover = _exact_repeat_cover(token_docs, w, min_count)
        for d, toks in token_docs.items():
            expect_kept = [t for p, t in enumerate(toks, start=1)
                           if (d, p) not in expect_cover]
            assert got[d].clean_text == " ".join(expect_kept), (
                f"w={w} doc={d}: {got[d].clean_text!r} != {expect_kept!r}")
            assert got[d].removed_tokens == len(toks) - len(expect_kept)


def test_remove_hot_spans_exactness_property(spark):
    """Randomized exactness sweep (hypothesis-style, fixed seed): on 20
    random corpora over a tiny alphabet (forcing plenty of accidental
    repeats at every alignment), the window method's removed-token set
    equals the brute-force exact-repeat cover for every doc."""
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        remove_hot_spans,
    )

    rng = random.Random(711)
    for trial in range(20):
        w = rng.choice([2, 3, 4])
        n_docs = rng.randint(1, 4)
        token_docs = {
            d: [rng.choice("abcde") + str(rng.randint(0, 2))
                for _ in range(rng.randint(0, 14))]
            for d in range(1, n_docs + 1)
        }
        df = spark.createDataFrame(
            [(d, " ".join(toks)) for d, toks in token_docs.items()],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.clean_text for r in remove_hot_spans(
            df, window_tokens=w, min_count=2).collect()}
        cover = _exact_repeat_cover(token_docs, w, 2)
        for d, toks in token_docs.items():
            expect = " ".join(t for p, t in enumerate(toks, start=1)
                              if (d, p) not in cover)
            assert got[d] == expect, (
                f"trial={trial} w={w} doc={d} toks={toks}: "
                f"{got[d]!r} != {expect!r}")


def test_fuzzy_contamination_flags_paraphrased_eval_doc(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import fuzzy_contamination

    eval_text = (
        "the standardized benchmark question asks which planet is closest "
        "to the sun and the expected answer is mercury because it orbits "
        "nearest among all the planets in the solar system"
    )
    # near-copy: a few words changed — exact-shingle overlap drops but
    # most 5-gram shingles survive, so MinHash similarity stays high
    near_copy = eval_text.replace("standardized", "standard").replace(
        "expected answer", "right answer"
    )
    corpus = spark.createDataFrame(
        [
            (1, near_copy),
            (2, "completely unrelated text about cooking pasta with garlic "
                "and olive oil in a large pot of salted boiling water"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")

    out = {r.doc_id: r for r in fuzzy_contamination(corpus, evals, threshold=0.5).collect()}
    assert 1 in out and out[1].eval_id == 100 and out[1].est_jaccard >= 0.5
    assert 2 not in out


def test_pq_encode_matches_numpy_reference(spark):
    import numpy as np

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    model = pq_train(emb, num_subspaces=8, bits=4, n_iters=3)
    got = {r.vec_id: r.codes for r in pq_encode(emb, model).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    C = model.codebooks
    ds = model.subdim
    for r in rows[:50]:
        v = np.asarray(r.embedding, dtype=np.float64)
        want = [
            int(np.argmin(((v[s * ds:(s + 1) * ds] - C[s]) ** 2).sum(axis=1)))
            for s in range(8)
        ]
        assert got[r.vec_id] == want, r.vec_id
    assert all(0 <= c < 16 for codes in got.values() for c in codes)
    assert all(len(codes) == 8 for codes in got.values())


def test_pq_train_deterministic(spark):
    import numpy as np

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import pq_train

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    m1 = pq_train(emb, num_subspaces=8, bits=4, n_iters=3)
    m2 = pq_train(emb, num_subspaces=8, bits=4, n_iters=3)
    assert np.array_equal(m1.codebooks, m2.codebooks)
    # repartitioning the input must not change the fit (hash-ordered sample)
    m3 = pq_train(emb.repartition(13), num_subspaces=8, bits=4, n_iters=3)
    assert np.array_equal(m1.codebooks, m3.codebooks)


def test_pq_topk_recall_against_exact(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    model = pq_train(emb, num_subspaces=16, bits=6, n_iters=5)
    codes = pq_encode(emb, model)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = pq_topk(codes, model, queries, k=10).collect()
    got: dict[int, list[int]] = {}
    for r in res:
        got.setdefault(r.query_id, []).append(r.vec_id)
    assert set(got) == {0, 1, 2, 3, 4} and all(len(v) == 10 for v in got.values())

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r.vec_id for r in rows])
    V = np.asarray([r.embedding for r in rows], dtype=np.float64)
    recalls = []
    for q in range(5):
        qv = V[ids == q][0]
        d = ((V - qv) ** 2).sum(axis=1)
        exact = set(ids[np.lexsort((ids, d))[:10]].tolist())
        recalls.append(len(exact & set(got[q])) / 10)
    # measured 0.68 at these knobs on the fixture; 0.5 leaves noise margin
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # the true nearest neighbor (the query itself, distance 0) always survives
    for q in range(5):
        assert got[q][0] == q


def test_pq_config_errors(spark):
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import pq_train

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, num_subspaces=7)
    with _pytest.raises(ValueError, match="bits"):
        pq_train(emb, bits=9)
    with _pytest.raises(ValueError, match="codewords"):
        pq_train(emb.limit(3), bits=8)


def test_ivfpq_recall_and_probe_monotonicity(spark):
    import numpy as np

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ivfpq_ann_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r.vec_id for r in rows])
    V = np.asarray([r.embedding for r in rows], dtype=np.float64)

    def recall(res):
        got: dict[int, list[int]] = {}
        for r in res:
            got.setdefault(r.query_id, []).append(r.vec_id)
        rs = []
        for q in range(5):
            qv = V[ids == q][0]
            d = ((V - qv) ** 2).sum(axis=1)
            exact = set(ids[np.lexsort((ids, d))[:10]].tolist())
            rs.append(len(exact & set(got[q])) / 10)
        return got, sum(rs) / len(rs)

    got4, r4 = recall(ivfpq_ann_topk(
        emb, queries, k=10, num_clusters=8, nprobe=4, num_subspaces=16, bits=6
    ).collect())
    # measured 0.6 at these knobs; 0.4 leaves margin
    assert r4 >= 0.4, r4
    # the query vector itself (residual distance ~0) must rank first
    for q in range(5):
        assert got4[q][0] == q
    # probing every cluster can only help (no routing loss left)
    _, r8 = recall(ivfpq_ann_topk(
        emb, queries, k=10, num_clusters=8, nprobe=8, num_subspaces=16, bits=6
    ).collect())
    assert r8 >= r4


def test_gopher_quality_flags_each_rule(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import gopher_quality_flags

    good = ("the report shows that revenue continued to grow with steady "
            "demand and the team plans to have further expansion of the "
            "analytics platform that customers be asking for ") * 3  # >50 words
    docs = [
        (1, good),
        (2, "too short to pass"),                                  # word count
        (3, " ".join("a" for _ in range(60)) + " the of and"),     # avg len < 3
        (4, good + " " + "#tag " * 30),                            # symbol ratio
        (5, "\n".join(f"- bullet {i} item listed here" for i in range(20))),  # bullets
        (6, "\n".join(f"line {i} trails off..." for i in range(20))),         # ellipsis
        (7, " ".join("1234" for _ in range(60)) + " the of and to"),          # alpha
        (8, " ".join(f"w{i}x" for i in range(60))),                # no stop words
        (9, None),                                                 # NULL text
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

    assert out[1].passes_gopher
    assert not out[2].ok_word_count and not out[2].passes_gopher
    assert not out[3].ok_avg_word_len
    assert not out[4].ok_symbol_ratio
    assert not out[5].ok_bullet_lines and out[5].bullet_ratio == 1.0
    assert not out[6].ok_ellipsis_lines and out[6].ellipsis_ratio == 1.0
    assert not out[7].ok_alpha_words
    assert not out[8].ok_stop_words and out[8].stop_hits == 0
    assert out[9].n_words == 0 and not out[9].passes_gopher


def _normalize_ref(s: str) -> str:
    """Pure-Python reference of textops.normalize_text (same pass order)."""
    import re as _re
    import unicodedata

    s = unicodedata.normalize("NFC", s)
    s = _re.sub(r"\r\n?", "\n", s)
    s = _re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", s)
    s = _re.sub("[ \t ]+", " ", s)
    s = _re.sub(r" ?\n ?", "\n", s)
    s = _re.sub(r"^[ \n]+|[ \n]+$", "", s)
    return s


def test_normalize_text_matches_python_reference_and_idempotent(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import normalize_text

    cases = [
        "plain ascii text",
        "decomposed: cafe\u0301 and A\u030angstro\u0308m",  # combining marks -> NFC must compose
        "nbsp separated words",
        "tabs\t\tand   runs",
        "crlf\r\nlines\rand lone cr",
        "ctrl\x00chars\x07here\x7f!",
        "  leading and trailing  \n\n mid \n ",
        "",
        "ééé",                                  # already composed
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "doc_id long, text string")
    out = {r.doc_id: r.text for r in normalize_text(df).collect()}
    for i, c in enumerate(cases):
        assert out[i] == _normalize_ref(c), (i, repr(c), repr(out[i]))
    # idempotent: a second pass is the identity
    df2 = spark.createDataFrame([(i, t) for i, t in out.items()], "doc_id long, text string")
    out2 = {r.doc_id: r.text for r in normalize_text(df2).collect()}
    assert out2 == out


def test_multimodal_near_dup_composition(spark):
    """Media near-dup end-to-end: attach binary content, featurize via the
    Arrow kernel, then block + exact-cosine near-dup over the feature
    vectors — identical payloads must pair, distinct ones must not."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import embedding_near_dup_pairs
    from dbc_informed_socketcan_to_parquet_spark.operators.multimodal import (
        attach_media,
        extract_features,
    )

    rows = [
        (1, "the same exact image payload bytes here"),
        (2, "the same exact image payload bytes here"),       # dup of 1
        (3, "a completely different pixel distribution!!!"),
        (4, "yet another unrelated binary blob of content"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_media(docs)
    feats = extract_features(media)
    vecs = feats.withColumn("block", F.lit(0))                 # tiny corpus: one block
    pairs = embedding_near_dup_pairs(vecs, "doc_id", "features", "block",
                                     threshold=0.999)
    got = {(r[0], r[1]) for r in pairs.select("id_a", "id_b").collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got), got


def test_lm_write_score_from_matches_inline(spark, tmp_path):
    """Persisted-LM path (r6): lm_score_from(path) == lm_score(corpus)
    bit-for-bit when the stored model is unpruned — train once, score
    forever."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        lm_score,
        lm_score_from,
        lm_write,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(5)]
        + [(100, "a rare bigram appears exactly once here")],
        "doc_id long, text string",
    )
    scored_df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "zxqv wkjh qpzm vbnx lkjq zzzz yyyy xxxx wwww"),
         (2, "a rare bigram appears exactly once here")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lm")
    v = lm_write(corpus, path, min_count=1)  # bit-identity needs unpruned
    assert v > 0
    inline = {r.doc_id: (r.n_bigrams, r.avg_logp, r.perplexity)
              for r in lm_score(scored_df, corpus=corpus).collect()}
    disk = {r.doc_id: (r.n_bigrams, r.avg_logp, r.perplexity)
            for r in lm_score_from(scored_df, path).collect()}
    assert inline == disk

    # pruned model: thresholded bigrams back off to the add-one floor —
    # the rare-bigram doc scores LOWER, common-text doc is unchanged
    # (its bigrams all clear the threshold), and context totals stay exact
    path2 = str(tmp_path / "lm_pruned")
    lm_write(corpus, path2, min_count=2)
    pruned = {r.doc_id: (r.n_bigrams, r.avg_logp, r.perplexity)
              for r in lm_score_from(scored_df, path2).collect()}
    assert pruned[0] == disk[0]
    assert pruned[2][1] < disk[2][1]
    with pytest.raises(ValueError):
        lm_write(corpus, str(tmp_path / "bad"), min_count=0)

    # the DEFAULT artifact is pruned (r7, ADVICE r6): min_count=2 in meta
    # and no singleton bigram survives in the stored table
    path3 = str(tmp_path / "lm_default")
    lm_write(corpus, path3)
    meta = spark.read.parquet(path3 + "/meta").collect()[0]
    assert meta["min_count"] == 2
    min_c12 = spark.read.parquet(path3 + "/bigrams").agg({"c12": "min"}).collect()[0][0]
    assert min_c12 >= 2


def test_lm_score_rowlocal_guards_oversized_model(spark, tmp_path):
    """lm_score_rowlocal refuses to driver-collect a model above its row
    ceiling and names min_count + the distributed alternative (ADVICE r6:
    the silent-OOM path is now a loud, actionable error)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        lm_score_rowlocal,
        lm_write,
    )

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(3)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lm")
    lm_write(corpus, path, min_count=1)
    with pytest.raises(ValueError, match="min_count.*lm_score_from"):
        lm_score_rowlocal(corpus, path, max_model_rows=3).collect()
    # under the ceiling it scores normally
    out = lm_score_rowlocal(corpus, path, max_model_rows=1000)
    assert out.filter("lm_avg_logp IS NOT NULL").count() == 3


def test_classifier_write_score_from_matches_inline(spark, tmp_path):
    """Persisted-classifier path (r6): the featurization config rides with
    the weights, and from-disk scores equal the inline call exactly."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_score,
        classifier_score_from,
        classifier_write,
    )

    nf = 1 << 12

    def idx(feat, seed="s9"):
        return _py_md5_long(feat, salt=f"{seed}|") % nf

    docs = spark.createDataFrame(
        [(0, "this text is very good indeed"), (1, "plain neutral words only here")],
        "doc_id long, text string",
    )
    w = spark.createDataFrame(
        [(idx("good"), 10.0), (idx("very good"), 4.0)], "idx long, w double"
    )
    path = str(tmp_path / "clf")
    classifier_write(w, path, num_features=nf, bigrams=True, bias=-0.5, seed="s9")
    inline = {r.doc_id: (r.n_features, r.margin, r.prob)
              for r in classifier_score(
                  docs, weights=w, num_features=nf, bias=-0.5, seed="s9").collect()}
    disk = {r.doc_id: (r.n_features, r.margin, r.prob)
            for r in classifier_score_from(docs, path).collect()}
    assert inline == disk
    assert disk[0][1] == pytest.approx(14.0 / 11 - 0.5, abs=1e-6)


def test_rowlocal_model_scores_match_batch(spark, tmp_path):
    """The streaming-safe row-local scorers reproduce the batch from-disk
    scorers' values exactly (same tokenizer, hash, add-one floor) — the
    property that makes stream and batch gate decisions identical."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_score_from,
        classifier_score_rowlocal,
        classifier_write,
        lm_score_from,
        lm_score_rowlocal,
        lm_write,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "zxqv wkjh qpzm vbnx lkjq zzzz yyyy"),
         (2, "x"),                  # one token: no bigrams
         (3, None)],                # NULL text
        "doc_id long, text string",
    )
    lm_dir = str(tmp_path / "lm")
    lm_write(corpus, lm_dir)
    batch = {r.doc_id: (r.n_bigrams, r.avg_logp, r.perplexity)
             for r in lm_score_from(docs, lm_dir).collect()}
    local = {r.doc_id: (r.lm_n_bigrams, r.lm_avg_logp, r.lm_perplexity)
             for r in lm_score_rowlocal(docs, lm_dir).collect()}
    # batch emits no row for bigram-less docs; row-local emits NULL scores
    assert set(batch) == {0, 1}
    for d in (0, 1):
        assert local[d][0] == batch[d][0]
        assert local[d][1] == pytest.approx(batch[d][1], abs=2e-6)
        assert local[d][2] == pytest.approx(batch[d][2], abs=2e-6)
    assert local[2] == (None, None, None) and local[3] == (None, None, None)

    nf = 1 << 12
    w = spark.createDataFrame(
        [(_py_md5_long("quick", salt="clf|") % nf, 5.0)], "idx long, w double"
    )
    clf_dir = str(tmp_path / "clf")
    classifier_write(w, clf_dir, num_features=nf, bias=-0.25)
    cb = {r.doc_id: (r.n_features, r.margin, r.prob)
          for r in classifier_score_from(docs.filter("text IS NOT NULL"), clf_dir).collect()}
    cl = {r.doc_id: (r.clf_n_features, r.clf_margin, r.clf_prob)
          for r in classifier_score_rowlocal(docs, clf_dir).collect()}
    for d in (0, 1, 2):
        assert cl[d][0] == cb[d][0]
        assert cl[d][1] == pytest.approx(cb[d][1], abs=2e-6)
        assert cl[d][2] == pytest.approx(cb[d][2], abs=2e-6)
    assert cl[3] == (None, None, None)


def test_cc_driver_fast_path_matches_distributed_loop(spark):
    """The r6 driver union-find and the distributed label-prop loop must
    emit identical (doc_id, cluster_id) sets on randomized graphs —
    chains, cliques, singleton edges, string ids."""
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import dedup_clusters

    rng = random.Random(23)
    for trial in range(4):
        n = rng.randrange(5, 120)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(1, 200))]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = {(r.doc_id, r.cluster_id)
                for r in dedup_clusters(df).collect()}
        loop = {(r.doc_id, r.cluster_id)
                for r in dedup_clusters(df, driver_threshold=0).collect()}
        assert fast == loop, trial

    # string ids exercise the non-numeric min + factorize path
    df = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], "id_a string, id_b string"
    )
    fast = {(r.doc_id, r.cluster_id) for r in dedup_clusters(df).collect()}
    assert fast == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


# -- classifier_train (operators/textops.py, r9) -----------------------------

def _separable_corpus(spark, n=30):
    rows = []
    for i in range(n):
        rows.append((i, f"fluffy cat purrs softly kitten whiskers feline friend {i % 3}", 1))
        rows.append((100 + i, f"compile the code segfault pointer debug stack trace {i % 3}", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_train_learns_and_roundtrips(spark, tmp_path):
    """In-engine GD training separates a separable corpus, and the
    trained model round-trips through classifier_write /
    classifier_score_from with identical scores — the full
    train→persist→score production loop."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_score,
        classifier_score_from,
        classifier_train,
        classifier_write,
    )

    docs = _separable_corpus(spark)
    w, b = classifier_train(docs, n_iters=8, lr=4.0, num_features=1024)
    scored = classifier_score(
        docs.drop("label"), weights=w, bias=b, num_features=1024
    ).join(docs.select("doc_id", "label"), "doc_id")
    p1 = [r.prob for r in scored.filter("label = 1").collect()]
    p0 = [r.prob for r in scored.filter("label = 0").collect()]
    assert min(p1) > max(p0), (min(p1), max(p0))

    path = str(tmp_path / "clf")
    classifier_write(w, path, num_features=1024, bigrams=True, bias=b)
    from_disk = {r.doc_id: r.prob for r in classifier_score_from(
        docs.drop("label"), path).collect()}
    inline = {r.doc_id: r.prob for r in scored.collect()}
    assert from_disk == inline


def test_classifier_train_null_labels_excluded_and_validation(spark):
    """NULL-label rows do not influence training (train(sub) ==
    train(sub + null rows)); degenerate inputs fail loudly."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_train,
    )

    docs = _separable_corpus(spark, n=5)
    with_nulls = docs.union(spark.createDataFrame(
        [(900, "some unlabeled text floating around here", None)],
        "doc_id long, text string, label int",
    ))
    w_a, b_a = classifier_train(docs, n_iters=2, num_features=256)
    w_b, b_b = classifier_train(with_nulls, n_iters=2, num_features=256)
    assert b_a == b_b
    assert sorted(map(tuple, w_a.collect())) == sorted(map(tuple, w_b.collect()))

    with pytest.raises(ValueError, match="n_iters"):
        classifier_train(docs, n_iters=0)
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="featureful"):
        classifier_train(empty, n_iters=1)


def test_perplexity_buckets_exact_ntile(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        perplexity_buckets,
    )

    rows = [(i, "en", float(10 + i)) for i in range(6)] + \
           [(10 + i, "de", float(100 - i)) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, perplexity double")
    out = perplexity_buckets(df, n_buckets=3, lang_col="lang", exact=True)
    got = {r["doc_id"]: (r["ppl_bucket"], r["ppl_tier"]) for r in out.collect()}
    # en: 6 docs ordered 10..15 -> tiles of 2
    assert got[0] == (1, "head") and got[1] == (1, "head")
    assert got[2] == (2, "middle") and got[3] == (2, "middle")
    assert got[4] == (3, "tail") and got[5] == (3, "tail")
    # de partitioned separately: its lowest ppl doc is ITS head
    assert got[12] == (1, "head") and got[10] == (3, "tail")


def test_perplexity_buckets_approx_scale_path(spark):
    """Default mode: cut points via percentile_approx broadcast — buckets
    are monotone in perplexity, every tier nonempty, no window/sort of
    the corpus in the plan."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        perplexity_buckets,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(90)], "doc_id long, perplexity double"
    )
    out = perplexity_buckets(df, n_buckets=3)
    rows = sorted(out.collect(), key=lambda r: r["perplexity"])
    buckets = [r["ppl_bucket"] for r in rows]
    assert buckets == sorted(buckets)                     # monotone
    assert {1, 2, 3} == set(buckets)                      # all tiers hit
    # roughly equal thirds (exact on this distinct-valued fixture)
    from collections import Counter
    sizes = Counter(buckets)
    assert all(25 <= sizes[b] <= 35 for b in (1, 2, 3)), sizes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan.split("Exchange")[0]


def test_perplexity_buckets_validation(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        perplexity_buckets,
    )

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, perplexity double")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(df, n_buckets=1)


def _near_dup_fixture(spark):
    hist = (
        "this historical boilerplate document is repeated nearly verbatim "
        "across crawls with only one serial token changing near the end of "
        "the body text which makes every copy a near duplicate serial one"
    )
    corpus = spark.createDataFrame(
        [(100, hist),
         (101, "a completely unrelated historical essay on alpine botany and "
               "the seasonal migration of pollinators across high meadows")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, hist.replace("serial one", "serial two")),   # near-dup of 100
         (2, "a genuinely fresh article about maritime navigation techniques "
             "used before the invention of the marine chronometer at sea"),
         (3, "another new piece describing distributed query engines and "
             "their shuffle strategies at terabyte scale with novel ideas")],
        "doc_id long, text string",
    )
    return corpus, batch


def test_near_dedup_against_corpus_text(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        near_dedup_against_corpus,
    )

    corpus, batch = _near_dup_fixture(spark)
    kept = near_dedup_against_corpus(
        batch, corpus, num_perms=32, num_bands=8, rows_per_band=4,
        verify_threshold=0.5,
    )
    assert {r.doc_id for r in kept.collect()} == {2, 3}

    with pytest.raises(ValueError, match="exactly one"):
        near_dedup_against_corpus(batch)
    with pytest.raises(ValueError, match="num_perms"):
        near_dedup_against_corpus(batch, corpus, num_perms=8, num_bands=8,
                                  rows_per_band=4)


def test_near_dedup_against_persisted_store(spark, tmp_path):
    """The production loop: sign history once (minhash_write), then each
    batch dedups against the store and appends its own signatures."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_read,
        minhash_signatures,
        minhash_write,
        near_dedup_against_corpus,
    )

    corpus, batch = _near_dup_fixture(spark)
    store = str(tmp_path / "sig_store")
    sigs = minhash_signatures(corpus, "doc_id", "text", num_perms=32)
    minhash_write(sigs, store, num_perms=32, shingle_n=5)

    loaded, meta = minhash_read(spark, store)
    assert meta["num_perms"] == 32 and meta["shingle_n"] == 5
    kept = near_dedup_against_corpus(
        batch, corpus_sigs=loaded, num_perms=meta["num_perms"],
        shingle_n=meta["shingle_n"], seed=meta["seed"],
        num_bands=8, rows_per_band=4, verify_threshold=0.5,
    )
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids == {2, 3}

    # append the accepted batch; a re-run of the SAME batch now fully dedups
    accepted_sigs = minhash_signatures(
        kept.select("doc_id", "text"), "doc_id", "text", num_perms=32
    )
    minhash_write(accepted_sigs, store, num_perms=32, shingle_n=5, mode="append")
    loaded2, _ = minhash_read(spark, store)
    rerun = near_dedup_against_corpus(
        batch, corpus_sigs=loaded2, num_perms=32, num_bands=8,
        rows_per_band=4, verify_threshold=0.5,
    )
    assert rerun.count() == 0


def test_near_dedup_corpus_never_shuffles(spark):
    """Plan guard for the 100 TB shape: every join in the plan is a
    BroadcastHashJoin — the history side streams against broadcast batch
    structures; no SortMergeJoin / ShuffledHashJoin of the store."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        near_dedup_against_corpus,
    )

    corpus, batch = _near_dup_fixture(spark)
    sigs = minhash_signatures(corpus, "doc_id", "text", num_perms=32)
    out = near_dedup_against_corpus(
        batch, corpus_sigs=sigs, num_perms=32, num_bands=8,
        rows_per_band=4, verify_threshold=0.5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_corpus_report_exact_and_approx(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        corpus_report,
    )

    df = spark.createDataFrame(
        [(1, "en", "alpha beta gamma"), (2, "en", "alpha beta gamma"),
         (3, "en", "delta epsilon"), (4, "de", "zeta eta theta iota")],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in corpus_report(df, group_col="lang").collect()}
    assert rows["en"]["n_docs"] == 3 and rows["en"]["n_distinct"] == 2
    assert abs(rows["en"]["dup_ratio"] - (1 - 2 / 3)) < 1e-6
    assert rows["en"]["total_tokens"] == 8
    assert rows["de"]["n_docs"] == 1 and rows["de"]["dup_ratio"] == 0.0
    total = rows[None]                      # rollup grand-total row
    assert total["n_docs"] == 4 and total["n_distinct"] == 3
    assert total["total_tokens"] == 12

    # approx mode: same counts/sums, cardinality within HLL tolerance
    arows = {r["lang"]: r
             for r in corpus_report(df, group_col="lang", approx=True).collect()}
    assert arows[None]["n_docs"] == 4
    assert abs(arows[None]["n_distinct"] - 3) <= 1
    assert arows[None]["total_tokens"] == 12

    # ungrouped: a single total row
    solo = corpus_report(df).collect()
    assert len(solo) == 1 and solo[0]["n_docs"] == 4


def test_report_cli(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    out = str(tmp_path / "rep.parquet")
    main(["report", "--in", "/root/testdata/sf0.001/documents.parquet",
          "--group-col", "lang", "--out", out])
    printed = capsys.readouterr().out
    assert "n_docs" in printed and "dup_ratio" in printed
    rep = {r["lang"]: r for r in spark.read.parquet(out).collect()}
    assert rep[None]["n_docs"] == 500 and len(rep) == 6


def test_corpus_diff_statuses(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo EDITED"), (4, "delta")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
    # unchanged rows appear only on request
    full = {r.doc_id: r.status for r in
            corpus_diff(old, new, include_unchanged=True).collect()}
    assert full == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_never_shuffles_text(spark):
    """Scale guard: only (id, digest) reaches the full-outer join — the
    text column must be pruned before any Exchange."""
    import io
    import contextlib

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import corpus_diff

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan_df = corpus_diff(docs, docs.withColumn("text", docs.text))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "text" not in line, f"text column shuffled: {line}"


def test_pii_report_counts_and_masking_order(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import pii_report

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.org and c.d+e@f.co.uk, call +1 (555) 010-1234, "
                "server 10.0.0.7 and 192.168.1.1"),
            # the email's all-digit local part must NOT double-count as a
            # phone once the email is masked (scrub's sequential order)
            (2, "reach +12345678901@example.com please"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_report(docs).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips, got[1].n_pii) == (2, 1, 2, 5)
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips, got[2].n_pii) == (1, 0, 0, 1)
    assert got[3].n_pii == 0


def test_pii_report_agrees_with_scrub(spark):
    """n_pii == 0 exactly when scrub_pii leaves the text unchanged."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        pii_report,
        scrub_pii,
    )

    docs = spark.createDataFrame(
        [(1, "clean text only"), (2, "dirty: x@y.zz"), (3, "ip 8.8.8.8 here")],
        "doc_id long, text string",
    )
    rep = pii_report(docs)
    scrubbed = scrub_pii(docs, out_col="clean")
    joined = docs.join(scrubbed.select("doc_id", "clean"), "doc_id").join(rep, "doc_id")
    for r in joined.collect():
        assert (r.n_pii == 0) == (r.text == r.clean), r


def test_cli_diff_and_pii_report(spark, tmp_path, capsys):
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    old = str(tmp_path / "v1.parquet")
    new = str(tmp_path / "v2.parquet")
    spark.createDataFrame(
        [(1, "alpha"), (2, "bravo")], "doc_id long, text string"
    ).write.parquet(old)
    spark.createDataFrame(
        [(1, "alpha"), (2, "bravo EDITED"), (3, "mail x@y.zz now")],
        "doc_id long, text string",
    ).write.parquet(new)

    out = str(tmp_path / "diff.parquet")
    main(["diff", "--old", old, "--new", new, "--out", out])
    printed = capsys.readouterr().out
    assert "added: 1" in printed and "removed: 0" in printed and "changed: 1" in printed
    assert {(r.doc_id, r.status) for r in spark.read.parquet(out).collect()} == \
        {(2, "changed"), (3, "added")}

    main(["pii-report", "--in", new])
    printed = capsys.readouterr().out
    assert "emails: 1" in printed and "docs affected: 1/3" in printed


def test_corpus_diff_set_algebra_property(spark):
    """Property: for random version pairs, corpus_diff statuses must equal
    the set-algebra ground truth computed driver-side."""
    import random

    rng = random.Random(1234)
    for trial in range(3):
        ids = list(range(30))
        old_rows = [(i, f"text {i} body {rng.randint(0, 3)}") for i in ids
                    if rng.random() < 0.8]
        old_map = dict(old_rows)
        new_rows = []
        for i in ids:
            if rng.random() < 0.8:
                if i in old_map and rng.random() < 0.5:
                    new_rows.append((i, old_map[i]))          # unchanged
                else:
                    new_rows.append((i, f"text {i} v2 {trial}"))
        new_map = dict(new_rows)
        expected = {}
        for i in set(old_map) | set(new_map):
            if i not in old_map:
                expected[i] = "added"
            elif i not in new_map:
                expected[i] = "removed"
            elif old_map[i] != new_map[i]:
                expected[i] = "changed"
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import corpus_diff

        old = spark.createDataFrame(old_rows or [(999, "x")], "doc_id long, text string")
        new = spark.createDataFrame(new_rows or [(999, "x")], "doc_id long, text string")
        if not old_rows or not new_rows:
            continue
        got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
        assert got == expected, f"trial {trial}"


def test_embedding_drift_identity_and_shift(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        embedding_drift,
    )

    base = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    # identical versions: centroid cosine exactly 1, norms equal
    same = embedding_drift(base, base).collect()[0]
    assert same.n_old == same.n_new == 30
    assert same.centroid_cos == 1.0
    assert same.avg_norm_old == same.avg_norm_new
    # scaled + shifted version: norms move, centroid direction differs
    from pyspark.sql import functions as F
    shifted = base.select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(2.0) + F.lit(1.0)).alias("embedding"),
    )
    drift = embedding_drift(base, shifted).collect()[0]
    assert drift.avg_norm_new > drift.avg_norm_old
    assert drift.centroid_cos < 1.0


def test_keep_canonical_by_best_scorer_survives(spark):
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        keep_canonical,
        keep_canonical_by,
    )

    docs = spark.createDataFrame(
        [(1, "short", 5), (2, "a much longer variant", 21),
         (3, "mid variant", 11), (9, "unclustered", 11)],
        "doc_id long, text string, n_chars int",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    best = {r.doc_id for r in keep_canonical_by(docs, clusters, "n_chars").collect()}
    assert best == {2, 9}            # longest member wins, unclustered passes
    minid = {r.doc_id for r in keep_canonical(docs, clusters).collect()}
    assert minid == {1, 9}           # the classic rule keeps the min id
    # tie: equal scores fall back to min id
    tied = spark.createDataFrame(
        [(4, "aaaa", 4), (5, "bbbb", 4)], "doc_id long, text string, n_chars int"
    )
    tclust = spark.createDataFrame([(4, 4), (5, 4)], "doc_id long, cluster_id long")
    assert {r.doc_id for r in keep_canonical_by(tied, tclust, "n_chars").collect()} == {4}


def test_compression_stats_pins_zlib_and_separates_repetition(spark):
    import zlib

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        compression_stats,
    )

    prose = ("the migration of alpine pollinators follows snowmelt up the "
             "valley sides each spring with remarkable annual consistency")
    junk = "buy now " * 40
    docs = spark.createDataFrame(
        [(1, prose), (2, junk), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_stats(docs).collect()}
    # exact parity with direct zlib of the same bytes
    for i, txt in ((1, prose), (2, junk)):
        b = txt.encode()
        assert got[i].raw_bytes == len(b)
        assert got[i].zlib_bytes == len(zlib.compress(b, 6))
        assert got[i].compression_ratio == round(len(zlib.compress(b, 6)) / len(b), 6)
    # the signal: repetitive junk compresses far below prose
    assert got[2].compression_ratio < 0.15 < 0.4 < got[1].compression_ratio
    # empty / NULL text: defined, no crash
    assert got[3].compression_ratio == 0.0 and got[4].compression_ratio == 0.0


def test_compression_stats_string_id_col(spark):
    """the output schema derives the id field's type from the input (r10
    ADVICE fix): string / int32 ids via curate --id-col must round-trip
    Arrow instead of failing on a hardcoded `long`."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        compression_stats,
    )

    docs = spark.createDataFrame(
        [("u-1", "some ordinary text " * 5), ("u-2", "x" * 40)],
        "uid string, text string",
    )
    got = {r.uid: r for r in compression_stats(docs, id_col="uid").collect()}
    assert set(got) == {"u-1", "u-2"}
    assert got["u-2"].compression_ratio < got["u-1"].compression_ratio
    ints = spark.createDataFrame([(7, "hello world " * 4)], "k int, text string")
    row = compression_stats(ints, id_col="k").collect()[0]
    assert row.k == 7 and row.raw_bytes == 48


def test_semantic_contamination_planted_paraphrase(spark):
    """Planted paraphrase-by-embedding: a corpus doc whose vector is a
    small perturbation of an eval doc's (a reworded benchmark question —
    no shared n-grams, near-identical embedding) must be flagged with
    that eval doc as best match; unrelated docs must not.  The IVF probe
    path must find the same planted hit (same cluster by construction),
    and its hit set is always a subset of exact mode's."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        semantic_contamination,
    )

    def unit(seed, dim=8):
        # deterministic pseudo-random unit vector per seed
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    ev_vec = unit(1)
    paraphrase = [x + (0.01 if i == 0 else -0.01) for i, x in enumerate(ev_vec)]
    corpus = spark.createDataFrame(
        [(100, paraphrase)] + [(200 + s, unit(s)) for s in range(2, 8)],
        "doc_id long, embedding array<double>",
    )
    eval_df = spark.createDataFrame(
        [(1, ev_vec)], "doc_id long, embedding array<double>"
    )
    exact = semantic_contamination(
        corpus, eval_df, threshold=0.95, round_to=6
    ).collect()
    assert [(r.doc_id, r.eval_id) for r in exact] == [(100, 1)]
    assert exact[0].cosine > 0.99
    # none of the unrelated vectors leak in at a loose threshold either
    loose = semantic_contamination(corpus, eval_df, threshold=0.9, round_to=6)
    assert {r.doc_id for r in loose.collect()} == {100}

    ivf = semantic_contamination(
        corpus, eval_df, threshold=0.95, mode="ivf",
        num_clusters=2, n_iters=1, nprobe=1, dim=8, round_to=6,
    ).collect()
    assert [(r.doc_id, r.eval_id) for r in ivf] == [(100, 1)]


def test_semantic_contamination_best_match_tiebreak(spark):
    """Max cosine wins; at equal (rounded) cosine the smallest eval id
    wins — the fuzzy_contamination report contract."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        semantic_contamination,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    corpus = spark.createDataFrame([(9, v)], "doc_id long, embedding array<double>")
    eval_df = spark.createDataFrame(
        [(5, v), (3, v), (7, [0.9, 0.1, 0.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    got = semantic_contamination(corpus, eval_df, threshold=0.5, round_to=6).collect()
    assert [(r.doc_id, r.eval_id, r.cosine) for r in got] == [(9, 3, 1.0)]


def test_semantic_contamination_string_ids(spark, tmp_path):
    """String doc/eval ids must work end-to-end (r11, ADVICE): the old
    struct-max tie-break negated the eval id (numeric-only) and crashed
    with CAST_INVALID_INPUT on string ids; the row_number ranking holds
    the same contract — max cosine, ties to the smallest (lexicographic)
    eval id — for any orderable id type.  Covers exact mode, IVF mode,
    and the persisted-index variant."""
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_contamination,
        semantic_contamination_indexed,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    corpus = spark.createDataFrame(
        [("doc-a", v), ("doc-b", [0.0, 1.0, 0.0, 0.0])],
        "doc_id string, embedding array<double>",
    )
    eval_df = spark.createDataFrame(
        [("ev-z", v), ("ev-b", v), ("ev-q", [0.9, 0.1, 0.0, 0.0])],
        "doc_id string, embedding array<double>",
    )
    got = semantic_contamination(
        corpus, eval_df, threshold=0.5, round_to=6
    ).collect()
    assert [(r.doc_id, r.eval_id, r.cosine) for r in got] == [("doc-a", "ev-b", 1.0)]

    ivf = semantic_contamination(
        corpus, eval_df, threshold=0.5, mode="ivf",
        num_clusters=2, n_iters=1, nprobe=2, dim=4, round_to=6,
    ).collect()
    assert [(r.doc_id, r.eval_id, r.cosine) for r in ivf] == [("doc-a", "ev-b", 1.0)]

    idx = str(tmp_path / "ivf_str")
    ivf_index_write(corpus, idx, id_col="doc_id", dim=4, num_clusters=2, n_iters=1)
    indexed = semantic_contamination_indexed(
        spark, idx, eval_df, threshold=0.5, nprobe=2, id_col="doc_id", round_to=6
    ).collect()
    assert [(r.doc_id, r.eval_id, r.cosine)
            for r in indexed] == [("doc-a", "ev-b", 1.0)]


def test_semantic_contamination_indexed_matches_exact_at_full_probe(spark, tmp_path):
    """Persisted-index contamination (r10): at nprobe == num_clusters the
    probe set covers the whole index, so the result equals exact mode;
    at nprobe=1 the hit set is a subset (the multi-probe trade)."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_contamination,
        semantic_contamination_indexed,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    corpus = spark.createDataFrame(
        [(100 + s, unit(s)) for s in range(24)],
        "vec_id long, embedding array<double>",
    )
    eval_df = spark.createDataFrame(
        [(1, unit(3)), (2, unit(17))], "vec_id long, embedding array<double>"
    )
    idx = str(tmp_path / "ivf")
    ivf_index_write(corpus, idx, dim=8, num_clusters=4, n_iters=2)

    exact = semantic_contamination(
        corpus, eval_df, id_col="vec_id", threshold=0.9, round_to=6
    )
    exact_set = {(r.vec_id, r.eval_id, r.cosine) for r in exact.collect()}
    assert exact_set  # the planted identical vectors hit

    full = semantic_contamination_indexed(
        spark, idx, eval_df, threshold=0.9, nprobe=4, id_col="vec_id", round_to=6
    )
    assert {(r.vec_id, r.eval_id, r.cosine) for r in full.collect()} == exact_set

    narrow = semantic_contamination_indexed(
        spark, idx, eval_df, threshold=0.9, nprobe=1, id_col="vec_id", round_to=6
    )
    assert {(r.vec_id, r.eval_id, r.cosine)
            for r in narrow.collect()} <= exact_set

    # r15: the probe-side join is measured-size-gated like
    # semantic_dedup_against — a forced-tiny cap flips to SHUFFLE_HASH
    # with the identical result set
    gated = semantic_contamination_indexed(
        spark, idx, eval_df, threshold=0.9, nprobe=4, id_col="vec_id",
        round_to=6, broadcast_max_bytes=1)
    assert "ShuffledHashJoin" in (
        gated._jdf.queryExecution().executedPlan().toString())
    assert {(r.vec_id, r.eval_id, r.cosine) for r in gated.collect()} == exact_set


def test_semantic_dedup_against_matches_brute_force_at_full_probe(spark, tmp_path):
    """Vs-history embedding near-dup (r14): at nprobe == num_clusters the
    persisted-index probe equals the brute-force batch × history sweep —
    one row per flagged BATCH doc with its best history match (max
    cosine, ties to the smallest history id); at nprobe=1 a subset; the
    report keys on the batch id (unlike contamination, which keys on the
    indexed corpus)."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_dedup_against,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    hist_rows = [(100 + s, unit(s)) for s in range(24)]
    batch_rows = [(1, unit(3)), (2, unit(17)), (3, unit(99))]
    history = spark.createDataFrame(
        hist_rows, "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "hist_ivf")
    ivf_index_write(history, idx, dim=8, num_clusters=4, n_iters=2)

    def brute(threshold):
        out = {}
        for bid, bv in batch_rows:
            best = None
            for hid, hv in hist_rows:
                c = round(sum(x * y for x, y in zip(bv, hv)), 6)
                if c >= threshold and (best is None or (-c, hid) < best):
                    best = (-c, hid)
            if best is not None:
                out[bid] = (best[1], -best[0])
        return {(b, h, c) for b, (h, c) in out.items()}

    want = brute(0.9)
    assert want  # planted identical vectors hit
    full = semantic_dedup_against(
        spark, idx, batch, threshold=0.9, nprobe=4, round_to=6)
    assert {(r.vec_id, r.history_id, r.cosine) for r in full.collect()} == want
    # one row per flagged batch doc, keyed on the batch id
    assert full.count() == len({b for b, _, _ in want})
    narrow = semantic_dedup_against(
        spark, idx, batch, threshold=0.9, nprobe=1, round_to=6)
    assert {(r.vec_id, r.history_id, r.cosine)
            for r in narrow.collect()} <= want


def test_semantic_dedup_against_broadcast_gate(spark, tmp_path):
    """r15 (VERDICT r14 item 1): the batch-side join is broadcast only
    when the measured exploded probe payload fits broadcast_max_bytes;
    a forced-tiny cap flips the plan to SHUFFLE_HASH with an IDENTICAL
    kept set — no driver-memory cliff on a large daily batch."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_dedup_against,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    history = spark.createDataFrame(
        [(100 + s, unit(s)) for s in range(24)],
        "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        [(i, unit(i % 24)) for i in range(1, 13)],
        "vec_id long, embedding array<double>")
    idx = str(tmp_path / "hist_ivf")
    ivf_index_write(history, idx, dim=8, num_clusters=4, n_iters=2)

    big = semantic_dedup_against(
        spark, idx, batch, threshold=0.9, nprobe=4, round_to=6)
    small = semantic_dedup_against(
        spark, idx, batch, threshold=0.9, nprobe=4, round_to=6,
        broadcast_max_bytes=1)  # 12 probe rows × (64+64) B >> 1 B
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in big_plan
    assert "ShuffledHashJoin" in small_plan
    assert "BroadcastHashJoin" not in small_plan.split("ShuffledHashJoin")[0]
    assert ({tuple(r) for r in big.collect()}
            == {tuple(r) for r in small.collect()})
    assert big.count() == 12  # every batch doc has an exact history twin


def test_chunk_cli(spark, tmp_path, capsys):
    """chunk subcommand (r11): curated docs -> chunk rows parquet."""
    from dbc_informed_socketcan_to_parquet_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "chunks.parquet")
    main(["chunk", "--in", src, "--out", out,
          "--chunk-tokens", "4", "--overlap-tokens", "1"])
    assert "chunked 1 documents -> 3 chunks" in capsys.readouterr().out
    rows = sorted((r.chunk_idx, r.text) for r in spark.read.parquet(out).collect())
    assert rows == [(0, "t0 t1 t2 t3"), (1, "t3 t4 t5 t6"), (2, "t6 t7 t8 t9")]


def test_ivf_cluster_stats_flags_planted_skew(spark):
    """ivf_cluster_stats (r11): a corpus where most vectors sit in one
    tight ball (one hot cluster) reports imbalance >> 1 there; the frac
    column sums to 1 over the emitted (non-empty) clusters."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_cluster_stats,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    hot = unit(1)
    rows = [(i, [x + 0.001 * (i % 7) for x in hot]) for i in range(30)]
    rows += [(100 + s, unit(s)) for s in range(2, 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = ivf_cluster_stats(emb, dim=8, num_clusters=4, n_iters=2).collect()
    assert sum(r.n_vecs for r in got) == 36
    assert abs(sum(r.frac for r in got) - 1.0) < 1e-6
    top = max(got, key=lambda r: r.n_vecs)
    assert top.n_vecs >= 30 and top.imbalance >= 3.0  # 30/36 * 4 = 3.33


def test_ivf_index_rebuild_advice_and_probe_cost(spark, tmp_path):
    """Index growth health (r15, VERDICT r14 item 4): appends assign with
    STORED centroids and never retrain, so a corpus that drifts into one
    region piles into one cluster.  ivf_index_health reads ONLY the
    partition column; ivf_index_rebuild_advice flags the skew-grown
    index; ivf_index_rebuild retrains into a NEW path and the probe
    cost (candidate rows in the hot query's nprobe=1 cluster) drops."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_health,
        ivf_index_rebuild,
        ivf_index_rebuild_advice,
        ivf_index_write,
    )
    from pyspark.sql import functions as F

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def cone(base, seed, spread=0.45):
        noise = unit(seed)
        v = [b + spread * x for b, x in zip(base, noise)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = unit(3)
    initial = spark.createDataFrame(
        [(s, unit(s)) for s in range(24)],
        "vec_id long, embedding array<double>")
    idx = str(tmp_path / "idx_v1")
    ivf_index_write(initial, idx, dim=8, num_clusters=8, n_iters=2)
    # daily appends drift into a wide cone around one history vector
    appended = spark.createDataFrame(
        [(100 + i, cone(base, 50 + i)) for i in range(72)],
        "vec_id long, embedding array<double>")
    ivf_index_append(spark, idx, appended)

    health = {r.cluster: r for r in ivf_index_health(spark, idx).collect()}
    assert sum(r.n_vecs for r in health.values()) == 96
    old_hot = max(health.values(), key=lambda r: r.n_vecs)
    adv = ivf_index_rebuild_advice(spark, idx, imbalance_threshold=2.0)
    # the model stores only OCCUPIED sign-LSH buckets, so k <= requested
    assert adv["rebuild"] and adv["n_vecs"] == 96 and 2 <= adv["k"] <= 8
    assert adv["max_imbalance"] == old_hot.imbalance >= 2.0
    assert adv["hot_cluster"] == old_hot.cluster
    assert adv["recommended_k"] >= adv["k"]

    # retrain over the accumulated data into a NEW path (publish-by-swap)
    idx2 = str(tmp_path / "idx_v2")
    ivf_index_rebuild(spark, idx, idx2, num_clusters=8, n_iters=2)
    h2 = ivf_index_health(spark, idx2).collect()
    assert sum(r.n_vecs for r in h2) == 96  # nothing lost in the rebuild
    new_max_imb = max(r.imbalance for r in h2)
    assert new_max_imb < old_hot.imbalance  # quantizer re-fit the drift

    # probe cost for a query INSIDE the drifted region: candidates in
    # its nearest cluster shrink after the rebuild
    def probe_candidates(path, q):
        model = spark.read.parquet(f"{path}/model").collect()
        best = min(model, key=lambda r: sum(
            (a - b) ** 2 for a, b in zip(r["center"], q)))
        return (spark.read.parquet(f"{path}/data")
                .filter(F.col("ivf_cluster") == best["ivf_cluster"]).count())

    q = cone(base, 999)
    before, after = probe_candidates(idx, q), probe_candidates(idx2, q)
    assert before == old_hot.n_vecs  # the query lands in the hot cluster
    assert after < before, (before, after)


def test_ivfpq_persisted_index_matches_inline_and_prunes(spark, tmp_path):
    """The persisted IVF-PQ index (codes + true norms, no floats) must
    (a) return exactly what the inline ivfpq_ann_topk returns for the
    same knobs — shared deterministic training and shared ADC kernels —
    (b) store NO vector column (the 32x claim is real, not alongside the
    floats), and (c) prune the probed scan at file listing like the
    raw-vector index."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivfpq_ann_topk,
        ivfpq_index_topk,
        ivfpq_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    path = str(tmp_path / "ivfpq_index")
    kw = dict(num_clusters=8, num_subspaces=8, bits=6, n_iters=2, pq_iters=3)
    centers = ivfpq_index_write(emb, path, dim=64, **kw)
    assert len(centers) <= 8

    # storage claim: codes + norm only, never the float vectors
    data_cols = set(spark.read.parquet(f"{path}/data").columns)
    assert data_cols == {"vec_id", "codes", "vec_norm", "ivf_cluster"}

    inline = sorted(map(tuple, ivfpq_ann_topk(
        emb, q, dim=64, k=10, nprobe=4, **kw).collect()))
    via_index = sorted(map(tuple, ivfpq_index_topk(
        spark, path, q, k=10, nprobe=4).collect()))
    assert len(via_index) == 30  # 3 queries x k=10
    assert [(a, b, d) for a, b, _, d in inline] == [
        (a, b, d) for a, b, _, d in via_index] or inline == via_index

    some = sorted(centers)[:2]
    probed = spark.read.parquet(f"{path}/data").filter(
        F.col("ivf_cluster").isin(some))
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = probed._jdf.queryExecution().explainString(mode)
    part_section = plan.split("PartitionFilters", 1)
    assert len(part_section) == 2, plan
    assert "ivf_cluster" in part_section[1][:200], plan


def test_ivfpq_index_serves_vs_history_gates(spark, tmp_path):
    """The vs-history gates accept a codes-only IVF-PQ index
    transparently: semantic_dedup_against flags a planted duplicate of
    history and not a distinct vector, its approximate cosine sits
    within PQ tolerance of exact, and semantic_contamination_indexed
    works through the same reconstruction path.  Also pins the
    layout-dispatch seams: ivf_index_append delegates PQ appends (codes
    grow, no floats), health/advice run on the codes layout, and
    rebuild refuses it with guidance."""
    import math

    import pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_health,
        ivf_index_rebuild,
        ivf_index_rebuild_advice,
        ivfpq_index_write,
        semantic_contamination_indexed,
        semantic_dedup_against,
    )

    def unit(seed, dim=16):
        # hash-style family: full-rank, max pairwise cosine ~0.80 — the
        # sin(a + d*b) family is rank-2 (everything near-duplicates
        # everything), useless for a threshold gate test
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    hist = spark.createDataFrame(
        [(s, unit(s)) for s in range(128)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "pq_hist")
    # bits=6 -> 64 codewords per 2-dim subspace at d=16: reconstruction
    # error tiny enough for the tolerance pin (needs >= 64 training rows)
    ivfpq_index_write(hist, path, dim=16, num_clusters=4,
                      num_subspaces=8, bits=6, pq_iters=4)

    batch = spark.createDataFrame(
        [(900, unit(7)), (901, unit(5000))],
        "vec_id long, embedding array<double>")
    hits = {r["vec_id"]: r for r in semantic_dedup_against(
        spark, path, batch, threshold=0.9, nprobe=4).collect()}
    assert set(hits) == {900}
    assert hits[900]["history_id"] == 7
    # approximate cosine of an exact duplicate: within PQ tolerance of 1
    assert hits[900]["cosine"] == pytest.approx(1.0, abs=0.05)

    evals = spark.createDataFrame(
        [(1, unit(11))], "eval_id long, embedding array<double>")
    cont = semantic_contamination_indexed(
        spark, path, evals, threshold=0.9, nprobe=4,
        eval_id_col="eval_id").collect()
    assert [r["vec_id"] for r in cont] == [11]

    # append through the GENERIC entry point delegates to the PQ encoder
    extra = spark.createDataFrame(
        [(800, unit(41))], "vec_id long, embedding array<double>")
    ivf_index_append(spark, path, extra)
    data = spark.read.parquet(f"{path}/data")
    assert data.count() == 129 and "embedding" not in data.columns
    # the appended vector is immediately visible to the gate
    rehit = semantic_dedup_against(
        spark, path,
        spark.createDataFrame([(902, unit(41))],
                              "vec_id long, embedding array<double>"),
        threshold=0.9, nprobe=4).collect()
    # unit(41) matches both history 41 and the appended 800; ties go to
    # the smallest history id, but PQ reconstruction error can break the
    # exact tie either way — both are correct detections
    assert len(rehit) == 1 and rehit[0]["history_id"] in (41, 800)

    # health + advice read only model/partition column: layout-agnostic
    h = ivf_index_health(spark, path).collect()
    assert sum(r.n_vecs for r in h) == 129
    adv = ivf_index_rebuild_advice(spark, path)
    assert adv["n_vecs"] == 129

    # rebuild cannot run from codes alone — refused with guidance
    with pytest.raises(ValueError, match="SOURCE embeddings"):
        ivf_index_rebuild(spark, path, str(tmp_path / "pq_v2"))


def test_ivfpq_reconstruction_report_calibrates_thresholds(spark, tmp_path):
    """The calibration report scores sampled source vectors against
    their own codes exactly as the gates score an exact duplicate, so
    p05 is a usable threshold ceiling; a raw-vector index is refused
    (exact dups score 1.0 there — nothing to calibrate)."""
    import math

    import pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        ivfpq_index_write,
        ivfpq_reconstruction_report,
        semantic_dedup_against,
    )

    def unit(seed, dim=16):
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = spark.createDataFrame(
        [(s, unit(s)) for s in range(128)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "pq_cal")
    ivfpq_index_write(vecs, path, dim=16, num_clusters=4,
                      num_subspaces=8, bits=6, pq_iters=4)
    rep = ivfpq_reconstruction_report(spark, path, vecs)
    assert rep["n"] == 128
    assert 0.0 < rep["min"] <= rep["p05"] <= rep["avg"] <= 1.0 + 1e-9

    # the pin that makes the report trustworthy: an exact duplicate of an
    # indexed vector scores >= the reported min through the actual gate
    probe = spark.createDataFrame(
        [(900, unit(5))], "vec_id long, embedding array<double>")
    hit = semantic_dedup_against(
        spark, path, probe, threshold=rep["min"] - 1e-9, nprobe=4).collect()
    assert [r["history_id"] for r in hit] == [5]
    assert hit[0]["cosine"] >= rep["min"] - 1e-9

    raw = str(tmp_path / "raw_cal")
    ivf_index_write(vecs, raw, dim=16, num_clusters=4)
    with pytest.raises(ValueError, match="no calibration needed"):
        ivfpq_reconstruction_report(spark, raw, vecs)


def test_sq8_persisted_index_near_lossless_roundtrip(spark, tmp_path):
    """SQ8 layout (r15): one uint8 per dimension with a per-vector range
    — 8x smaller than float64 and near-lossless, the middle option
    between raw and PQ.  Pins: codes-only schema on disk, reconstruction
    self-cosine >= 0.999 (so gates need NO threshold recalibration),
    ivf_index_topk serves the layout with ~exact cosines, the gates
    detect planted dups, the generic append delegates, and — unlike PQ —
    ivf_index_rebuild RETRAINS from the index's own reconstruction."""
    import math

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_health,
        ivf_index_rebuild,
        ivf_index_topk,
        ivfpq_reconstruction_report,
        semantic_dedup_against,
        sq8_index_write,
    )

    def unit(seed, dim=16):
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = spark.createDataFrame(
        [(s, unit(s)) for s in range(128)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "sq_idx")
    centers = sq8_index_write(vecs, path, dim=16, num_clusters=4)
    assert len(centers) <= 4

    data = spark.read.parquet(f"{path}/data")
    assert set(data.columns) == {"vec_id", "codes", "sq_lo", "sq_hi",
                                 "vec_norm", "ivf_cluster"}

    rep = ivfpq_reconstruction_report(spark, path, vecs)
    # d=16 is SQ8's worst case (per-dim half-step vs 1/sqrt(16) unit
    # components) — production d=768 is ~7x tighter
    assert rep["n"] == 128 and rep["min"] >= 0.995

    # topk through the layout: the planted query's top hit is itself at
    # cosine ~1 (rounded to 4 places to absorb the half-step error)
    q = spark.createDataFrame([(0, unit(9))],
                              "query_id long, embedding array<double>")
    tk = ivf_index_topk(spark, path, q, k=3, nprobe=4, round_to=4).collect()
    assert tk[0]["vec_id"] == 9 and tk[0]["cosine"] >= 0.995

    # vs-history gate at an UNCHANGED threshold (no recalibration)
    batch = spark.createDataFrame(
        [(900, unit(7)), (901, unit(5000))],
        "vec_id long, embedding array<double>")
    hits = semantic_dedup_against(
        spark, path, batch, threshold=0.95, nprobe=4).collect()
    assert [(r["vec_id"], r["history_id"]) for r in hits] == [(900, 7)]

    # contamination sweep through the same reconstruction path
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        semantic_contamination_indexed,
    )
    evals = spark.createDataFrame(
        [(1, unit(11))], "eval_id long, embedding array<double>")
    cont = semantic_contamination_indexed(
        spark, path, evals, threshold=0.95, nprobe=4,
        eval_id_col="eval_id").collect()
    assert [r["vec_id"] for r in cont] == [11]

    # generic append delegates to the SQ8 encoder
    ivf_index_append(spark, path, spark.createDataFrame(
        [(800, unit(41))], "vec_id long, embedding array<double>"))
    d2 = spark.read.parquet(f"{path}/data")
    assert d2.count() == 129 and "embedding" not in d2.columns

    # rebuild RETRAINS from the index's own reconstruction (PQ refuses)
    path2 = str(tmp_path / "sq_idx_v2")
    ivf_index_rebuild(spark, path, path2, num_clusters=8)
    h2 = ivf_index_health(spark, path2).collect()
    assert sum(r.n_vecs for r in h2) == 129
    rep2 = ivfpq_reconstruction_report(spark, path2, vecs)
    assert rep2["min"] >= 0.995  # error does not compound past the pin
    rehit = semantic_dedup_against(
        spark, path2, batch, threshold=0.95, nprobe=8).collect()
    assert [(r["vec_id"], r["history_id"]) for r in rehit] == [(900, 7)]


def test_ivf_index_rebuild_layout_migration(spark, tmp_path):
    """ivf_index_rebuild layout migration (r15): a raw index's floats
    compress in the same pass that refits the quantizer (raw→sq8,
    raw→pq), and a near-lossless SQ8 index can migrate on to PQ —
    the shrink-my-history path without re-reading source embeddings.
    Each migrated index still serves the vs-history gate."""
    import math

    import pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_rebuild,
        ivf_index_write,
        semantic_dedup_against,
    )

    def unit(seed, dim=16):
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = spark.createDataFrame(
        [(s, unit(s)) for s in range(128)],
        "vec_id long, embedding array<double>")
    raw = str(tmp_path / "raw_idx")
    ivf_index_write(vecs, raw, dim=16, num_clusters=4)
    batch = spark.createDataFrame(
        [(900, unit(7)), (901, unit(5000))],
        "vec_id long, embedding array<double>")

    def gate_hits(path, thr):
        return sorted((r["vec_id"], r["history_id"]) for r in
                      semantic_dedup_against(
                          spark, path, batch, threshold=thr, nprobe=4
                      ).collect())

    # raw -> sq8: unchanged threshold
    sq = str(tmp_path / "mig_sq")
    ivf_index_rebuild(spark, raw, sq, num_clusters=4, layout="sq8")
    assert set(spark.read.parquet(f"{sq}/data").columns) == {
        "vec_id", "codes", "sq_lo", "sq_hi", "vec_norm", "ivf_cluster"}
    assert gate_hits(sq, 0.95) == [(900, 7)]

    # raw -> pq: codes-only, calibrated threshold
    pq = str(tmp_path / "mig_pq")
    ivf_index_rebuild(spark, raw, pq, num_clusters=4,
                      layout="pq", pq=(8, 6))
    assert "pq_model" not in spark.read.parquet(f"{pq}/data").columns
    assert gate_hits(pq, 0.6) == [(900, 7)]

    # sq8 -> pq: migration chains through the near-lossless layout
    pq2 = str(tmp_path / "mig_pq2")
    ivf_index_rebuild(spark, sq, pq2, num_clusters=4,
                      layout="pq", pq=(8, 6))
    assert gate_hits(pq2, 0.6) == [(900, 7)]

    # config guards
    with pytest.raises(ValueError, match="needs pq="):
        ivf_index_rebuild(spark, raw, str(tmp_path / "x"), layout="pq")
    with pytest.raises(ValueError, match="layout must be"):
        ivf_index_rebuild(spark, raw, str(tmp_path / "x"), layout="opq")


def test_ivf_index_compact_defragments_appends(spark, tmp_path):
    """Index compaction (r15): daily appends land >= 1 file per touched
    cluster per day, so files grow as days x clusters while rows grow
    slowly — compaction rewrites partitions to ~1 file each with NO
    retrain (assignments preserved) and the gate answer is identical.
    Works for coded layouts too (markers copied): pinned on SQ8."""
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_compact,
        ivf_index_file_stats,
        ivf_index_topk,
        semantic_dedup_against,
        sq8_index_write,
    )

    def unit(seed, dim=16):
        v = [math.sin(seed * 12.9898 + d * 78.233) * 43758.5453 % 2.0 - 1.0
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    path = str(tmp_path / "frag_idx")
    sq8_index_write(
        spark.createDataFrame([(s, unit(s)) for s in range(64)],
                              "vec_id long, embedding array<double>"),
        path, dim=16, num_clusters=4)
    # five daily appends fragment the partitions
    for day in range(5):
        ivf_index_append(spark, path, spark.createDataFrame(
            [(1000 + 10 * day + i, unit(200 + 10 * day + i))
             for i in range(10)],
            "vec_id long, embedding array<double>"))

    before = {r.cluster: r.n_files
              for r in ivf_index_file_stats(spark, path).collect()}
    assert sum(before.values()) > len(before)  # genuinely fragmented

    out = str(tmp_path / "compact_idx")
    ivf_index_compact(spark, path, out)
    after = {r.cluster: r.n_files
             for r in ivf_index_file_stats(spark, out).collect()}
    assert set(after) == set(before)
    assert all(n == 1 for n in after.values()), after
    assert spark.read.parquet(f"{out}/data").count() == 114

    # identical service: same gate hits, same topk, layout marker intact
    batch = spark.createDataFrame(
        [(900, unit(7)), (901, unit(5000))],
        "vec_id long, embedding array<double>")
    def hits(p):
        return sorted((r["vec_id"], r["history_id"]) for r in
                      semantic_dedup_against(spark, p, batch,
                                             threshold=0.95, nprobe=4
                                             ).collect())
    assert hits(out) == hits(path) == [(900, 7)]
    q = spark.createDataFrame([(0, unit(230))],
                              "query_id long, embedding array<double>")
    tk = lambda p: [(r.query_id, r.vec_id, r.rank) for r in
                    ivf_index_topk(spark, p, q, k=3, nprobe=4).collect()]
    assert tk(out) == tk(path)


def test_resolve_index_path_versioned_root(spark, tmp_path):
    """Every persisted-index READER resolves an auto-rebuild VERSIONED
    ROOT (r15 follow-through): ``plans.recipe`` publishes rebuilds as
    ``{root}/vNNNN`` dirs behind a ``CURRENT.json`` pointer, so CLI
    ``index-embeddings --stats/--append``, ``ivf_index_topk``, and the
    vs-history gates must all accept the root itself — not just the
    resolved version dir — or a recipe-managed index would be unusable
    outside the recipe.  Pins: plain paths resolve to themselves, the
    root serves identical results to its CURRENT version, and appends
    through the root land in the SERVING version."""
    import json
    import math

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_health,
        ivf_index_topk,
        resolve_index_path,
        semantic_dedup_against,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 37.0 + d * 13.0) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    root = tmp_path / "idx_root"
    v1 = root / "v0001"
    hist = spark.createDataFrame(
        [(s, unit(s)) for s in range(32)],
        "vec_id long, embedding array<double>")
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import ivf_index_write
    ivf_index_write(hist, str(v1), dim=8, num_clusters=4, n_iters=2)

    # plain path (no CURRENT.json) resolves to itself
    assert resolve_index_path(str(v1)) == str(v1)
    # versioned root resolves through the pointer
    (root / "CURRENT.json").write_text(
        json.dumps({"version": "v0001", "requested_k": 4}))
    assert resolve_index_path(str(root)) == str(root / "v0001")

    # health / topk / vs-history gate through the ROOT == through v0001
    h_root = sorted((r.cluster, r.n_vecs)
                    for r in ivf_index_health(spark, str(root)).collect())
    h_dir = sorted((r.cluster, r.n_vecs)
                   for r in ivf_index_health(spark, str(v1)).collect())
    assert h_root == h_dir and sum(n for _, n in h_root) == 32

    q = spark.createDataFrame([(0, unit(5))],
                              "query_id long, embedding array<double>")
    tk_root = [(r.query_id, r.vec_id, r.rank) for r in
               ivf_index_topk(spark, str(root), q, k=3, nprobe=2).collect()]
    tk_dir = [(r.query_id, r.vec_id, r.rank) for r in
              ivf_index_topk(spark, str(v1), q, k=3, nprobe=2).collect()]
    assert tk_root == tk_dir and len(tk_root) == 3

    batch = spark.createDataFrame(
        [(900, unit(7)), (901, unit(1000))],
        "vec_id long, embedding array<double>")
    dd = semantic_dedup_against(spark, str(root), batch,
                                threshold=0.999, nprobe=4)
    assert {r.vec_id for r in dd.collect()} == {900}  # unit(7) == history 7

    # append through the root lands in the serving version
    extra = spark.createDataFrame([(800, unit(41))],
                                  "vec_id long, embedding array<double>")
    ivf_index_append(spark, str(root), extra)
    n_v1 = spark.read.parquet(str(v1 / "data")).count()
    assert n_v1 == 33


def test_vocab_coverage_semantics(spark):
    """Coverage arithmetic on a hand-checkable fixture: top-2 vocabulary
    {a, b} (count ties broken lexicographically), per-language token and
    distinct-coverage counts."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import vocab_coverage

    rows = [
        (1, "en", "a a b c"),    # en: 4 toks, a/a/b covered -> 3
        (2, "en", "a b"),        # en: +2, both covered
        (3, "de", "c c b"),      # de: 3 toks, b covered -> 1
        (4, None, "a x"),        # NULL lang -> 'unknown'; a covered
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # counts: a=4, b=3, c=3 -> top2 = {a, b} (b beats c lexicographically)
    out = {r.lang: r for r in vocab_coverage(df, top_k=2).collect()}
    assert set(out) == {"en", "de", "unknown"}
    en = out["en"]
    assert (en.n_tokens, en.n_covered) == (6, 5)
    assert en.oov_rate == round(1 - 5 / 6, 6)
    assert (en.n_distinct, en.n_distinct_covered) == (3, 2)
    de = out["de"]
    assert (de.n_tokens, de.n_covered, de.n_distinct, de.n_distinct_covered) == (3, 1, 2, 1)
    unk = out["unknown"]
    assert (unk.n_tokens, unk.n_covered) == (2, 1)


def test_vocab_coverage_plan(spark):
    """Top-K must be a distributed TakeOrdered (never a global sort) and
    the vocabulary membership a broadcast join; no text column in any
    exchange."""
    import re as _re

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = vocab_coverage(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
    for m in _re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in m.group(1), m.group(0)


def test_decon_report_planted_contamination(spark):
    """Each triad mechanism counts exactly its planted prey: an exact
    copy, a near-dup (shared shingle mass over the 0.5 estimate), and a
    span-sharer that is neither."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import decon_report

    quote = " ".join(f"tok{i}" for i in range(25))          # >= 20-token run
    eval_rows = [(100, f"question one {quote} end"),
                 (200, "completely different benchmark row " + " ".join(
                     f"q{i}" for i in range(30)))]
    corpus_rows = [
        (1, f"question one {quote} end"),                   # exact copy of 100
        (2, f"prefix words here {quote} and a long unrelated tail"),  # span-sharer of 100
        (3, "totally unrelated document about spark plans and shuffles"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = {r.eval_id: r for r in decon_report(corpus, ev).collect()}
    assert set(out) == {100, 200}
    assert out[100].n_exact == 1
    assert out[100].n_span == 2          # the copy AND the quoting doc
    assert out[100].n_near >= 1          # the exact copy estimates 1.0
    assert (out[200].n_exact, out[200].n_near, out[200].n_span) == (0, 0, 0)

    plan = decon_report(corpus, ev)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_decon_report_fused_edges_and_single_scan(spark):
    """The r16 single-scan fusion: degenerate docs (null text, shorter
    than a shingle, shorter than a window) flow through the shared
    position explode without phantom matches, and the corpus side of the
    plan scans its input exactly once (was 3 mechanism scans +
    a second sign pass before r16)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import decon_report

    quote = " ".join(f"tok{i}" for i in range(25))
    eval_rows = [(100, f"lead {quote} trail"), (200, None), (300, "ab")]
    corpus_rows = [
        (1, f"lead {quote} trail"),   # exact + near + span vs 100
        (2, None),                    # null text: matches nothing (md5 NULL)
        (3, "ab"),                    # shorter than shingle_n AND window
        (4, "xy"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = {r.eval_id: r for r in decon_report(corpus, ev).collect()}
    assert set(out) == {100, 200, 300}
    assert (out[100].n_exact, out[100].n_span) == (1, 1) and out[100].n_near >= 1
    # null text never equals null text (md5 NULL key is not emitted)
    assert (out[200].n_exact, out[200].n_near, out[200].n_span) == (0, 0, 0)
    # sub-shingle docs have no signature, no bands, no windows — near and
    # span stay 0 — but exact md5 equality has no length floor: corpus
    # doc 3 is a byte-identical copy of eval 300
    assert (out[300].n_exact, out[300].n_near, out[300].n_span) == (1, 0, 0)

    # one corpus pass: parquet-backed inputs scan once per side (+ the
    # eval-id spine), not once per mechanism
    import io
    import contextlib

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = decon_report(docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rep.explain("formatted")
    import re

    scans = [l for l in buf.getvalue().splitlines()
             if re.match(r"^\(\d+\) Scan parquet", l)]
    assert len(scans) <= 3, scans


def test_lsh_band_tune_against_bruteforce(spark):
    """Sweep numbers verified against an independent brute-force pass
    over the collected signatures: truth = all pairs with est >= t,
    per-config candidates = pairs colliding in >= 1 band."""
    import hashlib
    from itertools import combinations

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        lsh_band_tune,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    configs, t, perms = ((2, 8), (4, 4), (8, 2)), 0.5, 16
    got = {(r.num_bands, r.rows_per_band): r
           for r in lsh_band_tune(docs, configs=configs, threshold=t,
                                  num_perms=perms).collect()}

    sigs = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(
        docs, "doc_id", "text", num_perms=perms, shingle_n=5, seed=42).collect()}

    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / perms

    def collides(a, b, nb, rpb):
        return any(sigs[a][i * rpb:(i + 1) * rpb] == sigs[b][i * rpb:(i + 1) * rpb]
                   for i in range(nb))

    ids = sorted(sigs)
    truth = {(a, b) for a, b in combinations(ids, 2) if est(a, b) >= t}
    for nb, rpb in configs:
        cand = {(a, b) for a, b in combinations(ids, 2) if collides(a, b, nb, rpb)}
        r = got[(nb, rpb)]
        assert r.n_candidates == len(cand)
        assert r.n_true == len(cand & truth)
        assert r.truth_total == len(truth)
        assert r.s_curve == round(1 - (1 - t ** rpb) ** nb, 6)
        if len(cand):
            assert r.precision == round(len(cand & truth) / len(cand), 6)
        exp_recall = round(len(cand & truth) / len(truth), 6) if truth else 1.0
        assert r.recall == exp_recall


def test_remove_eval_spans_preserve_separators(spark):
    """preserve_separators=True (r12, ADVICE r11): surviving tokens keep
    their ORIGINAL whitespace — a contaminated doc's paragraph boundary
    survives the scrub; token-level removal is identical to the default
    lane."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        remove_eval_spans,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    docs = [
        # paragraph boundary BETWEEN surviving regions, quote in para 2
        (1, f"keep one two\n\npara two {quote} tail words here"),
        # untouched doc: whitespace must come back verbatim
        (2, "clean\tdoc with\n\noriginal   spacing"),
        (3, None),
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    ev = spark.createDataFrame([(9, quote)], "doc_id long, text string")

    kw = dict(window_tokens=12, keep_schema=True)
    plain = {r.doc_id: r.text for r in remove_eval_spans(corpus, ev, **kw).collect()}
    kept = {r.doc_id: r.text
            for r in remove_eval_spans(corpus, ev, preserve_separators=True,
                                       **kw).collect()}

    assert kept[1] == "keep one two\n\npara two tail words here"
    assert plain[1] == "keep one two para two tail words here"  # collapsed
    for d in (2, 3):
        assert kept[d] == plain[d] == docs[d - 1][1]  # untouched verbatim
    # same tokens removed either way — only the separators differ
    import re
    for d in (1, 2):
        assert re.split(r"\s+", kept[d]) == re.split(r"\s+", plain[d])


def test_gopher_repetition_pinned(spark):
    """Hand-computed battery values (r12): line/para dup fractions,
    char-weighted top n-grams (incl. the tie-break and the overlap
    clamp), dup n-gram fractions, empty/null-doc zeros."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import gopher_repetition

    docs = spark.createDataFrame(
        [
            (0, "ab cd\nab cd\nef"),
            (1, "p q\n\np q\n\nr"),
            (2, " ".join(["w"] * 12)),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in gopher_repetition(docs).collect()}

    # doc 0: 3 lines (1 repeat of "ab cd"), one paragraph, tokens
    # [ab cd ab cd ef] -> "ab cd" x2 of 14 joined chars
    assert got[0]["dup_line_frac"] == round(1 / 3, 6)
    assert got[0]["dup_line_char_frac"] == round(5 / 12, 6)
    assert got[0]["dup_para_frac"] == 0.0
    assert got[0]["top_2gram_char_frac"] == round(10 / 14, 6)
    # 3-gram tie (all count 1) -> lexicographically smallest "ab cd ab"
    assert got[0]["top_3gram_char_frac"] == round(8 / 14, 6)
    assert got[0]["top_4gram_char_frac"] == round(11 / 14, 6)
    assert got[0]["dup_5gram_frac"] == 0.0 and got[0]["dup_10gram_frac"] == 0.0

    # doc 1: blank-line paragraphs repeat like the lines do
    assert got[1]["dup_para_frac"] == round(1 / 3, 6)
    assert got[1]["dup_para_char_frac"] == round(3 / 7, 6)
    assert got[1]["top_2gram_char_frac"] == round(6 / 9, 6)

    # doc 2: "w" x12 — self-overlapping top bigram clamps at 1.0; 8
    # 5-grams all identical -> 7/8 dup; 3 10-grams -> 2/3
    assert got[2]["top_2gram_char_frac"] == 1.0
    assert got[2]["dup_5gram_frac"] == 0.875
    assert got[2]["dup_10gram_frac"] == round(2 / 3, 6)

    # doc 3: null text -> all-zero row, present
    assert all(v == 0.0 for k, v in got[3].items() if k != "doc_id")


def test_gopher_repetition_kernel_parity(spark):
    """r13 kernel lane vs the expression battery: bit-identical values on
    real sf0.001 documents AND on crafted edge docs (null/empty text,
    self-overlap, ties, Java-\\s whitespace variants, repeated
    paragraphs) — the kernel is the default, the expression lane is the
    oracle-replayable shape, so parity is the correctness bridge."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import gopher_repetition

    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [
            (9001, None), (9002, ""), (9003, "   "),
            (9004, " ".join(["w"] * 12)),
            (9005, "ab cd\nab cd\nef"),
            (9006, "p q\n\np q\n\n\nr\n\np q"),
            (9007, "tab\there\x0bvt\ff\rcr  multi  space"),
            (9008, ("one two three four five " * 3) + "tail"),
            (9009, "A B a b A B\nmixed CASE lines\nA B a b A B"),
            # control char INSIDE a token: the joined-string tie order
            # ("a\x01 a" < "a z") diverges from tuple order — the slow
            # path the ctrl detector must route to (r13 fix)
            (9010, "a\x01 a z"),
            (9011, "q\x02w e r q\x02w e r zz"),
        ],
        "doc_id long, text string",
    )
    import random as _random

    rng = _random.Random(1313)
    vocab = ["alpha", "beta", "beta", "gamma", "δéļtå", "x", "yy", "z" * 7,
             "a\x01b", "ctrl\x1f", "ǫuirk", "1234", "...", "—dash"]
    fuzz = spark.createDataFrame(
        [(9100 + i,
          " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
          + ("\n" * rng.randrange(0, 4)))
         for i in range(60)],
        "doc_id long, text string",
    )
    docs = (real.select("doc_id", "text")
            .unionByName(edge).unionByName(fuzz))
    k = {r.doc_id: r.asDict() for r in gopher_repetition(docs).collect()}
    e = {r.doc_id: r.asDict()
         for r in gopher_repetition(docs, kernel=False).collect()}
    assert set(k) == set(e) and len(k) > 70
    mismatches = [
        (d, c, k[d][c], e[d][c])
        for d in k for c in k[d] if k[d][c] != e[d][c]
    ]
    assert mismatches == []


def test_gopher_repetition_dup_char_frac_pinned(spark):
    """dup_char=True, r14 reference semantics (DataTrove
    find_all_duplicate): only REPEATED occurrences count — the first
    occurrence of a gram is free — and each counted repeat skips n
    tokens, so counted spans never overlap.  Hand-computed walks, next
    to the count-based fraction the same row still reports."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import gopher_repetition

    docs = spark.createDataFrame(
        [
            # tokens: one two three four five ×2 + tail; joined stream is
            # 52 chars; the walk hits the repeat of the 5-gram
            # "one two three four five" once (23 chars) — the first
            # occurrence is NOT counted (pre-r14 interval union scored
            # both occurrences: 46/52)
            (0, "one two three four five one two three four five tail"),
            # "w"×12 joined = 23 chars: hits at gram idx 1 and 6, each
            # "w w w w w" = 9 chars -> 18/23 (pre-r14: 1.0) while the
            # count frac stays 7/8
            (1, " ".join(["w"] * 12)),
            (2, "all tokens perfectly unique here nothing repeats at any size"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict()
           for r in gopher_repetition(docs, dup_char=True).collect()}
    assert got[0]["dup_5gram_char_frac"] == round(23 / 52, 6)
    assert got[0]["dup_5gram_frac"] == round(1 / 7, 6)
    assert got[0]["dup_6gram_char_frac"] == 0.0
    assert got[1]["dup_5gram_char_frac"] == round(18 / 23, 6)
    assert got[1]["dup_5gram_frac"] == 0.875
    assert got[2]["dup_5gram_char_frac"] == 0.0
    assert all(v == 0.0 for c, v in got[3].items() if c != "doc_id")
    # char-frac columns need the kernel; the expression lane refuses
    with _pytest.raises(ValueError, match="dup_char requires the kernel"):
        gopher_repetition(docs, kernel=False, dup_char=True)


def test_repetition_gate_reference_semantics_kept_set(spark):
    """A document where the r14 reference definition and the pre-r14
    all-occurrence interval union DISAGREE on the kept-set, pinned to
    the intended (reference) outcome: one repeated 5-gram whose single
    counted repeat is 14/149 = 0.094 ≤ 0.15 (KEEP), while counting both
    occurrences scores 28/149 = 0.188 > 0.15 (pre-r14 dropped it).
    Filler is sized so no other rule trips (top_4gram 22/149 = 0.148)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        gopher_repetition_flags,
        with_passes_repetition,
    )

    text = "aa bb cc dd ee aa bb cc dd ee " + " ".join(
        f"x{i:02d}" for i in range(30))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = gopher_repetition_flags(docs).collect()[0]
    assert row["dup_5gram_char_frac"] == round(14 / 149, 6)
    assert row["ok_dup_5gram_char_frac"] is True
    assert row["ok_top_4gram_char_frac"] is True
    assert row["passes_repetition"] is True
    # the streaming twin agrees on the same document
    srow = with_passes_repetition(docs).collect()[0]
    assert srow["_passes_repetition"] is True


def test_repetition_gate_override_key_parity(spark):
    """r14 review fix: BOTH gates validate threshold overrides against
    the same key set — a legacy count-frac override (dup_5gram_frac) is
    rejected by the streaming gate too, instead of silently conjoining
    with the char-frac default."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        gopher_repetition_flags,
        with_passes_repetition,
    )

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    for gate in (
        lambda: gopher_repetition_flags(docs, thresholds={"dup_5gram_frac": 0.5}),
        lambda: with_passes_repetition(docs, thresholds={"dup_5gram_frac": 0.5}),
    ):
        with _pytest.raises(ValueError, match="unknown repetition rules"):
            gate()
    # char-frac overrides remain accepted by both
    gopher_repetition_flags(docs, thresholds={"dup_5gram_char_frac": 0.5})
    with_passes_repetition(docs, thresholds={"dup_5gram_char_frac": 0.5})


def test_ngram_novelty_pinned(spark):
    """Known windows (r12): identical doc scores 0 novelty, a one-token
    tail edit leaves only the prefix window seen, short docs score 1."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import ngram_novelty

    ref = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j"),
            (11, "a b c d e f g h zz yy"),
            (12, "hi there"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty)
           for r in ngram_novelty(docs, ref, n=8).collect()}
    assert got[10] == (3, 0, 0.0)
    assert got[11] == (3, 2, round(2 / 3, 6))
    assert got[12] == (0, 0, 1.0)


def test_lsh_band_tune_sampled_lane(spark):
    """sample_docs (r12): deterministic id-hash sample — same report
    twice, same schema as the full lane, and the sampled truth universe
    is smaller; a sample_docs above the corpus size is a no-op."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import lsh_band_tune

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {(r.num_bands, r.rows_per_band): r
            for r in lsh_band_tune(docs, configs=((4, 4),),
                                   sample_docs=None).collect()}
    s1 = {(r.num_bands, r.rows_per_band): r
          for r in lsh_band_tune(docs, configs=((4, 4),), sample_docs=200).collect()}
    s2 = {(r.num_bands, r.rows_per_band): r
          for r in lsh_band_tune(docs, configs=((4, 4),), sample_docs=200).collect()}
    assert s1 == s2                                     # deterministic
    assert s1[(4, 4)].truth_total <= full[(4, 4)].truth_total
    assert s1[(4, 4)].n_candidates < full[(4, 4)].n_candidates
    # r13: sampling is the production DEFAULT (100k), a no-op below the
    # cut — the default report equals the explicit full lane here
    noop = {(r.num_bands, r.rows_per_band): r
            for r in lsh_band_tune(docs, configs=((4, 4),)).collect()}
    assert noop == full


def test_cluster_size_report_pinned(spark):
    """Hand-built cluster structure (r12): one 3-doc near-dup clique,
    one 2-doc pair, two singletons -> histogram rows (3,1), (2,1),
    (1,2); n_docs sums to the corpus, frac_docs to 1."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        cluster_size_report,
    )

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "completely different content about cooking stews and braises slowly"
    docs = spark.createDataFrame(
        [(0, a), (1, a), (2, a + " extra"), (3, b), (4, b),
         (5, "a unique document about astronomy and telescopes at night"),
         (6, "another unique document about gardening and soil health")],
        "doc_id long, text string",
    )
    rows = {r.cluster_size: r for r in cluster_size_report(
        docs, num_perms=16, num_bands=8, threshold=0.5).collect()}
    assert rows[3].n_clusters == 1 and rows[2].n_clusters == 1
    assert rows[1].n_clusters == 2
    assert sum(r.n_docs for r in rows.values()) == 7
    assert abs(sum(r.frac_docs for r in rows.values()) - 1.0) < 1e-6


def test_gopher_repetition_flags_and_gate(spark):
    """gopher_repetition_flags (r12): the paper's thresholds as named
    rules — a boilerplate doc fails, clean prose passes, unknown rule
    overrides are rejected; the curate gate drops exactly the failing
    doc and records the funnel stage."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        gopher_repetition_flags,
    )

    spam = "\n".join(["buy cheap pills online now today"] * 20)
    # >= 50 words, like the quality battery's floor the paper pairs
    # these thresholds with: on a 25-word doc a SINGLETON 4-gram covers
    # ~18% of the characters and trips the 0.16 rule by construction
    prose = ("a genuinely varied paragraph discussing gardens weather "
             "books travel cooking music science history and art with "
             "no repeated lines anywhere in sight at all " +
             " ".join(f"plus{i} extra{i} vocabulary{i}" for i in range(12)))
    docs = spark.createDataFrame(
        [(1, spam), (2, prose)], "doc_id long, text string")

    flags = {r.doc_id: r for r in gopher_repetition_flags(docs).collect()}
    assert not flags[1].passes_repetition and not flags[1].ok_dup_line_frac
    assert flags[2].passes_repetition

    with _pytest.raises(ValueError, match="unknown repetition rules"):
        gopher_repetition_flags(docs, thresholds={"bogus": 0.1})

    trace: list = []
    kept = curate(
        docs, config=CurateConfig(min_chars=1, min_quality=0.0,
                                  gopher_repetition=True),
        _trace=trace,
    )
    assert [r.doc_id for r in kept.select("doc_id").collect()] == [2]
    assert any(name == "gopher_repetition" for name, _ in trace)


def test_topic_report_planted_topics(spark):
    """Two planted embedding blobs with disjoint vocabularies (r12):
    each cluster's top terms come from its own blob's vocabulary, the
    cluster sizes match the blobs, and corpus-wide filler words (present
    in both topics) never outrank topic-specific terms."""
    import random

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        topic_report,
    )

    rng = random.Random(7)
    cooking = "recipe kitchen saucepan simmer braise seasoning skillet"
    space = "orbital telescope asteroid spacecraft nebula gravity cosmos"

    def vec(center):
        return [center + rng.uniform(-0.05, 0.05) for _ in range(8)]

    rows, vecs = [], []
    for i in range(30):
        topic = cooking if i % 2 == 0 else space
        words = " ".join(rng.choice(topic.split()) for _ in range(30))
        rows.append((i, f"shared filler words {words} shared filler words"))
        vecs.append((i, vec(1.0 if i % 2 == 0 else -1.0)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    got = topic_report(docs, emb, num_clusters=2, n_iters=2, dim=8,
                       top_terms=3).collect()
    by_cluster: dict = {}
    for r in got:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert len(by_cluster) == 2
    cook_set, space_set = set(cooking.split()), set(space.split())
    for rows_ in by_cluster.values():
        assert rows_[0].n_docs == 15
        terms = {r.term for r in rows_}
        # every top term is topic vocabulary, never the shared filler
        assert terms <= cook_set or terms <= space_set
        assert not terms & {"shared", "filler", "words"}


def test_with_passes_repetition_custom_ns(spark):
    """Non-default top_ns/dup_ns (r12 review finding): the conjunction
    covers only computed rules (no KeyError on the absent defaults),
    and overrides naming un-computed rules are rejected."""
    import pytest as _pytest

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        with_passes_repetition,
    )

    docs = spark.createDataFrame(
        [(1, "spam line\n" * 25), (2, "varied " + " ".join(f"w{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r._passes_repetition
           for r in with_passes_repetition(docs, top_ns=(2, 3), dup_ns=(5,)).collect()}
    assert got == {1: False, 2: True}
    with _pytest.raises(ValueError, match="unknown repetition rules"):
        with_passes_repetition(docs, top_ns=(2,), dup_ns=(5,),
                               thresholds={"top_4gram_char_frac": 0.5})


def test_calibration_report_pinned(spark):
    """calibration_report (r13): hand-computed bins — equal-width bin
    assignment with prob 1.0 clamped into the last bin, per-bin mean
    prob vs empirical positive rate, absolute gap, empty bins absent,
    boolean labels accepted via cast."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        calibration_report,
    )

    scored = spark.createDataFrame(
        [
            (0.05, 0), (0.08, 1),          # bin 0: mean 0.065, pos 0.5
            (0.62, 1), (0.66, 1), (0.64, 0),  # bin 6: mean 0.64, pos 2/3
            (1.0, 1),                       # clamps into bin 9
        ],
        "prob double, label int",
    )
    got = {r.bin: r for r in calibration_report(scored).collect()}
    assert set(got) == {0, 6, 9}
    assert got[0].n == 2 and got[0].mean_prob == 0.065 and got[0].frac_pos == 0.5
    assert got[0].abs_gap == round(abs(0.065 - 0.5), 6)
    assert got[6].n == 3 and got[6].frac_pos == round(2 / 3, 6)
    assert got[9].n == 1 and got[9].mean_prob == 1.0 and got[9].abs_gap == 0.0
    # ECE over the report = sum(n * gap) / sum(n)
    ece = sum(r.n * r.abs_gap for r in got.values()) / sum(r.n for r in got.values())
    assert 0.0 <= ece <= 1.0
    # custom bin count: 0.62/0.64/0.66 split across 50 bins
    fine = {r.bin for r in calibration_report(scored, n_bins=50).collect()}
    assert {31, 32, 33} <= fine
    # r14 review fix: NULL / NaN / out-of-[0,1] probs are dropped up
    # front — no NULL bin row, no negative/overflow bins, and the
    # well-formed rows' bins are untouched
    dirty = spark.createDataFrame(
        [(0.05, 0), (0.08, 1), (None, 1), (float("nan"), 0),
         (-0.3, 1), (1.7, 0)],
        "prob double, label int",
    )
    rows = calibration_report(dirty).collect()
    assert {r.bin for r in rows} == {0}
    assert rows[0].n == 2 and rows[0].mean_prob == 0.065


def test_threshold_sweep_pinned(spark):
    """threshold_sweep (r13): hand-computed keep/precision/recall at
    each threshold, the empty-kept and no-positives edge conventions,
    and monotone non-increasing keep_frac."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        threshold_sweep,
    )

    scored = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.6, 1), (0.4, 0), (0.2, 1)],
        "prob double, label int",
    )
    got = {r.threshold: r
           for r in threshold_sweep(scored, thresholds=(0.5, 0.7, 0.95)).collect()}
    assert got[0.5].n_kept == 3 and got[0.5].keep_frac == 0.6
    assert got[0.5].precision == round(2 / 3, 6)
    assert got[0.5].recall == round(2 / 3, 6)
    assert got[0.7].n_kept == 2 and got[0.7].precision == 0.5
    assert got[0.95].n_kept == 0 and got[0.95].precision == 0.0
    # r14: NULL / NaN / out-of-range probs leave the sweep universe —
    # Spark sorts NaN above every double, so an unfiltered NaN row
    # would count as kept at every threshold
    dirty = scored.union(spark.createDataFrame(
        [(float("nan"), 1), (None, 0), (1.8, 1), (-0.2, 0)],
        "prob double, label int"))
    dgot = {r.threshold: r
            for r in threshold_sweep(dirty, thresholds=(0.5, 0.7, 0.95)).collect()}
    for t in (0.5, 0.7, 0.95):
        assert (dgot[t].n_kept, dgot[t].keep_frac, dgot[t].precision,
                dgot[t].recall) == (
            got[t].n_kept, got[t].keep_frac, got[t].precision, got[t].recall), t
    assert got[0.95].recall == 0.0
    ks = [got[t].keep_frac for t in (0.5, 0.7, 0.95)]
    assert ks == sorted(ks, reverse=True)
    # no positives: recall pins to 1 by convention; the one kept doc is
    # a negative, so precision is 0
    neg = spark.createDataFrame([(0.9, 0), (0.1, 0)], "prob double, label int")
    r = threshold_sweep(neg, thresholds=(0.5,)).collect()[0]
    assert r.recall == 1.0 and r.precision == 0.0 and r.n_kept == 1


def test_doc_repetition_kernel_invariants_property():
    """Hypothesis invariants over the kernel's pure-Python core (r13):
    every metric lands in [0, 1]; unique-token docs have zero dup-gram
    fractions; the overlap-aware duplicated-char fraction is 0 exactly
    when the count fraction is 0; all-identical-token docs saturate the
    dup fractions as n grows.  Pure driver-side — no Spark roundtrip,
    so hypothesis can run hundreds of examples."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        _doc_repetition,
        _metric_names,
    )

    TOP, DUP = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    names = _metric_names(TOP, DUP, dup_char=True)

    text_st = st.one_of(
        st.none(),
        st.text(alphabet=st.characters(codec="utf-8"), max_size=400),
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "a\x01b", "δé", "zz zz", "\n\n", "w"]),
            max_size=80,
        ).map(" ".join),
    )

    @settings(max_examples=300, deadline=None)
    @given(text_st)
    def check(t):
        vals = dict(zip(names, _doc_repetition(t, TOP, DUP, dup_char=True)))
        for m, v in vals.items():
            assert 0.0 <= v <= 1.0, (m, v, t)
        for nn in DUP:
            cf, chf = vals[f"dup_{nn}gram_frac"], vals[f"dup_{nn}gram_char_frac"]
            assert (cf == 0.0) == (chf == 0.0), (nn, cf, chf, t)

    check()

    # saturation: "w"*k has dup_ngram_frac (k-n)/(k-n+1) -> 1; the
    # reference walk (r14) hits at gram idx 1, 1+n, 1+2n, … ≤ k-n —
    # floor((k-1)/n) repeats of 2n-1 chars over the 2k-1-char stream
    for k in (12, 40):
        vals = dict(zip(names, _doc_repetition(" ".join(["w"] * k), TOP, DUP, True)))
        for nn in DUP:
            assert vals[f"dup_{nn}gram_frac"] == (k - nn) / (k - nn + 1)
            hits = (k - 1) // nn
            assert vals[f"dup_{nn}gram_char_frac"] == (
                hits * (2 * nn - 1) / (2 * k - 1))
    # unique tokens: every dup fraction is exactly 0
    vals = dict(zip(names, _doc_repetition(
        " ".join(f"tok{i}" for i in range(30)), TOP, DUP, True)))
    for nn in DUP:
        assert vals[f"dup_{nn}gram_frac"] == 0.0
        assert vals[f"dup_{nn}gram_char_frac"] == 0.0
