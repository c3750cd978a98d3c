"""Streaming ingest deduplication — the streaming complement of
``operators/dedup`` for a continuously-fed training-data pipeline.

``streaming_exact_dedup`` drops content-duplicate records as they
arrive, with state bounded by the event-time watermark
(``dropDuplicatesWithinWatermark``): a duplicate arriving within the
horizon is suppressed; state for horizons already passed is evicted, so
the state store stays O(arrival rate × horizon) instead of growing with
the whole corpus.  For whole-corpus exact dedup run the batch operator
(``operators/dedup.exact_dedup``) over the landed table; this operator
exists to keep the *online* path from writing obvious duplicates in the
first place — the standard two-tier design at 100 TB.

The dedup key is a content hash (md5 of the text payload), not the full
text: state rows stay small and the comparison is O(1) per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
    extra_key_cols: list[str] | None = None,
) -> DataFrame:
    """Suppress records whose content hash was already seen within the
    watermark horizon.  ``extra_key_cols`` widens the dedup key (e.g.
    dedup per source feed rather than globally)."""
    key = ["_content_hash", *(extra_key_cols or [])]
    hashed = docs.withColumn("_content_hash", F.md5(F.col(text_col).cast("string")))
    return (
        hashed.withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(key)
        .drop("_content_hash")
    )


def _rowlocal_minhash(text, num_perms: int, shingle_n: int, seed: int, max_chars: int,
                      kernel: str = "pandas"):
    """MinHash signature as ONE row-local expression (array<long>).

    The batch operator (operators/dedup.minhash_signatures) explodes
    shingles and aggregates per-permutation minima — the right shape for
    a corpus scan, but an explode→groupBy is a streaming AGGREGATION
    (stateful, output-mode-constrained).  Here the whole signature is a
    stateless per-row expression: shingle array → hash array (md5,
    JVM-side codegen) → per-permutation minima.

    ``kernel="pandas"`` (default) runs the permutation stage as an
    Arrow-batched numpy broadcast — (A·fold30(h) + B) mod 2³¹-1, min
    over shingles — in exact int64 arithmetic, identical values to the
    JVM expression (the products stay < 2⁶¹; pytest pins parity against
    the batch operator).  The interpreted-HOF form (``kernel="expr"``)
    costs ~num_perms·max_chars lambda evals per record (~45 ms/doc at
    16×4096, measured r5); the numpy kernel does the same arithmetic in
    ~0.2 ms/doc.  Statelessness is preserved either way."""
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long, perm_hash
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import minhash_perms

    t = F.substring(F.lower(text), 1, max_chars)
    n = F.length(t) - (shingle_n - 1)
    shingles = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(shingle_n)))
    hashes = F.transform(shingles, lambda s: md5_long(s))
    if kernel == "expr":
        return F.array(*[
            F.array_min(F.transform(hashes, lambda h: perm_hash(h, a, b)))
            for a, b in minhash_perms(num_perms, seed)
        ])
    if kernel != "pandas":
        raise ValueError(f"kernel must be 'pandas' or 'expr', got {kernel!r}")

    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    perms = minhash_perms(num_perms, seed)
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]
    P = np.int64((1 << 31) - 1)
    MASK = np.int64((1 << 30) - 1)

    def _perm_mins_fn(hs):
        out = []
        for h in hs:
            h = np.asarray(h, dtype=np.int64)
            folded = (h >> np.int64(30)) ^ (h & MASK)
            out.append(((A * folded[None, :] + B) % P).min(axis=1))
        return pd.Series(out)

    # legacy-style registration (no type hints): the module uses
    # `from __future__ import annotations`, under which pyspark cannot
    # resolve locally-imported pd.Series hints
    _perm_mins = pandas_udf(_perm_mins_fn, "array<long>")
    return _perm_mins(hashes)


def streaming_near_dup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    shingle_n: int = 5,
    num_bands: int = 4,
    threshold: float = 0.5,
    seed: int = 42,
    max_chars: int = 4096,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Online near-duplicate detection: each arriving document lands in
    ``num_bands`` LSH buckets; the FIRST document seen in a bucket
    becomes its representative (id + signature held in the state store),
    and every later arrival is scored against that representative by
    estimated Jaccard — the streaming analog of the batch star-edge
    design (operators/dedup.lsh_star_edges): O(1) state and O(1)
    comparisons per (record, band), never pairwise within the stream.

    Output (append): ``(id_col, band, rep_id, est_jaccard)`` — one row
    per band collision at ``est_jaccard >= threshold``; a document may
    be flagged by several bands (consumers dedup on id as needed).
    Records shorter than ``shingle_n`` chars cannot be shingled and pass
    unflagged.  ``state_ttl_ms`` bounds the state store: buckets idle
    longer than the TTL are evicted (processing-time timeout), after
    which their next arrival founds a fresh representative.  NOTE: with
    a processing-time timeout the engine schedules micro-batches
    CONTINUOUSLY to fire evictions, so ``processAllAvailable()`` never
    settles — use the TTL only under a real trigger schedule
    (production); leave it None for drain-style tests.

    Two-tier design note: this flags duplicates ONLINE before they land;
    the batch star clustering over the landed table remains the
    authoritative dedup (same signatures, same banding — the tiers
    agree by construction).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd

    from pyspark.sql import types as T

    rows_per_band = num_perms // num_bands
    sig = _rowlocal_minhash(F.col(text_col), num_perms, shingle_n, seed, max_chars)
    # Repartition BEFORE the signature projection: the row-local minhash
    # is ~16·max_chars interpreted HOF ops per record, and without the
    # exchange it executes at SOURCE parallelism (a 2-file micro-batch =
    # 2 tasks no matter how many cores).  The stateful groupBy below
    # shuffles regardless, so this narrow pre-shuffle is cheap relative
    # to the signature work it parallelizes (streaming fan_out analog —
    # the batch probe in functions/partitioning can't run on a stream).
    target = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    with_sig = (
        docs.filter(F.length(F.col(text_col)) >= shingle_n)
        .repartition(target)
        .select(F.col(id_col), sig.alias("_sig"))
    )
    bands = with_sig.select(
        id_col,
        "_sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[
                        F.col("_sig")[b * rows_per_band + r] for r in range(rows_per_band)
                    ])).alias("bh"),
                )
                for b in range(num_bands)
            ])
        ).alias("_bb"),
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bh").alias("bh"), "_sig")

    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("band", T.IntegerType()),
        T.StructField("rep_id", id_type),
        T.StructField("est_jaccard", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("rep_id", id_type),
        T.StructField("rep_sig", T.ArrayType(T.LongType())),
    ])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def check(key, pdfs, state: GroupState):
        band = key[0]
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=[id_col, "band", "rep_id", "est_jaccard"])
            return
        rep_id, rep_sig = (state.get if state.exists else (None, None))
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)  # deterministic within a batch
            ids = pdf[id_col].tolist()
            sigs = pdf["_sig"].tolist()
            for i, s in zip(ids, sigs):
                # plain Python ints: the state tuple is pickled for the
                # JVM state store, which rejects numpy scalars
                i = int(i)
                s = [int(x) for x in s]
                if rep_id is None:
                    rep_id, rep_sig = i, s
                elif i != rep_id:
                    est = sum(x == y for x, y in zip(s, rep_sig)) / float(num_perms)
                    if est >= threshold:
                        out.append((i, band, rep_id, est))
        state.update((rep_id, list(rep_sig)))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(out, columns=[id_col, "band", "rep_id", "est_jaccard"])

    return bands.groupBy("band", "bh").applyInPandasWithState(
        check,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_dedup_against(
    docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    corpus_digest_col: str | None = None,
) -> DataFrame:
    """Drop stream records whose content already exists in a STATIC
    historical corpus — the streaming twin of
    ``operators/dedup.dedup_against_corpus``.

    Shape: the history projects to a distinct content-digest table
    (static side, computed once per micro-batch plan from the immutable
    snapshot) and the stream joins it by digest.  Stream-static LEFT
    ANTI is not in Spark's supported stream-static join set, so the gate
    is the equivalent left_outer + null-probe filter — stateless,
    append-safe, no watermark required.  At 100 TB the static side is
    the persisted, hash-bucketed corpus-digest table (the same artifact
    the batch Bloom verify reads), so each micro-batch pays a digest
    join, never a history scan.

    ``corpus_digest_col`` (r15): pass that persisted digest table
    directly — md5-of-text strings in the named column — instead of raw
    history text (the daily-recipe store shape; same result as hashing
    the raw corpus)."""
    hashes = (
        (corpus.select(F.col(corpus_digest_col).alias("_ch"))
         if corpus_digest_col is not None
         else corpus.select(
             F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_ch")))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    probed = docs.withColumn(
        "_ch", F.md5(F.coalesce(F.col(text_col), F.lit("")))
    ).join(hashes, "_ch", "left_outer")
    return probed.filter(F.col("_hit").isNull()).drop("_ch", "_hit")


def streaming_near_dedup_against(
    docs: DataFrame,
    store_sigs: DataFrame,
    num_perms: int,
    shingle_n: int,
    seed: int,
    num_bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 4096,
) -> DataFrame:
    """Drop stream records that NEAR-duplicate the historical corpus via
    its persisted MinHash signature store (``operators/dedup
    .minhash_write``) — the streaming twin of
    ``near_dedup_against_corpus``, fully STATELESS: the stream side
    signs row-locally (``_rowlocal_minhash``, pytest-pinned equal to the
    batch signatures), and history arrives as one static
    REPRESENTATIVE-per-bucket table.

    Semantics (the ``streaming_near_dup`` two-tier contract): a record
    drops iff one of its ``num_bands`` band hashes collides with a
    history bucket AND its estimated Jaccard against that bucket's
    representative (min-id member, deterministic) is ≥ ``threshold``.
    Verifying against the representative rather than every member is
    the streaming tier's documented trade — the batch
    ``curate --against-sigs`` pass over the landed table remains
    authoritative, and the tiers share signature family and banding by
    construction.

    Scale (r13, VERDICT r12 item 6 — the pre-r13 shape halved drain
    throughput): the rep table is built ONCE, keyed by the composite
    ``_bk = band ':' band_hash``, and MATERIALIZED eagerly
    (``_measured_small``) at gate construction — the store is an
    immutable snapshot, so re-deriving its band aggregation inside
    every micro-batch plan (×``num_bands`` joins, the old shape: eight
    store-scale aggregations per batch) bought nothing.  The stream
    stays one row per record (no explode → no per-doc regroup, no
    stream aggregation, stateless/append-safe) and probes the ONE
    keyed table ``num_bands`` times; because every probe hits the same
    materialized relation with the same key, Spark's ReuseExchange
    collapses the static side to a single broadcast (measured-small
    path) or a single shuffle (SHUFFLE_HASH fallback) per micro-batch
    — cost-wise one keyed (band, band_hash) join.  The verify is a
    row-local ``zip_with``/``aggregate`` over two ``num_perms``-long
    arrays.

    The store must carry the md5 signature family (``minhash_write``
    default): the row-local signer is md5-pinned, and mixing hash
    families would compare unrelated minima.
    """
    rows_per_band = num_perms // num_bands
    # static: one deterministic representative signature per (band, bh),
    # composite-keyed and materialized once.  The broadcast gate is sized
    # in BYTES, not rows (r13 review finding): a rep row carries a
    # num_perms-long signature array plus the composite key (~200 B at
    # num_perms=16), so the id-only 2M-row hot-set cap would admit a
    # ~400 MB forced broadcast; cap the estimated payload at 128 MB.
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        _band_table,
        _measured_small,
    )

    rep_row_bytes = 64 + 8 * num_perms  # key string + long[] signature
    max_rep_rows = (128 << 20) // rep_row_bytes

    store_bands = _band_table(store_sigs, "doc_id", num_bands, rows_per_band)
    reps = (
        store_bands.join(store_sigs.select("doc_id", "sig"), "doc_id")
        .groupBy("band", "bh")
        .agg(F.min(F.struct(F.col("doc_id"), F.col("sig"))).alias("_rep"))
        .select(
            F.concat_ws(":", F.col("band"), F.col("bh")).alias("_bk"),
            F.col("_rep.sig").alias("_rep_sig"),
        )
    )
    reps, small = _measured_small(reps, max_rep_rows)

    sig = _rowlocal_minhash(F.col(text_col), num_perms, shingle_n, seed, max_chars)
    # records too short to shingle have no signature and pass unflagged
    # (the batch operator's contract); guard with a null signature
    out = docs.withColumn(
        "_sig",
        F.when(F.length(F.col(text_col)) >= shingle_n, sig),
    )
    est_cols = []
    for b in range(num_bands):
        bh_b = F.md5(F.concat_ws(",", *[
            F.col("_sig")[b * rows_per_band + r] for r in range(rows_per_band)
        ]))
        rep_b = reps.select(F.col("_bk").alias(f"_bk{b}"),
                            F.col("_rep_sig").alias(f"_rep{b}"))
        rep_b = F.broadcast(rep_b) if small else rep_b.hint("SHUFFLE_HASH")
        out = out.withColumn(
            f"_bk{b}", F.concat_ws(":", F.lit(b), bh_b)
        ).join(rep_b, f"_bk{b}", "left_outer")
        est_cols.append(
            F.when(
                F.col(f"_rep{b}").isNotNull(),
                F.aggregate(
                    F.zip_with(F.col("_sig"), F.col(f"_rep{b}"),
                               lambda x, y: (x == y).cast("int")),
                    F.lit(0), lambda acc, x: acc + x,
                ) / F.lit(float(num_perms)),
            ).otherwise(F.lit(0.0))
        )
    keep = F.greatest(*est_cols) < F.lit(threshold) if len(est_cols) > 1 \
        else est_cols[0] < F.lit(threshold)
    drop_cols = ["_sig"] + [c for b in range(num_bands) for c in (f"_bk{b}", f"_rep{b}")]
    return out.filter(F.col("_sig").isNull() | keep).drop(*drop_cols)


# -- span-level verbatim decontamination, streaming twin ----------------------


def eval_span_hashes(
    eval_df: DataFrame,
    text_col: str = "text",
    window_tokens: int = 20,
) -> set[int]:
    """Driver-collected window-hash set of the eval corpus — the static
    side of :func:`streaming_scrub_eval_spans`.  Benchmark-sized by the
    same contract the batch gate makes (``dedup.remove_eval_spans``
    broadcasts the identical set); built with the SAME expressions as
    the batch operator so the two tiers share one hash family."""
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long

    w = int(window_tokens)
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != F.lit(""),
    )
    starts = F.sequence(F.lit(1), F.col("_n") - F.lit(w - 1))
    rows = (
        eval_df.select(toks.alias("_tk"), F.size(toks).alias("_n"))
        .filter(F.col("_n") >= w)
        .select(F.explode(F.transform(
            starts,
            lambda i: md5_long(
                F.lower(F.array_join(F.slice(F.col("_tk"), i, w), " "))
            ),
        )).alias("_wh"))
        .distinct()
        .collect()
    )
    return {r["_wh"] for r in rows}


def streaming_scrub_eval_spans(
    docs: DataFrame,
    eval_hashes: set[int],
    window_tokens: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """STREAMING twin of ``dedup.remove_eval_spans`` (r11): rewrite each
    arriving document with every token cut that sits inside a
    ``window_tokens``-token run shared verbatim with the eval corpus.
    Fully STATELESS and row-local — no aggregation, no watermark: the
    eval hash set rides the task closure (the urlops big-blocklist
    kernel pattern) and each row is masked independently, so the stage
    composes with any gate chain and any trigger.

    Parity with the batch operator (same \\s+ tokenization, same
    lowercased-window md5_long family, same cover semantics) is
    pytest-pinned; NULL text passes through untouched (the batch
    keep_schema contract).

    .. note:: the parity guarantee is ASCII-only (r12, ADVICE r11): the
       batch side lowercases with Spark ``lower()`` (JVM case mapping)
       while this kernel uses Python ``str.lower()`` (Unicode simple
       case mapping) — on ASCII the two are identical byte-for-byte,
       but non-ASCII text (e.g. dotted/dotless I under a Turkish-locale
       JVM, or full-vs-simple case folds like ``'İ'``) can hash the same
       window differently across the two tiers.  For a non-ASCII corpus
       run the batch scrub, or pre-normalize case upstream in BOTH
       tiers with one shared kernel."""
    from pyspark.sql.functions import pandas_udf

    w = int(window_tokens)
    hashes = frozenset(eval_hashes)

    def _scrub_fn(texts):
        import hashlib
        import re

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, ASCII class

        def one(text):
            if text is None:
                return None
            toks = [t for t in ws.split(text) if t]
            n = len(toks)
            if n < w:
                return text
            covered = bytearray(n)
            lowered = [t.lower() for t in toks]
            for i in range(n - w + 1):
                win = " ".join(lowered[i:i + w])
                h = int(hashlib.md5(win.encode("utf-8")).hexdigest()[:15], 16)
                if h in hashes:
                    for j in range(i, i + w):
                        covered[j] = 1
            if not any(covered):
                return text
            return " ".join(t for t, c in zip(toks, covered) if not c)

        return texts.map(one)

    # legacy-style registration (no type hints): see _rowlocal_minhash —
    # under `from __future__ import annotations` pyspark cannot resolve
    # locally-imported pd.Series hints
    _scrub = pandas_udf(_scrub_fn, "string")
    return docs.withColumn(text_col, _scrub(F.col(text_col)))


def streaming_semantic_dedup_against(
    docs: DataFrame,
    spark,
    index_path: str,
    threshold: float = 0.9,
    nprobe: int = 4,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    time_col: str = "_ingest_ts",
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """STREAMING twin of ``similarity.semantic_dedup_against`` (r14):
    drop arriving records whose EMBEDDING near-duplicates the persisted
    history index (``ivf_index_write`` layout) — the semantic cell of
    the streaming vs-history matrix, next to
    :func:`streaming_dedup_against` (exact text) and
    :func:`streaming_near_dedup_against` (MinHash text).

    Shape: centers load once at gate construction (driver-sized model
    table); each record assigns ROW-LOCALLY to its ``nprobe`` nearest
    clusters (stateless expression over broadcast-literal centroids),
    stream-static LEFT OUTER joins the cached index data on
    ``ivf_cluster``, and a watermarked (window, id) aggregation folds
    the per-candidate cosines back to one row per record —
    ``max(cosine)`` is NULL when no probed cluster held any history
    vector, and the record is kept iff that max is NULL or below
    ``threshold``.  All original columns ride a payload struct through
    the aggregation, so the gate composes like the other twins.

    The documented two-tier trade (the near gate's doctrine): the
    streaming tier cannot prune index partitions per batch (the probe
    set is dynamic), so each micro-batch pays one keyed join against
    the CACHED index relation — even at production cluster counts
    (k ≥ cores, so the cluster key partitions evenly) this is the
    online pre-filter, and the batch pass over the landed table
    (``curate --against-embeddings``, partition-pruned) remains
    authoritative.  Output lands AFTER the watermark passes (the
    aggregation is append-mode) — the same latency contract as the
    watermarked exact-dedup stage.
    """
    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        _load_pq_books,
        _load_sq_dim,
        _nearest_labels,
        _pq_reconstruct,
        _sq_reconstruct,
        cosine,
        dot_product,
        l2_norm,
        resolve_index_path,
    )

    index_path = resolve_index_path(index_path)
    model = spark.read.parquet(f"{index_path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    books = _load_pq_books(spark, index_path)
    sq_dim = None if books is not None else _load_sq_dim(spark, index_path)
    if books is None and sq_dim is None:
        data = (
            spark.read.parquet(f"{index_path}/data")
            .select("ivf_cluster",
                    F.col(vec_col).cast("array<double>").alias("_hv"))
            .persist()
        )
        score = cosine(F.col("_bv"), F.col("_hv"))
    elif sq_dim is not None:
        # scalar-quantized history: near-lossless reconstruction on the
        # STATIC side, same scoring contract as the PQ branch below
        raw = spark.read.parquet(f"{index_path}/data")
        hid = next(c for c in raw.columns
                   if c not in ("ivf_cluster", "codes", "vec_norm",
                                "sq_lo", "sq_hi"))
        data = (
            _sq_reconstruct(raw, sq_dim, hid)
            .select("ivf_cluster", "_hv", "_hnorm")
            .persist()
        )
        score = dot_product(F.col("_bv"), F.col("_hv")) / (
            F.col("_hnorm") * l2_norm(F.col("_bv"))
        )
    else:
        # codes-only history (ivfpq_index_write): reconstruct ĥ once on
        # the STATIC side of the stream-static join; cosine uses the
        # stored true norm so only the dot product carries PQ error.
        # The index id col is not part of this gate's output — any id
        # column in the codes table works, so probe the schema for it.
        raw = spark.read.parquet(f"{index_path}/data")
        hid = next(c for c in raw.columns
                   if c not in ("ivf_cluster", "codes", "vec_norm"))
        data = (
            _pq_reconstruct(raw, books, centers, hid)
            .select("ivf_cluster", "_hv", "_hnorm")
            .persist()
        )
        score = dot_product(F.col("_bv"), F.col("_hv")) / (
            F.col("_hnorm") * l2_norm(F.col("_bv"))
        )

    orig = docs.columns
    out = docs
    if time_col not in out.columns:
        out = out.withColumn(time_col, F.current_timestamp())
    payload_cols = [c for c in out.columns]
    probes = (
        out.withColumn("_payload", F.struct(*[F.col(c) for c in payload_cols]))
        .withColumn("_bv", F.col(vec_col).cast("array<double>"))
        .withColumn(
            # NULL/un-embeddable records are KEPT, like the batch gate
            # keeps them (r15, advisory-hardened): guard the assignment
            # so a NULL vector gets a NULL cluster array, and
            # explode_OUTER so that still emits one row — the NULL
            # cluster key equi-joins nothing, max cosine stays NULL, and
            # the keep-filter passes the record through.  (Unguarded,
            # null distances still sorted to real labels and the record
            # pointlessly joined every probed history partition.)
            "ivf_cluster",
            F.explode_outer(
                F.when(F.col("_bv").isNotNull(),
                       _nearest_labels("_bv", centers, nprobe))
            ),
        )
        .withWatermark(time_col, watermark)
    )
    scored = probes.join(data, "ivf_cluster", "left_outer").withColumn(
        "_cos", F.when(F.col("_hv").isNotNull(), score),
    )
    agg = (
        scored.groupBy(F.window(F.col(time_col), window), F.col(id_col))
        .agg(F.max("_cos").alias("_best"), F.first("_payload").alias("_p"))
    )
    kept = agg.filter(
        F.col("_best").isNull() | (F.col("_best") < F.lit(threshold))
    )
    return kept.select(*[F.col(f"_p.{c}").alias(c) for c in orig])
