"""Streaming curation — the online analog of ``operators/curate.curate``.

One entry point wires the continuously-fed training-data front door:
JSONL landing dir → corrupt-line quarantine → ``normalize_text`` →
quality gate → watermarked ``streaming_exact_dedup`` → parquet shard
landing, all as ONE streaming plan per sink (every stage is an existing,
individually stream-tested operator; this module only composes them).

Design notes at 100 TB/day:

- The quality gate filters on stat EXPRESSIONS (no per-doc stats join —
  a stream-stream join would be stateful).  A ``repartition`` sits
  between the normalize projection and the gate: projections never merge
  across an Exchange, so the NFC + regex normalize chain materializes
  once per row instead of being substituted into every stat term the
  filter references (the streaming analog of batch curate()'s
  localCheckpoint barrier; same CollapseProject mechanics, measured r5).
- Dedup state is bounded by the watermark horizon
  (``dropDuplicatesWithinWatermark``): O(arrival rate × horizon), not
  O(corpus).  Whole-corpus dedup remains the batch tier's job over the
  landed table — the standard two-tier arrangement.
- The quarantine is its own query over the same source (file sources
  track progress per query), so a burst of bad lines can never stall
  the main lane.

Persisted-model gates (``lm_write`` / ``classifier_write`` artifacts)
are built in: the batch scorers' explode→groupBy is a streaming
aggregation, so the stream scores ROW-LOCALLY via Arrow-batched kernels
against driver-loaded model dicts (``textops.lm_score_rowlocal`` /
``classifier_score_rowlocal`` — broadcast-sized by construction,
score-identical to the batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbc_informed_socketcan_to_parquet_spark.sources.jsonl import (
    CORRUPT_COL,
    DOC_SCHEMA,
    stream_jsonl_dir,
)
from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
    streaming_exact_dedup,
)

#: stat aliases produced by textops._doc_stat_cols, in order
_STAT_NAMES = (
    "n_chars", "n_tokens", "n_bpe_ish", "avg_token_len",
    "punct_ratio", "digit_ratio", "stopword_ratio", "quality",
)

#: observe() metric names in pipeline order — the streaming analog of
#: curate_audit's stage list (only stages that actually run emit)
_FUNNEL_ORDER = (
    "funnel_input", "funnel_pii", "funnel_quality", "funnel_repetition",
    "funnel_compression",
    "funnel_perplexity", "funnel_classifier", "funnel_language",
    "funnel_exact_dedup", "funnel_against_exact", "funnel_against_near",
)


def streaming_funnel(query, order: tuple = _FUNNEL_ORDER) -> list[dict]:
    """Aggregate a stream-curate query's per-batch ``observe`` metrics
    into the same drop funnel :func:`operators.curate.curate_audit`
    reports for batch runs: ordered ``{stage, rows_in, rows_out,
    dropped}`` dicts, summed across every micro-batch in
    ``query.recentProgress``.

    The counts are Spark ``CollectMetrics`` side-outputs of the one
    streaming plan — zero extra passes, zero extra state; the engine
    accumulates them while the data flows.  Pass the main-lane query
    after a drain (or read periodically on a live stream for
    rates-per-stage).

    Note ``recentProgress`` is a bounded window (default ~100
    micro-batches, ``spark.sql.streaming.numRecentProgressUpdates``) —
    complete totals over a long drain or a long-lived stream should use
    :class:`FunnelListener` instead (the CLI does); this function WARNS
    when the window is full because the totals may then under-report."""
    import warnings

    progresses = query.recentProgress
    try:
        from pyspark.sql import SparkSession

        cap = int(
            SparkSession.getActiveSession().conf.get(
                "spark.sql.streaming.numRecentProgressUpdates", "100")
        )
    except Exception:
        cap = 100
    if len(progresses) >= cap:
        warnings.warn(
            f"streaming_funnel: recentProgress holds {len(progresses)} updates "
            f"(the retention cap) — earlier micro-batches have been evicted and "
            f"the funnel totals under-report; use FunnelListener for complete "
            f"totals over long drains",
            stacklevel=2,
        )
    totals: dict[str, int] = {}
    for progress in progresses:
        for name, row in (progress.get("observedMetrics") or {}).items():
            if name in order:
                totals[name] = totals.get(name, 0) + int(row["rows"])
    return funnel_from_totals(totals, order)


def funnel_from_totals(totals: dict, order: tuple = _FUNNEL_ORDER) -> list[dict]:
    """Fold accumulated per-metric row totals into the ordered funnel
    shape (shared by :func:`streaming_funnel` and :class:`FunnelListener`)."""
    seen = [n for n in order if n in totals]
    out = []
    for prev, cur in zip(seen, seen[1:]):
        out.append({
            "stage": cur.removeprefix("funnel_"),
            "rows_in": totals[prev],
            "rows_out": totals[cur],
            "dropped": totals[prev] - totals[cur],
        })
    return out


def _make_funnel_listener(order: tuple = _FUNNEL_ORDER):
    """A ``StreamingQueryListener`` that accumulates the observe() funnel
    metrics across EVERY micro-batch via the listener bus — unlike
    ``query.recentProgress`` it has no retention window, so an
    arbitrarily large ``--available-now`` drain reports complete
    ``rows_in``/``rows_out``.  Register with ``spark.streams
    .addListener(listener)`` BEFORE starting the query; read
    ``listener.funnel()`` after the drain.

    Built by a factory (not a module-level class) so importing this
    module never requires the streaming listener machinery."""
    from pyspark.sql.streaming import StreamingQueryListener

    class FunnelListener(StreamingQueryListener):
        def __init__(self):
            self.totals: dict[str, int] = {}
            self._order = order

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            metrics = event.progress.observedMetrics or {}
            for name, row in metrics.items():
                if name in self._order:
                    self.totals[name] = self.totals.get(name, 0) + int(row["rows"])

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

        def funnel(self) -> list[dict]:
            return funnel_from_totals(self.totals, self._order)

    return FunnelListener()


def streaming_curate_frame(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "_ingest_ts",
    min_chars: int = 32,
    min_quality: float = 0.5,
    watermark: str = "10 minutes",
    normalize: bool = True,
    extract_html: bool = False,
    html_min_words: int = 3,
    html_max_link_density: float = 0.5,
    gate_partitions: int | None = None,
    lm_path: str | None = None,
    max_perplexity: float | None = None,
    classifier_path: str | None = None,
    min_clf_prob: float | None = None,
    lang_model_path: str | None = None,
    allowed_langs: tuple[str, ...] = (),
    max_pii: int | None = None,
    min_compression_ratio: float | None = None,
    gopher_repetition: bool = False,
    against_corpus: DataFrame | None = None,
    against_digest_col: str | None = None,
    against_sigs_path: str | None = None,
    against_num_bands: int = 4,
    against_jaccard: float = 0.5,
    eval_corpus: DataFrame | None = None,
    decon_span_window: int | None = None,
    observe_funnel: bool = False,
) -> DataFrame:
    """The transformation core (source- and sink-agnostic): normalize →
    quality gate → watermarked exact dedup, as one streaming-safe plan.
    Exposed separately so tests and custom pipelines can compose it with
    any source/sink; :func:`run_streaming_curate` adds the JSONL source,
    quarantine lane, and parquet sink.

    ``observe_funnel`` lands a named ``observe`` (CollectMetrics) at
    every drop-capable gate boundary; :func:`streaming_funnel` folds the
    per-batch metrics into the batch-audit-shaped drop report.  The
    metrics ride the existing plan — no second pass, no state.

    If ``time_col`` is absent it is added as the processing-time ingest
    stamp (JSONL corpora rarely carry event time; dedup-horizon
    semantics then follow arrival order, which is the meaningful order
    for an ingest gate).  The column rides into the output as
    provenance."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        _doc_stat_cols,
        normalize_text,
    )

    def _obs(stage: str, df: DataFrame) -> DataFrame:
        if not observe_funnel:
            return df
        return df.observe(stage, F.count(F.lit(1)).alias("rows"))

    out = docs
    if time_col not in out.columns:
        out = out.withColumn(time_col, F.current_timestamp())
    out = _obs("funnel_input", out)
    if extract_html:
        # HTML front door (r9): rewrite raw HTML to rendered text before
        # normalize/stats.  Stateless codegen projection — streaming-safe
        # by construction (no aggregation, no watermark interaction).
        from dbc_informed_socketcan_to_parquet_spark.operators.htmlops import (
            extract_text,
        )

        out = extract_text(
            out, html_col=text_col, out_col=text_col,
            min_words=html_min_words, max_link_density=html_max_link_density,
        )
    if decon_span_window is not None:
        # span-level verbatim decontamination (r11): the streaming twin —
        # the eval window-hash set is computed ONCE here (batch side,
        # benchmark-sized) and rides the task closure; the scrub itself
        # is a stateless row-local rewrite, same ordering as batch
        # curate (after HTML extraction, before any gate reads text)
        if eval_corpus is None:
            raise ValueError(
                "decon_span_window set but eval_corpus not provided")
        from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
            eval_span_hashes,
            streaming_scrub_eval_spans,
        )

        out = streaming_scrub_eval_spans(
            out,
            eval_span_hashes(eval_corpus, text_col=text_col,
                             window_tokens=decon_span_window),
            window_tokens=decon_span_window, text_col=text_col,
        )
    if normalize:
        out = normalize_text(out, text_col)
        # projection barrier (see module docstring): without it the gate
        # filter inlines the normalize chain into every stat expression
        spark = out.sparkSession
        n = gate_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        out = out.repartition(n)
    if max_pii is not None:
        # PII density gate (r9): row-local regexp-count filter on the
        # pre-scrub text — stateless, append-safe, the streaming twin of
        # CurateConfig.max_pii.  Counting follows scrub's sequential
        # masking order (same chain as textops.pii_report).
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            _PII_PATTERNS,
        )

        # coalesce NULL text to '' so null-text docs count zero PII and
        # fall through to the quality gate (batch curate gate parity)
        t = F.coalesce(F.col(text_col), F.lit(""))
        total = F.lit(0)
        for pat, tag in _PII_PATTERNS:
            total = total + F.regexp_count(t, F.lit(pat))
            t = F.regexp_replace(t, pat, tag)
        out = _obs("funnel_pii", out.filter(total <= F.lit(max_pii)))
    stats = dict(zip(_STAT_NAMES, _doc_stat_cols(F.col(text_col))))
    out = _obs("funnel_quality", out.filter(
        (stats["n_chars"] >= F.lit(min_chars))
        & (stats["quality"] >= F.lit(min_quality))
    ))
    if gopher_repetition:
        # Gopher repetition battery gate (r12): two stateless row-local
        # projections appending the threshold conjunction — the
        # streaming twin of CurateConfig.gopher_repetition (batch uses
        # a join-based gate; streams filter on the appended column)
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            with_passes_repetition,
        )

        out = with_passes_repetition(out, text_col=text_col)
        out = _obs("funnel_repetition", out.filter(
            F.col("_passes_repetition"))).drop("_passes_repetition")
    if min_compression_ratio is not None:
        # zlib repetition gate (r9): stateless Arrow kernel filter — the
        # streaming twin of CurateConfig.min_compression_ratio.  The
        # kernel projects (row_key, ratio); a stream-safe filter needs
        # the ratio ON the row, so compute it as a pandas-kernel column
        # via mapInPandas preserving the full row.
        import zlib as _zlib

        _schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in out.schema.fields
        ) + ", _zratio double"

        def _zkernel(batches, _tc=text_col):
            for pdf in batches:
                raw = pdf[_tc].fillna("").astype(str)
                ratios = []
                for t in raw:
                    b = t.encode("utf-8")
                    ratios.append(len(_zlib.compress(b, 6)) / len(b) if b else 0.0)
                o = pdf.copy()
                o["_zratio"] = ratios
                yield o

        out = out.mapInPandas(_zkernel, _schema)
        out = _obs("funnel_compression", out.filter(
            F.col("_zratio") >= F.lit(min_compression_ratio)
        )).drop("_zratio")
    # persisted-model gates (r6): the batch scorers' explode→groupBy is a
    # streaming aggregation, so the stream scores ROW-LOCALLY against the
    # driver-loaded model dicts (broadcast-sized by construction) —
    # stateless, append-safe, score-identical to the batch path.  Docs
    # the kernels can't score (no bigrams / no tokens) have NULL scores
    # and drop: the documented conservative gate.
    if max_perplexity is not None:
        if lm_path is None:
            raise ValueError("max_perplexity set but lm_path not provided")
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            lm_score_rowlocal,
        )

        out = _obs("funnel_perplexity", lm_score_rowlocal(
            out, lm_path, text_col=text_col
        ).filter(
            F.col("lm_perplexity") <= max_perplexity
        ).drop("lm_n_bigrams", "lm_avg_logp", "lm_perplexity"))
    if min_clf_prob is not None:
        if classifier_path is None:
            raise ValueError("min_clf_prob set but classifier_path not provided")
        from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
            classifier_score_rowlocal,
        )

        out = _obs("funnel_classifier", classifier_score_rowlocal(
            out, classifier_path, text_col=text_col
        ).filter(
            F.col("clf_prob") >= min_clf_prob
        ).drop("clf_n_features", "clf_margin", "clf_prob"))
    if allowed_langs:
        if lang_model_path is None:
            raise ValueError("allowed_langs set but lang_model_path not provided "
                             "(streaming uses the trained row-local model)")
        from dbc_informed_socketcan_to_parquet_spark.operators.langid import (
            lang_id_rowlocal,
        )

        out = _obs("funnel_language", lang_id_rowlocal(
            out, lang_model_path, text_col=text_col
        ).filter(
            F.col("lang_pred").isin(list(allowed_langs))
        ).drop("lang_pred", "lang_score"))
    out = _obs("funnel_exact_dedup", streaming_exact_dedup(
        out, text_col=text_col, time_col=time_col, watermark=watermark
    ))
    if against_corpus is not None:
        # incremental EXACT vs history (r10): stream-static digest join —
        # the streaming twin of curate --against (batch order preserved:
        # own exact dedup first, history second)
        from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
            streaming_dedup_against,
        )

        out = _obs("funnel_against_exact", streaming_dedup_against(
            out, against_corpus, text_col=text_col,
            corpus_digest_col=against_digest_col,
        ))
    if against_sigs_path is not None:
        # incremental NEAR vs history (r10): row-local signature +
        # per-band stream-static rep joins — the streaming twin of
        # curate --against-sigs (representative-verify tier contract)
        from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
            minhash_read,
        )
        from dbc_informed_socketcan_to_parquet_spark.streaming.dedup import (
            streaming_near_dedup_against,
        )

        store_sigs, meta = minhash_read(out.sparkSession, against_sigs_path)
        if meta.get("hash_name", "md5") != "md5":
            raise ValueError(
                "streaming --against-sigs needs an md5-family signature store "
                "(the row-local signer is md5-pinned); re-sign history with "
                "minhash_signatures(hash_fn=md5_long)")
        out = _obs("funnel_against_near", streaming_near_dedup_against(
            out, store_sigs,
            num_perms=meta["num_perms"], shingle_n=meta["shingle_n"],
            seed=meta["seed"], num_bands=against_num_bands,
            threshold=against_jaccard, text_col=text_col,
        ))
    return out


def run_streaming_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOC_SCHEMA,
    text_col: str = "text",
    min_chars: int = 32,
    min_quality: float = 0.5,
    watermark: str = "10 minutes",
    quarantine_dir: str | None = None,
    max_files_per_trigger: int = 16,
    available_now: bool = False,
    lm_path: str | None = None,
    max_perplexity: float | None = None,
    classifier_path: str | None = None,
    min_clf_prob: float | None = None,
    lang_model_path: str | None = None,
    allowed_langs: tuple[str, ...] = (),
    extract_html: bool = False,
    html_min_words: int = 3,
    html_max_link_density: float = 0.5,
    input_format: str = "jsonl",
    max_pii: int | None = None,
    min_compression_ratio: float | None = None,
    gopher_repetition: bool = False,
    against_path: str | None = None,
    against_digest_col: str | None = None,
    against_sigs_path: str | None = None,
    against_num_bands: int = 4,
    against_jaccard: float = 0.5,
    eval_corpus_path: str | None = None,
    decon_span_window: int | None = None,
    observe_funnel: bool = False,
):
    """Start the full streaming curate pipeline; returns the list of
    live ``StreamingQuery`` handles (main lane first, then quarantine
    when ``quarantine_dir`` is set).

    ``available_now=True`` drains everything currently in the landing
    dir and stops — the batch-drain mode used by tests and by catch-up
    runs after downtime; the checkpoint makes successive drains resume
    exactly (dedup state included).

    ``input_format="warc"`` swaps the landing-dir source for the WARC
    stream reader (sources/warc): newly-landed ``*.warc[.gz]`` segments
    become documents (``doc_id`` = content-keyed xxhash64, ``source`` =
    target URI) with ``extract_html`` forced on — the crawl chain's
    streaming twin.  WARC has no quarantine lane (malformed records end
    a segment's iteration at the source, jsonl-doctrine)."""
    if input_format == "warc":
        from dbc_informed_socketcan_to_parquet_spark.sources.warc import stream_warc

        recs = stream_warc(spark, input_dir, html_only=True).where(
            F.col("parse_ok") & F.col("text").isNotNull()
            & (F.col("http_status") == 200)
        )
        clean = recs.select(
            F.xxhash64("record_id", "url").alias("doc_id"),
            F.col("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("url").alias("source"),
            F.length("text").alias("n_chars"),
        )
        raw = None
        extract_html = True
    else:
        raw = stream_jsonl_dir(
            spark, input_dir, schema=schema, max_files_per_trigger=max_files_per_trigger
        )
        corrupt = F.col(CORRUPT_COL).isNotNull()
        clean = raw.filter(~corrupt).drop(CORRUPT_COL)
    curated = streaming_curate_frame(
        clean, text_col=text_col, min_chars=min_chars,
        min_quality=min_quality, watermark=watermark,
        lm_path=lm_path, max_perplexity=max_perplexity,
        classifier_path=classifier_path, min_clf_prob=min_clf_prob,
        lang_model_path=lang_model_path, allowed_langs=allowed_langs,
        extract_html=extract_html, html_min_words=html_min_words,
        html_max_link_density=html_max_link_density,
        max_pii=max_pii, min_compression_ratio=min_compression_ratio,
        gopher_repetition=gopher_repetition,
        against_corpus=(
            spark.read.parquet(against_path) if against_path else None
        ),
        against_digest_col=against_digest_col,
        against_sigs_path=against_sigs_path,
        against_num_bands=against_num_bands, against_jaccard=against_jaccard,
        eval_corpus=(
            spark.read.parquet(eval_corpus_path) if eval_corpus_path else None
        ),
        decon_span_window=decon_span_window,
        observe_funnel=observe_funnel,
    )

    def _start(df, fmt, path, ckpt):
        w = df.writeStream.format(fmt).option("path", path).option(
            "checkpointLocation", ckpt
        ).outputMode("append")
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    queries = [_start(curated, "parquet", output_dir, f"{checkpoint_dir}/main")]
    if quarantine_dir is not None and raw is not None:
        qrows = raw.filter(corrupt).select(F.col(CORRUPT_COL).alias("raw_line"))
        queries.append(
            _start(qrows, "json", quarantine_dir, f"{checkpoint_dir}/quarantine")
        )
    return queries
