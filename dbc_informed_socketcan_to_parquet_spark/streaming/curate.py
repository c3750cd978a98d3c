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

Model-gated variants (persisted LM / classifier from ``lm_write`` /
``classifier_write``) drop in as additional ``filter`` stages on scored
columns; they are left to the caller because score joins against stored
tables broadcast per micro-batch and need no state.
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


def streaming_curate_frame(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "_ingest_ts",
    min_chars: int = 32,
    min_quality: float = 0.5,
    watermark: str = "10 minutes",
    normalize: bool = True,
    gate_partitions: int | None = None,
) -> DataFrame:
    """The transformation core (source- and sink-agnostic): normalize →
    quality gate → watermarked exact dedup, as one streaming-safe plan.
    Exposed separately so tests and custom pipelines can compose it with
    any source/sink; :func:`run_streaming_curate` adds the JSONL source,
    quarantine lane, and parquet sink.

    If ``time_col`` is absent it is added as the processing-time ingest
    stamp (JSONL corpora rarely carry event time; dedup-horizon
    semantics then follow arrival order, which is the meaningful order
    for an ingest gate).  The column rides into the output as
    provenance."""
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        _doc_stat_cols,
        normalize_text,
    )

    out = docs
    if time_col not in out.columns:
        out = out.withColumn(time_col, F.current_timestamp())
    if normalize:
        out = normalize_text(out, text_col)
        # projection barrier (see module docstring): without it the gate
        # filter inlines the normalize chain into every stat expression
        spark = out.sparkSession
        n = gate_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        out = out.repartition(n)
    stats = dict(zip(_STAT_NAMES, _doc_stat_cols(F.col(text_col))))
    out = out.filter(
        (stats["n_chars"] >= F.lit(min_chars))
        & (stats["quality"] >= F.lit(min_quality))
    )
    return streaming_exact_dedup(
        out, text_col=text_col, time_col=time_col, watermark=watermark
    )


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
):
    """Start the full streaming curate pipeline; returns the list of
    live ``StreamingQuery`` handles (main lane first, then quarantine
    when ``quarantine_dir`` is set).

    ``available_now=True`` drains everything currently in the landing
    dir and stops — the batch-drain mode used by tests and by catch-up
    runs after downtime; the checkpoint makes successive drains resume
    exactly (dedup state included)."""
    raw = stream_jsonl_dir(
        spark, input_dir, schema=schema, max_files_per_trigger=max_files_per_trigger
    )
    corrupt = F.col(CORRUPT_COL).isNotNull()
    clean = raw.filter(~corrupt).drop(CORRUPT_COL)
    curated = streaming_curate_frame(
        clean, text_col=text_col, min_chars=min_chars,
        min_quality=min_quality, watermark=watermark,
    )

    def _start(df, fmt, path, ckpt):
        w = df.writeStream.format(fmt).option("path", path).option(
            "checkpointLocation", ckpt
        ).outputMode("append")
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    queries = [_start(curated, "parquet", output_dir, f"{checkpoint_dir}/main")]
    if quarantine_dir is not None:
        qrows = raw.filter(corrupt).select(F.col(CORRUPT_COL).alias("raw_line"))
        queries.append(
            _start(qrows, "json", quarantine_dir, f"{checkpoint_dir}/quarantine")
        )
    return queries
