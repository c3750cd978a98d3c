"""JSONL document ingest — the interchange format of LLM-corpus tooling.

A north-star source beyond the reference's surface (its inputs are
candump/SocketCAN/parquet): crawl dumps, annotation exports, and
inter-pipeline handoffs all move as JSON-lines.  The 100 TB failure mode
is silent row loss — a malformed line in shard 40k of 50k must neither
kill the job nor vanish.

Shape: a text scan + one ``from_json`` projection (JVM-side Jackson,
codegen'd) rather than ``spark.read.json`` with PERMISSIVE mode.  Same
parse cost, but the corrupt-line column is an ordinary column: Spark's
internal ``_corrupt_record`` refuses any plan that references only it
(QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the whole scan is cached —
and caching a 100 TB ingest batch to count its bad lines is the wrong
trade.  Here ``quarantine.count()`` / ``.select(raw)`` just work.

An explicit schema is REQUIRED at scale: inference reads the data twice
and samples, so a rare field or a type drift between shards silently
changes the schema between runs.  ``DOC_SCHEMA`` matches the engine's
``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The engine's document-interchange schema (matches documents.parquet).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def _project(raw: DataFrame, schema: T.StructType, keep_corrupt: bool) -> DataFrame:
    """value:string → typed columns (+ raw line where the parse failed).

    The corrupt column is declared INSIDE the struct schema handed to
    ``from_json`` (its documented ``columnNameOfCorruptRecord`` contract)
    — ``from_json`` never returns a NULL struct in PERMISSIVE mode, it
    returns all-NULL fields, so a struct-level null test cannot detect
    corruption.  Parsing into one named struct keeps it ONE Jackson parse
    per row (a per-field ``from_json(...)[f]`` would re-parse per column).
    Type-drift rows (valid JSON, wrong field type) keep their parseable
    fields AND carry the raw line — standard PERMISSIVE semantics."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = raw.select(
        F.from_json(
            F.col("value"), full, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("_r")
    )
    cols = [F.col(f"_r.{f.name}").alias(f.name) for f in schema.fields]
    if keep_corrupt:
        return parsed.select(*cols, F.col(f"_r.{CORRUPT_COL}").alias(CORRUPT_COL))
    return parsed.filter(F.col(f"_r.{CORRUPT_COL}").isNull()).select(*cols)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL scan: conforming rows parse to typed columns,
    malformed lines survive whole in ``_corrupt_record`` (NULL for clean
    rows).  ``keep_corrupt=False`` drops malformed lines instead and
    carries no corrupt column.  One narrow scan either way."""
    return _project(spark.read.text(path), schema, keep_corrupt)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantine_rows): route parse failures to a quarantine
    sink instead of silently mixing NULL-heavy rows into the corpus.
    Both are narrow filters over the same scan — write clean first, then
    the (tiny) quarantine side."""
    corrupt = F.col(CORRUPT_COL).isNotNull()
    return (
        df.filter(~corrupt).drop(CORRUPT_COL),
        df.filter(corrupt).select(F.col(CORRUPT_COL).alias("raw_line")),
    )


def write_jsonl(df: DataFrame, path: str, max_records_per_file: int = 100_000) -> None:
    """JSONL export with bounded shard sizes (downstream tools memory-map
    shards; one giant file serializes every consumer)."""
    df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file).json(path)


def stream_jsonl_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Structured-streaming JSONL ingest over a landing directory — the
    continuous analog of :func:`read_jsonl` (new shards picked up per
    micro-batch; compose with streaming/dedup for online ingest dedup)."""
    raw = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    return _project(raw, schema, keep_corrupt=True)
