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
