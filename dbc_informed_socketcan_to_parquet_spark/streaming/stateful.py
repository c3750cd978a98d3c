"""Custom stateful streaming operators (SURVEY §2.3 A4 streaming flavor).

``streaming_forward_fill`` carries each signal's last observed value across
micro-batches with ``applyInPandasWithState`` — the engine-sanctioned
custom-stateful-operator surface (Arrow-batched; state lives in the Spark
state store, checkpointed, partitioned by key).  This is what the
reference's "don't clear the cache" forward-fill
(/root/reference/src/main.cpp.bak:399-405) means under fault tolerance:
the carried values survive restarts via the checkpoint, which the
reference cannot do at all.

Within a micro-batch rows are filled in event-time order; across batches
the state provides the carry-in.  (Late rows older than already-carried
state follow arrival order — pair with a watermark upstream to bound it.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_forward_fill(
    wide: DataFrame,
    key_col: str,
    time_col: str,
    value_cols: list[str],
) -> DataFrame:
    """LOCF over a keyed stream with cross-batch state.

    Output schema: (key, time, *value_cols) — same shape as input, nulls
    replaced by the latest non-null seen for that key so far.
    """
    in_schema = wide.select(key_col, time_col, *value_cols).schema
    out_schema = T.StructType(list(in_schema.fields))
    state_schema = T.StructType(
        [f for f in in_schema.fields if f.name in value_cols]
    )

    def fill(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        carry = list(state.get) if state.exists else [None] * len(value_cols)
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)
            for i, c in enumerate(value_cols):
                col = pdf[c]
                filled = col.ffill()
                if carry[i] is not None:
                    filled = filled.fillna(carry[i])
                pdf[c] = filled
                last = col.dropna()
                if len(last):
                    carry[i] = last.iloc[-1]
            yield pdf
        state.update(tuple(carry))

    return (
        wide.select(key_col, time_col, *value_cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            fill,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming sessionization: dynamic-gap session windows per key —
    events closer than ``gap`` merge into one session; a session emits
    once the watermark passes its end (append mode), so late events
    inside the allowed lateness still extend their session.

    The batch analog is the ``sessionize`` registry query (lag +
    cumulative-sum session ids); ``F.session_window`` is its streaming
    form — state per OPEN session only, bounded by the watermark, never
    a full-history buffer.  Output: key, session start/end, event count.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_sliding_counts(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "1 minute",
    slide: str = "30 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """Overlapping (sliding) windowed counts per key — each event lands
    in window/slide overlapping windows; a window finalizes when the
    watermark passes its end.  The tumbling special case (slide ==
    window) is what ``streaming_bucket_downsample`` uses; the sliding
    form is the rate-over-trailing-interval monitor shape.  State is
    one row per open (window, key): watermark-bounded."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )
