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
