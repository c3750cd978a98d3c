"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference has no join operator at all (its pipeline is a single
decode lineage, /root/reference/src/main.cpp); these are part of the
engine's Spark-native superset — the telemetry patterns a fleet-scale
deployment needs: enrich a live decoded-signal stream with a dimension
table (per-vehicle metadata, enum labels), and align two live streams
within a time tolerance (frames ↔ diagnostic events).

Scale notes (1000-executor target):

- Stream-static joins broadcast the static side per micro-batch when it
  is small (Catalyst sizes it exactly like a batch join) — no state
  store, no shuffle of the stream.
- Stream-stream joins keep both sides in the state store bounded by
  watermark + interval: state size ≈ rate × (watermark + interval
  width).  Both inputs MUST be watermarked or state grows forever;
  this module refuses to build an unwatermarked interval join rather
  than silently leaking state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension (broadcast per micro-batch).

    The dimension side is marked for broadcast explicitly: at any scale a
    stream-side shuffle per micro-batch is the failure mode, and the dim
    tables this engine joins (DBC enum labels, vehicle registry) are
    KB-to-MB sized.
    """
    if dim.isStreaming:
        # falling through would build an unwatermarked stream-stream join
        # whose state grows forever — route to the watermarked form instead
        raise ValueError(
            "dim is a streaming DataFrame; use stream_interval_join for "
            "stream-stream joins (it enforces watermarks)"
        )
    if stream.isStreaming:
        return stream.join(F.broadcast(dim), on=on, how=how)
    return stream.join(dim, on=on, how=how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    on: list[str] | None = None,
    lower_ms: int = 0,
    upper_ms: int = 1000,
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: right rows within
    ``[left_ts + lower_ms, left_ts + upper_ms]`` of each left row,
    optionally equi-keyed on ``on``.

    Both sides get the same event-time watermark; the state store then
    provably discards rows older than ``watermark + interval`` — the
    bound that makes a 24/7 deployment's memory flat.  ``left_ts`` /
    ``right_ts`` must be timestamp columns and must have DIFFERENT names
    (both survive into the output for downstream lag computation).
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must differ (both are kept in the output)")
    if not (left.isStreaming and right.isStreaming):
        raise ValueError("stream_interval_join is for two streams; use a batch range join otherwise")

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)

    lo = F.expr(f"INTERVAL {int(lower_ms)} MILLISECOND")
    hi = F.expr(f"INTERVAL {int(upper_ms)} MILLISECOND")
    cond = (F.col(right_ts) >= F.col(left_ts) + lo) & (F.col(right_ts) <= F.col(left_ts) + hi)
    for k in on or []:
        cond = cond & (lw[k] == rw[k])
    joined = lw.join(rw, cond, how)
    for k in on or []:
        joined = joined.drop(rw[k])
    return joined
