from dbc_informed_socketcan_to_parquet_spark.streaming.joins import (
    stream_interval_join,
    stream_static_enrich,
)
from dbc_informed_socketcan_to_parquet_spark.streaming.pipeline import (
    run_stream,
    streaming_bucket_downsample,
    streaming_decode,
)

__all__ = [
    "run_stream",
    "stream_interval_join",
    "stream_static_enrich",
    "streaming_bucket_downsample",
    "streaming_decode",
]
