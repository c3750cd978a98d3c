from dbc_informed_socketcan_to_parquet_spark.sources.candump import (
    normalize_time,
    read_candump,
    stream_candump_dir,
    stream_candump_socket,
)
from dbc_informed_socketcan_to_parquet_spark.sources.parquet_reingest import read_legacy_parquet

__all__ = [
    "normalize_time",
    "read_candump",
    "stream_candump_dir",
    "stream_candump_socket",
    "read_legacy_parquet",
]
