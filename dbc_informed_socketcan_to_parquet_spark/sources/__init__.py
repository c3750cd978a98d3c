from dbc_informed_socketcan_to_parquet_spark.sources.candump import (
    normalize_time,
    read_candump,
    stream_candump_dir,
    stream_candump_socket,
)
from dbc_informed_socketcan_to_parquet_spark.sources.parquet_reingest import read_legacy_parquet
from dbc_informed_socketcan_to_parquet_spark.sources.warc import (
    WarcDataSource,
    read_warc,
    warc_record_decode,
)

__all__ = [
    "normalize_time",
    "read_candump",
    "stream_candump_dir",
    "stream_candump_socket",
    "read_legacy_parquet",
    "WarcDataSource",
    "read_warc",
    "warc_record_decode",
]
