from dbc_informed_socketcan_to_parquet_spark.operators.bucket import bucket_downsample
from dbc_informed_socketcan_to_parquet_spark.operators.ffill import forward_fill, forward_fill_blocks
from dbc_informed_socketcan_to_parquet_spark.operators.pivot import pivot_last, unpivot

__all__ = [
    "bucket_downsample",
    "forward_fill",
    "forward_fill_blocks",
    "pivot_last",
    "unpivot",
]
