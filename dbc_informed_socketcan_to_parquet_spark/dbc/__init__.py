from dbc_informed_socketcan_to_parquet_spark.dbc.spec import DbcSpec, MessageSpec, SignalSpec
from dbc_informed_socketcan_to_parquet_spark.dbc.parser import parse_dbc, parse_dbc_text
from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler

__all__ = [
    "DbcSpec",
    "MessageSpec",
    "SignalSpec",
    "parse_dbc",
    "parse_dbc_text",
    "DecodeCompiler",
]
