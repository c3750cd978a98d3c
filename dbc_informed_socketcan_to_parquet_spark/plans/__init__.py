from dbc_informed_socketcan_to_parquet_spark.plans.pipeline import DecodePipeline, PipelineConfig

__all__ = ["DecodePipeline", "PipelineConfig"]
