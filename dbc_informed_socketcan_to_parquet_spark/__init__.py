"""dbc_informed_socketcan_to_parquet_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
decoder ``Rombutan/dbc-informed-socketcan-to-parquet`` (a single-binary C++
CAN-bus → Parquet ETL tool), extended with the relational surface Spark
provides for free (joins, sorts, SQL, windows) and with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Design stance (see SURVEY.md):
- Declare logical plans with the DataFrame/SQL API; let Catalyst/Tungsten
  choose physical strategy.  No RDDs, no driver-side row loops.
- The DBC signal dictionary is compiled *driver-side* into Column
  expressions (pure ``pyspark.sql.functions`` algebra — bit shifts, masks,
  IEEE-754 arithmetic), so the entire decode path stays inside
  WholeStageCodegen.  Pandas UDFs exist only as test oracles.
- Every operator is designed for a 1000-executor cluster reading ~100 TB:
  broadcast the tiny dictionary side, aligned tumbling windows (shuffle on
  (bucket) key), partition-parallel forward-fill with a two-pass boundary
  fix, inverted-index joins instead of cross joins for dedup/similarity.
"""

__version__ = "0.1.0"

from dbc_informed_socketcan_to_parquet_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables", "__version__"]
