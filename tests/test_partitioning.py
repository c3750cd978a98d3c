"""fan_out: the single-partition-input guard for row-multiplying and
heavy-per-row operators (functions/partitioning)."""

from __future__ import annotations

from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import fan_out


def test_fan_out_expands_narrow_input(spark):
    one = spark.range(100).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    fo = fan_out(one)
    assert fo.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # pure repartition: row set unchanged
    assert sorted(r.id for r in fo.collect()) == list(range(100))


def test_fan_out_leaves_wide_input_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 8)
    assert fan_out(wide) is wide


def test_fan_out_multiplier(spark):
    one = spark.range(10).coalesce(1)
    fo = fan_out(one, multiplier=2)
    assert fo.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism
