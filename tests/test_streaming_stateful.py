"""Cross-micro-batch state: the stateful forward-fill must carry values
from batch 1 into batch 2 (maxFilesPerTrigger=1 forces two batches)."""

from __future__ import annotations

import time

from pyspark.sql import types as T

from dbc_informed_socketcan_to_parquet_spark.streaming.stateful import streaming_forward_fill


def test_forward_fill_carries_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = T.StructType([
        T.StructField("iface", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("a", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ])
    # batch 1: a observed; batch 2: a never observed → must carry 2.0
    (in_dir / "b1.csv").write_text("vcan0,1,1.0,\nvcan0,2,2.0,5.0\n")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    (in_dir / "b2.csv").write_text("vcan0,3,,6.0\nvcan0,4,,\n")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .csv(str(in_dir))
    )
    filled = streaming_forward_fill(stream, "iface", "t", ["a", "b"])
    q = (
        filled.writeStream.format("memory")
        .queryName("ffill_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.t: (r.a, r.b) for r in spark.sql("SELECT * FROM ffill_out").collect()}
    assert rows[1] == (1.0, None)          # nothing to carry yet for b
    assert rows[2] == (2.0, 5.0)
    assert rows[3] == (2.0, 6.0)           # a carried across the batch boundary
    assert rows[4] == (2.0, 6.0)           # both carried within batch 2
