"""Storage-layout plan guards: bucketed joins must not shuffle, and
directory-partition filters must prune at the scan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.storage import (
    read_table,
    write_bucketed_table,
    write_partitioned,
)

from tests.test_plan_quality import n_exchanges, plan_of


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count:
    the sort-merge join runs exchange-free (write-time co-location)."""
    ev = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 97).alias("v")
    )
    us = spark.range(0, 1_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("grp")
    )
    write_bucketed_table(ev, "ev_bucketed", ["user_id"], num_buckets=8,
                         sort_cols=["user_id"], path=str(tmp_path / "ev"))
    write_bucketed_table(us, "us_bucketed", ["user_id"], num_buckets=8,
                         sort_cols=["user_id"], path=str(tmp_path / "us"))
    try:
        # force the join strategy that would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "ev_bucketed").join(
            read_table(spark, "us_bucketed"), "user_id"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert n_exchanges(plan) == 0            # co-located: no shuffle at all
        # and the answer is right
        assert joined.count() == 1_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS us_bucketed")


def test_bucketed_agg_no_shuffle(spark, tmp_path):
    """groupBy on the bucket key aggregates without an exchange."""
    ev = spark.range(0, 10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 97).alias("v")
    )
    write_bucketed_table(ev, "ev_bucketed_agg", ["user_id"], num_buckets=8,
                         path=str(tmp_path / "ev_agg"))
    try:
        agg = read_table(spark, "ev_bucketed_agg").groupBy("user_id").agg(F.sum("v"))
        assert n_exchanges(plan_of(agg)) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed_agg")


def test_partition_pruning(spark, tmp_path):
    """A filter on the partition column must prune directories at plan
    time (PartitionFilters), not scan-and-discard."""
    df = spark.range(0, 1_000).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("day")
    )
    path = str(tmp_path / "parts")
    write_partitioned(df, path, ["day"])
    got = spark.read.parquet(path).filter(F.col("day") == "3")
    plan = plan_of(got)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1)
    assert got.count() == 200


def test_export_training_shards_manifest_reproducible(spark, tmp_path):
    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 10).cast("long").alias("n_tokens"),
    )
    out1 = str(tmp_path / "epoch1")
    out2 = str(tmp_path / "epoch1_rerun")
    m1 = export_training_shards(docs, out1, "n_tokens", max_tokens=256, num_shards=8)
    # re-run with DIFFERENT input parallelism: pack membership/identity is
    # content-derived, so the manifest must still be byte-identical
    m2 = export_training_shards(
        docs.repartition(13), out2, "n_tokens", max_tokens=256, num_shards=8
    )

    # lossless: every doc and token accounted for
    assert m1["total_docs"] == 500
    assert m1["total_tokens"] == sum((i % 97 + 10) for i in range(500))
    assert len(m1["shards"]) == 8
    # reproducible: identical shard layout and content fingerprints
    assert m1["shards"] == m2["shards"]
    # a different seed is a different epoch permutation
    m3 = export_training_shards(
        docs, str(tmp_path / "epoch2"), "n_tokens", max_tokens=256, num_shards=8, seed=1
    )
    assert m3["shards"] != m1["shards"]
    assert m3["total_docs"] == 500
    # manifest on disk matches the returned one
    import json
    disk = json.load(open(f"{out1}/_manifest.json"))
    assert disk["total_tokens"] == m1["total_tokens"]
    assert {int(k): v for k, v in disk["shards"].items()} == m1["shards"]


def test_export_training_shards_empty_shards_explicit(spark, tmp_path):
    """Fewer packs than shards → the manifest still enumerates EVERY shard
    index, empty ones as explicit zero rows (the r5 ADVICE silent-shrink)."""
    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards

    docs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit(50).cast("long").alias("n_tokens")
    )
    m = export_training_shards(
        docs, str(tmp_path / "tiny"), "n_tokens", max_tokens=64, num_shards=16
    )
    assert len(m["shards"]) == 16
    assert sorted(m["shards"]) == list(range(16))
    empties = [s for s in m["shards"].values() if s["packs"] == 0]
    assert empties and all(
        s == {"packs": 0, "docs": 0, "tokens": 0, "fingerprint": 0} for s in empties
    )
    assert m["total_docs"] == 3


def test_export_training_shards_shard_regex_ignores_path_segments(spark, tmp_path):
    """An out_dir containing a 'part-<digits>' path segment must not poison
    the shard-index extraction (anchored to the file basename)."""
    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 31 + 5).cast("long").alias("n_tokens"),
    )
    out = str(tmp_path / "part-3" / "shards")
    m = export_training_shards(docs, out, "n_tokens", max_tokens=128, num_shards=4)
    nonempty = [i for i, s in m["shards"].items() if s["packs"] > 0]
    assert len(nonempty) > 1, "all rows collapsed into one shard index"
    assert m["total_docs"] == 200
