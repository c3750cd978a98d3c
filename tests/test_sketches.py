"""Error-bound tests for the approximate sketch surface.

The sketches (`approx_count_distinct` HLL++, `percentile_approx` KLL-ish
quantile digest) are engine-specific by construction, so the oracle
harness only rows-checks them — this file pins their ACCURACY instead:
the approximate answers must sit within the published error envelope of
the exact answers at sf0.01.  Spark's sketches are deterministic for a
fixed input, so these are exact assertions, not flaky statistical ones.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"

# q_approx_distinct's configured HLL relative standard deviation, and the
# sigma multiplier for the assertion band.  rsd is a *standard error*:
# 5 sigma is far outside plausible HLL behavior, so a failure here means
# a wiring bug (wrong column, wrong grouping), not sketch noise.
RSD = 0.02
K_SIGMA = 5


def test_approx_distinct_error_bound(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r["exact_users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", RSD).alias("approx_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert ex > 0
        rel_err = abs(approx[et] - ex) / ex
        assert rel_err <= RSD * K_SIGMA, (
            f"event_type={et}: approx={approx[et]} exact={ex} "
            f"rel_err={rel_err:.4f} > {RSD * K_SIGMA}"
        )


def test_percentile_approx_rank_bound(spark):
    """percentile_approx(accuracy=1000) guarantees a rank error of at most
    n/accuracy — assert the approximate p50/p95 fall inside the exact
    value range of ranks [target - n/1000, target + n/1000]."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_type", "value")
    groups = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    approx = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 1000).alias("p50"),
            F.percentile_approx("value", 0.95, 1000).alias("p95"),
        )
        .collect()
    }
    for et in groups:
        vals = sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == et).select("value").collect()
            if r["value"] is not None
        )
        n = len(vals)
        # rank error guarantee is n/accuracy; +2 absorbs the rank-index
        # convention (nearest-rank vs interpolated target) on both ends
        slack = max(n // 1000, 1) + 2
        for q, got in zip((0.5, 0.95), approx[et]):
            target = int(q * n)
            lo = vals[max(target - slack - 1, 0)]
            hi = vals[min(target + slack, n - 1)]
            assert lo <= got <= hi, (
                f"event_type={et} q={q}: approx={got} outside exact rank "
                f"band [{lo}, {hi}] (n={n}, slack={slack})"
            )


def test_sketch_rollup_union_matches_direct_sketch(spark):
    """Mergeable-rollup contract: union of per-slice HLL sketches gives the
    same estimate as sketching the union directly, and the estimate stays
    within the lg_k=12 error band of exact."""
    from dbc_informed_socketcan_to_parquet_spark.operators.sketches import (
        sketch_rollup,
        sketch_union,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    rollup = sketch_rollup(ev, ["event_type"], "user_id", lg_k=12)
    assert rollup.count() == ev.select("event_type").distinct().count()

    merged = sketch_union(rollup, [])
    est = merged.collect()[0]["estimate"]
    exact = ev.select("user_id").distinct().count()
    # lg_k=12 => rsd ~ 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(est - exact) <= max(5 * 0.0163 * exact, 3.0), (est, exact)

    import pyspark.sql.functions as F
    direct = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))).alias("e"))
        .collect()[0]["e"]
    )
    assert est == direct     # union of partials == one-shot sketch

    # re-aggregating to a coarser grain preserves per-group n_rows
    per_type = {r["event_type"]: r["n_rows"] for r in sketch_union(rollup, ["event_type"]).collect()}
    truth = {r["event_type"]: r["cnt"] for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert per_type == truth


def test_hll_sketch_agg_streaming_rollup(spark, tmp_path):
    """The sketch rollup works as a STREAMING aggregation: per-source HLL
    sketches accumulate across micro-batches; estimates land within the
    lg_k error band of the exact per-source distinct count."""
    import json

    land = tmp_path / "events"
    land.mkdir()

    def shard(name, rows):
        (land / name).write_text(
            "\n".join(json.dumps({"src": s, "user": u}) for s, u in rows) + "\n"
        )

    shard("b0.json", [("a", f"u{i}") for i in range(50)] + [("b", f"v{i}") for i in range(20)])

    stream = (
        spark.readStream.schema("src string, user string")
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
    )
    agg = stream.groupBy("src").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12))).alias("est")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: 25 repeat users + 30 new for source a
        shard("b1.json", [("a", f"u{i}") for i in range(25, 80)])
        q.processAllAvailable()
        got = {r.src: r.est for r in spark.sql("SELECT * FROM hll_stream").collect()}
        assert abs(got["a"] - 80) <= max(5 * 0.0163 * 80, 3)
        assert abs(got["b"] - 20) <= max(5 * 0.0163 * 20, 3)
    finally:
        q.stop()
