"""Physical-plan regression guards for the 100 TB design story.

These assert the properties that make the engine scale — filters reaching
the parquet scan, dimension sides broadcast, aggregations single-shuffle,
decode shuffle-free, top-k without a global sort — so an operator rewrite
that silently trades them away fails CI, not the cluster.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler
from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES, _SYNTH_DBC, _synth_frames

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


def n_exchanges(plan: str) -> int:
    """Shuffle exchanges in a formatted plan (each node prints once as
    '(k) Exchange'; BroadcastExchange is counted separately)."""
    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


def test_q1_filter_pushed_to_scan(spark):
    plan = plan_of(QUERIES["tpch_q1_pricing_summary"](spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # partial + final hash aggregation around exactly one exchange
    assert n_exchanges(plan) == 1


def test_q3_broadcasts_dimensions(spark):
    plan = plan_of(QUERIES["tpch_q3_shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    # top-10 must not be a global sort
    assert "TakeOrderedAndProject" in plan


def test_bucket_last_single_shuffle(spark):
    plan = plan_of(QUERIES["bucket_last"](spark, SF))
    assert n_exchanges(plan) == 1
    assert "partial_max_by" in plan          # map-side partial aggregation


def test_decode_is_shuffle_free_and_codegen(spark):
    frames = _synth_frames(spark, SF)
    comp = DecodeCompiler(_SYNTH_DBC)
    cols = [comp.phys_expr(s, m).alias(s.column_name) for m in _SYNTH_DBC.messages for s in m.signals]
    df = frames.select("event_id", *cols)
    assert "Exchange" not in plan_of(df)     # wide decode introduces no shuffle
    # simple mode marks codegen stages with '*(n)'
    assert "*(1)" in plan_of(df, "simple")


def test_order_limit_no_global_sort(spark):
    plan = plan_of(QUERIES["order_limit"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_known_id_filter_pushdown(spark):
    """The isin-form dictionary filter must reach the scan as an In filter."""
    ev = spark.read.parquet(f"{SF}/customer.parquet")
    filtered = ev.filter(F.col("c_custkey").isin([1, 2, 3]))
    plan = plan_of(filtered)
    assert "PushedFilters" in plan and "In(c_custkey" in plan
