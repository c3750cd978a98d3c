"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
collect-to-driver, no disk write skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES  # noqa: E402
from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402

#: The performance-representative subset: the decode spine, the heavy
#: relational shapes, and the corpus operators (one per family).
HEADLINE = [
    "candump_parse",
    "bitfield_decode",
    "bucket_downsample_wide",
    "bucket_last",
    "pivot_wide",
    "forward_fill",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "top_k_per_group",
    "window_running",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "text_stats",
    "similarity_topk",
    "media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # Warm the JVM outside the timed region: file listing, codegen, and the
    # md5/regex/conv intrinsics the text queries lean on — bench measures
    # steady-state throughput, not first-call JIT compilation.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("bitfield_decode", "simhash_signatures"):
        QUERIES[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
