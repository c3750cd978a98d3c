"""Full-registry scaling study (VERDICT r4 #2): run EVERY registry entry
(the 50 driver queries + the EXTRA_QUERIES fold) at sf0.1 and at the
fabricated sf1 (×10) fixture, and record per-query wall time + scaling
ratio.  A ratio ≤ ~10 is linear-or-better on ×10 data; anything well
above that is a superlinear shape that would not survive 100 TB and must
be root-caused (BASELINE.md records the findings).

Usage:
    python scripts/full_registry_scaling.py [OUT_JSON]
Requires `.benchdata/sf1` (scripts/make_scaled_sf.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dbc_informed_socketcan_to_parquet_spark.queries import EXTRA_QUERIES, QUERIES  # noqa: E402
from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".benchdata", "sf1")


def time_query(spark, fn, sf_dir: str, passes: int = 2) -> float:
    samples = []
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata", "registry_scaling.json")
    if not os.path.isdir(SF1):
        raise SystemExit(f"missing {SF1}: run scripts/make_scaled_sf.py first")
    spark = get_spark("registry-scaling")
    # JVM warmup outside any timed region
    spark.read.parquet(f"{SF01}/lineitem.parquet").count()
    QUERIES["bitfield_decode"](spark, SF01).write.format("noop").mode("overwrite").save()

    all_queries = dict(QUERIES)
    for k, v in EXTRA_QUERIES.items():
        all_queries[f"extra:{k}"] = v

    results: dict[str, dict] = {}
    for i, (name, fn) in enumerate(all_queries.items(), 1):
        row: dict = {}
        try:
            row["sf01_s"] = time_query(spark, fn, SF01)
        except Exception as e:  # record, keep going
            row["sf01_err"] = f"{type(e).__name__}: {e}"[:300]
        try:
            row["sf1_s"] = time_query(spark, fn, SF1)
        except Exception as e:
            row["sf1_err"] = f"{type(e).__name__}: {e}"[:300]
        if "sf01_s" in row and "sf1_s" in row and row["sf01_s"] > 0:
            row["ratio"] = round(row["sf1_s"] / row["sf01_s"], 2)
        results[name] = row
        print(f"[{i}/{len(all_queries)}] {name}: {row}", flush=True)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    flagged = {k: v for k, v in results.items() if v.get("ratio", 0) > 12 or "sf1_err" in v or "sf01_err" in v}
    print(json.dumps({"n": len(results), "flagged": flagged}, indent=1))


if __name__ == "__main__":
    main()
