"""Quiet-machine remeasure of individual tail_scaling entries, patching
an existing REGISTRY_SCALING json in place.

The r7 study recorded two numbers its own prose supersedes:
`semantic_dedup_prod` at sf10 was measured BEFORE the assign-kernel fix
landed (266 s; post-fix 10.9 s per BASELINE.md), and
`ngram_jaccard_pairs` at sf10 overlapped a concurrent pytest run
(215.7 s; quiet remeasure 153.7 s).  The committed JSON should carry
the post-fix, quiet numbers the prose cites — rerun just those entries:

    python scripts/remeasure_tail.py REGISTRY_SCALING_r7.json \
        semantic_dedup_prod ngram_jaccard_pairs
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.tail_scaling import SF_POINTS, _resolve, time_entry  # noqa: E402

from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, names = sys.argv[1], sys.argv[2:]
    with open(out_path) as f:
        payload = json.load(f)
    spark = get_spark("tail-remeasure")
    spark.read.parquet(f"{SF_POINTS['sf01']}/lineitem.parquet").count()  # warmup
    for name in names:
        fn = _resolve(name)
        row: dict = {}
        for point, passes in (("sf01", 2), ("sf1", 2), ("sf10", 1)):
            row[f"{point}_s"] = time_entry(spark, fn, SF_POINTS[point], passes)
        row["ratio_x10"] = round(row["sf1_s"] / row["sf01_s"], 2)
        row["ratio_x100_decade2"] = round(row["sf10_s"] / row["sf1_s"], 2)
        row["remeasured"] = "quiet machine, post-fix code (r7)"
        payload["entries"][name] = row
        print(f"{name}: {row}", flush=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
