"""Same-host alternating A/B for arbitrary bench entries between the
pre-optimization r15 commit and HEAD.

The end-of-round bench draw was host-degraded (mc start 1.358, 40
probe-gated retries) and inflated UNTOUCHED entries 1.1-1.5x, so
per-entry final-vs-before ratios cannot attribute the checkpoint
commits' effect.  Method identical to scripts/ab_drift.py: check the
pre-optimization tree into a worktree, run the named entries in fresh
subprocesses ALTERNATING between the trees (A,B,B,A,... order flipped
per round so slow drifts penalize both symmetrically), min-of-3 per
subprocess, mc-probed at both ends.

Usage: python scripts/ab_r15_entries.py <ref> <entry,entry,...> [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = sys.argv[1] if len(sys.argv) > 1 else "aeb5a25"
ENTRIES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["fuzzy_contamination"]
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
WORKTREE = os.path.join(REPO, f".ab_{REF}")

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES, EXTRA_QUERIES
from dbc_informed_socketcan_to_parquet_spark.session import get_spark

entries = json.loads(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-r15")
# same warm protocol as bench.py: listing + codegen + md5 intrinsics
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
QUERIES["bitfield_decode"](spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for name in entries:
    fn = QUERIES.get(name) or EXTRA_QUERIES[name]
    samples = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    out[name] = round(min(samples), 3)
print("ABRESULT " + json.dumps(out))
"""


def _mc_probe() -> float:
    sys.path.insert(0, REPO)
    import bench

    return bench._mc_probe()["mean_ratio"]


def _run_tree(tree: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, json.dumps(ENTRIES)],
        capture_output=True, text=True, env=dict(os.environ), timeout=2400,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"runner failed on {tree}: {proc.stderr[-2000:]}")


def main() -> None:
    if not os.path.isdir(WORKTREE):
        subprocess.run(["git", "worktree", "add", WORKTREE, REF],
                       cwd=REPO, check=True, capture_output=True)
    mc_start = _mc_probe()
    runs = {"pre": [], "head": []}
    for i in range(REPS):
        order = [("pre", WORKTREE), ("head", REPO)]
        if i % 2:
            order.reverse()
        for tag, tree in order:
            runs[tag].append(_run_tree(tree))
            time.sleep(2.0)
    mc_end = _mc_probe()

    report = {"metric": "ab_r15_pre_vs_head", "reps": REPS, "ref": REF,
              "mc_probe": {"start": mc_start, "end": mc_end},
              "entries": {}}
    for name in ENTRIES:
        a = [r[name] for r in runs["pre"]]
        b = [r[name] for r in runs["head"]]
        report["entries"][name] = {
            "pre_min": min(a), "head_min": min(b),
            "pre_all": a, "head_all": b,
            "head_over_pre_min_ratio": round(min(b) / min(a), 3),
            "head_over_pre_median_ratio": round(
                statistics.median(b) / statistics.median(a), 3),
        }
    ratios = [e["head_over_pre_min_ratio"] for e in report["entries"].values()]
    report["summary_min_ratio_mean"] = round(sum(ratios) / len(ratios), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
