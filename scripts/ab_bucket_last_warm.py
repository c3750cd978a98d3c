"""JVM-WARM A/B for the bucket_last watch (r15, VERDICT r14 item 7).

The r14 drift A/B read bucket_last 1.39x tree-side (0.355 s r12 tree vs
0.493 s HEAD, 0.14 s absolute) with its code path diff-empty.  The
hypothesis left open: JVM/codegen PROFILE shift from the larger module —
the r14 runner warmed codegen with bitfield_decode, so bucket_last's
first sample paid its OWN codegen compile, and a bigger tree compiles
more.  This variant warms with THE ENTRY ITSELF (one untimed pass) and
times min-of-5 warm passes per fresh subprocess, alternating trees —
if the gap closes warm, the watch closes as codegen-profile noise; if
it persists, there is a real regression to find.

Usage: python scripts/ab_bucket_last_warm.py [r12_ref] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R12_REF = sys.argv[1] if len(sys.argv) > 1 else "46cf3ea"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
WORKTREE = os.path.join(REPO, ".ab_r12")
ENTRY = "bucket_last"

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES
from dbc_informed_socketcan_to_parquet_spark.session import get_spark

name = sys.argv[2]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-bucket-warm")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
fn = QUERIES[name]
# JVM-warm: one UNTIMED pass of the entry itself compiles its own
# codegen/whole-stage classes before any sample is taken
spark.catalog.clearCache()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
samples = []
for _ in range(5):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples.append(time.perf_counter() - t0)
print("ABRESULT " + json.dumps({"min": round(min(samples), 3),
                                "all": [round(s, 3) for s in samples]}))
"""


def _mc_probe() -> float:
    sys.path.insert(0, REPO)
    import bench

    return bench._mc_probe()["mean_ratio"]


def _run_tree(tree: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, ENTRY],
        capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"runner failed on {tree}: {proc.stderr[-2000:]}")


def main() -> None:
    if not os.path.isdir(WORKTREE):
        subprocess.run(["git", "worktree", "add", WORKTREE, R12_REF],
                       cwd=REPO, check=True, capture_output=True)
    mc_start = _mc_probe()
    runs = {"r12": [], "head": []}
    for i in range(REPS):
        order = [("r12", WORKTREE), ("head", REPO)]
        if i % 2:
            order.reverse()
        for tag, tree in order:
            runs[tag].append(_run_tree(tree))
            time.sleep(2.0)
    mc_end = _mc_probe()
    a = [r["min"] for r in runs["r12"]]
    b = [r["min"] for r in runs["head"]]
    print(json.dumps({
        "metric": "ab_bucket_last_warm", "entry": ENTRY, "reps": REPS,
        "r12_ref": R12_REF, "mc_probe": {"start": mc_start, "end": mc_end},
        "r12_min": min(a), "head_min": min(b),
        "r12_all": a, "head_all": b,
        "head_over_r12_min_ratio": round(min(b) / min(a), 3),
        "head_over_r12_median_ratio": round(
            statistics.median(b) / statistics.median(a), 3),
    }))


if __name__ == "__main__":
    main()
