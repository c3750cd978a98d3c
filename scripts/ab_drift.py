"""Same-host A/B for the r13 'uniform 1.1-1.4x drift on untouched
entries' residual (r14, VERDICT r13 item 1c).

Question: did the 1.1-1.4x inflation of UNTOUCHED bench entries between
the r12 and r13 quiet bands come from the HOST CLASS or from something
the harness/code changed?  Method: check out the r12-close tree
(46cf3ea) into a git worktree, then run a fixed set of entries whose
code did not change between r12 and r13 — the decode spine + one
relational + one hash-bound — ALTERNATING between the two trees
(A, B, A, B, ...), each run in a FRESH subprocess (own JVM, identical
session config), each pass single-thread-probe-gated and the whole
experiment mc-probed at both ends.  Uniform inflation that follows the
HOST (both trees equally slow/fast per round-trip) is host class;
inflation that follows the TREE is a harness/code regression.

Usage: python scripts/ab_drift.py [r12_ref] [reps]
Writes one JSON line with per-tree, per-entry min/median and the
paired per-alternation ratios.
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

#: entries untouched between r12 and r13 (diff-verified by the r13
#: judge for candump_parse; the others are decode/relational spine
#: files with no r13 commits)
ENTRIES = ["candump_parse", "bitfield_decode", "bucket_last",
           "tpch_q1_pricing_summary", "text_stats"]

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES
from dbc_informed_socketcan_to_parquet_spark.session import get_spark

entries = json.loads(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-drift")
# same warm protocol as bench.py: listing + codegen + md5 intrinsics
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
QUERIES["bitfield_decode"](spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for name in entries:
    fn = QUERIES[name]
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
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, json.dumps(ENTRIES)],
        capture_output=True, text=True, env=env, timeout=1800,
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
        # alternate, r12 first on even rounds, HEAD first on odd — a
        # slow drift then penalizes both trees symmetrically
        order = [("r12", WORKTREE), ("head", REPO)]
        if i % 2:
            order.reverse()
        for tag, tree in order:
            runs[tag].append(_run_tree(tree))
            time.sleep(2.0)
    mc_end = _mc_probe()

    report = {"metric": "ab_drift_r12_vs_head", "reps": REPS,
              "r12_ref": R12_REF,
              "mc_probe": {"start": mc_start, "end": mc_end},
              "entries": {}}
    for name in ENTRIES:
        a = [r[name] for r in runs["r12"]]
        b = [r[name] for r in runs["head"]]
        report["entries"][name] = {
            "r12_min": min(a), "head_min": min(b),
            "r12_all": a, "head_all": b,
            "head_over_r12_min_ratio": round(min(b) / min(a), 3),
            "head_over_r12_median_ratio": round(
                statistics.median(b) / statistics.median(a), 3),
        }
    ratios = [e["head_over_r12_min_ratio"] for e in report["entries"].values()]
    report["summary_min_ratio_mean"] = round(sum(ratios) / len(ratios), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
