"""Core-scaling study at sf1 (r16, VERDICT r15 item 5): the r15/r16
parallelization fixes (fan-out before explodes/kernels, tokens-once
projections) are plan-proven, but at sf0.1 the bench is job-setup-bound
and 8-core vs 32-core ratios sit ~1 — the sf0.1 numbers CANNOT show that
the fixes actually parallelize.  This runs the touched lanes on the sf1
fixture (scripts/make_scaled_sf.py) at 8 and at 32 cores in FRESH
subprocesses (one JVM per core count) and records low/high-core ratios:
a ratio meaningfully above 1 at sf1 is the scaling evidence the sf0.1
bench structurally cannot produce.

Usage: python scripts/core_scaling_r16.py [OUT_JSON] [entry,entry,...]
Writes plans/r16/core_scaling_sf1.json by default.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".benchdata", "sf1")

#: the lanes the r15/r16 rounds parallelized or rewrote (decode spine,
#: chunk/extract, LM/classifier, dedup sign passes, DSIR featurize)
DEFAULT_ENTRIES = [
    "candump_parse", "bitfield_decode", "bucket_downsample_wide",
    "chunk_documents", "extract_text", "text_stats",
    "simhash_signatures", "minhash_lsh_pairs",
    "lm_score", "ppl_partition", "classifier_train", "classifier_score",
    "frequent_ngrams", "warc_extract", "normalize_text",
    "importance_resample", "decon_report", "fuzzy_contamination",
    "near_dedup_against", "vocab_coverage",
]

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1]); os.chdir(sys.argv[1])
from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES, EXTRA_QUERIES
from dbc_informed_socketcan_to_parquet_spark.session import get_spark
entries = json.loads(sys.argv[2]); sf_dir = sys.argv[3]
spark = get_spark("core-scaling")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
QUERIES["bitfield_decode"](spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for name in entries:
    fn = QUERIES.get(name) or EXTRA_QUERIES[name]
    samples = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    out[name] = round(min(samples), 3)
print("SCALING " + json.dumps(out))
"""


def run_at(cpus: int, entries: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, REPO, json.dumps(entries), SF1],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING "):
            return json.loads(line[len("SCALING "):])
    raise RuntimeError(f"runner failed at cpus={cpus}: {proc.stderr[-2000:]}")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "plans", "r16", "core_scaling_sf1.json")
    entries = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_ENTRIES
    # alternate 8/32/8/32 so slow host drift penalizes both symmetrically
    runs = {8: [], 32: []}
    for i in range(2):
        for cpus in ((8, 32) if i % 2 == 0 else (32, 8)):
            runs[cpus].append(run_at(cpus, entries))
    report = {"metric": "core_scaling_sf1", "sf_dir": SF1, "reps": 2,
              "entries": {}}
    for name in entries:
        lo = min(r[name] for r in runs[8])
        hi = min(r[name] for r in runs[32])
        report["entries"][name] = {
            "c8_min_sec": lo, "c32_min_sec": hi,
            "c8_over_c32": round(lo / hi, 3) if hi else None,
        }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
