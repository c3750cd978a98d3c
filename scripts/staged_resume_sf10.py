"""Staged-curate resume timings at sf10 (r11, VERDICT item 5 second
half — extends the r10 sf1 study: plain 40.5s / staged-cold 25.8s /
resume-complete 2.8s / partial-resume 10.3s).

At sf10 (500k synthetic docs, .benchdata/sf10) with CurateConfig
defaults, measures:
  1. staged COLD run (every boundary materialized to stage_dir)
  2. resume with ALL boundaries complete (pure load of the final one)
  3. resume after deleting the LAST boundary (recompute only the final
     stage from the prior boundary's parquet)

Prints one JSON line.  Usage:
  python scripts/staged_resume_sf10.py [SF_DIR] [WORK_DIR]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata", "sf10")
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/staged_resume_sf10"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from dbc_informed_socketcan_to_parquet_spark.operators.curate import (
        CurateConfig,
        curate,
    )
    from dbc_informed_socketcan_to_parquet_spark.session import get_spark

    spark = get_spark("staged_resume_sf10")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()
    cfg = CurateConfig()
    stage_dir = os.path.join(work, "stages")

    def timed(tag):
        t0 = time.perf_counter()
        n = curate(docs, config=cfg, stage_dir=stage_dir).count()
        return round(time.perf_counter() - t0, 1), n

    cold_s, n_out = timed("cold")
    resume_complete_s, n2 = timed("resume_complete")
    assert n2 == n_out

    boundaries = sorted(d for d in os.listdir(stage_dir) if d != "manifest.json")
    # delete the last NUMBERED pipeline boundary (near_dup), not an aux
    # table — the resume then recomputes exactly the final stage
    last = max(d for d in boundaries if d[:2].isdigit())
    shutil.rmtree(os.path.join(stage_dir, last))
    resume_last_s, n3 = timed("resume_last")
    assert n3 == n_out

    print(json.dumps({
        "sf_dir": sf_dir, "n_in": n_in, "n_out": n_out,
        "boundaries": boundaries, "recomputed_on_resume": last,
        "staged_cold_sec": cold_s,
        "resume_all_complete_sec": resume_complete_s,
        "resume_last_boundary_sec": resume_last_s,
    }))


if __name__ == "__main__":
    main()
