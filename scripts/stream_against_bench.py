"""Throughput evidence for the r10 streaming vs-history gates (r11,
VERDICT item 5): drain the sf1 documents table (50k docs) as a JSONL
landing dir through ``stream-curate`` with

  (a) the exact vs-history gate   (``against_path``      -> streaming_dedup_against)
  (b) the near vs-history gate    (``against_sigs_path`` -> streaming_near_dedup_against)
  (c) both gates together

against a HISTORY several times the batch: key-shifted copies of sf1
— overlap mode: 10 copies, copy 0 verbatim (so the whole batch is
genuinely in history and both gates do full drop work), copies 1-9
letter-rotated; disjoint mode: 7 copies at shifts 10..16, one shift
each (r12, ADVICE r11: only 7 shifts in 10..25 stay disjoint from the
batch's 0..9 rotation band, and repeating shifts internally duplicated
~30% of the old "10x" history, inflating signature-store buckets
relative to a genuinely disjoint history).  The
history parquet feeds the exact gate; its ``minhash_write`` signature
store (num_perms=16, shingle_n=5, the curate defaults) feeds the near
gate.

Setup (history build + signing) is untimed; each drain is a fresh
checkpoint so nothing is resumed.  Prints one JSON line per
configuration: {"gate": ..., "n_in": ..., "n_out": ..., "wall_sec":
..., "docs_per_sec": ...} — the numbers BASELINE.md records next to
the r6 streaming-curate tier (1 631 docs/s full chain).

Usage: python scripts/stream_against_bench.py [SF_DIR] [WORK_DIR]
Defaults: SF_DIR=<repo>/.benchdata/sf1, WORK_DIR=/tmp/stream_against_bench
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_COPIES = 10          # overlap mode: shifts 0..9 (copy 0 verbatim)
N_COPIES_DISJOINT = 7   # disjoint mode: shifts 10..16, each used ONCE
KEY_OFFSET = 100_000_000


def build_history(spark, sf_dir: str, work: str, overlap: bool) -> tuple[str, str]:
    """500k-doc history parquet + its MinHash signature store.

    ``overlap=True``: copy 0 is the batch VERBATIM (the catch-up-drain
    shape — both gates drop everything, downstream stages go idle).
    ``overlap=False``: every copy letter-rotated (shifts 1..10), zero
    batch overlap — the steady-state shape, isolating the gates' check
    cost (nothing drops, the full chain still runs)."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        minhash_write,
    )

    tag = "overlap" if overlap else "disjoint"
    hist_path = os.path.join(work, f"history_{tag}.parquet")
    store_path = os.path.join(work, f"sig_store_{tag}")
    if os.path.exists(os.path.join(store_path, "_meta")) and os.path.exists(hist_path):
        return hist_path, store_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = []
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    for i in range(N_COPIES if overlap else N_COPIES_DISJOINT):
        # disjoint shifts live in 10..16: the sf1 fixture is ITSELF
        # rotation-built from sf0.1 with shifts 0..9 (make_scaled_sf),
        # so history shift h collides with batch copy j whenever
        # h + j' = j (mod 26) for batch/history copy indices j, j' in
        # 0..9 — only h in 10..16 keeps h+j' inside 10..25, disjoint
        # from the batch's 0..9 band
        # one shift per copy: repeating a shift would internally
        # duplicate history content (same text, shifted ids) and inflate
        # signature-store buckets vs a genuinely disjoint history
        shift = i if overlap else 10 + i
        c = docs.select(
            (F.col("doc_id") + F.lit(i * KEY_OFFSET)).alias("doc_id"),
            (F.col("text") if shift % 26 == 0 else F.translate(
                F.col("text"),
                lower + upper,
                lower[shift:] + lower[:shift] + upper[shift:] + upper[:shift],
            )).alias("text"),
        )
        copies.append(c)
    hist = copies[0]
    for c in copies[1:]:
        hist = hist.unionAll(c)
    hist.write.mode("overwrite").parquet(hist_path)

    hist_on_disk = spark.read.parquet(hist_path)
    sigs = minhash_signatures(hist_on_disk, "doc_id", "text",
                              num_perms=16, shingle_n=5, seed=42)
    minhash_write(sigs, store_path, num_perms=16, shingle_n=5, seed=42)
    return hist_path, store_path


def build_landing(spark, sf_dir: str, work: str) -> tuple[str, int]:
    from pyspark.sql import functions as F

    landing = os.path.join(work, "landing")
    if not os.path.exists(landing):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        (docs.select(F.to_json(F.struct("doc_id", "text", "lang", "source",
                                        "n_chars")).alias("value"))
         .repartition(32).write.text(landing))
    n = spark.read.text(landing).count()
    return landing, n


def drain(spark, landing: str, work: str, tag: str, **gates) -> dict:
    from dbc_informed_socketcan_to_parquet_spark.streaming.curate import (
        run_streaming_curate,
    )

    out = os.path.join(work, f"out_{tag}")
    ckpt = os.path.join(work, f"ckpt_{tag}")
    for p in (out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.perf_counter()
    queries = run_streaming_curate(
        spark, landing, out, ckpt,
        min_chars=32, min_quality=0.0, watermark="1 hour",
        available_now=True, max_files_per_trigger=64, **gates,
    )
    for q in queries:
        q.awaitTermination()
    wall = time.perf_counter() - t0
    n_out = spark.read.parquet(out).count()
    return {"gate": tag, "n_out": n_out, "wall_sec": round(wall, 1)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata", "sf1")
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_against_bench"
    os.makedirs(work, exist_ok=True)

    from dbc_informed_socketcan_to_parquet_spark.session import get_spark

    spark = get_spark("stream_against_bench")
    t0 = time.perf_counter()
    landing, n_in = build_landing(spark, sf_dir, work)
    print(f"# setup: landing ({n_in} docs) in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    runs = [("baseline_no_against", {})]
    for overlap in (False, True):
        t0 = time.perf_counter()
        hist_path, store_path = build_history(spark, sf_dir, work, overlap)
        mult = N_COPIES if overlap else N_COPIES_DISJOINT
        print(f"# setup: history {mult}x (overlap={overlap}) in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        sfx = "overlap" if overlap else "disjoint"
        runs += [
            (f"against_exact_{sfx}", {"against_path": hist_path}),
            (f"against_near_{sfx}", {"against_sigs_path": store_path,
                                     "against_jaccard": 0.5,
                                     "against_num_bands": 4}),
            (f"against_both_{sfx}", {"against_path": hist_path,
                                     "against_sigs_path": store_path,
                                     "against_jaccard": 0.5,
                                     "against_num_bands": 4}),
        ]
    for tag, gates in runs:
        # min of 2 fresh-checkpoint drains: the first drain after setup
        # pays page-cache cold + codegen (measured 54.5s vs 13.2s for
        # identical baseline drains) — min measures steady-state
        r1 = drain(spark, landing, work, tag, **gates)
        r2 = drain(spark, landing, work, tag, **gates)
        r = min((r1, r2), key=lambda x: x["wall_sec"])
        assert r1["n_out"] == r2["n_out"]
        r["n_in"] = n_in
        r["docs_per_sec"] = int(n_in / r["wall_sec"])
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
