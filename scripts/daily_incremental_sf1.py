"""Two-day DAILY-INCREMENTAL recipe timing at sf1 (r15, VERDICT r14
item 5): day 1 curates half the sf1 corpus and builds the vs-history
stores (content-digest table, MinHash signature store, IVF embedding
index); day 2 curates the other half — with ~2% planted exact dups,
~2% planted near dups, and ~1% planted embedding twins of day 1 — so
every vs-history gate fires at corpus scale, then appends its own
survivors back into the stores.

Fixture build (untimed, deterministic):

- day 1 = even doc_ids, day 2 = odd doc_ids of ``.benchdata/sf1``;
- day-2 plants via doc_id-1 (an even, day-1 id): text replaced verbatim
  (exact), text + one appended token (near), embedding value copied
  (semantic twin);
- embeddings split by the same parity (the sf fixtures embed a subset
  of docs; un-embedded docs pass the semantic gate, as in production).

Timed: the two ``run_recipe`` calls, each end-to-end (ingest → gates →
out → history-store append), audit on — the operating posture.  Prints
ONE JSON line for BASELINE.md.

Usage: python scripts/daily_incremental_sf1.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.path.join(REPO, ".benchdata", "sf1")
WORK = "/tmp/daily_incr_sf1"


def build_fixtures(spark) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    even.write.mode("overwrite").parquet(f"{WORK}/day1.parquet")

    prev = even.select((F.col("doc_id") + 1).alias("doc_id"),
                       F.col("text").alias("_prev"))
    slot = F.pmod(F.col("doc_id"), F.lit(100))
    day2 = (
        odd.join(prev, "doc_id", "left")
        .withColumn(
            "text",
            F.when(F.col("_prev").isNotNull() & (slot < 2), F.col("_prev"))
            .when(F.col("_prev").isNotNull() & (slot < 4),
                  F.concat(F.col("_prev"), F.lit(" znearplanttoken")))
            .otherwise(F.col("text")),
        )
        .drop("_prev")
    )
    day2.write.mode("overwrite").parquet(f"{WORK}/day2.parquet")

    e_even = emb.filter(F.col("vec_id") % 2 == 0)
    e_odd = emb.filter(F.col("vec_id") % 2 == 1)
    e_even.write.mode("overwrite").parquet(f"{WORK}/day1_emb.parquet")
    eprev = e_even.select((F.col("vec_id") + 1).alias("vec_id"),
                          F.col("embedding").alias("_pv"))
    vslot = F.pmod(F.col("vec_id"), F.lit(100))
    e2 = (
        e_odd.join(eprev, "vec_id", "left")
        .withColumn(
            "embedding",
            F.when(F.col("_pv").isNotNull() & (vslot == 5), F.col("_pv"))
            .otherwise(F.col("embedding")),
        )
        .drop("_pv")
    )
    e2.write.mode("overwrite").parquet(f"{WORK}/day2_emb.parquet")


def mk_recipe(day: int) -> dict:
    return {
        "ingest": {"format": "parquet",
                   "path": f"{WORK}/day{day}.parquet"},
        "curate": {"min_quality": 0.0, "min_chars": 1,
                   "embeddings": f"{WORK}/day{day}_emb.parquet",
                   "decon_id_col": "vec_id",
                   "against_cosine": 0.95},
        "out": f"{WORK}/day{day}_kept.parquet",
        "history": {"digests": f"{WORK}/stores/digests.parquet",
                    "sigs": f"{WORK}/stores/sig_store",
                    "embeddings_index": f"{WORK}/stores/ivf_idx",
                    "num_clusters": 64},
        "audit": True,
    }


def main() -> None:
    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import run_recipe
    from dbc_informed_socketcan_to_parquet_spark.session import get_spark

    if not os.path.isdir(SF_DIR):
        raise SystemExit(f"{SF_DIR} missing — run scripts/make_scaled_sf.py")
    spark = get_spark("daily-incremental-sf1")
    shutil.rmtree(WORK, ignore_errors=True)
    build_fixtures(spark)

    t0 = time.perf_counter()
    s1 = run_recipe(spark, mk_recipe(1))
    day1_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    s2 = run_recipe(spark, mk_recipe(2))
    day2_sec = round(time.perf_counter() - t0, 2)

    funnel = {st["stage"]: st["dropped"] for st in s2["audit"]}
    print(json.dumps({
        "metric": "daily_incremental_recipe_sf1",
        "day1_sec": day1_sec, "day2_sec": day2_sec,
        "day1_docs": s1["ingest"]["n_docs"],
        "day1_kept": s1["curate"]["n_docs"],
        "day2_docs": s2["ingest"]["n_docs"],
        "day2_kept": s2["curate"]["n_docs"],
        "day2_against_exact_dropped": funnel.get("against_exact", 0),
        "day2_against_near_dropped": funnel.get("against_near", 0),
        "day2_against_semantic_dropped": funnel.get("against_semantic", 0),
        "day1_history": s1["history"], "day2_history": s2["history"],
    }, default=str))


if __name__ == "__main__":
    main()
