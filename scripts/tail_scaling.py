"""Two-decade scaling study for the expensive tail (VERDICT r6 #1):
run the most expensive registry entries + the e2e compositions at
sf0.1 → sf1 (×10) → sf10 (×100) and record per-point wall time and the
per-decade ratios.  Superlinear terms that hide at ×10 (state growth,
broadcast limits, driver-side tables) show up as a second-decade ratio
well above the 10× data growth.

Entry selection: the top of REGISTRY_SCALING_r6 by sf1 cost, plus
curate_e2e and export_training_shards (the two compositions a
production pipeline actually ships), plus the r7 lang_id_trained.

Usage:
    python scripts/tail_scaling.py [OUT_JSON] [--only name1,name2]
Requires `.benchdata/sf1` and `.benchdata/sf10`
(scripts/make_scaled_sf.py 10 / 100).  ``--only`` restricts the run to
the named entries — the incremental mode for measuring entries added
after a full (multi-hour) sweep; merge the JSONs when recording.

Methodology: min of 2 cold passes at sf0.1/sf1; ONE cold pass at sf10
(recorded in the output — a second ×100 pass would double a multi-hour
budget for noise reduction the decade trend doesn't need).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbc_informed_socketcan_to_parquet_spark.queries import (  # noqa: E402
    EXTRA_QUERIES,
    QUERIES,
)
from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402

SF_POINTS = {
    "sf01": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".benchdata", "sf1"),
    "sf10": os.path.join(REPO, ".benchdata", "sf10"),
}

#: the r6 expensive tail (by sf1 cost) + the r7 trained-langid entry
TAIL = [
    "extra:classifier_score",
    "extra:importance_resample",
    "extra:lm_score",
    "semantic_dedup",
    "ngram_jaccard_pairs",
    "leakage_safe_split",
    "dedup_star_clusters",
    "extra:chunk_documents",
    "extra:frequent_ngrams",
    "benchmark_contamination",
    "minhash_lsh_pairs",
    "doc_fingerprints",
    "simhash_signatures",
    "similarity_ann_ivf",
    "extra:lang_id_trained",
    # r9 (VERDICT r8 #7): the r7 retrieval additions + the r9 tuner
    "extra:tfidf_topk",
    "extra:bm25_search",
    "extra:knn_classify",
    "extra:ann_tune",
    "extract_text",  # promoted to driver registry r10
    # r9 late additions: crawl ingest, CCNet partition, incremental near dedup
    "extra:warc_extract",
    "extra:ppl_partition",
    "near_dedup_against",  # promoted to driver registry r10
    "corpus_report",      # promoted to driver registry r10
    # r9 second session: observability + hygiene + versioning ops
    "extra:curate_audit",
    "extra:corpus_diff",
    "extra:pii_report",
    "extra:embedding_drift",
    "extra:dedup_keep_best",
    "extra:curate_dropped",
    "extra:decode_audit",
    # r10 additions: embedding-space contamination + tokenizer fertility
    "extra:semantic_contamination",
    "extra:tokenizer_fertility",
    # r12 additions: banding sweep, decon-triad report, vocab coverage,
    # Gopher repetition battery, n-gram novelty (the r11 flagships
    # remove_eval_spans/duplicate_spans/source_overlap/fertility_mix were
    # rotated into the driver 50 in r12 — measure them by bare name)
    "extra:lsh_band_tune",
    "extra:decon_report",
    # r13: the r12 flagships were rotated into the driver 50 — bare names
    "vocab_coverage",
    "gopher_repetition",
    "ngram_novelty",
    "cluster_size_report",
    "topic_report",
    "source_overlap",
    "duplicate_spans",
    "remove_eval_spans",
    "fertility_mix",
    # r13 additions (classifier-gating toolkit + token-budget selection
    # + the 300-doc sampled band-tune registry lane), all rotated into
    # the driver 50 in r14 — bare names (the old ``extra:`` forms are
    # gone from EXTRA_QUERIES); the select lane is PRESCORED since r14,
    # so its rows measure the operator, not the scoring fixture
    "calibration_report",
    "threshold_sweep",
    "select_to_token_budget",
    "lsh_band_tune_sampled_registry",
    # r14 additions: per-group budget selection + vs-history embedding
    # dedup.  The latter is measured in its PRODUCTION shape — a
    # FIXED-size daily batch probing a GROWING history index (linear in
    # history for a fixed batch).  The registry entry's batch grows with
    # the corpus (batch = corpus/3, the deterministic oracle fixture),
    # which is |batch|·|history|-quadratic at fixed split — an oracle
    # shape like the full band-tune lane, never the production posture.
    # r15: both promoted into the driver 50 — bare name for the select
    # lane; the driver semantic_dedup_against entry is now ITSELF the
    # fixed-batch production posture (vec_id < 450 slice), and the
    # growing-batch oracle shape lives on as EXTRA
    # semantic_dedup_against_full (never measured here)
    "select_by_group_budget",
    "semantic_dedup_against_fixed_batch",
    # r15 session 4: the same fixed-batch production posture against the
    # CODED history layouts — PQ (calibrated threshold) and SQ8
    # (unchanged threshold); cost adds quantizer training + encode at
    # index-build time and reconstruction inside probed partitions at
    # gate time, both of which must stay history-linear for fixed batch
    "semantic_dedup_against_fixed_batch_pq",
    "semantic_dedup_against_fixed_batch_sq8",
]


def _semantic_dedup_against_fixed_batch(spark, sf_dir):
    """Vs-history embedding dedup in the PRODUCTION posture (r14): a
    fixed ~700-vector daily batch probes an IVF index over the FULL
    remaining history — history grows 10× per decade, the batch does
    not, so cost should scale with the probed history fraction (index
    build dominates; the probe join is |batch|·|history|·nprobe/k)."""
    import tempfile

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivf_index_write,
        semantic_dedup_against,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hist = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") < 2100))
    path = tempfile.mkdtemp(prefix="sda_scale_")
    ivf_index_write(hist, path, dim=64, num_clusters=8, n_iters=2,
                    assign_kernel="pandas")
    return semantic_dedup_against(spark, path, batch, threshold=0.4, nprobe=4)


def _semantic_dedup_against_fixed_batch_pq(spark, sf_dir):
    """The fixed-batch posture against a CODES-ONLY IVF-PQ history index
    (r15): 16x8 — the calibrated production shape; threshold 0.3 sits
    under the measured reconstruction p05."""
    import tempfile

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        ivfpq_index_write,
        semantic_dedup_against,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hist = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") < 2100))
    path = tempfile.mkdtemp(prefix="sda_scale_pq_")
    ivfpq_index_write(hist, path, dim=64, num_clusters=8,
                      num_subspaces=16, bits=8, n_iters=2, pq_iters=3)
    return semantic_dedup_against(spark, path, batch, threshold=0.3, nprobe=4)


def _semantic_dedup_against_fixed_batch_sq8(spark, sf_dir):
    """The fixed-batch posture against a scalar-quantized history index
    (r15): near-lossless, unchanged threshold."""
    import tempfile

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.similarity import (
        semantic_dedup_against,
        sq8_index_write,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hist = emb.filter(F.col("vec_id") % 3 != 0)
    batch = emb.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") < 2100))
    path = tempfile.mkdtemp(prefix="sda_scale_sq_")
    sq8_index_write(hist, path, dim=64, num_clusters=8, n_iters=2)
    return semantic_dedup_against(spark, path, batch, threshold=0.4, nprobe=4)


def _lsh_band_tune_sampled(spark, sf_dir):
    """The production tuning posture: sweep on a deterministic ~50k-doc
    sample — cost should be ~flat per decade (the full lane's capped
    pair universe is transitionally superlinear, see the docstring)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import lsh_band_tune

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lsh_band_tune(docs, num_perms=16, shingle_n=5,
                         threshold=0.5, sample_docs=50_000)


def _curate_e2e(spark, sf_dir):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate(docs)


def _semantic_dedup_prod(spark, sf_dir):
    """The production-shaped semantic dedup: auto-scaled cluster count
    (blocks bounded at ~target_block vectors regardless of N) and a
    real near-dup threshold (0.9 — the registry entry's 0.25 passes
    ~2.3% of RANDOM 64-dim pairs, so its pair output is quadratic by
    fixture construction, not by operator design)."""
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        semantic_dedup_clusters,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup_clusters(
        emb, "vec_id", "embedding",
        threshold=0.9, num_clusters="auto", n_iters=2, dim=64, nprobe=2,
    )


def _export_shards(spark, sf_dir):
    """export_training_shards writes files (no noop sink) — wrapped so
    the timing harness treats the write as the action."""
    from dbc_informed_socketcan_to_parquet_spark.storage import export_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "n_tokens", F.size(F.split("text", r"\s+")).cast("long")
    )
    out = os.path.join(REPO, ".benchdata", "_tail_export")
    shutil.rmtree(out, ignore_errors=True)
    export_training_shards(docs, out, "n_tokens", 4096, num_shards=32)
    shutil.rmtree(out, ignore_errors=True)
    return None


def _resolve(name):
    if name == "lsh_band_tune_sampled":
        return _lsh_band_tune_sampled
    if name == "lsh_band_tune_sampled_registry":
        # the driver-registry lane (300-doc sample) — named apart from
        # the 50k posture wrapper above
        return QUERIES["lsh_band_tune_sampled"]
    if name == "semantic_dedup_against_fixed_batch":
        return _semantic_dedup_against_fixed_batch
    if name == "semantic_dedup_against_fixed_batch_pq":
        return _semantic_dedup_against_fixed_batch_pq
    if name == "semantic_dedup_against_fixed_batch_sq8":
        return _semantic_dedup_against_fixed_batch_sq8
    if name == "curate_e2e":
        return _curate_e2e
    if name == "export_training_shards":
        return _export_shards
    if name == "semantic_dedup_prod":
        return _semantic_dedup_prod
    if name.startswith("extra:"):
        return EXTRA_QUERIES[name.split(":", 1)[1]]
    return QUERIES[name]


def time_entry(spark, fn, sf_dir: str, passes: int) -> float:
    samples = []
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if df is not None:
            df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(min(samples), 3)


def main() -> None:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    out_path = argv[0] if argv else os.path.join(
        REPO, ".benchdata", "tail_scaling.json"
    )
    for k, p in SF_POINTS.items():
        if not os.path.isdir(p):
            raise SystemExit(f"missing {p}: run scripts/make_scaled_sf.py first")
    spark = get_spark("tail-scaling")
    spark.read.parquet(f"{SF_POINTS['sf01']}/lineitem.parquet").count()  # warmup

    names = TAIL + ["semantic_dedup_prod", "curate_e2e",
                    "export_training_shards", "lsh_band_tune_sampled"]
    if only is not None:
        unknown = only - set(names)
        if unknown:
            raise SystemExit(f"--only names not in the tail set: {sorted(unknown)}")
        names = [n for n in names if n in only]
    results: dict[str, dict] = {}
    for i, name in enumerate(names, 1):
        fn = _resolve(name)
        row: dict = {}
        for point, passes in (("sf01", 2), ("sf1", 2), ("sf10", 1)):
            try:
                row[f"{point}_s"] = time_entry(spark, fn, SF_POINTS[point], passes)
            except Exception as e:
                row[f"{point}_err"] = f"{type(e).__name__}: {e}"[:300]
                # a fatal executor error (e.g. heap OOM) kills the shared
                # local SparkContext and would poison every later entry —
                # recycle the session before moving on
                try:
                    alive = not spark.sparkContext._jsc.sc().isStopped()
                except Exception:
                    alive = False
                if not alive:
                    try:
                        spark.stop()
                    except Exception:
                        pass
                    spark = get_spark("tail-scaling")
                    spark.read.parquet(
                        f"{SF_POINTS['sf01']}/lineitem.parquet"
                    ).count()
                break
        if "sf01_s" in row and "sf1_s" in row and row["sf01_s"] > 0:
            row["ratio_x10"] = round(row["sf1_s"] / row["sf01_s"], 2)
        if "sf1_s" in row and "sf10_s" in row and row["sf1_s"] > 0:
            row["ratio_x100_decade2"] = round(row["sf10_s"] / row["sf1_s"], 2)
        results[name] = row
        print(f"[{i}/{len(names)}] {name}: {row}", flush=True)

    payload = {
        "methodology": "min2-cold at sf0.1/sf1, single cold pass at sf10",
        "data_growth_per_decade": 10,
        "entries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    flagged = {
        k: v for k, v in results.items()
        if v.get("ratio_x100_decade2", 0) > 12 or any("err" in kk for kk in v)
    }
    print(json.dumps({"n": len(results), "flagged": flagged}, indent=1))


if __name__ == "__main__":
    main()
