"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
collect-to-driver, no disk write skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbc_informed_socketcan_to_parquet_spark.queries import QUERIES  # noqa: E402
from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402

#: The performance-representative subset: the decode spine, the heavy
#: relational shapes, and the corpus operators (one per family).
HEADLINE = [
    "candump_parse",
    "bitfield_decode",
    "bucket_downsample_wide",
    "bucket_last",
    "pivot_wide",
    "forward_fill",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "top_k_per_group",
    "window_running",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "text_stats",
    "similarity_topk",
    "media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # Warm the JVM outside the timed region: file listing, codegen, and the
    # md5/regex/conv intrinsics the text queries lean on — bench measures
    # steady-state throughput, not first-call JIT compilation.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("bitfield_decode", "simhash_signatures"):
        QUERIES[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # min of 3 passes per query (r6; was 2): this host shows ±2× run-to-run
    # noise, and minhash_lsh_pairs see-sawed three rounds inside the noise
    # band at min-of-2 while its fast path was strictly improving — one
    # more draw collapses that (VERDICT r5 item 8).  A single bad draw
    # (GC pause, page-cache miss) should not be recorded as a regression —
    # min measures steady-state capability.  Cache is cleared between
    # passes so operators that .cache() intermediates (minhash_lsh_pairs'
    # signature table) are still measured cold.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    fast = _fast_path_timings(spark, sf_dir)
    corpus = _corpus_addition_timings(spark, sf_dir)
    fps = _decode_throughput(spark)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # r6 methodology: headline + fast-path entries are min-of-3 cold
        # passes (cache cleared between); corpus additions min-of-2;
        # decode throughput is median-of-5 after a JIT warm pass
        "methodology": "headline=min3-cold, fast_path=min3-cold, corpus=min2-cold, decode=median5-warm",
        "queries": timings,
        "sf": sf,
        "decode_frames_per_sec": fps,
        # xxhash64 production path for the hash-bound corpus operators —
        # same plans as the md5 (oracle-parity) headline entries above,
        # reported separately so `value` stays comparable across rounds
        "fast_path_queries": fast,
        # round-5 corpus additions, tracked per-round OUTSIDE the headline
        # sum for the same comparability reason
        "corpus_queries": corpus,
    }))


def _curate_run(docs):
    from dbc_informed_socketcan_to_parquet_spark.operators.curate import curate

    return lambda: curate(docs)


def _fast_path_timings(spark, sf_dir: str) -> dict[str, float]:
    """The hash-bound corpus operators on the xxhash60 fast path (what a
    production pipeline without a cross-engine oracle would run)."""
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import xxhash60
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        lsh_star_edges,
        minhash_dedup_pairs,
        minhash_signatures,
        simhash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict[str, float] = {}
    runs = {
        # identical knobs to the md5 headline entries (queries.py) so the
        # delta is purely the hash function
        "minhash_lsh_pairs_fast": lambda: minhash_dedup_pairs(
            docs, "doc_id", "text", num_perms=16, shingle_n=5, num_bands=4,
            threshold=0.5, seed=42, hash_fn=xxhash60,
        ),
        "simhash_signatures_fast": lambda: simhash(
            docs, "doc_id", "text", num_bits=16, shingle_n=4, hash_fn=xxhash60,
        ),
        # the O(bucket) near-dup graph (star edges, rep-verified) — the
        # scale path whose cost stays linear where the all-pairs list
        # above goes quadratic in boilerplate-clique size
        "minhash_star_edges_fast": lambda: lsh_star_edges(
            minhash_signatures(docs, "doc_id", "text", num_perms=16,
                               shingle_n=5, seed=42, hash_fn=xxhash60),
            "doc_id", num_bands=4, rows_per_band=4,
            num_perms=16, verify_threshold=0.5,
        ),
        # the flagship composition end-to-end (scrub → quality gate over
        # materialized stats → exact dedup → star clusters → canonical,
        # xxhash production path) — tracked so its trend is visible
        # per-round; NOT in the headline sum, so `value` stays
        # comparable across rounds
        "curate_e2e": _curate_run(docs),
    }
    for name, mk in runs.items():
        samples = []
        # 3 reps: at sf0.1 the hash is a minor cost post-fan-out, so the
        # md5-vs-xxhash delta is within host noise at min-of-2
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
    return out


def _corpus_addition_timings(spark, sf_dir: str) -> dict[str, float]:
    """The round-5 corpus operators (oracle registry entries), min of 2
    cold passes each — same protocol as the headline set."""
    from dbc_informed_socketcan_to_parquet_spark.queries import EXTRA_QUERIES

    out: dict[str, float] = {}
    for name in ("paragraph_dedup", "dedup_incremental", "lm_score",
                 "classifier_score", "frequent_ngrams",
                 "exact_substring_dedup", "importance_resample",
                 "fuzzy_contamination", "normalize_text",
                 "temperature_mix",
                 # r6 additions: the URL front door + trained-BPE counting
                 "url_canonical_dedup", "domain_cap", "bpe_token_count",
                 # r7 addition: trained multiclass language ID (train+score)
                 "lang_id_trained",
                 # r9 additions: HTML extraction + in-engine classifier GD,
                 # WARC ingest, CCNet partition, incremental near dedup
                 "extract_text", "classifier_train",
                 "warc_extract", "ppl_partition", "near_dedup_against",
                 "corpus_report",
                 # r9 second session: version diff + PII inventory
                 # (curate_audit's trend is implied by curate_e2e above)
                 "corpus_diff", "pii_report"):
        fn = EXTRA_QUERIES[name]
        samples = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
    return out


def _decode_throughput(spark, n_frames: int = 1_000_000) -> int:
    """candump-decode throughput: parse → known-id filter → 5-signal decode
    → 10 ms bucket last-value → noop, on a generated 1M-line log
    (the reference's ``--cache 10`` file-conversion workload)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.dbc.compiler import DecodeCompiler
    from dbc_informed_socketcan_to_parquet_spark.operators.bucket import bucket_downsample
    from dbc_informed_socketcan_to_parquet_spark.queries import _SYNTH_DBC
    from dbc_informed_socketcan_to_parquet_spark.sources.candump import read_candump

    log_dir = tempfile.mkdtemp(prefix="bench_canlog_")
    try:
        # ~1 kHz bus, 3 message ids, deterministic payloads
        lines = spark.range(n_frames).select(
            F.format_string(
                "(%d.%06d) vcan0 %X#%016X",
                F.lit(1_700_000_000) + F.expr("id div 1000"),
                (F.col("id") % 1000) * 1000,
                F.lit(0x100) + F.col("id") % 3,
                F.col("id") * F.lit(2654435761),
            ).alias("value")
        )
        lines.write.mode("overwrite").text(log_dir)

        comp = DecodeCompiler(_SYNTH_DBC)
        sig_cols = [s.column_name for _, s in _SYNTH_DBC.all_signals()]

        def run() -> None:
            frames = read_candump(spark, log_dir)
            wide = comp.decode_wide(frames, keep_cols=("Time_ms",), time_col="_e").drop("_e")
            out = bucket_downsample(wide, 10, signal_cols=sig_cols)
            out.write.format("noop").mode("overwrite").save()

        run()  # JIT warm pass — steady-state throughput is the figure of merit
        # median of 5 timed passes: this host shows ±2× run-to-run noise,
        # and recorded medians-of-3 still swung 177k-423k f/s across rounds
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            samples.append(time.perf_counter() - t0)
        return int(n_frames / sorted(samples)[2])
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
