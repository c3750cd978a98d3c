"""One end-to-end PRODUCTION chain timed at sf10 (r12, VERDICT r11 item 7):

    WARC crawl segments  →  curate with the FULL decontamination triad
    (exact + near shingle doc-drop vs the eval corpus, embedding-cosine
    doc-drop, span-level verbatim scrub)  →  context-length chunking  →
    token-budget shard export — all driven from the COMMITTED recipe
    ``recipes/production_sf10.json`` via ``plans/recipe.run_recipe``.

Fixtures are derived deterministically from ``.benchdata/sf10``:

- **WARC segments**: each sf10 document wrapped as an HTML page inside a
  WARC/1.0 response record (one gzip member per record, 32 segment
  files — the Common Crawl layout the ``warc`` data source parallelizes
  over).  URL carries the source + original doc id.
- **eval corpus**: every 1000th document's EXTRACTED text (500 docs) —
  planted contamination, so every decon gate provably fires: the eval
  docs themselves are exact/near duplicates of corpus docs, and their
  embeddings match at cosine 1.0.
- **doc/eval embedding tables**: ``.benchdata/sf10/embeddings.parquet``
  re-keyed to the WARC-ingest ids (``xxhash64(record_id, url)``) on the
  doc side, original ids on the eval side.

Fixture build is UNTIMED and skipped when already on disk; the recipe
run is timed end-to-end and the summary (per-stage audit funnel + stage
row counts) prints as one JSON line for BASELINE.md.

Usage: python scripts/production_recipe_sf10.py [--rebuild]
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.path.join(REPO, ".benchdata", "sf10")
WORK = "/tmp/prod_recipe_sf10"
RECIPE = os.path.join(REPO, "recipes", "production_sf10.json")
N_SEGMENTS = 32


def _write_warc_partition(rows, out_dir: str):
    """One WARC segment per Spark partition: WARC/1.0 response records,
    one gzip member per record (the multi-member layout iter_warc_records
    streams)."""
    it = iter(rows)
    try:
        first = next(it)
    except StopIteration:
        return iter([])
    import itertools
    pid = first["pid"]
    path = os.path.join(out_dir, f"segment-{pid:05d}.warc.gz")
    n = 0
    with open(path, "wb") as raw:
        for row in itertools.chain([first], it):
            body = (
                f"<html><head><title>doc {row['doc_id']}</title></head>"
                f"<body><p>{row['text']}</p></body></html>"
            ).encode("utf-8")
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            url = f"https://{row['source']}.example.test/doc/{row['doc_id']}"
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:doc:{row['doc_id']}>\r\n"
                f"WARC-Target-URI: {url}\r\n"
                "WARC-Date: 2026-08-15T00:00:00Z\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            raw.write(gzip.compress(head + http + b"\r\n\r\n"))
            n += 1
    return iter([(pid, n)])


def build_fixtures(spark) -> None:
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        minhash_signatures,
        minhash_write,
    )
    from dbc_informed_socketcan_to_parquet_spark.operators.htmlops import extract_text
    from dbc_informed_socketcan_to_parquet_spark.sources.warc import read_warc

    os.makedirs(os.path.join(WORK, "warc"), exist_ok=True)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # 1. WARC segments (one gzip member per record, N_SEGMENTS files)
    out_dir = os.path.join(WORK, "warc")
    parts = (
        docs.repartition(N_SEGMENTS)
        .withColumn("pid", F.spark_partition_id())
        .select("pid", "doc_id", "text", "source")
    )
    wrote = parts.rdd.mapPartitions(
        lambda rows: _write_warc_partition(rows, out_dir)).collect()
    print(f"# fixtures: {sum(n for _, n in wrote)} docs in {len(wrote)} WARC segments",
          flush=True)

    # 2. the ingest-id mapping (xxhash64(record_id, url) — the recipe
    # ingest projection) + original doc id parsed back from the URL
    recs = read_warc(spark, out_dir).where(
        F.col("parse_ok") & F.col("text").isNotNull() & (F.col("http_status") == 200))
    mapping = recs.select(
        F.xxhash64("record_id", "url").alias("ingest_id"),
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("orig_id"),
        "text",
    )

    # 3. eval corpus: every 1000th doc's EXTRACTED text — exact planted
    # contamination against the post-extraction corpus text
    ev = mapping.filter(F.col("orig_id") % 1000 == 0)
    ev_txt = extract_text(ev, html_col="text", out_col="_ext").select(
        F.col("orig_id").alias("doc_id"), F.col("_ext").alias("text"))
    ev_txt.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(WORK, "eval_corpus.parquet"))

    # 4. eval signature store (near-dup decon gate; curate defaults)
    ev_docs = spark.read.parquet(os.path.join(WORK, "eval_corpus.parquet"))
    sig_dir = os.path.join(WORK, "eval_sigs")
    shutil.rmtree(sig_dir, ignore_errors=True)
    minhash_write(
        minhash_signatures(ev_docs, "doc_id", "text", num_perms=16, shingle_n=5),
        sig_dir, num_perms=16, shingle_n=5,
    )

    # 5. embeddings re-keyed to ingest ids (doc side) / original (eval)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    (mapping.join(emb, mapping["orig_id"] == emb["vec_id"])
     .select(F.col("ingest_id").alias("vec_id"), "embedding")
     .write.mode("overwrite").parquet(os.path.join(WORK, "doc_embeddings.parquet")))
    (emb.join(ev.select("orig_id"), emb["vec_id"] == F.col("orig_id"))
     .select("vec_id", "embedding")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(WORK, "eval_embeddings.parquet")))
    print("# fixtures: eval corpus / sig store / embedding tables written", flush=True)


def build_clf_fixture(spark) -> None:
    """r14 (VERDICT r13 item 6): a persisted quality classifier for the
    recipe's SELECT stage — trained in-engine on every 50th sf10 doc
    with a deterministic length proxy label (token count ≥ 100), the
    shape a production run has after a human-labeled bootstrap.  Fixture
    build is untimed; the recipe run pays SCORING, which is the real
    per-curation cost."""
    from pyspark.sql import functions as F

    from dbc_informed_socketcan_to_parquet_spark.functions.text import tokens
    from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
        classifier_train,
        classifier_write,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    labeled = docs.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id", "text",
        (F.size(tokens(F.col("text"))) >= 100).cast("int").alias("label"),
    )
    weights, bias = classifier_train(
        labeled, num_features=1 << 15, n_iters=3, lr=2.0)
    classifier_write(weights, os.path.join(WORK, "clf_model"),
                     num_features=1 << 15, bias=bias)
    print("# fixtures: classifier model written", flush=True)


def main() -> None:
    from dbc_informed_socketcan_to_parquet_spark.plans.recipe import run_recipe
    from dbc_informed_socketcan_to_parquet_spark.session import get_spark

    spark = get_spark("production_recipe_sf10")
    rebuild = "--rebuild" in sys.argv
    done_marker = os.path.join(WORK, "doc_embeddings.parquet", "_SUCCESS")
    if rebuild or not os.path.exists(done_marker):
        t0 = time.perf_counter()
        build_fixtures(spark)
        print(f"# fixture build (untimed setup): {time.perf_counter()-t0:.0f}s",
              flush=True)
    clf_marker = os.path.join(WORK, "clf_model", "meta", "_SUCCESS")
    if rebuild or not os.path.exists(clf_marker):
        t0 = time.perf_counter()
        build_clf_fixture(spark)
        print(f"# classifier fixture (untimed setup): "
              f"{time.perf_counter()-t0:.0f}s", flush=True)

    with open(RECIPE) as f:
        recipe = json.load(f)
    recipe.pop("_comment", None)
    for stale in ("curated.parquet", "selected.parquet", "chunks.parquet",
                  "shards", "resume"):
        shutil.rmtree(os.path.join(WORK, stale), ignore_errors=True)

    t0 = time.perf_counter()
    summary = run_recipe(spark, recipe)
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({"metric": "production_recipe_sf10_wall", "value": wall,
                      "unit": "sec", "summary": summary}))

    # r14 (VERDICT r13 item 5): RESUMED timing — simulate an export-stage
    # death (shards gone, marker gone, everything upstream committed) and
    # re-run the same recipe; the resume should pay only the export.
    shutil.rmtree(os.path.join(WORK, "shards"), ignore_errors=True)
    marker = os.path.join(WORK, "resume", "export.done.json")
    if os.path.exists(marker):
        os.remove(marker)
    t0 = time.perf_counter()
    summary2 = run_recipe(spark, recipe)
    wall2 = round(time.perf_counter() - t0, 1)
    print(json.dumps({
        "metric": "production_recipe_sf10_resumed_export_wall",
        "value": wall2, "unit": "sec",
        "export": summary2.get("export"),
        "matches_full_run": summary2.get("export") == summary.get("export"),
    }))


if __name__ == "__main__":
    main()
