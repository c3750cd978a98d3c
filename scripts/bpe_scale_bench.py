"""BPE at production vocab scale (VERDICT r6 #7): train 32k merges on
the sf1 corpus (50k docs), timing the two cost components separately —
the distributed word-count pass (the only corpus-sized stage; scales
with data) and the driver-side merge loop (fixed cost, independent of
corpus size once the word-type table is capped) — then measure encode
throughput against the 32k-rank table.

Usage: python scripts/bpe_scale_bench.py [NUM_MERGES] [SF_DIR]
Writes a JSON summary to stdout; BASELINE.md records the findings.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbc_informed_socketcan_to_parquet_spark.operators.bpe import (  # noqa: E402
    _train_merges,
    bpe_encode,
    bpe_word_counts,
)
from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".benchdata", "sf1")
    spark = get_spark("bpe-scale-bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    t0 = time.perf_counter()
    wc = bpe_word_counts(docs)
    top = wc.orderBy(F.desc("cnt"), F.col("w")).limit(50_000).collect()
    t_wordcount = time.perf_counter() - t0
    word_freq = {r["w"]: int(r["cnt"]) for r in top}

    # The synthetic fixture's vocabulary is tiny (~310 word types at sf1
    # — a small word pool times the per-copy cipher), so 32k merges
    # exhaust after <1k.  The driver merge loop's cost depends only on
    # the WORD-TYPE table (that is the whole point of the word-frequency
    # formulation), so to measure the production fixed cost we pad to
    # 50k Zipfian-weighted synthetic word types — deterministic, flagged
    # in the output (no silent substitution).
    augmented = False
    if len(word_freq) < 50_000:
        import hashlib

        augmented = True
        syll = ["ba", "ne", "to", "ri", "mul", "sta", "pre", "ver", "ing",
                "ed", "er", "un", "re", "con", "ly", "ment", "tion", "al",
                "ous", "ex", "qu", "zo", "fi", "gra", "ph"]
        i = 0
        while len(word_freq) < 50_000:
            h = hashlib.md5(f"w{i}".encode()).digest()
            w = "".join(syll[b % len(syll)] for b in h[: 3 + h[3] % 4])
            if w not in word_freq:
                word_freq[w] = max(1, 200_000 // (i + 1))
            i += 1

    t0 = time.perf_counter()
    merges = _train_merges(word_freq, num_merges)
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_tokens = (
        bpe_encode(docs, merges)
        .agg(F.sum(F.size("bpe_tokens")))
        .collect()[0][0]
    )
    t_encode = time.perf_counter() - t0

    print(json.dumps({
        "num_merges_requested": num_merges,
        "merges_learned": len(merges),
        "word_types": len(word_freq),
        "word_types_augmented": augmented,
        "n_docs": n_docs,
        "wordcount_s": round(t_wordcount, 2),
        "train_s": round(t_train, 2),
        "merges_per_s": round(len(merges) / t_train, 1),
        "encode_s": round(t_encode, 2),
        "encode_docs_per_s": round(n_docs / t_encode, 1),
        "encode_tokens_total": int(n_tokens),
        "encode_tokens_per_s": round(n_tokens / t_encode, 1),
    }))


if __name__ == "__main__":
    main()
