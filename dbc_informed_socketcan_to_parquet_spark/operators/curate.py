"""End-to-end corpus curation: the composition the individual operators
exist for — raw documents in, deduplicated training-ready documents out.

Stage order is chosen for scale, cheapest-first so each stage shrinks the
input of the next:

1. PII scrub           — codegen'd regexp chain, no shuffle.
2. quality gate        — doc_stats + repetition_stats thresholds; drops
                         boilerplate before any hashing happens.
3. exact dedup         — one shuffle on the content hash; removes the
                         cheap mass of byte-identical copies so MinHash
                         only sees near-dup candidates.
4. near-dup clusters   — MinHash→LSH pairs → connected components →
                         keep the min-id member per cluster.

Every stage is a library operator with its own tests/oracle; this module
only wires them and is itself tested end-to-end.  At 100 TB each stage
boundary is a natural materialization point (write → read back) so a
failed later stage never recomputes the full chain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup,
    keep_canonical,
    minhash_dedup_pairs,
)
from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
    doc_quality_stats,
    scrub_pii,
)


@dataclass(frozen=True)
class CurateConfig:
    min_chars: int = 32
    min_quality: float = 0.5
    max_dup_line_ratio: float = 0.5
    max_top_bigram_ratio: float = 0.5
    minhash_perms: int = 16
    minhash_bands: int = 4
    shingle_n: int = 5
    jaccard_threshold: float = 0.8
    seed: int = 42
    scrub: bool = True


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: CurateConfig = CurateConfig(),
) -> DataFrame:
    """Run the full curation pipeline; returns the kept documents with
    their original schema (text scrubbed when ``config.scrub``)."""
    out = scrub_pii(docs, text_col) if config.scrub else docs

    # one shuffle-free projection (r4) — no doc_stats ⋈ repetition join
    stats = doc_quality_stats(out, id_col, text_col)
    good_ids = stats.filter(
        (F.col("n_chars") >= config.min_chars)
        & (F.col("quality") >= config.min_quality)
        & (F.col("dup_line_ratio") <= config.max_dup_line_ratio)
        & (F.col("top_bigram_ratio") <= config.max_top_bigram_ratio)
    ).select(id_col)
    out = out.join(good_ids, id_col, "left_semi")

    out = exact_dedup(out, id_col, text_col)

    pairs = minhash_dedup_pairs(
        out, id_col, text_col,
        num_perms=config.minhash_perms, shingle_n=config.shingle_n,
        num_bands=config.minhash_bands, threshold=config.jaccard_threshold,
        seed=config.seed,
    )
    clusters = dedup_clusters(pairs)
    return keep_canonical(out, clusters, id_col)
