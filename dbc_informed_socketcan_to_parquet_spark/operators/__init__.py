from dbc_informed_socketcan_to_parquet_spark.operators.bucket import bucket_downsample, rollup_cascade
from dbc_informed_socketcan_to_parquet_spark.operators.curate import CurateConfig, curate
from dbc_informed_socketcan_to_parquet_spark.operators.sampling import (
    assign_split,
    leakage_safe_split,
    mix_corpora,
    pack_sequences,
    split_by_hash,
    stratified_sample,
    temperature_mix,
)
from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
    dedup_clusters,
    embedding_near_dup_pairs,
    exact_dedup,
    exact_duplicates,
    keep_canonical,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from dbc_informed_socketcan_to_parquet_spark.operators.ffill import forward_fill, forward_fill_blocks
from dbc_informed_socketcan_to_parquet_spark.operators.multimodal import (
    attach_media,
    extract_features,
    frame_sample_plan,
    resize_images,
)
from dbc_informed_socketcan_to_parquet_spark.operators.pivot import pivot_last, unpivot
from dbc_informed_socketcan_to_parquet_spark.operators.similarity import cosine_topk, lsh_ann_topk, random_projection
from dbc_informed_socketcan_to_parquet_spark.operators.textops import (
    doc_fingerprints,
    doc_quality_stats,
    doc_stats,
    lang_id,
    normalize_text,
    repetition_stats,
    scrub_pii,
)

__all__ = [
    "repetition_stats",
    "scrub_pii",
    "bucket_downsample",
    "rollup_cascade",
    "CurateConfig",
    "curate",
    "assign_split",
    "leakage_safe_split",
    "mix_corpora",
    "pack_sequences",
    "split_by_hash",
    "stratified_sample",
    "dedup_clusters",
    "embedding_near_dup_pairs",
    "keep_canonical",
    "exact_dedup",
    "exact_duplicates",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "forward_fill",
    "forward_fill_blocks",
    "attach_media",
    "extract_features",
    "frame_sample_plan",
    "resize_images",
    "pivot_last",
    "unpivot",
    "cosine_topk",
    "lsh_ann_topk",
    "random_projection",
    "doc_fingerprints",
    "doc_quality_stats",
    "doc_stats",
    "lang_id",
]
