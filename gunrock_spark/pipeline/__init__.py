from gunrock_spark.pipeline.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicates,
    shingles,
    simhash,
    simhash_near_duplicates,
)
from gunrock_spark.pipeline.multimodal import (
    decode_features,
    frame_sample,
    synthesize_media,
)
from gunrock_spark.pipeline.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    default_n_lists,
    ivf_index,
    ivf_search,
    select_centroids,
    signbit_buckets,
)
from gunrock_spark.pipeline.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)

__all__ = [
    "exact_duplicates",
    "shingles",
    "minhash_signatures",
    "lsh_buckets",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "near_duplicates",
    "simhash",
    "simhash_near_duplicates",
    "cosine_topk",
    "ivf_index",
    "ivf_search",
    "select_centroids",
    "default_n_lists",
    "signbit_buckets",
    "cosine_near_dup_pairs",
    "token_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "synthesize_media",
    "decode_features",
    "frame_sample",
]
