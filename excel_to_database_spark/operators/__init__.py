from excel_to_database_spark.operators.asof import asof_join
from excel_to_database_spark.operators.dedup import (
    char_shingles,
    connected_components,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_dedup,
    shingle_contamination,
    shingles,
    simhash_fingerprints,
    simhash_pairs,
)
from excel_to_database_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
)
from excel_to_database_spark.operators.sessionize import sessionize
from excel_to_database_spark.operators.similarity import (
    ann_hyperplane_lsh,
    ann_ivf,
    cosine_topk,
    ivf_assign,
    ivf_refine,
)
from excel_to_database_spark.operators.skew import salted_join
from excel_to_database_spark.operators.text import (
    fingerprint,
    hash_split,
    lang_id,
    quality_score,
    stratified_sample,
    tfidf_top_terms,
    token_count_bpe,
    token_count_ws,
)

__all__ = [
    "asof_join",
    "sessionize",
    "salted_join",
    "exact_dedup",
    "shingles",
    "char_shingles",
    "jaccard_pairs",
    "minhash_lsh_dedup",
    "connected_components",
    "shingle_contamination",
    "simhash_fingerprints",
    "simhash_pairs",
    "cosine_topk",
    "ann_hyperplane_lsh",
    "ann_ivf",
    "ivf_assign",
    "ivf_refine",
    "attach_payload",
    "decode_media",
    "extract_features",
    "resize_images",
    "sample_frames",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_count_ws",
    "token_count_bpe",
    "tfidf_top_terms",
    "hash_split",
    "stratified_sample",
]
