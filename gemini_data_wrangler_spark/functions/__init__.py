from gemini_data_wrangler_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
)
from gemini_data_wrangler_spark.functions.vectors import cosine_similarity, l2_norm, vec_dot

__all__ = [
    "char_shingles",
    "doc_fingerprint",
    "language_id",
    "quality_features",
    "token_count",
    "cosine_similarity",
    "l2_norm",
    "vec_dot",
]
