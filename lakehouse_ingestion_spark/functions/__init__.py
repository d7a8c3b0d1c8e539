from lakehouse_ingestion_spark.functions.text import (  # noqa: F401
    token_count,
    tokens,
    quality_score,
    fingerprint_md5,
    fingerprint_xxhash,
    language_scores,
    language_id,
)
from lakehouse_ingestion_spark.functions.similarity import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    shingles,
    minhash_signature,
    simhash64,
)
