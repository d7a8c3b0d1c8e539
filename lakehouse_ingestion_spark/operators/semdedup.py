"""Semantic deduplication over embeddings (SemDeDup-style).

SemDeDup (Abbas et al., 2023) removes SEMANTIC duplicates — documents
whose embeddings are nearly parallel even when their text differs (
templated articles, paraphrases, machine-translated copies) — by
clustering the embedding space and dropping all-but-one document from
every tight neighborhood. Lexical dedup (MinHash, ``operators/dedup``)
cannot see these; this operator is the embedding-side companion.

Spark-first formulation (deterministic, no trained clusterer):

1. **Bucket** every vector by the sign pattern of its first ``n_bits``
   dimensions — a fixed, data-independent partition of the sphere into
   2^n_bits orthants. Same shape as SimHash with axis-aligned
   hyperplanes; deterministic so the DuckDB oracle reproduces it
   bit-for-bit (no RNG, no kmeans iteration order to replicate).
2. **Intra-bucket self-join** on the bucket key (one shuffle), keep
   pairs ``id_a < id_b`` with cosine >= threshold. Candidate volume is
   Σ bucket² — bounded by the orthant partition, never all-pairs.
3. **Drop rule**: a document is a duplicate iff SOME smaller-id
   document shares its bucket at >= threshold (left-semi join). The
   smallest id of every neighborhood therefore survives as the
   representative — a total, deterministic keep order.

Caveat (inherent to single-probe bucketing, documented not hidden):
near-duplicates straddling an orthant boundary are missed; SemDeDup
accepts the same within-cluster-only tradeoff. Lower ``n_bits`` for
recall, raise it for throughput; the exact all-pairs tier
(``similarity_join.cosine_allpairs_blocked``) is the recall=1 fallback
for modest N.

100-TB posture: one shuffle to bucket-join, one semi-join to filter;
the cosine rides ``F.aggregate``'s JVM fold (no Python workers); skewed
buckets (embedding mass concentrates) are AQE-split, and the pair
volume is monitorable per bucket before committing the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sign_bucket(vec: Column, n_bits: int) -> Column:
    """Sign pattern of the first ``n_bits`` dims as a bit string.
    Zero counts as positive (sign >= 0 -> '1') so the rule is total."""
    return F.array_join(
        F.transform(
            F.slice(vec, 1, n_bits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
        "",
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "emb_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
    keep_col: str = "keep",
    round_to: int = 9,
) -> DataFrame:
    """Mark semantic duplicates: ``keep_col`` False iff a smaller-id
    vector in the same sign-bucket has cosine >= ``threshold``.

    Returns the input frame plus ``keep_col`` — marking, not filtering,
    so callers can audit the drop set before committing (the same
    report-first contract as ``dq/ruleset``'s quarantine mode).
    ``round_to`` rounds the cosine before the >= compare so the
    Spark and DuckDB float paths agree at the threshold boundary.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    src = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__bkt", sign_bucket(F.col("__v"), n_bits))

    a = src.select(
        F.col("__bkt"),
        F.col("__id").alias("__ida"),
        F.col("__v").alias("__va"),
    )
    b = src.select(
        F.col("__bkt"),
        F.col("__id").alias("__idb"),
        F.col("__v").alias("__vb"),
    )
    va, vb = F.col("__va"), F.col("__vb")
    cos = F.round(
        _dot(va, vb) / F.sqrt(_dot(va, va) * _dot(vb, vb)), round_to
    )
    dup_ids = (
        a.join(b, "__bkt")
        .where(F.col("__ida") < F.col("__idb"))
        .where(cos >= F.lit(threshold))
        .select(F.col("__idb").alias("__dup_id"))
        .distinct()
    )
    return df.join(
        dup_ids, F.col(id_col).cast("long") == F.col("__dup_id"), "left"
    ).select(
        *df.columns,
        F.col("__dup_id").isNull().alias(keep_col),
    )
