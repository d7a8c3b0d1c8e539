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
2. **Intra-bucket pair scan** (one shuffle groups each orthant), keep
   pairs ``id_a < id_b`` with cosine >= threshold. Candidate volume is
   Σ bucket² — bounded by the orthant partition, never all-pairs; the
   pair cosines are one Arrow-batched BLAS matmul per bucket.
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

100-TB posture: one shuffle groups buckets, one distinct + left join
applies the drop set; per-bucket work is a single BLAS matmul over the
bucket's matrix (raise ``n_bits`` to bound bucket memory — 2^n_bits
buckets over N vectors → N²/2^n_bits pair work and N·dim/2^n_bits
rows per task); the pair volume is monitorable per bucket before
committing the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    # the id must be integral: a lossy cast("long") on string/float ids
    # yields NULLs and the operator would silently mark EVERYTHING keep
    id_type = dict(df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"semantic_dedup needs an integral id column; {id_col!r} is "
            f"{id_type!r} — map string/hash ids to a surrogate long first"
        )
    # one shuffle groups each orthant; the intra-bucket pair cosines are
    # ONE BLAS matmul per bucket (the similarity_join._block idiom —
    # ~10x the interpreted per-pair zip_with/aggregate fold this
    # replaces: 3.2 s -> <1 s at sf1/20k vectors). The raw cutoff is
    # relaxed by half an ulp at the rounding precision; the exact
    # round-then-compare threshold semantics apply JVM-side after.
    import numpy as np
    import pandas as pd

    src = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__bkt", sign_bucket(F.col("__v"), n_bits))

    cut = threshold - 0.5 * 10**-round_to
    empty = pd.DataFrame(
        {
            "__dup_id": pd.Series(dtype="int64"),
            "__cos": pd.Series(dtype="float64"),
        }
    )

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return empty
        m = np.stack(pdf["__v"].to_numpy())
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        ids = pdf["__id"].to_numpy()
        # tile the row side so the bucket's similarity matrix stays
        # ~64 MB however large the orthant gets (the untiled |bucket|^2
        # matrix is the similarity_join OOM shape: reused python
        # workers keep the peak RSS forever)
        tile = max(1, (64 << 20) // (8 * len(ids)))
        frames = []
        for lo in range(0, m.shape[0], tile):
            sims = m[lo : lo + tile] @ m.T
            mask = (sims >= cut) & (ids[lo : lo + tile, None] < ids[None, :])
            ra, rb = np.nonzero(mask)
            if len(ra) == 0:
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "__dup_id": np.maximum(ids[lo + ra], ids[rb]),
                        "__cos": sims[ra, rb],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    dup_ids = (
        src.groupBy("__bkt")
        .applyInPandas(_bucket_pairs, "__dup_id long, __cos double")
        .where(F.round(F.col("__cos"), round_to) >= F.lit(threshold))
        .select("__dup_id")
        .distinct()
    )
    return df.join(
        dup_ids, F.col(id_col).cast("long") == F.col("__dup_id"), "left"
    ).select(
        *df.columns,
        F.col("__dup_id").isNull().alias(keep_col),
    )
