"""Blocked all-pairs cosine similarity join (exact, threshold-filtered).

Extension beyond the reference (which has no similarity operators —
SURVEY.md §2C); this is the exact baseline for embedding near-dup
detection, complementing the LSH-bucketed approximate path
(``functions/similarity.lsh_bucket``).

Formulation — distributed block outer product:

1. every vector gets a block id ``bid = vec_id % num_blocks`` (hash-mod:
   balanced block sizes without knowing N);
2. each vector is fanned out to every unordered block pair ``(i, j)``
   (i <= j) it participates in — ``num_blocks + 1`` copies per vector;
3. one shuffle groups each block pair; ``applyInPandas`` normalizes the
   two sub-matrices and computes their product with a single BLAS
   ``matmul`` (Arrow-batched, ~100x the per-pair interpreted
   higher-order-function dot product), emitting only pairs at or above
   the threshold.

Scale posture: cost is inherently O(N^2 * dim / cluster); the fan-out
replication factor is ``num_blocks``, so pick
``num_blocks ~ sqrt(cluster cores)`` to balance parallelism (the shuffle
spreads ``num_blocks * (num_blocks + 1) / 2`` independent tasks) against
replication. Exact all-pairs is the wrong tool above ~10^6 vectors —
the LSH path bounds candidate sets instead; this operator is for the
exact-verification tier and modest-N corpora.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine_allpairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_blocks: int = 8,
    round_to: int | None = 6,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with cosine similarity >= threshold.

    Returns columns ``id_a, id_b, cos_sim``.
    """
    nb = num_blocks

    src = df.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        (F.col(id_col).cast("long") % nb).alias("bid"),
    )

    # fan out: block b serves as the LEFT of pairs (b, j>=b) and the RIGHT
    # of pairs (i<=b, b); pair key pk = i * nb + j
    pairs_of = F.array_union(
        F.transform(
            F.sequence(F.col("bid"), F.lit(nb - 1)),
            lambda j: F.col("bid") * nb + j,
        ),
        F.transform(
            F.sequence(F.lit(0), F.col("bid")),
            lambda i: i * nb + F.col("bid"),
        ),
    )
    fanned = src.select(
        "vid", "v", "bid", F.explode(pairs_of).alias("pk")
    )

    empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64"),
                          "cos_sim": pd.Series(dtype="float64")})

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        pk = int(pdf["pk"].iloc[0])
        i, j = pk // nb, pk % nb
        left = pdf[pdf["bid"] == i]
        right = pdf[pdf["bid"] == j]
        if left.empty or right.empty:
            return empty
        a = np.stack(left["v"].to_numpy())
        b = np.stack(right["v"].to_numpy())
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        sims = a @ b.T
        ids_a = left["vid"].to_numpy()[:, None]
        ids_b = right["vid"].to_numpy()[None, :]
        # raw cutoff relaxed by half an ulp at the rounding precision; the
        # caller's round-then-filter applies the exact threshold semantics
        cut = threshold if round_to is None else threshold - 0.5 * 10**-round_to
        if i == j:
            # both directions of every pair are in the matrix: keep one
            mask = (sims >= cut) & (ids_a < ids_b)
        else:
            # each unordered cross-block pair appears exactly once
            mask = sims >= cut
        ra, rb = np.nonzero(mask)
        va, vb = ids_a[ra, 0], ids_b[0, rb]
        return pd.DataFrame(
            {
                "id_a": np.minimum(va, vb),
                "id_b": np.maximum(va, vb),
                "cos_sim": sims[ra, rb],
            }
        )

    out = fanned.groupBy("pk").applyInPandas(
        _block, "id_a long, id_b long, cos_sim double"
    )
    if round_to is not None:
        out = out.withColumn("cos_sim", F.round("cos_sim", round_to)).filter(
            F.col("cos_sim") >= threshold
        )
    return out
