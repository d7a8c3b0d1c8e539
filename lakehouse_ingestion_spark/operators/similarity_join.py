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

from lakehouse_ingestion_spark.errors import ConfigError


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
    # integral-id guard (same contract as semdedup): a lossy
    # cast("long") on string/float ids yields NULL vids/bids — rows
    # silently vanish from every block instead of erroring
    id_type = dict(df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ConfigError(
            f"cosine_allpairs_blocked needs an integral id column; "
            f"{id_col!r} is {id_type!r} — map string/hash ids to a "
            "surrogate long first"
        )

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
        ids_a_full = left["vid"].to_numpy()
        ids_b = right["vid"].to_numpy()[None, :]
        # raw cutoff relaxed by half an ulp at the rounding precision; the
        # caller's round-then-filter applies the exact threshold semantics
        cut = threshold if round_to is None else threshold - 0.5 * 10**-round_to
        # TILE the left side so the similarity matrix stays ~64 MB no
        # matter the block size: the untiled |block|^2 matrix scaled
        # quadratically with the corpus (at 200k vectors / 8 blocks each
        # block pair materialized 25k x 25k = 5 GB, and 32 REUSED python
        # workers holding that peak RSS OOM-killed the whole box). The
        # matmul is tile-local; survivors per tile are threshold-sparse.
        tile = max(1, (64 << 20) // (8 * max(1, b.shape[0])))
        frames = []
        for lo in range(0, a.shape[0], tile):
            sims = a[lo : lo + tile] @ b.T
            ids_a = ids_a_full[lo : lo + tile, None]
            if i == j:
                # both directions of every pair are in the matrix: keep one
                mask = (sims >= cut) & (ids_a < ids_b)
            else:
                # each unordered cross-block pair appears exactly once
                mask = sims >= cut
            ra, rb = np.nonzero(mask)
            if len(ra) == 0:
                continue
            va, vb = ids_a[ra, 0], ids_b[0, rb]
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(va, vb),
                        "id_b": np.maximum(va, vb),
                        "cos_sim": sims[ra, rb],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    out = fanned.groupBy("pk").applyInPandas(
        _block, "id_a long, id_b long, cos_sim double"
    )
    if round_to is not None:
        out = out.withColumn("cos_sim", F.round("cos_sim", round_to)).filter(
            F.col("cos_sim") >= threshold
        )
    return out
