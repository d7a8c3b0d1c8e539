"""Semantic train/eval decontamination over embeddings.

Lexical decontamination (``operators/decontaminate``) catches verbatim
n-gram overlap; it is blind to paraphrases, translations, and templated
rewrites of eval examples.  The embedding-side companion flags a
training document when its embedding is within cosine ``threshold`` of
ANY eval example's embedding (the semantic-contamination screen used
alongside n-gram screens in modern LLM data hygiene — same asymmetry as
the n-gram pass: |eval| is thousands, the corpus is the 100-TB side).

Scale shape — the asymmetry IS the design, as in ``decontaminate``:

- the eval matrix (n_eval x dim, float64, L2-normalized, sorted by id)
  is collected ONCE on the driver (size-gated by ``max_eval``) and
  ships inside the Arrow-UDF closure to every executor — the same
  broadcast-small-side pattern as the n-gram set;
- the corpus is touched exactly once by a map-only ``mapInPandas``
  pass: one BLAS matmul per Arrow batch (batch x eval), a row-max, and
  an argmax.  NO shuffle, no join, no candidate generation — the plan
  is a scan plus a projection, which is the best possible 100-TB shape
  (contrast: a join formulation shuffles the corpus once per eval
  re-bucketing).

Determinism at the threshold: cosines are rounded to ``round_to``
BEFORE the max/argmax/compare, so the Spark (numpy float64 BLAS) and
DuckDB (float64 sequential ``list_dot_product``) paths agree at the
boundary; the nearest-eval tie-break is the smallest eval id (the eval
matrix is sorted by id and ``argmax`` returns the first maximum).

Marking, not filtering: every training row comes back with
(``max_cos``, ``nearest_eval_id``, ``contaminated``) — the drop is the
caller's policy decision, as in the n-gram pass.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lakehouse_ingestion_spark.errors import ConfigError


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int = 6,
    max_eval: int = 200_000,
) -> DataFrame:
    """Flag training vectors within rounded-cosine ``threshold`` of any
    eval vector.  Returns ``train`` plus ``max_cos`` (rounded),
    ``nearest_eval_id`` and ``contaminated``.

    ``max_eval`` bounds the driver-collected eval matrix — eval sets
    are human-curated and small by contract; crossing the gate raises
    instead of silently OOMing every executor.
    """
    if not 0.0 < threshold <= 1.0:
        raise ConfigError(f"threshold must be in (0, 1], got {threshold}")
    n_eval = eval_df.count()
    if n_eval > max_eval:
        raise ConfigError(
            f"eval set has {n_eval} rows > max_eval={max_eval}; the eval "
            "matrix ships to every executor — use an ANN index for "
            "corpus-sized 'eval' sides"
        )

    rows = (
        eval_df.select(id_col, vec_col)
        .dropna()
        .orderBy(id_col)  # argmax tie-break = smallest eval id
        .collect()
    )
    out_fields = train.schema.fields
    result_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", `max_cos` double, `nearest_eval_id` long, `contaminated` boolean"
    )
    if not rows:
        # empty eval set: nothing can be contaminated; NULL cosines make
        # the "no screen actually ran against anything" case visible
        def passthrough(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                yield pdf.assign(
                    max_cos=None, nearest_eval_id=None, contaminated=False
                )

        return train.mapInPandas(passthrough, schema=result_schema)

    eval_ids = np.array([r[id_col] for r in rows], dtype="int64")
    E = np.array([r[vec_col] for r in rows], dtype="float64")
    # cosine as dot/(|a||b|) — the SAME float path as the DuckDB mirror
    # (list_dot_product / product of sqrt norms), minimizing cross-engine
    # drift at the rounded threshold
    nE = np.maximum(np.linalg.norm(E, axis=1), 1e-12)

    def score_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            B = np.array(pdf[vec_col].tolist(), dtype="float64")
            nB = np.maximum(np.linalg.norm(B, axis=1), 1e-12)
            sims = np.round((B @ E.T) / np.outer(nB, nE), round_to)
            mx = sims.max(axis=1)
            nearest = eval_ids[sims.argmax(axis=1)]
            yield pdf.assign(
                max_cos=mx,
                nearest_eval_id=nearest,
                contaminated=mx >= threshold,
            )

    return train.mapInPandas(score_batches, schema=result_schema)
