"""Random-projection dimensionality reduction (Johnson-Lindenstrauss).

The standard pre-step before clustering / semantic dedup at scale
(SemDeDup-family pipelines reduce 768-4096-dim embeddings before the
O(n·d) passes): project each vector through a seeded Gaussian matrix
``R`` (out_dim × in_dim, entries N(0,1)/√out_dim). JL: pairwise
distances are preserved within (1±ε) for out_dim = O(ln n / ε²),
independent of in_dim — so every downstream cosine/L2 operator
(``operators/ann.py``, ``operators/semdedup.py``) runs on vectors
4-64× narrower with bounded distortion.

Spark shape: map-only ``mapInArrow`` — flat Arrow buffer reshaped to a
(rows × in_dim) matrix, ONE tiled BLAS matmul per Arrow batch (tiles
capped at ~64 MB so a reused Python worker's peak RSS stays bounded —
the round-5 box-killer lesson), output ListArray rebuilt straight from
the flat result buffer. No per-row Python objects, no shuffle; the
projection matrix is deterministic from (in_dim, out_dim, seed) and
ships in the task closure (out_dim × in_dim × 8 B — KBs at real
widths), never via a data-sized broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TILE_BYTES = 64 << 20


def projection_matrix(in_dim: int, out_dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian JL matrix (out_dim × in_dim), scaled by
    1/√out_dim so projected norms are unbiased. Same (in_dim, out_dim,
    seed) always yields the same matrix — index builds and query-time
    projections agree by construction."""
    if in_dim < 1 or out_dim < 1:
        raise ValueError(f"dims must be >= 1, got in={in_dim} out={out_dim}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    in_dim: int | None = None,
) -> DataFrame:
    """(id_col, proj: array<double>) — each vector multiplied through
    the seeded JL matrix. Vectors must be non-null and exactly
    ``in_dim`` wide (raises otherwise — a ragged embedding column is an
    upstream bug, not something to project silently). ``in_dim=None``
    probes one row (driver-side scalar; pass it explicitly in
    streaming/empty-input contexts)."""
    if in_dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("n")).first()
        if row is None:
            raise ValueError(
                "project_embeddings: empty input and no in_dim given"
            )
        in_dim = row["n"]
    R = projection_matrix(in_dim, out_dim, seed)
    Rt = R.T.copy()  # (in_dim, out_dim), contiguous for the matmul
    id_type = df.schema[id_col].dataType.simpleString()
    tile_rows = max(1, _TILE_BYTES // (max(in_dim, out_dim) * 8))

    def _project(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            arr = rb.column(1)
            if arr.null_count:
                raise ValueError(f"project_embeddings: null {vec_col} vectors")
            # the outer null_count misses null ELEMENTS inside a vector —
            # flatten() would convert them to NaN and the matmul would
            # silently emit NaN projections, breaking the raises-otherwise
            # contract above
            if arr.flatten().null_count:
                raise ValueError(
                    f"project_embeddings: null elements inside {vec_col} vectors"
                )
            widths = np.asarray(arr.value_lengths(), dtype="int64")
            if (widths != in_dim).any():
                bad = int(widths[widths != in_dim][0])
                raise ValueError(
                    f"project_embeddings: expected {in_dim}-wide vectors, got {bad}"
                )
            flat = np.asarray(arr.flatten(), dtype="float64")
            X = flat.reshape(-1, in_dim)
            out = np.empty((X.shape[0], out_dim), dtype="float64")
            for s in range(0, X.shape[0], tile_rows):
                e = min(s + tile_rows, X.shape[0])
                np.matmul(X[s:e], Rt, out=out[s:e])
            offsets = pa.array(
                np.arange(0, (X.shape[0] + 1) * out_dim, out_dim),
                type=pa.int32(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.ListArray.from_arrays(
                        offsets, pa.array(out.ravel(), type=pa.float64())
                    ),
                ],
                [id_col, "proj"],
            )

    return df.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInArrow(_project, f"{id_col} {id_type}, proj array<double>")
