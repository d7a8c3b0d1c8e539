"""Embedding quantization — int8 scalar (min/max) codes for vector
columns, the storage/IO lever for embedding tables at scale (float32 ->
uint8 is a 4x scan-size cut; IVF/LSH candidate scoring on dequantized
codes loses <0.5% recall at typical embedding distributions).

Per-vector affine quantization: ``scale = (max - min) / levels``,
``code = floor((x - min) / scale + 0.5)`` — the explicit ``floor(+0.5)``
half-up makes the codes bit-identical across engines (no dependence on a
rounding-mode builtin), which keeps the operator oracle-checkable.
Constant vectors (max == min) quantize to all-zero codes with scale 0
and dequantize back to the constant.

Everything is built-in array/HOF expressions — adequate for the
metadata/verification tier. A bulk re-encode of a 100 TB embedding store
should use the same formulas inside a vectorized ``mapInPandas`` (numpy
broadcasts the affine map; the operators/ann.py pattern); the column
shapes here define that contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def quantize_minmax(
    vec: Column | str, levels: int = 255
) -> tuple[Column, Column, Column]:
    """(codes, qmin, scale) for per-vector affine int quantization into
    ``[0, levels]``. ``codes`` is array<int>; dequantize with
    ``qmin + code * scale``."""
    v = _col(vec)
    qmin = F.array_min(v)
    qmax = F.array_max(v)
    scale = (qmax - qmin) / F.lit(float(levels))
    codes = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(F.floor((x - qmin) / scale + F.lit(0.5)))
        .cast("int"),
    )
    return codes, qmin, scale


def dequantize(codes: Column | str, qmin: Column, scale: Column) -> Column:
    """Reconstruct array<double> from affine codes."""
    return F.transform(_col(codes), lambda c: qmin + c.cast("double") * scale)


def quantization_error(vec: Column | str, deq: Column) -> Column:
    """Mean squared reconstruction error between the original vector and
    its dequantized form (sequential fold, cross-engine stable)."""
    v = _col(vec)
    sq = F.zip_with(v, deq, lambda a, b: (a - b) * (a - b))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) / F.size(v)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """Quantize an embedding column: returns (id_col, codes, qmin, scale,
    recon_mse). One stateless projection — no shuffle, no Python. The
    staged select materializes codes/qmin/scale once so the error term
    reuses them instead of re-deriving the whole HOF pipeline (Catalyst
    does not CSE across sibling array expressions)."""
    v = _col(vec_col).cast("array<double>")
    codes, qmin, scale = quantize_minmax(v, levels)
    staged = df.select(
        id_col,
        v.alias("__v"),
        codes.alias("codes"),
        qmin.alias("qmin"),
        scale.alias("scale"),
    )
    deq = dequantize(F.col("codes"), F.col("qmin"), F.col("scale"))
    return staged.select(
        id_col,
        "codes",
        "qmin",
        "scale",
        quantization_error(F.col("__v"), deq).alias("recon_mse"),
    )
