"""Deterministic dataset splitting and sampling for training pipelines.

Train/val/test assignment must be a pure function of a stable row key —
not of partitioning, row order, or Spark's RNG — so that re-runs,
backfills, and different cluster sizes produce the SAME split, and so a
document never migrates between train and eval when the corpus grows.
``randomSplit`` guarantees none of that; a content-hash bucket does.

Everything here is a stateless projection/filter over built-in JVM
expressions (md5 arithmetic, no UDFs, no shuffle, no state): it
parallelizes embarrassingly at any scale and is cross-engine
reproducible (DuckDB mirror: ``('0x' || substr(md5(x),1,15))::BIGINT``,
the same 60-bit reduction as ``functions.similarity.md5_hash60``).

NULL keys fail loudly at execution time (``raise_error``): a NULL can
neither hash stably nor be dropped silently — either choice corrupts a
training/eval split without a trace.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.functions.similarity import md5_hash60

# denominator for the hash -> [0, 1) projection; 2^20 buckets keeps the
# quantization error (~1e-6) far below any realistic split fraction
HASH_BUCKETS = 1 << 20


def hash_uniform(key: Column | str, seed: str = "") -> Column:
    """Deterministic uniform-ish draw in [0, 1) from a row key.

    ``seed`` is folded into the hashed string so independent draws (one
    per purpose: split, sampling, shard) decorrelate — the same key gets
    unrelated positions under different seeds. A NULL key raises at
    execution time rather than silently vanishing from (or flooding
    into) a split.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = md5_hash60(F.concat(k.cast("string"), F.lit(f"\x1f{seed}")))
    u = (h % HASH_BUCKETS).cast("double") / F.lit(float(HASH_BUCKETS))
    return F.when(
        k.isNull(),
        F.raise_error(F.lit("sampling/split key must not be NULL")),
    ).otherwise(u)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing ``key_col``.

    ``fractions`` maps split name -> fraction; they must sum to 1 (±1e-9).
    Assignment is the half-open interval partition of [0, 1) in the
    given dict order, so adding rows later never reassigns existing keys.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ConfigError(f"split fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ConfigError("split fractions must be non-negative")
    u = hash_uniform(key_col, seed)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash — stable
    under re-runs and corpus growth (a kept key stays kept)."""
    if not 0.0 <= fraction <= 1.0:
        raise ConfigError(f"sample fraction must be in [0,1], got {fraction}")
    return df.filter(hash_uniform(key_col, seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps a stratum
    value (e.g. language) to its keep-rate; strata absent from the map
    keep ``default_fraction``. The per-row draw depends only on
    (key, seed), so changing one stratum's rate never perturbs another's
    sample. Used to rebalance skewed training mixtures (cap the dominant
    language, keep all of the rare ones) in one shuffle-free pass.

    A NULL stratum value matches no map entry and keeps
    ``default_fraction`` (the key column, by contrast, must be non-NULL —
    ``hash_uniform`` raises).
    """
    for v, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ConfigError(f"fraction for stratum {v!r} must be in [0,1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ConfigError("default_fraction must be in [0,1]")
    s = F.col(strata_col)
    rate = F.lit(float(default_fraction))
    for v, frac in fractions.items():
        rate = F.when(s == F.lit(v), F.lit(float(frac))).otherwise(rate)
    return df.filter(hash_uniform(key_col, seed) < rate)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    expected_n: float,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted (Poisson) sampling: each row is kept with
    inclusion probability ``min(1, expected_n * w / W)`` where ``W`` is
    the total weight — expected sample size ``expected_n`` (exactly, when
    no row saturates the cap), inclusion odds proportional to weight.
    The draw is the same content-hash uniform as every sampler here, so
    membership is a pure function of (key, seed, weight distribution):
    re-runs and cluster-size changes reproduce the SAME sample.

    The mixture-weighting workhorse: sample documents proportional to
    length/quality so the training token budget, not the document count,
    follows the target distribution.

    Scale shape: ONE scalar aggregate for ``W`` (map-side combined,
    1-row broadcast back) + a shuffle-free filter — no sort, no top-k
    heap, nothing driver-side. NULL or negative weights raise loudly
    (they cannot be sampled proportionally and dropping them silently
    would bias the mixture).
    """
    if expected_n <= 0:
        raise ConfigError(f"expected_n must be positive, got {expected_n}")
    w = F.col(weight_col)
    checked_w = F.when(
        w.isNull() | (w < 0),
        F.raise_error(F.lit("weighted_sample: weights must be non-null and >= 0")),
    ).otherwise(w)
    # sum in the column's NATIVE type, cast after: integer weights then
    # give an exact, partition-order-independent total (a double sum is
    # non-associative, and a W that wobbles across runs/engines flips
    # rows at the inclusion boundary)
    total = df.select(F.sum(checked_w).cast("double").alias("__W"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(expected_n)) * checked_w.cast("double") / F.col("__W"),
    )
    return (
        df.crossJoin(F.broadcast(total))
        .filter(hash_uniform(key_col, seed) < rate)
        .drop("__W")
    )


def group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    order_by: Column | str | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the per-domain document cap
    of web-corpus curation (a handful of template-heavy domains must not
    dominate the training mixture).

    Which rows survive is deterministic: ranked by ``order_by``
    descending when given (e.g. a quality score), falling back to the
    content-hash draw (stable under re-runs and corpus growth, like
    every sampler here); ``key_col`` breaks remaining ties. With a
    constant ``cap`` the rank+filter plans as WindowGroupLimit — Spark
    keeps a bounded per-group heap on the map side, so the shuffle
    carries at most ``cap`` rows per group per input partition rather
    than the whole group (the difference between a bounded and an
    unbounded shuffle when one domain is half the corpus)."""
    if cap < 1:
        raise ConfigError(f"group cap must be >= 1, got {cap}")
    from pyspark.sql.window import Window

    keys = [F.col(order_by).desc() if isinstance(order_by, str) else order_by.desc()] \
        if order_by is not None else [hash_uniform(key_col, "cap")]
    w = Window.partitionBy(group_col).orderBy(*keys, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
