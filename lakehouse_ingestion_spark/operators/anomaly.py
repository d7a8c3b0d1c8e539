"""Statistical outlier detection over grouped measures.

The monitoring-side complement to the DQ rule checks (``dq/checks.py``):
instead of validating rows against DECLARED bounds, flag rows that
deviate from their group's OBSERVED distribution — the standard z-score
screen over metric streams (latency per endpoint, amount per merchant,
value per event type).

Formulation: one groupBy computes each group's (mean, stddev, count) —
map-side partial aggregation collapses every partition to one row per
group before the shuffle — then the tiny stats frame broadcasts back
onto the stream. Two scans of the input would also work via a window,
but a window shuffles the FULL table on the group key; the
aggregate+broadcast form shuffles only the per-group stats (the right
trade whenever groups ≪ rows, which is what "metrics by type" means).
Population stddev (``stddev_pop``): the screen describes the observed
batch, it does not infer beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.0,
    min_group_count: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """Rows whose ``value_col`` lies more than ``z`` population standard
    deviations from their group mean, annotated with ``group_mean``,
    ``group_std``, and ``zscore``. Groups smaller than
    ``min_group_count`` (or with zero variance) produce no outliers —
    a 1-row group is never anomalous against itself."""
    if z <= 0:
        raise ValueError(f"z must be positive, got {z}")
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("group_mean"),
        F.stddev_pop(value_col).alias("group_std"),
        F.count(value_col).alias("__n"),
    )
    joined = df.join(F.broadcast(stats), group_cols)
    score = (F.col(value_col) - F.col("group_mean")) / F.col("group_std")
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        joined.filter(
            (F.col("__n") >= min_group_count) & (F.col("group_std") > 0)
        )
        .withColumn("zscore", score)
        .filter(F.abs(F.col("zscore")) > z)
        .drop("__n")
    )
