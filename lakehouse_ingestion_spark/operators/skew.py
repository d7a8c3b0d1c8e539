"""Skew mitigation: salting for hot keys (100 TB posture).

AQE's skew-join splitting (on by default, session.py) handles most skew
at runtime; these helpers cover the cases AQE cannot re-plan:

- ``salted_aggregate``: two-stage aggregation for heavily-skewed groupBy
  keys — stage 1 aggregates (key, salt) partials, stage 2 merges per key.
  Correct for any algebraic aggregate expressed as (partial, merge) pair.
- ``salted_broadcast_left``: replicate a small right side S ways and salt
  the left side so one hot key spreads over S tasks in a shuffle join
  (for when the right side is too big to broadcast outright but a hot
  left key would stall a single reducer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (partial_expr, merge_expr) builders per supported aggregate
_SALTED_AGGS = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_aggregate(
    df: DataFrame,
    group_by: list[str],
    aggs: list[tuple[str, str, str]],  # (func, column, alias)
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``avg`` callers: request sum+count and divide afterwards (the salted
    decomposition of avg is exactly that).
    """
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % num_salts
    salted = df.withColumn("__salt", salt)

    partials = []
    merges = []
    for func, col, alias in aggs:
        if func not in _SALTED_AGGS:
            raise ValueError(
                f"salted_aggregate supports {sorted(_SALTED_AGGS)}; got {func} "
                "(decompose avg into sum+count)"
            )
        partial_fn, merge_fn = _SALTED_AGGS[func]
        p_name = f"__p_{alias}"
        partials.append(partial_fn(F.col(col)).alias(p_name))
        merges.append(merge_fn(F.col(p_name)).alias(alias))

    stage1 = salted.groupBy(*group_by, "__salt").agg(*partials)
    return stage1.groupBy(*group_by).agg(*merges)


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join: left gets a random salt in [0, S); right is
    replicated S times with every salt value; join on keys + salt. One hot
    left key now lands on S reducers instead of one.

    Only ``inner`` and ``left`` joins are valid: the right side is
    replicated S times, so right/full outer would emit S null-padded
    copies of every unmatched right row."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_broadcast_left supports how='inner'/'left' only, got {how!r} "
            "(right rows are replicated per salt; outer-right semantics would duplicate them)"
        )
    salt_l = (F.spark_partition_id() + F.monotonically_increasing_id()) % num_salts
    l = left.withColumn("__salt", salt_l.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>"))
    )
    return l.join(r, on=[*on, "__salt"], how=how).drop("__salt")
