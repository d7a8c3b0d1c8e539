"""Mergeable distinct-count sketches (Apache DataSketches HLL).

The missing piece of incremental Gold maintenance
(``operators/incremental.py``): count/sum/min/max merge trivially, but
``count_distinct`` does not — yesterday's distinct count plus today's
cannot be added. The standard fix is to store a SKETCH per group
instead of a number: HyperLogLog sketches union losslessly (union of
sketches = sketch of union), so

- fine-grained sketches (per nation, per day) roll up to any coarser
  grain (per region, per month) WITHOUT rescanning raw data;
- incremental maintenance is ``hll_union_agg(old_sketch, delta_sketch)``
  — the same state-merge shape as ``merge_aggregate_state``.

Spark 4 ships the DataSketches functions natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``);
everything here is a thin declarative layer keeping the sketch column
opaque binary, exactly how a state table would store it.

Accuracy: lgConfigK=12 (default) gives ~1.6% relative standard error;
the estimate-vs-exact contract is asserted in the oracle query (the
emitted ``est_ok`` boolean) and in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_by: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group —
    the state-table row format for incremental distinct counting."""
    return df.groupBy(*group_by).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    to_group_by: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union fine-grained sketches up to a coarser grouping (possibly
    ``[]`` for a global sketch). Lossless: the result is exactly the
    sketch that would have been built at the coarse grain directly."""
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    if to_group_by:
        return sketches.groupBy(*to_group_by).agg(agg)
    return sketches.agg(agg)


def merge_sketch_state(
    state: DataFrame | None,
    delta_sketches: DataFrame,
    group_by: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Fold a delta batch's sketches into the sketch state table (same
    contract as ``incremental.merge_aggregate_state``)."""
    if state is None:
        return delta_sketches
    return (
        state.unionByName(delta_sketches)
        .groupBy(*group_by)
        .agg(F.hll_union_agg(sketch_col).alias(sketch_col))
    )


def estimate(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Read-time finalization: replace the sketch column with its
    distinct-count estimate."""
    return sketches.withColumn(
        "estimate", F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)
