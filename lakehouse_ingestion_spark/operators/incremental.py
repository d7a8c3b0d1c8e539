"""Incremental aggregate maintenance — Gold tables without full rescans.

The reference's Gold layer recomputes its roll-ups from Silver on every
run (``docs/00-architecture-overview.md:240-244`` describes the
aggregations, not their maintenance). At 100 TB a daily full recompute
is the single largest avoidable cost in the pipeline: the day's DELTA is
a few hundred GB while the base table is the whole lake. This operator
maintains aggregate STATE that merges with each delta:

    state' = merge(state, partial_aggregate(delta))

which is exactly Spark's own partial-aggregation algebra (what
HashAggregate's partial/final split does within one query) lifted across
jobs: the state table plays the role of yesterday's partials.

Only decomposable aggregates participate — ``count``/``sum`` merge by
sum, ``min``/``max`` by min/max; ``avg`` is finalized from (sum, count)
at read time. Non-decomposable aggregates (count_distinct, exact
percentiles) are rejected loudly: maintaining them incrementally
requires sketches (HLL / t-digest), not silent wrong answers.

Merge cost is one groupBy over |state| + |delta-groups| rows — never
over the raw delta (it partial-aggregates first) and never over raw
history (that is the point). Replay safety: merging the same delta
twice double-counts; pair with the engine's idempotent upsert/dedup
operators (``operators/merge.py``) or exactly-once streaming
(``streaming/cdc.py``) for at-least-once sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gold import AggSpec

# func -> (delta partial expr, state merge expr)
_MERGE = {
    "count": (lambda c: F.count(F.lit(1)) if c == "*" else F.count(c), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _alias(a: AggSpec) -> str:
    return a.alias or f"{a.func}_{a.column}"


def partial_aggregate(
    delta: DataFrame, group_by: list[str], aggs: list[AggSpec]
) -> DataFrame:
    """Collapse a delta batch to one row per group of mergeable partial
    aggregates — the state-table row format."""
    cols = []
    for a in aggs:
        if a.func not in _MERGE:
            raise ValueError(
                f"aggregate {a.func!r} is not incrementally mergeable; "
                "mergeable: " + ", ".join(sorted(_MERGE)) + " (avg via "
                "sum+count; distinct counts via operators/sketches HLL; "
                "percentiles via operators/sketches t-digest "
                "quantile_sketches/merge_digests)"
            )
        cols.append(_MERGE[a.func][0](a.column).alias(_alias(a)))
    return delta.groupBy(*group_by).agg(*cols)


def merge_aggregate_state(
    state: DataFrame | None,
    delta: DataFrame,
    group_by: list[str],
    aggs: list[AggSpec],
) -> DataFrame:
    """Fold a raw delta batch into the aggregate state table.

    ``state`` is a previous output of this function (or
    ``partial_aggregate``); None bootstraps from the delta alone. The
    result has identical schema to ``partial_aggregate`` and equals a
    full recompute over state's history + delta (oracle-checked)."""
    part = partial_aggregate(delta, group_by, aggs)
    if state is None:
        return part
    merged = state.unionByName(part)
    cols = [
        _MERGE[a.func][1](_alias(a)).alias(_alias(a)) for a in aggs
    ]
    return merged.groupBy(*group_by).agg(*cols)


def finalize_aggregate(
    state: DataFrame,
    avg_pairs: list[tuple[str, str, str]] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Read-time finalization: derive non-mergeable presentations from
    the mergeable state. ``avg_pairs`` is (sum_alias, count_alias,
    out_alias) triples — avg = sum / count, NULL when count is 0."""
    out = state
    for sum_a, cnt_a, out_a in avg_pairs or []:
        expr = F.when(
            F.col(cnt_a) > 0, F.col(sum_a) / F.col(cnt_a)
        )
        if round_to is not None:
            expr = F.round(expr, round_to)
        out = out.withColumn(out_a, expr)
    return out
