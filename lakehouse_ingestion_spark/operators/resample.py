"""Time-series resampling: regular grid + gap filling per key.

The standard feature-engineering step Spark lacks as a built-in:
sensor/event streams arrive irregularly; models and dashboards want a
regular grid with gaps carried forward (pandas ``resample().ffill()``,
TimescaleDB ``time_bucket_gapfill``, InfluxDB ``fill(previous)``).

DataFrame-algebra formulation (no Python, no iteration):

1. bucket every observation to its grid cell (integer division on
   epoch seconds — pure codegen);
2. ONE aggregation keyed (key, bucket) keeps the LAST observation per
   cell (``max_by`` on the timestamp — partial-aggregates map-side);
3. per key, the grid materializes from min..max bucket via
   ``sequence`` + explode — grid size is data-bounded per key
   (span/step cells), and the explode is map-only off a one-row-per-key
   aggregate, NOT a join against a generated calendar table;
4. a left join places observations on the grid; forward fill is
   ``last(value, ignorenulls=True)`` over the per-key bucket order —
   one window pass over the grid (already the join's partitioning).

100-TB posture: two keyed shuffles (cell aggregation, grid join) plus
the per-key window; grid volume = Σ_key span/step — the caller chooses
``step``, so the operator never amplifies data unboundedly on its own;
a key with a pathological span surfaces as its own grid partition
(AQE-splittable), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    out_ts_col: str = "grid_ts",
    fill_col: str | None = None,
) -> DataFrame:
    """Per-key regular grid at ``step_seconds`` with forward fill.

    Output: one row per (key, grid cell) from each key's first to last
    observation (inclusive), with ``value_col`` = the last observation
    in that cell, ``fill_col`` (default ``<value_col>_ffill``) = the
    cell value carried forward across empty cells. Leading cells before
    a key's first observation do not exist (the grid starts at the
    first observation, so the fill never fabricates a value). The grid
    timestamp is the CELL START, UTC-epoch anchored.
    """
    if not key_cols:
        raise ValueError("resample_ffill needs at least one key column")
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be > 0, got {step_seconds}")
    filled = fill_col or f"{value_col}_ffill"
    grid = _grid_ffill(df, key_cols, ts_col, value_col, step_seconds, filled)
    return grid.select(
        *key_cols,
        F.timestamp_seconds(F.col("__bkt") * step_seconds).alias(out_ts_col),
        F.col("__v").alias(value_col),
        F.col(filled),
    )


def _grid_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    filled: str,
) -> DataFrame:
    """Shared grid + forward-fill core: returns ``key_cols, __bkt, __v,
    <filled>`` with the INTEGER grid cell still present.
    ``resample_interpolate`` windows on ``__bkt`` directly (r13, guide
    §2.4): re-deriving the cell from the converted timestamp produced an
    expression Catalyst could not match against the fill window's sort
    order, forcing an extra grid-sized Sort + separate Window wave."""
    # floor, not cast-truncation: a pre-epoch timestamp (negative epoch)
    # must land in the cell that STARTS AT OR BEFORE it (-0.5 -> -1,
    # not 0) — matches DuckDB's // and pandas resample
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds).cast(
        "long"
    )
    obs = (
        df.select(
            *key_cols,
            bucket.alias("__bkt"),
            F.col(ts_col).alias("__ts"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(*key_cols, "__bkt")
        .agg(
            # last observation in the cell wins (max ts; ties broken by
            # value to stay deterministic under equal timestamps)
            F.max_by(F.col("__v"), F.struct("__ts", "__v")).alias("__v")
        )
    )
    spans = obs.groupBy(*key_cols).agg(
        F.min("__bkt").alias("__b0"), F.max("__bkt").alias("__b1")
    )
    grid = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("__b0"), F.col("__b1"))).alias("__bkt"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(obs, [*key_cols, "__bkt"], "left").withColumn(
        filled, F.last("__v", ignorenulls=True).over(w)
    )


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    out_ts_col: str = "grid_ts",
    fill_col: str | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-key regular grid with LINEAR interpolation across gaps
    (pandas ``resample().interpolate()``): empty cells between two
    observed cells get the straight-line value; cells after the last
    observation carry it forward (nothing to interpolate toward).
    Interpolation weights use CELL indices (each observed cell is
    represented by its last observation, per ``resample_ffill``).

    Same shuffle structure as ``resample_ffill`` plus one backward
    window pass (next observed cell); ``round_to`` rounds the
    interpolated value so cross-engine float division agrees.
    """
    if not key_cols:
        raise ValueError("resample_interpolate needs at least one key column")
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be > 0, got {step_seconds}")
    filled = fill_col or f"{value_col}_interp"

    # r13: window on the grid core's INTEGER cell directly instead of
    # re-deriving it from the converted timestamp (bit-identical — the
    # cell is an exact long either way — but the re-derived expression
    # hid the shared sort order from the planner: 3 grid-sized Sorts +
    # 3 Window waves before, 2 after, with the forward-fill and
    # prev-cell windows fused into one wave)
    base = _grid_ffill(df, key_cols, ts_col, value_col, step_seconds, "__prev_v")
    value_col_i = "__v"  # the grid core's internal value column
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # "next observed cell" = running last(ignorenulls) over the grid in
    # REVERSE bucket order. A [CURRENT ROW, UNBOUNDED FOLLOWING] frame
    # computes the same thing but Spark's UnboundedFollowing frame
    # re-scans current..end PER ROW — O(cells²) per key (measured 151 s
    # vs 13 s at sf1 on 10.5M grid rows / ~7k cells per key); the
    # reversed running frame is the O(cells) formulation.
    wr = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__bkt").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_bkt = F.when(F.col(value_col_i).isNotNull(), F.col("__bkt"))
    out = (
        base.withColumn("__pb", F.last(obs_bkt, ignorenulls=True).over(wb))
        .withColumn("__nb", F.last(obs_bkt, ignorenulls=True).over(wr))
        .withColumn("__nv", F.last(value_col_i, ignorenulls=True).over(wr))
    )
    interp = F.when(
        F.col(value_col_i).isNotNull(), F.col(value_col_i)
    ).when(
        F.col("__nb").isNotNull(),
        F.col("__prev_v")
        + (F.col("__nv") - F.col("__prev_v"))
        * (F.col("__bkt") - F.col("__pb"))
        / (F.col("__nb") - F.col("__pb")),
    ).otherwise(F.col("__prev_v"))
    if round_to is not None:
        interp = F.round(interp, round_to)
    return out.withColumn(filled, interp).select(
        *key_cols,
        F.timestamp_seconds(F.col("__bkt") * step_seconds).alias(out_ts_col),
        F.col(value_col_i).alias(value_col),
        filled,
    )
