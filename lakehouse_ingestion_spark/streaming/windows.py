"""Event-time windowed aggregation with watermarks (SURVEY.md D19, M6).

The reference names late-data handling as a pain point but implements
nothing (``docs/01-problem-statement.md:21-28``). Here: declarative
tumbling / sliding / session windows over event time, watermark-bounded
state, usable identically on batch and streaming DataFrames (Spark's
``window`` works on both — batch runs simply have no late-data cutoff).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, event_time: str, delay: str) -> DataFrame:
    """Watermark only applies to streaming frames; no-op on batch (lets
    the same pipeline code serve both)."""
    return df.withWatermark(event_time, delay) if df.isStreaming else df


def tumbling_window_agg(
    df: DataFrame,
    event_time: str,
    window_duration: str,
    group_by: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    src = with_watermark(df, event_time, watermark_delay) if watermark_delay else df
    out = src.groupBy(
        F.window(event_time, window_duration).alias("win"), *group_by
    ).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def sliding_window_agg(
    df: DataFrame,
    event_time: str,
    window_duration: str,
    slide_duration: str,
    group_by: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    src = with_watermark(df, event_time, watermark_delay) if watermark_delay else df
    out = src.groupBy(
        F.window(event_time, window_duration, slide_duration).alias("win"), *group_by
    ).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def session_window_agg(
    df: DataFrame,
    event_time: str,
    gap_duration: str,
    group_by: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    """Session windows: rows closer than ``gap_duration`` merge into one
    session per group key."""
    src = with_watermark(df, event_time, watermark_delay) if watermark_delay else df
    out = src.groupBy(
        F.session_window(event_time, gap_duration).alias("win"), *group_by
    ).agg(*aggs)
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *[c for c in out.columns if c != "win"],
    )
