"""Watermarked stream-stream joins — correlating two live streams
(clicks-to-impressions, payments-to-orders) without unbounded state.

Spark buffers both sides in the state store; without bounds that state
grows forever. The production shape constrains BOTH dimensions:

- a watermark on each side bounds how late either stream can be;
- a time-range join condition (``right.ts BETWEEN left.ts AND left.ts
  + horizon``) bounds how long a buffered row can still find a match,
  letting the state store evict everything older than
  ``watermark + horizon``.

Inner joins need just those two; outer joins additionally REQUIRE the
time bound (Spark refuses them otherwise) and emit the null-padded side
only after the watermark passes — results are delayed by design, not
missing.

The reference has no stream-stream correlation at all (its streaming
path is single-topic Bronze append, `io/KafkaReader.scala` ->
`lakehouse/DeltaLakeWriter.scala`); this closes that gap Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    left_delay: str,
    right_delay: str,
    horizon_seconds: float,
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join two watermarked streams on ``keys`` where the right event
    lands within ``[left_time, left_time + horizon_seconds]``.

    State bound: each side's store holds at most (watermark delay +
    horizon) of data — independent of stream length. ``how`` may be
    "inner", "left" ("leftOuter"), or "right"; outer results for
    unmatched rows surface once the watermark passes the horizon.

    Right-side non-key columns that collide with left names get
    ``right_suffix`` so the joined frame is unambiguous.
    """
    allowed = {"inner": "inner", "left": "leftOuter", "right": "rightOuter"}
    if how not in allowed:
        raise ConfigError(
            f"interval_join supports how in {sorted(allowed)}, got {how!r}"
        )
    if not keys:
        raise ConfigError("interval_join needs at least one key column")
    if horizon_seconds <= 0:
        raise ConfigError("horizon_seconds must be positive")

    l = left.withWatermark(left_time, left_delay)
    r = right.withWatermark(right_time, right_delay)
    renames = {
        c: c + right_suffix
        for c in r.columns
        if c in l.columns and c not in keys and c != right_time
    }
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    if right_time in l.columns and right_time not in keys:
        r = r.withColumnRenamed(right_time, right_time + right_suffix)
        rt = right_time + right_suffix
    else:
        rt = right_time

    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (l[k] == r[k])
    cond = (
        cond
        & (F.col(rt) >= F.col(left_time))
        & (
            F.col(rt)
            # an INTERVAL *literal*, not make_interval():
            # StreamingJoinHelper can only extract the state-value
            # watermark from literal interval arithmetic, and without it
            # outer joins are refused outright (and inner-join state
            # could never evict). Fixed-point formatting (not str(float))
            # because scientific repr (1e-06) fails the interval parser.
            <= F.col(left_time)
            + F.expr(f"INTERVAL {float(horizon_seconds):.6f} SECONDS")
        )
    )
    joined = l.join(r, cond, allowed[how])
    # drop the duplicated right-side key columns
    return joined.drop(*[r[k] for k in keys]) if how != "right" else joined.drop(
        *[l[k] for k in keys]
    )
