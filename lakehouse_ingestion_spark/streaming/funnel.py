"""Streaming ordered-funnel progression with bounded per-user state.

The streaming counterpart to ``operators/funnel.funnel_stages``: batch
funnels re-fold every user's full history each run; the stream carries
each user's progress as TWO values — (stage reached, timestamp of the
last matched step) — and advances it per micro-batch. State is constant
size per user regardless of event volume, with optional idle eviction.

Semantics match the batch operator's greedy strict-ordering fold
(events sorted by time; a step matches only strictly after the previous
match) WITHIN the arrival order: events are folded batch by batch, so a
matching event that arrives in a LATER batch but with an EARLIER
timestamp than the last match cannot rewind the funnel — across-batch
out-of-order delivery is the source's job to bound (watermark +
ordered replay); within a batch, events are time-sorted before folding.

Emits (update mode) one row per user whose stage ADVANCED in the batch
— downstream keeps the latest row per user for the live funnel report.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("stage", IntegerType(), True),
        StructField("last_ts", DoubleType(), True),  # epoch seconds
    ]
)

_TIMEOUTS = {
    "NoTimeout": GroupStateTimeout.NoTimeout,
    "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
}


def streaming_funnel(
    df: DataFrame,
    user_column: str,
    ts_column: str,
    step_column: str,
    steps: list[str],
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 86_400_000,
) -> DataFrame:
    """Per-user funnel stage across micro-batches: emits
    ``(user, stage, stage_name)`` whenever a user's stage advances.
    State: (stage, last-matched epoch seconds) — constant per user."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if timeout not in _TIMEOUTS:
        raise ValueError(
            f"unknown timeout {timeout!r}; expected one of {sorted(_TIMEOUTS)}"
        )
    key_field = df.schema[user_column]
    out_schema = StructType(
        [
            StructField(user_column, key_field.dataType, True),
            StructField("stage", IntegerType(), True),
        ]
    )
    user_col = user_column
    ts_col = ts_column
    step_col = step_column
    steps_l = list(steps)
    armed = timeout == "ProcessingTimeTimeout"
    duration = int(timeout_duration_ms)

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if state.hasTimedOut:
            state.remove()
            return

        stage, last_ts = state.get if state.exists else (0, None)
        start_stage = stage
        # concat the user's Arrow chunks so the time sort spans the WHOLE
        # micro-batch (per-chunk sorting would leak arrival order across
        # chunk boundaries); per-user-per-batch volume bounds the buffer
        chunks = [pdf[[ts_col, step_col]].dropna() for pdf in batches]
        sub = (
            _pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else (chunks[0] if chunks else _pd.DataFrame({ts_col: [], step_col: []}))
        )
        sub = sub.sort_values(ts_col, kind="stable")
        tsv = sub[ts_col]
        if _pd.api.types.is_datetime64_any_dtype(tsv):
            # datetime64[ns] -> epoch seconds; numeric ts columns are
            # already epoch seconds and pass through unscaled (a blanket
            # /1e9 would silently store wrong-unit state)
            tsv = tsv.astype("int64") / 1e9
        else:
            tsv = tsv.astype("float64")
        for ts, step in zip(tsv, sub[step_col]):
            if stage >= len(steps_l):
                break
            if step == steps_l[stage] and (last_ts is None or ts > last_ts):
                stage += 1
                last_ts = float(ts)
        state.update((int(stage), last_ts))
        if armed:
            state.setTimeoutDuration(duration)
        if stage > start_stage:
            yield _pd.DataFrame({user_col: [key[0]], "stage": [stage]})

    return df.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_TIMEOUTS[timeout],
    )
