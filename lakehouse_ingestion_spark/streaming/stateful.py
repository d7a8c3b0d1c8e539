"""Custom stateful streaming operator via ``applyInPandasWithState``.

Implements a running per-key aggregate (count + sum) that survives
across micro-batches — the pattern behind sessionization, per-entity
counters, and online feature computation. State is per group key and,
with a timeout configured, evicted after inactivity (bounding state
size on high-cardinality key spaces).

The state/batch function is self-contained (no module-global references)
so it pickles by value for executors without this package installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)

_TIMEOUTS = {
    "NoTimeout": GroupStateTimeout.NoTimeout,
    "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
}


def running_aggregate(
    df: DataFrame,
    key_column: str,
    value_column: str,
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Works on a streaming DataFrame grouped by ``key_column``; emits one
    updated row per key per micro-batch (update output mode). The output
    key column keeps the input column's name and type.

    ``timeout="ProcessingTimeTimeout"`` arms per-key eviction: keys idle
    for ``timeout_duration_ms`` have their state removed (a final row
    with is_final=true is emitted on eviction). Unknown timeout names
    raise instead of silently disabling eviction.
    """
    if timeout not in _TIMEOUTS:
        raise ValueError(
            f"unknown timeout {timeout!r}; expected one of {sorted(_TIMEOUTS)}"
        )
    key_field = df.schema[key_column]
    out_schema = StructType(
        [
            StructField(key_column, key_field.dataType, True),
            StructField("n_events", LongType(), True),
            StructField("total_value", DoubleType(), True),
            StructField("is_final", BooleanType(), True),
        ]
    )
    key_col = key_column
    val_col = value_column
    armed = timeout == "ProcessingTimeTimeout"
    duration = int(timeout_duration_ms)

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if state.hasTimedOut:
            n, total = state.get if state.exists else (0, 0.0)
            state.remove()
            yield _pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "total_value": [total],
                 "is_final": [True]}
            )
            return

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[val_col].fillna(0.0).sum())
        state.update((n, float(total)))
        if armed:
            state.setTimeoutDuration(duration)
        yield _pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total],
             "is_final": [False]}
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=_TIMEOUTS[timeout],
        )
    )
