"""Custom stateful streaming operator via ``applyInPandasWithState``.

Implements a running per-key aggregate (count + sum + last-seen event
time) that survives across micro-batches — the pattern behind
sessionization, per-entity counters, and online feature computation.
State is per group key, watermark-evictable via timeout.

The state/batch function is self-contained (no module-global references)
so it pickles by value for executors without this package installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_AGG_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def running_aggregate(
    df: DataFrame,
    key_column: str,
    value_column: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Works on a streaming DataFrame grouped by ``key_column``; emits one
    updated row per key per micro-batch (update output mode).
    """
    key_col = key_column
    val_col = value_column

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[val_col].fillna(0.0).sum())
        state.update((n, float(total)))
        yield _pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_AGG_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout),
        )
    )
