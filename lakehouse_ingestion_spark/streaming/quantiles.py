"""Streaming per-key quantile tracking with bounded t-digest state.

The streaming counterpart to ``operators/sketches.quantile_sketches``:
exact streaming percentiles need every value ever seen; the digest
needs ~``compression`` centroids per key, forever. Each micro-batch
folds its values into the key's digest with the same cosine-spaced
rank-bin compression the batch operator uses (Dunning & Ertl t-digest,
merging formulation), so

- state per key is CONSTANT (<= compression (mean, weight) pairs +
  min/max/n), regardless of stream length;
- the fold is associative in the sketch sense: batch-then-merge equals
  one big digestion up to bounded rank error (~pi/(2*compression) per
  digestion interior, tighter at the tails where the bins are narrow);
- emission (update mode) is the current quantile estimates after each
  batch that saw data for the key — the live p50/p95/p99 dashboard row.

Idle keys evict via the optional processing-time timeout, same contract
as the other stateful operators here. The state/batch function is
self-contained (no module-global references) so it pickles by value.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("mn", DoubleType(), True),
        StructField("mx", DoubleType(), True),
        StructField("means", ArrayType(DoubleType()), True),
        StructField("weights", ArrayType(DoubleType()), True),
    ]
)

_TIMEOUTS = {
    "NoTimeout": GroupStateTimeout.NoTimeout,
    "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
}


def streaming_quantiles(
    df: DataFrame,
    key_column: str,
    value_column: str,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    compression: int = 400,
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 3_600_000,
) -> DataFrame:
    """Per-key running quantile estimates: emits one row per key per
    micro-batch that carried data for it — ``(key, n, q_50, q_95, ...)``
    with column names derived from the requested quantiles (``0.95`` ->
    ``q_95``; fractional tails keep digits: ``0.999`` -> ``q_999``).
    State: one bounded t-digest per key. Update output mode."""
    qs = [float(q) for q in quantiles]
    if not qs:
        raise ValueError("quantiles must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0,1], got {quantiles}")
    if compression < 8:
        raise ValueError(f"compression must be >= 8, got {compression}")
    if timeout not in _TIMEOUTS:
        raise ValueError(
            f"unknown timeout {timeout!r}; expected one of {sorted(_TIMEOUTS)}"
        )

    def _qname(q: float) -> str:
        s = f"{q:.10f}".rstrip("0").lstrip("0").strip(".")
        return f"q_{s or '0'}"

    qnames = [_qname(q) for q in qs]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"duplicate quantiles: {quantiles}")
    key_field = df.schema[key_column]
    out_schema = StructType(
        [
            StructField(key_column, key_field.dataType, True),
            StructField("n", LongType(), True),
            *[StructField(nm, DoubleType(), True) for nm in qnames],
        ]
    )
    key_col = key_column
    val_col = value_column
    n_bins = int(compression)
    armed = timeout == "ProcessingTimeTimeout"
    duration = int(timeout_duration_ms)

    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        if state.hasTimedOut:
            state.remove()
            return

        def _compress(means, weights):
            tot = float(weights.sum())
            if len(means) <= 1 or tot <= 0.0:
                return means, weights
            mid = _np.cumsum(weights) - weights / 2.0
            j = _np.arange(1, n_bins)
            bounds = (1.0 - _np.cos(_np.pi * j / n_bins)) / 2.0 * tot
            idx = _np.searchsorted(bounds, mid, side="right")
            w = _np.bincount(idx, weights=weights, minlength=n_bins)
            m = _np.bincount(idx, weights=weights * means, minlength=n_bins)
            keep = w > 0
            return m[keep] / w[keep], w[keep]

        def _estimate(means, weights, mn, mx, q):
            tot = float(weights.sum())
            target = q * tot
            mid = _np.cumsum(weights) - weights / 2.0
            if target <= mid[0]:
                return float(
                    mn + (means[0] - mn) * (target / mid[0])
                    if mid[0] > 0
                    else means[0]
                )
            if target >= mid[-1]:
                span = tot - mid[-1]
                return float(
                    means[-1] + (mx - means[-1]) * ((target - mid[-1]) / span)
                    if span > 0
                    else mx
                )
            return float(_np.interp(target, mid, means))

        if state.exists:
            n, mn, mx, means_l, weights_l = state.get
            means = _np.asarray(means_l, dtype="float64")
            weights = _np.asarray(weights_l, dtype="float64")
        else:
            n, mn, mx = 0, None, None
            means = _np.array([], dtype="float64")
            weights = _np.array([], dtype="float64")

        saw = False
        for pdf in batches:
            v = pdf[val_col].astype("float64").to_numpy()
            v = v[~_np.isnan(v)]
            if len(v) == 0:
                continue
            saw = True
            v = _np.sort(v)
            mn = float(v[0]) if mn is None else min(mn, float(v[0]))
            mx = float(v[-1]) if mx is None else max(mx, float(v[-1]))
            n += len(v)
            allm = _np.concatenate([means, v])
            allw = _np.concatenate([weights, _np.ones(len(v))])
            order = _np.argsort(allm, kind="stable")
            means, weights = _compress(allm[order], allw[order])

        state.update(
            (int(n), mn, mx, means.tolist(), weights.tolist())
        )
        if armed:
            state.setTimeoutDuration(duration)
        if saw:
            row = {key_col: [key[0]], "n": [int(n)]}
            for q, nm in zip(qs, qnames):
                row[nm] = [_estimate(means, weights, mn, mx, q)]
            yield _pd.DataFrame(row)

    return df.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_TIMEOUTS[timeout],
    )
