"""Metrics (reference ``metrics/Metrics.scala:16-50`` — interface only).

Concrete here: ``observe``-based metric collection (no extra actions —
metrics ride the main job), a row-count metric, and a streaming listener
hook. SURVEY.md §4: avoid ``df.count()`` in hot paths; the reference
logs ``df.count()`` inside a streaming batch (``DeltaLakeWriter.scala:
105``) — an anti-pattern we replace with observed metrics.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


@dataclass
class MetricValue:
    name: str
    value: float
    tags: dict[str, str] = field(default_factory=dict)


@dataclass
class ObservedMetrics:
    """Attach named aggregate metrics to a DataFrame via ``observe``:
    they are computed as a side effect of whatever action the caller
    runs — zero additional scans."""

    observation: Observation
    df: DataFrame

    @classmethod
    def attach(cls, df: DataFrame, name: str, exprs: dict[str, Column]) -> "ObservedMetrics":
        obs = Observation(name)
        observed = df.observe(obs, *[c.alias(a) for a, c in exprs.items()])
        return cls(observation=obs, df=observed)

    def get(self) -> dict[str, float]:
        """Blocks until an action has run on the observed DataFrame."""
        return dict(self.observation.get)


def row_count_metrics(df: DataFrame, name: str = "ingest") -> ObservedMetrics:
    return ObservedMetrics.attach(df, name, {"rows": F.count(F.lit(1))})


class LoggingStreamListener:
    """StreamingQueryListener emitting per-batch MetricValues to the log
    (reference D20: row counts / durations to monitoring; swap the `emit`
    callable for a Prometheus/StatsD pusher in production).

    Implemented lazily: pyspark's StreamingQueryListener base is imported
    at attach time so the module stays importable in minimal setups.
    """

    def __init__(self, emit=None):
        self.emit = emit or (lambda m: log.info("stream-metric %s", m))
        self.records: list[MetricValue] = []

    def attach(self, spark) -> object:
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                for name, value in (
                    ("stream_input_rows", p.numInputRows),
                    ("stream_rows_per_sec", p.processedRowsPerSecond or 0.0),
                    ("stream_batch_duration_ms", (p.durationMs or {}).get("triggerExecution", 0)),
                ):
                    m = MetricValue(
                        name,
                        float(value),
                        tags={"query": str(p.name or p.id), "batch": str(p.batchId)},
                    )
                    outer.records.append(m)
                    outer.emit(m)

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        listener = _L()
        spark.streams.addListener(listener)
        return listener
