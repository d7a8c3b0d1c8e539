"""Multi-stream manager.

Fixes the reference's serialization defect (SURVEY.md §3.2): the
reference blocks on ``query.awaitTermination()`` inside each writer
(``lakehouse/DeltaLakeWriter.scala:89``), so job 2 in a config never
starts. Here all streams launch first, then the caller awaits any/all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamManager:
    spark: SparkSession
    queries: list[StreamingQuery] = field(default_factory=list)

    def register(self, query: StreamingQuery) -> StreamingQuery:
        self.queries.append(query)
        return query

    def await_any(self, timeout: float | None = None) -> bool:
        """Block until one of THIS manager's registered queries
        terminates. resetTerminated first: awaitAnyTermination otherwise
        returns immediately if ANY query in the session ever terminated
        (e.g. an earlier availableNow catch-up job), which would let a
        caller fall through and stop still-active streams."""
        self.spark.streams.resetTerminated()
        if not self.active:
            return True
        return self.spark.streams.awaitAnyTermination(timeout)

    def await_all(self) -> None:
        for q in self.queries:
            q.awaitTermination()

    def process_all_available(self) -> None:
        """Drain every registered stream (test/batch-catchup helper)."""
        for q in self.queries:
            q.processAllAvailable()

    def stop_all(self) -> None:
        for q in self.queries:
            if q.isActive:
                q.stop()

    @property
    def active(self) -> list[StreamingQuery]:
        return [q for q in self.queries if q.isActive]
