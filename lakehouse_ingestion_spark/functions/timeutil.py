"""Type-robust epoch conversions for timestamp-like columns.

Spark 4 distinguishes ``TIMESTAMP`` (instant, session-tz rendered) from
``TIMESTAMP_NTZ`` (wall clock, no zone). Parquet written with plain
microsecond timestamps (no ``isAdjustedToUTC`` flag) reads as NTZ, and two
common epoch idioms then throw ``AnalysisException``:

- ``F.unix_micros(ntz_col)``           -> UNEXPECTED_INPUT_TYPE
- ``ntz_col.cast("double")``           -> CAST_WITHOUT_SUGGESTION

Time operators (as-of join, range join, sessionization, Kafka encode) must
not care which flavor a fixture happens to decode as.  The helpers here
route every timestamp-like input through ``cast("timestamp")`` first — a
no-op for ``TIMESTAMP``, a session-tz wall-clock interpretation for
``TIMESTAMP_NTZ``, and seconds-since-epoch for numerics — then convert.

Relative uses (differences, bucketing, ordering) are exact only when the
session timezone has a FIXED offset (UTC, Etc/GMT+N): the NTZ
interpretation offset is then a constant that cancels.  Under a DST zone
(e.g. America/New_York) differences spanning a transition are off by the
shift, and nonexistent local times collapse — so as-of tolerances and
range-window membership could be wrong by up to an hour.  Callers that
feed NTZ columns through these helpers must pin
``spark.sql.session.timeZone=UTC`` (as ``__spark_entry__._events`` does);
absolute uses compared against an engine that reads NTZ as UTC (DuckDB)
need the same pin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def _col(c: "Column | str") -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_instant(c: "Column | str") -> Column:
    """The column as a ``TIMESTAMP`` instant, whatever it started as."""
    return _col(c).cast("timestamp")


def epoch_seconds(c: "Column | str") -> Column:
    """Seconds since epoch as ``double`` (fractional seconds preserved)."""
    return as_instant(c).cast("double")


def epoch_micros(c: "Column | str") -> Column:
    """Microseconds since epoch as ``bigint`` (NTZ-safe ``unix_micros``)."""
    return F.unix_micros(as_instant(c))
