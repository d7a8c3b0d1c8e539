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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = "Column | str"

# fixed-offset zone spellings Spark accepts that zoneinfo can't resolve:
# "+05:30", "-08:00", "UTC+8", "GMT-03:30", bare "UTC"/"GMT"/"Z"/"UT"
_FIXED_OFFSET_RE = re.compile(
    r"^(UTC|GMT|UT|Z)?([+-]\d{1,2}(:\d{2})?)?$", re.IGNORECASE
)


def _is_fixed_offset_zone(tz: str) -> bool:
    m = _FIXED_OFFSET_RE.match(tz.strip())
    # both groups optional means the regex matches "" — require at
    # least one to have actually matched
    if m and (m.group(1) or m.group(2)):
        return True
    try:
        from datetime import datetime, timedelta
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        # dense probe: every 10 days across two years. Month-start
        # probes miss zones whose entire DST window falls between them
        # (e.g. Africa/Casablanca's Ramadan-anchored ~5-week reversal);
        # no IANA zone has a DST interval shorter than ~3 weeks, so a
        # 10-day grid cannot skip over one.
        start = datetime(2025, 1, 1)
        offs = {
            z.utcoffset(start + timedelta(days=d)) for d in range(0, 730, 10)
        }
        return len(offs) == 1
    except Exception:
        # unresolvable zone: claim nothing — callers treat it as unsafe
        return False


def ensure_ntz_safe_session(
    df: DataFrame, ts_cols: list[str], op: str
) -> None:
    """Enforce the module-docstring contract at runtime: if any of
    ``ts_cols`` is ``TIMESTAMP_NTZ``, the session timezone must be a
    FIXED-offset zone (UTC, Etc/GMT+N, "+05:30", ...). Under a DST zone
    the NTZ wall-clock interpretation shifts by the transition, so
    as-of tolerances and range-window membership silently come out
    wrong by up to an hour — raise loudly instead."""
    ntz = [
        c
        for c in ts_cols
        if c in df.columns
        and df.schema[c].dataType.typeName() == "timestamp_ntz"
    ]
    if not ntz:
        return
    spark = df.sparkSession
    tz = spark.conf.get("spark.sql.session.timeZone")
    if not _is_fixed_offset_zone(tz):
        raise ValueError(
            f"{op}: column(s) {ntz} are TIMESTAMP_NTZ and the session "
            f"timezone {tz!r} observes DST (or cannot be resolved). "
            "Relative time arithmetic on the NTZ interpretation would "
            "shift across transitions; set "
            "spark.sql.session.timeZone=UTC (or any fixed-offset zone) "
            "or cast the column to TIMESTAMP explicitly."
        )


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
