"""As-of join unit tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_ingestion_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "L1"),
            (1, _ts("2024-01-01 12:00:00"), "L2"),
            (2, _ts("2024-01-01 09:00:00"), "L3"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "L4"),  # key with no right rows
        ],
        "key int, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 10:00:00"), 20.0),  # tie with L1 -> included
            (1, _ts("2024-01-01 11:00:00"), 30.0),
            (2, _ts("2024-01-01 09:30:00"), 40.0),
        ],
        "key int, ts timestamp, val double",
    )
    return left, right


def test_backward_match_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, by=["key"], left_on="ts", right_on="ts")
    got = {r["lbl"]: r["val"] for r in out.collect()}
    # tie (right.ts == left.ts) matches; latest-at-or-before wins
    assert got == {"L1": 20.0, "L2": 30.0, "L3": None, "L4": None}


def test_left_rows_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, by=["key"], left_on="ts", right_on="ts")
    assert out.count() == left.count()
    assert set(out.columns) == {"key", "ts", "lbl", "val", "_asof_matched_time"}


def test_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, by=["key"], left_on="ts", right_on="ts",
        tolerance_seconds=1800.0,
    )
    got = {r["lbl"]: r["val"] for r in out.collect()}
    # L2 at 12:00 only has a right row at 11:00 — 3600s > tolerance
    assert got == {"L1": 20.0, "L2": None, "L3": None, "L4": None}


def test_name_collision_gets_suffix(spark):
    left, right = _frames(spark)
    right2 = right.withColumnRenamed("val", "lbl")  # collides with left.lbl
    out = asof_join(left, right2, by=["key"], left_on="ts", right_on="ts")
    assert "lbl_right" in out.columns and "lbl" in out.columns


def test_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, by=["key"], left_on="ts", right_on="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union+window formulation: exactly one exchange, no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_ntz_dst_session_timezone_raises(spark):
    """TIMESTAMP_NTZ through relative-time operators under a DST session
    timezone must raise (the interpretation offset no longer cancels);
    fixed-offset zones pass."""
    import pytest
    from pyspark.sql import functions as F

    from lakehouse_ingestion_spark.functions.timeutil import (
        _is_fixed_offset_zone,
    )
    from lakehouse_ingestion_spark.operators.asof import asof_join
    from lakehouse_ingestion_spark.operators.range_join import range_join

    assert _is_fixed_offset_zone("UTC")
    assert _is_fixed_offset_zone("+05:30")
    assert _is_fixed_offset_zone("Etc/GMT+5")
    assert not _is_fixed_offset_zone("America/New_York")
    assert not _is_fixed_offset_zone("not/a_zone")

    left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "k long, ts string")
    left = left.select("k", F.to_timestamp_ntz("ts").alias("ts"))
    right = left.select("k", F.col("ts").alias("rts"), F.lit(1).alias("v"))
    assert dict(left.dtypes)["ts"] == "timestamp_ntz"

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="TIMESTAMP_NTZ"):
            asof_join(left, right, ["k"], "ts", "rts")
        with pytest.raises(ValueError, match="TIMESTAMP_NTZ"):
            range_join(left, right, "ts", "rts", -60.0, 60.0)
        # fixed offset: both plan fine
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert asof_join(left, right, ["k"], "ts", "rts").count() == 1
        assert range_join(left, right, "ts", "rts", -60.0, 60.0).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
