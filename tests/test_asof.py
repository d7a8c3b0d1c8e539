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
