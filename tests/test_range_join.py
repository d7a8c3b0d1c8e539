"""Bucketed range join tests (operators/range_join.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from lakehouse_ingestion_spark.operators.range_join import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),
            (2, _ts("2024-01-01 11:00:00")),
        ],
        "lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:56:00")),  # within -5min of L1
            (11, _ts("2024-01-01 10:05:00")),  # exactly +5min of L1 (boundary)
            (12, _ts("2024-01-01 10:30:00")),  # matches nothing
            (13, _ts("2024-01-01 10:57:30")),  # within -5min of L2
        ],
        "rid int, rts timestamp",
    )
    return left, right


def test_inner_matches_and_boundaries(spark):
    left, right = _frames(spark)
    out = range_join(left, right, "ts", "rts", -300.0, 300.0)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 10), (1, 11), (2, 13)]


def test_no_duplicate_pairs_across_buckets(spark):
    left, right = _frames(spark)
    out = range_join(left, right, "ts", "rts", -300.0, 300.0)
    rows = [(r["lid"], r["rid"]) for r in out.collect()]
    assert len(rows) == len(set(rows))


def test_left_join_keeps_unmatched(spark):
    left, right = _frames(spark)
    # narrow window: only L2<->13 matches
    out = range_join(left, right, "ts", "rts", -180.0, 0.0, how="left")
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, None), (2, 13)]


def test_extra_keys(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00"))], "lid int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, "a", _ts("2024-01-01 10:01:00")),
            (11, "b", _ts("2024-01-01 10:01:00")),  # right key mismatch
        ],
        "rid int, k string, rts timestamp",
    )
    out = range_join(left, right, "ts", "rts", -300.0, 300.0, extra_keys=["k"])
    assert [(r["lid"], r["rid"]) for r in out.collect()] == [(1, 10)]


def test_no_nested_loop_in_plan(spark):
    left, right = _frames(spark)
    out = range_join(left, right, "ts", "rts", -300.0, 300.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_invalid_bounds(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        range_join(left, right, "ts", "rts", 300.0, -300.0)


def test_left_join_with_shared_column_names(spark):
    # regression: both sides call their time column "ts"
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (2, _ts("2024-01-01 20:00:00"))],
        "lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:01:00"))], "rid int, ts timestamp"
    )
    out = range_join(left, right, "ts", "ts", -300.0, 300.0, how="left")
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert got == [(1, 10), (2, None)]


def test_left_join_wide_row_with_map_column(spark):
    """The left-path dedup window must key on the synthetic row id, not
    on all left columns — a map-typed column cannot be a window
    partition key (maps are un-orderable), and duplicate wide rows must
    still each survive exactly once."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), {"a": 1}, "x"),
            (1, _ts("2024-01-01 10:00:00"), {"a": 1}, "x"),  # exact dup row
            (2, _ts("2024-01-01 20:00:00"), {"b": 2}, "y"),
        ],
        "lid int, ts timestamp, meta map<string,int>, tag string",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:01:00"))], "rid int, rts timestamp"
    )
    out = range_join(left, right, "ts", "rts", -300.0, 300.0, how="left")
    rows = sorted(
        (r["lid"], r["rid"], r["tag"]) for r in out.collect()
    )
    # both duplicate lid=1 rows match rid=10; the unmatched lid=2 row
    # survives exactly once
    assert rows == [(1, 10, "x"), (1, 10, "x"), (2, None, "y")]
    assert out.filter(F.col("meta").isNotNull()).count() == 3


def test_left_join_window_keys_on_single_synthetic_id(spark):
    """Plan assertion: the dedup window partitions by ONE key (the
    synthetic row id), regardless of left-table width."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a", "b", "c")],
        "lid int, ts timestamp, c1 string, c2 string, c3 string",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:01:00"))], "rid int, rts timestamp"
    )
    out = range_join(left, right, "ts", "rts", -300.0, 300.0, how="left")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    windows = re.findall(
        r"windowspecdefinition\((.*?)specifiedwindowframe", plan
    )
    assert windows, plan
    for spec in windows:
        # spec = "partition keys..., [order keys...,]" before the frame —
        # the partition key list must be the single __rj_lid attribute
        keys = [s for s in spec.split(", ") if s]
        assert len(keys) == 1 and keys[0].startswith("__rj_lid"), spec


def test_left_row_key_formulation_matches_window_form(spark):
    """With a real PK, the left join plans as inner + anti-join union —
    it must produce exactly the window form's rows (map columns and all)
    and contain NO window in the plan."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), {"a": 1}, "x"),
            (2, _ts("2024-01-01 10:00:30"), {"b": 2}, "y"),
            (3, _ts("2024-01-01 20:00:00"), {"c": 3}, "z"),  # unmatched
        ],
        "lid int, ts timestamp, meta map<string,int>, tag string",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:01:00")),
            (11, _ts("2024-01-01 10:04:00")),
        ],
        "rid int, rts timestamp",
    )
    keyed = range_join(
        left, right, "ts", "rts", -300.0, 300.0, how="left",
        left_row_key="lid",
    )
    windowed = range_join(left, right, "ts", "rts", -300.0, 300.0, how="left")

    def canon(df):
        return sorted(
            (r["lid"], r["rid"], r["tag"], tuple(sorted((r["meta"] or {}).items())))
            for r in df.collect()
        )

    assert canon(keyed) == canon(windowed)
    assert keyed.schema == windowed.schema
    assert "windowspecdefinition" not in (
        keyed._jdf.queryExecution().optimizedPlan().toString()
    )
    # unmatched row null-padded exactly once
    assert canon(keyed).count((3, None, "z", (("c", 3),))) == 1


def test_left_row_key_validation(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:01:00"))], "rid int, rts timestamp"
    )
    with pytest.raises(ValueError, match="left_row_key"):
        range_join(
            left, right, "ts", "rts", -300.0, 300.0, how="left",
            left_row_key="nope",
        )
