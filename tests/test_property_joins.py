"""Property-based tests (hypothesis): custom join operators vs
brute-force reference implementations on randomized inputs.

Spark-session-per-example is too slow, so examples generate DATA and a
single session (conftest fixture) evaluates them; deadline disabled
accordingly.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_ingestion_spark.operators.asof import asof_join
from lakehouse_ingestion_spark.operators.range_join import range_join

BASE = dt.datetime(2024, 1, 1)

# (key, offset_seconds) pairs; small key space forces collisions,
# offsets collide too (tie cases)
row = st.tuples(st.integers(0, 3), st.integers(0, 120))
rows = st.lists(row, min_size=0, max_size=25)


def _to_df(spark, data, prefix):
    return spark.createDataFrame(
        [
            (k, BASE + dt.timedelta(seconds=s), f"{prefix}{i}")
            for i, (k, s) in enumerate(data)
        ],
        f"key int, ts timestamp, {prefix}id string",
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf, rdf = _to_df(spark, left, "l"), _to_df(spark, right, "r")
    got = {
        r["lid"]: r["_asof_matched_time"]
        for r in asof_join(
            ldf, rdf, by=["key"], left_on="ts", right_on="ts",
            value_columns=[],
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        lts = BASE + dt.timedelta(seconds=s)
        cand = [
            BASE + dt.timedelta(seconds=rs)
            for (rk, rs) in right
            if rk == k and rs <= s
        ]
        expected = max(cand) if cand else None
        assert got[f"l{i}"] == expected, (i, k, s)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows, lo=st.integers(-60, 0), span=st.integers(1, 90))
def test_range_join_matches_bruteforce(spark, left, right, lo, span):
    hi = lo + span
    ldf, rdf = _to_df(spark, left, "l"), _to_df(spark, right, "r")
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            ldf, rdf, "ts", "ts", float(lo), float(hi)
        ).collect()
    )
    expected = sorted(
        (f"l{i}", f"r{j}")
        for i, (_, ls) in enumerate(left)
        for j, (_, rs) in enumerate(right)
        if ls + lo <= rs <= ls + hi
    )
    assert got == expected
