"""Property-based tests (hypothesis) for the round-4 operators: funnel
vs a pure-Python reference fold, exact-Jaccard join vs brute force, and
group_cap invariants — randomized adversarial inputs (tiny vocabularies
and key spaces force ties, duplicates, and boundary thresholds).

Same pattern as test_property_joins.py: hypothesis generates DATA only;
the shared session fixture evaluates (deadline disabled)."""

from __future__ import annotations

import pytest

import datetime as dt
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_ingestion_spark.operators.funnel import funnel_stages
from lakehouse_ingestion_spark.operators.jaccard import jaccard_join

BASE = dt.datetime(2024, 1, 1)
STEPS = ["a", "b", "c"]

# small ts space forces equal-timestamp collisions (the strictness edge)
event = st.tuples(st.integers(0, 2), st.integers(0, 5), st.sampled_from("abcx"))
events = st.lists(event, min_size=0, max_size=30)


def _funnel_ref(rows, steps):
    """Reference: iterative min-time per stage, strictly increasing ts."""
    out = {}
    for u in {r[0] for r in rows}:
        evs = sorted((s, e) for (uu, s, e) in rows if uu == u)
        stage, last = 0, None
        for s, e in evs:
            if stage < len(steps) and e == steps[stage] and (
                last is None or s > last
            ):
                stage, last = stage + 1, s
        out[u] = stage
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=events)
def test_funnel_matches_reference_fold(spark, data):
    df = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s), e) for (u, s, e) in data],
        "user_id int, ts timestamp, event_type string",
    )
    got = {
        r["user"]: r["stage"]
        for r in funnel_stages(df, "user_id", "ts", "event_type", STEPS).collect()
    }
    want = {
        u: s
        for u, s in _funnel_ref(data, STEPS).items()
        # users with no step events at all drop out of the groupBy
        if any(uu == u and e in STEPS for (uu, _, e) in data)
    }
    assert got == want


# 3-letter vocabulary + short docs: heavy shingle overlap, boundary
# Jaccard values, empty-after-shingling docs
doc = st.lists(st.sampled_from("pqr"), min_size=0, max_size=8).map(" ".join)
docs = st.lists(doc, min_size=0, max_size=10)


def _shingle_ref(text, n=2):
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs, threshold=st.sampled_from([0.2, 0.5, 1.0]))
@pytest.mark.slow
def test_jaccard_join_lossless_random(spark, data, threshold):
    df = spark.createDataFrame(
        list(enumerate(data)), "doc_id int, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_join(
            df, "doc_id", "text", n=2, threshold=threshold
        ).collect()
    }
    want = {}
    sets = {i: _shingle_ref(t) for i, t in enumerate(data)}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        # raw jaccard since the round-7 rounding audit: same-integer
        # division is IEEE-exact, so the reference matches bit-for-bit
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            want[(a, b)] = j
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=0,
        max_size=30,
        unique_by=lambda r: r[1],
    ),
    cap=st.integers(1, 4),
)
def test_group_cap_invariants(spark, rows, cap):
    from lakehouse_ingestion_spark.operators.sampling import group_cap

    df = spark.createDataFrame(rows, "grp int, key int")
    kept = group_cap(df, "grp", "key", cap).collect()
    by_grp = {}
    for r in kept:
        by_grp.setdefault(r["grp"], []).append(r["key"])
    # never exceeds the cap; groups under the cap keep everything
    sizes = {g: len([1 for gg, _ in rows if gg == g]) for g, _ in rows}
    for g, ks in by_grp.items():
        assert len(ks) <= cap
        assert len(ks) == min(cap, sizes[g])
    assert sum(len(v) for v in by_grp.values()) == sum(
        min(cap, s) for s in sizes.values()
    )


def _lev_ref(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=7).map("".join),
        min_size=0,
        max_size=12,
    ),
    k=st.integers(1, 3),
)
@pytest.mark.slow
def test_edit_distance_join_lossless_random(spark, data, k):
    """PassJoin candidate generation must be complete AND the verify
    exact: identical output to brute-force Levenshtein on adversarial
    tiny-alphabet strings (ties, empties, length skews)."""
    from lakehouse_ingestion_spark.operators.editdist import edit_distance_join

    df = spark.createDataFrame(list(enumerate(data)), "id int, s string")
    got = sorted(
        (r["id_a"], r["id_b"], r["distance"])
        for r in edit_distance_join(df, "id", "s", k=k).collect()
    )
    want = sorted(
        (i, j, _lev_ref(a, b))
        for (i, a) in enumerate(data)
        for (j, b) in enumerate(data)
        if i < j and _lev_ref(a, b) <= k
    )
    assert got == want
