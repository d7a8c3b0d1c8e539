"""Property-based tests (hypothesis) for the round-5 curation operators:
duplicated-span extraction vs a brute-force reference, line-dedup
reassembly invariants, novelty bounds, and semantic-dedup consistency.

Same pattern as test_property_curation.py: hypothesis generates DATA
only; the shared session fixture evaluates (deadline disabled)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_ingestion_spark.operators.linededup import dedup_lines
from lakehouse_ingestion_spark.operators.substr_dedup import (
    dup_stats,
    duplicated_spans,
    ngram_novelty,
)

# tiny vocabulary forces real cross-doc shingle collisions
doc = st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(" ".join)
docs = st.lists(doc, min_size=1, max_size=6)


def _spans_ref(texts, k):
    """Brute force: mark every position whose k-shingle occurs >= 2
    times corpus-wide; merge overlapping/adjacent marks into spans."""
    toks = [t.lower().split() for t in texts]
    counts: dict[tuple, int] = {}
    for tk in toks:
        for i in range(len(tk) - k + 1):
            key = tuple(tk[i : i + k])
            counts[key] = counts.get(key, 0) + 1
    out = {}
    for d_id, tk in enumerate(toks):
        marks = [
            (i, i + k - 1)
            for i in range(len(tk) - k + 1)
            if counts[tuple(tk[i : i + k])] >= 2
        ]
        spans = []
        for s, e in marks:
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((s, e))
        out[d_id] = spans
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs, k=st.integers(1, 3))
def test_duplicated_spans_match_brute_force(spark, data, k):
    df = spark.createDataFrame(
        list(enumerate(data)), "doc_id long, text string"
    )
    got: dict[int, list] = {i: [] for i in range(len(data))}
    for r in duplicated_spans(df, k=k).collect():
        got[r["doc_id"]].append((r["span_start"], r["span_end"]))
    ref = _spans_ref(data, k)
    for d_id in ref:
        assert sorted(got[d_id]) == ref[d_id], (data, k, d_id)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs, k=st.integers(1, 3))
@pytest.mark.slow
def test_dup_stats_bounds(spark, data, k):
    rows = dup_stats(
        spark.createDataFrame(list(enumerate(data)), "doc_id long, text string"),
        k=k,
    ).collect()
    assert len(rows) == len(data)  # no silent row loss
    for r in rows:
        n_tok = len(data[r["doc_id"]].split())
        assert 0 <= r["dup_tokens"] <= n_tok
        assert 0.0 <= r["dup_token_frac"] <= 1.0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs)
@pytest.mark.slow
def test_line_dedup_identity_when_threshold_huge(spark, data):
    """With max_occurrences >= corpus line count, only blank lines are
    removed — every non-blank line survives in order."""
    joined = ["\n".join(d.split()) for d in data]  # one token per line
    df = spark.createDataFrame(
        list(enumerate(joined)), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(df, max_occurrences=10_000).collect()
    }
    for i, t in enumerate(joined):
        expect = "\n".join(ln for ln in t.split("\n") if ln.strip())
        assert out[i]["text"] == expect
        assert out[i]["n_lines_dropped"] == 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs, k=st.integers(1, 3))
def test_ngram_novelty_bounds_and_first_doc(spark, data, k):
    df = spark.createDataFrame(
        list(enumerate(data)), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(df, k=k).collect()}
    assert set(rows) == set(range(len(data)))
    first_seen = None
    for i, t in enumerate(data):
        n_tok = len(t.split())
        if n_tok >= k:
            assert rows[i]["n_shingles"] >= 1
            assert 0.0 <= rows[i]["novelty"] <= 1.0
            if first_seen is None:
                first_seen = i
                # the first doc with shingles introduces all of them
                assert rows[i]["novelty"] == 1.0
        else:
            assert rows[i]["n_shingles"] == 0
            assert rows[i]["novelty"] is None


# ------------------------------------------------------------- resample ----
ts_strat = st.integers(0, 60 * 60 * 8)  # seconds across 8 hours
obs = st.lists(
    st.tuples(st.sampled_from("ab"), ts_strat, st.integers(-5, 5)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=obs)
def test_resample_ffill_matches_pandas(spark, data):
    """Hourly ffill grid must equal pandas' resample('h').last().ffill()
    per key (pandas keeps the last observation per cell and carries it
    forward — the exact operator contract)."""
    import datetime as dt

    import pandas as pd

    from lakehouse_ingestion_spark.operators.resample import resample_ffill

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(seconds=s), float(v)) for k, s, v in data
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        (r["k"], r["grid_ts"]): r["v_ffill"]
        for r in resample_ffill(df, ["k"], "ts", "v", 3600).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    want = {}
    for k, g in pdf.groupby("k"):
        # same tie-break as the operator: max ts, then max value
        g = g.sort_values(["ts", "v"]).set_index("ts")
        ser = g["v"].resample("h").last().ffill()
        # pandas grid spans min..max cell like the operator
        for t, v in ser.items():
            want[(k, t.to_pydatetime())] = v
    assert got == want, (sorted(got.items()), sorted(want.items()))
