"""Winnowing fingerprints (operators/winnow.py): the winnowing
GUARANTEE (Schleimer et al. 2003, §3 — any shared substring of length
>= w + k - 1 shares at least one fingerprint), density, short-doc and
empty-doc conventions, the stop-fingerprint cap, and a pure-Python
reference equivalence under hypothesis.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap,
)

K, W = 5, 4


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_fps(text: str, k: int = K, w: int = W) -> set[int]:
    """Pure-Python reference: identical normalization, hashing, and
    window-min selection."""
    t = _norm(text)
    hashes = [_h60(t[i : i + k]) for i in range(len(t) - k + 1)]
    if not hashes:
        return set()
    n_windows = max(len(hashes) - w + 1, 1)
    return {min(hashes[s : s + w]) for s in range(n_windows)}


def _spark_fps(spark, texts, k: int = K, w: int = W):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = winnow_fingerprints(df, k=k, w=w)
    by_doc: dict[int, set[int]] = {i: set() for i in range(len(texts))}
    for r in out.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    return by_doc


def test_matches_python_reference(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "shrt",  # < k after normalization -> no fingerprints
        "exact",  # == k -> one k-gram, partial window -> one fp
        "  Spaces   and\tTABS  collapse\n\nto one  ",
        "",
    ]
    got = _spark_fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _ref_fps(t), f"doc {i}: {t!r}"


def test_winnowing_guarantee(spark):
    """Two documents sharing a substring of length w + k - 1 (in
    character space, after normalization) MUST share a fingerprint:
    the shared span contains a full window of w k-grams, whose minimum
    hash is selected in both."""
    shared = "zqxjvkwpby"[: W + K - 1] + "qq"  # comfortably >= w+k-1
    a = "aaaaaaaaaaaa " + shared + " bbbbbbbbbbbb"
    b = "cccccccccccc " + shared + " dddddddddddd"
    got = _spark_fps(spark, [a, b])
    assert got[0] & got[1], "guaranteed shared fingerprint missing"


@settings(max_examples=20, deadline=None)
@given(
    prefix=st.text(alphabet="abcdef gh", min_size=0, max_size=30),
    core=st.text(alphabet="mnopqrstuv", min_size=W + K - 1, max_size=W + K + 5),
    suffix=st.text(alphabet="wxyz jkl", min_size=0, max_size=30),
)
@pytest.mark.slow
def test_guarantee_property(spark, prefix, core, suffix):
    """Hypothesis sweep of the guarantee + reference equivalence. The
    shared core avoids whitespace so normalization cannot shrink it
    below the guarantee length."""
    a, b = prefix + core, core + suffix
    ref_a, ref_b = _ref_fps(a), _ref_fps(b)
    assert ref_a & ref_b  # theorem holds on the reference...
    got = _spark_fps(spark, [a, b])
    assert got[0] == ref_a and got[1] == ref_b  # ...and Spark == reference


def test_density(spark):
    """Expected fingerprint density is 2/(w+1) of k-grams (paper §4);
    allow a loose band — this catches an implementation that selects
    every window's min WITHOUT distinct-ing (density ~1) or only the
    global min (density ~1/m)."""
    text = " ".join(f"tok{i * 37 % 101}word{i}" for i in range(200))
    (fps,) = _spark_fps(spark, [text], k=8, w=16).values()
    m = len(_norm(text)) - 7
    density = len(fps) / m
    assert 0.05 < density < 0.30, density


def test_overlap_pairs_and_cap(spark):
    base = "the winnowing algorithm selects minimum hashes from windows"
    texts = [base, base + " with a tail", "completely different content here okay"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, k=5, w=4)
    pairs = {
        (r["a"], r["b"]): r["shared"]
        for r in winnow_overlap(fps, min_shared=2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert (0, 2) not in pairs and (1, 2) not in pairs
    # cap: with max_postings=1 every fp shared by 2+ docs is dropped
    assert winnow_overlap(fps, min_shared=1, max_postings=2).count() >= 1
    with pytest.raises(ConfigError):
        winnow_overlap(fps, min_shared=0)
    with pytest.raises(ConfigError):
        winnow_overlap(fps, max_postings=1)


def test_param_guards(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ConfigError):
        winnow_fingerprints(df, k=1)
    with pytest.raises(ConfigError):
        winnow_fingerprints(df, w=0)
