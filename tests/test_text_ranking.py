"""Tests for operators/quality.py and operators/text_ranking.py
(quality rule chains, n-gram top-k, TF-IDF, BM25)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.operators.quality import (
    QualityRule,
    apply_quality_rules,
    default_quality_rules,
)
from lakehouse_ingestion_spark.operators.text_ranking import (
    bm25,
    build_vocab,
    ngram_topk,
    tfidf,
    tokens_to_ids,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_rules_fail_reasons(spark):
    # 45 tokens, all distinct (repetition rule needs >= 0.3 distinct ratio)
    good = " ".join(
        ["the", "and", "of", "to", "is"]
        + [f"{a}{b}ua" for a in "bcdfghjk" for b in "aeiou"]
    )
    short = "the cat"  # fails length
    digits = "12 34 56 78 90 " * 8  # fails alpha + stopword
    repeated = ("spam " * 40).strip()  # fails repetition + stopword
    df = _docs(
        spark,
        [(1, good), (2, short), (3, digits), (4, repeated)],
    )
    out = {
        r["doc_id"]: (r["failed_rules"], r["keep"])
        for r in apply_quality_rules(df, default_quality_rules()).collect()
    }
    assert out[1] == ([], True)
    assert out[2] == (["length"], False)
    assert "alpha_ratio" in out[3][0] and "stopword" in out[3][0]
    assert not out[3][1]
    assert "repetition" in out[4][0]
    assert not out[4][1]


def test_quality_rules_null_predicate_is_failure(spark):
    df = _docs(spark, [(1, None)])
    rules = [QualityRule("notnull_len", lambda t: F.length(t) > 0)]
    row = apply_quality_rules(df, rules).collect()[0]
    assert row["failed_rules"] == ["notnull_len"]
    assert row["keep"] is False


def test_quality_rules_duplicate_names_rejected(spark):
    df = _docs(spark, [(1, "x")])
    r = QualityRule("a", lambda t: F.lit(True))
    with pytest.raises(ValueError, match="duplicate"):
        apply_quality_rules(df, [r, r])
    with pytest.raises(ValueError, match="at least one"):
        apply_quality_rules(df, [])


def test_word_ngrams_edges(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "solo"), (3, "  "), (4, "X  y\tz")])
    out = {
        r["doc_id"]: r["ng"]
        for r in df.select("doc_id", word_ngrams("text", 2).alias("ng")).collect()
    }
    assert out[1] == ["a b", "b c", "c d"]
    assert out[2] == []  # fewer tokens than n
    assert out[3] == []  # whitespace-only
    assert out[4] == ["x y", "y z"]  # lowercased, any-whitespace split


def test_ngram_topk_ranks_and_ties(spark):
    df = _docs(
        spark,
        [(1, "a b a b"), (2, "a b c d"), (3, "z z z z z")],
    )
    rows = ngram_topk(df, n=2, k=2).collect()
    got = [(r["ngram"], r["n_occur"], r["rk"]) for r in rows]
    # "a b" x3; "z z" x4 -> top; tie-break among count-3 peers is lexicographic
    assert got[0] == ("z z", 4, 1) or ("z z", 4, 1) in got
    assert ("a b", 3, 2) in got or ("a b", 3, 1) in got


def test_tfidf_matches_math(spark):
    df = _docs(spark, [(1, "x x y"), (2, "x z")])
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf(df).collect()
    }
    # x appears in both docs -> idf = ln(2/2) = 0
    assert out[(1, "x")] == (2, 2, 0.0)
    assert out[(2, "x")] == (1, 2, 0.0)
    assert out[(1, "y")] == (1, 1, round(math.log(2.0), 6))
    assert out[(2, "z")] == (1, 1, round(math.log(2.0), 6))


def test_bm25_scores_and_pruning(spark):
    df = _docs(
        spark,
        [(1, "spark spark table"), (2, "spark alone here"), (3, "no match text")],
    )
    rows = {r["doc_id"]: r["score"] for r in bm25(df, ["spark", "table"]).collect()}
    assert 3 not in rows  # no query term -> pruned before aggregation
    assert rows[1] > rows[2]  # more matches + rarer term -> higher score
    n, k1, b = 3, 1.2, 0.75
    avgdl = 3.0
    def _idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def _norm(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    want1 = round(_idf(2) * _norm(2, 3) + _idf(1) * _norm(1, 3), 6)
    assert rows[1] == pytest.approx(want1, abs=1e-6)
    with pytest.raises(ValueError, match="at least one"):
        bm25(df, [])


def test_build_vocab_rank_and_cap(spark):
    df = _docs(spark, [(1, "b b b a a c"), (2, "a d")])
    vocab = {
        r["term"]: (r["vocab_id"], r["n_occur"])
        for r in build_vocab(df).collect()
    }
    # a:3 b:3 (tie -> term asc), c:1 d:1 (tie -> term asc)
    assert vocab == {"a": (1, 3), "b": (2, 3), "c": (3, 1), "d": (4, 1)}
    capped = build_vocab(df, max_size=2)
    assert {r["term"] for r in capped.collect()} == {"a", "b"}


def test_tokens_to_ids_positions_and_oov(spark):
    df = _docs(spark, [(1, "b a zz b")])
    vocab = build_vocab(_docs(spark, [(9, "a a b")]))  # zz is OOV
    rows = sorted(
        (r["pos"], r["token_id"])
        for r in tokens_to_ids(df, vocab).collect()
    )
    # positions keep the original stream; pos 2 (zz) is a dropped gap
    assert rows == [(0, 2), (1, 1), (3, 2)]


def test_build_vocab_uncapped_distributed_rank_many_partitions(spark):
    """Uncapped vocab ranks via range repartition + cumulative partition
    offsets — verify the rank sequence is exactly 1..|vocab| in
    (count desc, term asc) order when the table genuinely spans many
    range partitions."""
    # 500 distinct terms, term_i appears (i % 17) + 1 times
    rows = []
    doc = 0
    for i in range(500):
        reps = (i % 17) + 1
        rows.append((doc, " ".join([f"t{i:03d}"] * reps)))
        doc += 1
    df = _docs(spark, rows)
    got = [
        (r["term"], r["n_occur"], r["vocab_id"])
        for r in build_vocab(df).collect()
    ]
    got.sort(key=lambda t: t[2])
    assert [g[2] for g in got] == list(range(1, 501))
    expect = sorted(got, key=lambda t: (-t[1], t[0]))
    assert got == expect


def test_blocklist_rule(spark):
    """C4-style bad-words rule: token-boundary (no Scunthorpe
    substring hits), case-insensitive, zero-tolerance and thresholded
    modes, empty docs pass, fused plan stays shuffle-free."""
    import pytest

    from lakehouse_ingestion_spark.operators.quality import (
        apply_quality_rules,
        blocklist_rule,
    )

    df = spark.createDataFrame(
        [
            (0, "a clean document with classic words"),  # 'class' substring must NOT trip
            (1, "this has one BAD word in nine total tokens ok"),
            (2, "bad bad bad"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    strict = apply_quality_rules(df, [blocklist_rule(["bad"])])
    got = {r["doc_id"]: r["keep"] for r in strict.collect()}
    assert got == {0: True, 1: False, 2: False, 3: True}

    loose = apply_quality_rules(
        df, [blocklist_rule(["bad"], max_ratio=0.2)]
    )
    got2 = {r["doc_id"]: r["keep"] for r in loose.collect()}
    # doc 1: 1/10 tokens = 0.1 <= 0.2 passes; doc 2: 3/3 fails
    assert got2 == {0: True, 1: True, 2: False, 3: True}

    plan = strict._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with pytest.raises(ValueError, match="at least one word"):
        blocklist_rule([])
    with pytest.raises(ValueError, match="max_ratio"):
        blocklist_rule(["x"], max_ratio=1.0)
