"""Round-5 curation operators: free-text PII scrubbing, line-level
boilerplate dedup, bigram-LM perplexity, semantic dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.operators.linededup import dedup_lines, line_stats
from lakehouse_ingestion_spark.operators.lm_score import (
    score_perplexity,
    train_bigram_lm,
)
from lakehouse_ingestion_spark.operators.pii import scrub_text
from lakehouse_ingestion_spark.operators.semdedup import semantic_dedup


# ---------------------------------------------------------------- pii ----
def test_scrub_text_all_patterns(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail a@b.io call 555-123-4567 ip 10.0.0.1 "
                "ssn 123-45-6789 card 4111-1111-1111-1111",
            ),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = scrub_text(df, out_col="scrubbed").orderBy("doc_id").collect()
    s1 = out[0]["scrubbed"]
    assert "<EMAIL>" in s1 and "<PHONE>" in s1 and "<IP>" in s1
    assert "<SSN>" in s1 and "<CARD>" in s1
    assert "a@b.io" not in s1 and "4111" not in s1
    assert out[0]["pii_email_n"] == 1
    assert out[0]["pii_credit_card_n"] == 1
    assert out[0]["pii_ssn_n"] == 1
    assert out[0]["pii_phone_n"] == 1
    assert out[0]["pii_ipv4_n"] == 1
    assert out[1]["scrubbed"] == "no pii here at all"
    assert out[1]["pii_email_n"] == 0


def test_scrub_text_card_not_half_matched_as_phone(spark):
    # card runs before phone: the 16-digit dashed run must become ONE
    # <CARD>, never a partial <PHONE> bite
    df = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 now")], "doc_id long, text string"
    )
    row = scrub_text(df).collect()[0]
    assert row["text"] == "pay <CARD> now"
    assert row["pii_phone_n"] == 0


def test_scrub_text_in_place_and_validation(spark):
    df = spark.createDataFrame([(1, "x a@b.io")], "doc_id long, text string")
    out = scrub_text(df, count_cols=False)
    assert out.columns == ["doc_id", "text"]
    assert out.collect()[0]["text"] == "x <EMAIL>"
    from lakehouse_ingestion_spark.errors import ConfigError

    with pytest.raises(ConfigError):
        scrub_text(df, patterns=[])
    with pytest.raises(ConfigError):
        scrub_text(df, patterns=[("a", r"x", "y"), ("a", r"z", "w")])


# ----------------------------------------------------------- linededup ----
def test_line_stats_positions_and_hash(spark):
    df = spark.createDataFrame(
        [(1, "Alpha\nbeta\n ALPHA ")], "doc_id long, text string"
    )
    rows = line_stats(df).orderBy("pos").collect()
    assert [r["pos"] for r in rows] == [0, 1, 2]
    # normalized hashing: 'Alpha' and ' ALPHA ' collide, 'beta' doesn't
    assert rows[0]["line_hash"] == rows[2]["line_hash"]
    assert rows[0]["line_hash"] != rows[1]["line_hash"]
    assert rows[2]["line"] == " ALPHA "  # original text preserved


def test_dedup_lines_drops_corpus_frequent(spark):
    df = spark.createDataFrame(
        [
            (1, "cookie banner\nunique one"),
            (2, "cookie banner\nunique two"),
            (3, "cookie banner\nunique three"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(df, max_occurrences=2).collect()
    }
    assert out[1]["text"] == "unique one"
    assert out[2]["text"] == "unique two"
    assert out[1]["n_lines_dropped"] == 1
    # threshold honored: occurrences <= max survive
    kept = dedup_lines(df.limit(2), max_occurrences=2).collect()
    assert all("cookie banner" in r["text"] for r in kept)


def test_dedup_lines_order_blanks_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "keep a\n\nkeep b\n  \nkeep c"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    # blanks dropped, order preserved, not counted in the stat
    assert out[1]["text"] == "keep a\nkeep b\nkeep c"
    assert out[1]["n_lines_dropped"] == 0
    assert out[2]["text"] == ""
    assert out[2]["n_lines_dropped"] == 0
    with pytest.raises(ValueError):
        dedup_lines(df, max_occurrences=0)


# ------------------------------------------------------------ lm_score ----
def test_bigram_lm_hand_computed(spark):
    # corpus: "a b" and "a c": contexts <s>->a (x2), a->{b,c}; V=3 (a,b,c)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    bg, ctx, v = train_bigram_lm(df)
    assert v == 3
    cbg = {(r["prev"], r["word"]): r["c_bg"] for r in bg.collect()}
    assert cbg[("<s>", "a")] == 2 and cbg[("a", "b")] == 1
    scored = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity(df, bg, ctx, v, k=1.0).collect()
    }
    # doc 1: P(a|<s>) = (2+1)/(2+3) = 0.6 ; P(b|a) = (1+1)/(2+3) = 0.4
    expect = (-math.log2(0.6) - math.log2(0.4)) / 2
    assert abs(scored[1] - expect) < 1e-9
    assert scored[1] == scored[2]  # symmetric corpus


def test_score_perplexity_unseen_and_empty(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    bg, ctx, v = train_bigram_lm(train)
    test = spark.createDataFrame(
        [(10, "z z"), (11, "")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity(test, bg, ctx, v, k=1.0).collect()
    }
    # model: (<s>,a),(a,b) -> V=2. First token: seen context <s>
    # (c_ctx=1), unseen word: P=(0+1)/(1+2)=1/3. Second: unseen context
    # z: P=(0+1)/(0+2)=1/2. Mean bits = (log2(3)+1)/2.
    assert abs(rows[10] - (math.log2(3) + 1.0) / 2) < 1e-9
    assert rows[11] is None  # empty doc scores NULL, never crashes
    with pytest.raises(ValueError):
        score_perplexity(test, bg, ctx, v, k=0.0)


# ------------------------------------------------------------ semdedup ----
def test_semantic_dedup_keeps_smallest_id(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),  # near-parallel to 1 -> dropped
            (3, [0.0, 1.0, 0.0, 0.0]),  # same orthant, orthogonal -> kept
            (4, [-1.0, 0.0, 0.0, 0.0]),  # different orthant -> kept
        ],
        "emb_id long, embedding array<double>",
    )
    out = {
        r["emb_id"]: r["keep"]
        for r in semantic_dedup(df, threshold=0.95, n_bits=4).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_semantic_dedup_boundary_bucketing_miss_documented(spark):
    # two near-identical vectors straddling an orthant boundary are NOT
    # paired — the documented single-probe tradeoff
    df = spark.createDataFrame(
        [(1, [0.001, 1.0]), (2, [-0.001, 1.0])],
        "emb_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.9, n_bits=2)
    assert all(r["keep"] for r in out.collect())
    with pytest.raises(ValueError):
        semantic_dedup(df, threshold=0.0)


# --------------------------------------------------------- substr_dedup ----
def test_duplicated_spans_merge_and_stats(spark):
    from lakehouse_ingestion_spark.operators.substr_dedup import (
        dup_stats,
        duplicated_spans,
    )

    # docs 1/2 share "a b c d" (two overlapping 3-shingles -> ONE span);
    # doc 3 is clean
    df = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "q a b c d w"),
            (3, "p r s t u v"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(df, k=3).collect()
    }
    assert (1, 0, 3) in spans and (2, 1, 4) in spans
    assert not any(d == 3 for d, _, _ in spans)
    stats = {r["doc_id"]: r for r in dup_stats(df, k=3).collect()}
    assert stats[1]["n_dup_spans"] == 1 and stats[1]["dup_tokens"] == 4
    assert abs(stats[1]["dup_token_frac"] - 4 / 7) < 1e-6
    assert stats[3]["n_dup_spans"] == 0 and stats[3]["dup_token_frac"] == 0.0


def test_duplicated_spans_within_doc_repeat_counts(spark):
    from lakehouse_ingestion_spark.operators.substr_dedup import (
        duplicated_spans,
    )

    # self-repetition is duplication too (ExactSubstr semantics)
    df = spark.createDataFrame(
        [(1, "x y z m m x y z")], "doc_id long, text string"
    )
    spans = duplicated_spans(df, k=3).collect()
    got = {(r["span_start"], r["span_end"]) for r in spans}
    assert (0, 2) in got and (5, 7) in got
    with pytest.raises(ValueError):
        duplicated_spans(df, k=3, min_occurrences=1)
    with pytest.raises(ValueError):
        duplicated_spans(df, k=0)


def test_ngram_novelty_order_and_short_docs(spark):
    from lakehouse_ingestion_spark.operators.substr_dedup import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c"),     # introduces 'a b' and 'b c'
            (2, "a b d"),     # 'a b' seen; 'b d' new -> 0.5
            (3, "a"),         # < k tokens -> NULL novelty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, k=2).collect()}
    assert out[1]["novelty"] == 1.0 and out[1]["n_shingles"] == 2
    assert out[2]["novelty"] == 0.5
    assert out[3]["n_shingles"] == 0 and out[3]["novelty"] is None


# ----------------------------------------------------- incremental_dedup ----
def test_incremental_near_dup_matches_batch_restriction(spark):
    """Increments over any corpus split must equal the batch q_near_dup
    pair set restricted to pairs involving new docs."""
    from lakehouse_ingestion_spark.operators.incremental_dedup import (
        incremental_near_dup,
        minhash_index,
    )

    texts = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely different words about spark and parquet files"),
        (3, "the quick brown fox jumps over the lazy dog today"),
        (4, "words about spark and parquet files completely different"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    hist = df.where("doc_id < 3")
    batch = df.where("doc_id >= 3")

    idx = minhash_index(hist, num_hashes=8, num_bands=4)
    pairs, delta = incremental_near_dup(
        batch, idx, 0.3, num_hashes=8, num_bands=4
    )
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    # full-corpus reference: index everything, self-dedup, keep pairs
    # touching the batch
    full_idx_pairs, _ = incremental_near_dup(
        df, None, 0.3, num_hashes=8, num_bands=4
    )
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in full_idx_pairs.collect()
        if r["doc_b"] >= 3 or r["doc_a"] >= 3
    }
    assert got == want
    # doc 3 duplicates docs 0 (exact) and 1 (near)
    assert (0, 3) in got and got[(0, 3)] == 1.0
    # the delta is appendable: same schemas as the index
    assert delta.bands.columns == idx.bands.columns
    assert delta.hashes.columns == idx.hashes.columns


def test_incremental_near_dup_bootstrap_and_validation(spark):
    from lakehouse_ingestion_spark.operators.incremental_dedup import (
        incremental_near_dup,
        minhash_index,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    pairs, _ = incremental_near_dup(df, None, 0.3, num_hashes=8, num_bands=4)
    assert [(r["doc_a"], r["doc_b"]) for r in pairs.collect()] == [(1, 2)]
    with pytest.raises(ValueError):
        incremental_near_dup(df, None, 0.0)
    with pytest.raises(ValueError):
        minhash_index(df, num_hashes=7, num_bands=4)


# ------------------------------------------------------ compressibility ----
def test_compression_ratio_matches_zlib(spark):
    import zlib

    from lakehouse_ingestion_spark.operators.compressibility import (
        compression_ratio,
    )

    texts = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 10),  # redundant
        (2, "the quick brown fox jumps over the lazy dog and then naps"),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r["compress_ratio"] for r in compression_ratio(df).collect()}
    for i, t in texts:
        if not t:
            assert got[i] is None
        else:
            raw = t.encode("utf-8")
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
    assert got[1] < got[2]  # boilerplate compresses harder than prose
    with pytest.raises(ValueError):
        compression_ratio(df, level=10)


def test_compressibility_filter_short_doc_passes(spark):
    from lakehouse_ingestion_spark.operators.compressibility import (
        compressibility_filter,
    )

    df = spark.createDataFrame(
        [(1, "zz" * 500), (2, "short"), (3, "genuine prose with many distinct words here today" * 3)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["keep_compress"] for r in compressibility_filter(df, min_ratio=0.15).collect()}
    assert out[1] is False   # extreme redundancy
    assert out[2] is True    # under min_chars: passes unconditionally
    assert out[3] is True


# ------------------------------------------------------------- resample ----
def test_resample_ffill_grid_and_fill(spark):
    from lakehouse_ingestion_spark.operators.resample import resample_ffill

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:05:00", 1.0),
            ("a", "2024-01-01 00:50:00", 2.0),   # same hour: last wins
            ("a", "2024-01-01 03:10:00", 9.0),   # 2 empty hours between
            ("b", "2024-01-01 10:00:00", 5.0),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(df, ["k"], "ts", "v", 3600)
    rows = {
        (r["k"], r["grid_ts"].hour): (r["v"], r["v_ffill"])
        for r in out.collect()
    }
    # key a: hours 0..3; hour 0 keeps last obs (2.0); 1-2 filled; 3 = 9.0
    assert rows[("a", 0)] == (2.0, 2.0)
    assert rows[("a", 1)] == (None, 2.0)
    assert rows[("a", 2)] == (None, 2.0)
    assert rows[("a", 3)] == (9.0, 9.0)
    # key b: single cell, no fabricated leading cells
    assert [k for k in rows if k[0] == "b"] == [("b", 10)]
    with pytest.raises(ValueError):
        resample_ffill(df, [], "ts", "v", 3600)
    with pytest.raises(ValueError):
        resample_ffill(df, ["k"], "ts", "v", 0)


def test_resample_interpolate_linear_and_tail(spark):
    from lakehouse_ingestion_spark.operators.resample import (
        resample_interpolate,
    )

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00", 1.0),
            ("a", "2024-01-01 03:00:00", 7.0),   # 2 empty hours between
            ("a", "2024-01-01 04:30:00", 4.0),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["grid_ts"].hour: (r["v"], r["v_interp"])
        for r in resample_interpolate(df, ["k"], "ts", "v", 3600).collect()
    }
    assert out[0] == (1.0, 1.0)
    assert out[1] == (None, 3.0)   # 1 + (7-1)*1/3
    assert out[2] == (None, 5.0)   # 1 + (7-1)*2/3
    assert out[3] == (7.0, 7.0)
    assert out[4] == (4.0, 4.0)


# ----------------------------------------------------------------- diff ----
def test_snapshot_diff_statuses(spark):
    from lakehouse_ingestion_spark.operators.diff import (
        diff_summary,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)],
        "id long, v string, w string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (4, "d", "z")],
        "id long, v string, w string",
    )
    got = {
        r["id"]: r["diff_status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summary = {
        r["diff_status"]: r["n_rows"]
        for r in diff_summary(old, new, ["id"]).collect()
    }
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_hash_boundaries_and_nulls(spark):
    """Field boundaries and NULL vs '' must not collide (the length-
    prefixed null-tagged hash contract)."""
    from lakehouse_ingestion_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "ab", "c"), (2, None, "q")], "id long, v string, w string"
    )
    new = spark.createDataFrame(
        [(1, "a", "bc"), (2, "", "q")], "id long, v string, w string"
    )
    got = {
        r["id"]: r["diff_status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, ["id"], ["nope"])


def test_self_score_matches_composed_train_score(spark):
    from lakehouse_ingestion_spark.operators.lm_score import (
        score_perplexity,
        self_score_perplexity,
        train_bigram_lm,
    )

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b d"), (3, "")],
        "doc_id long, text string",
    )
    bg, ctx, v = train_bigram_lm(df)
    composed = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity(df, bg, ctx, v).collect()
    }
    fused = {
        r["doc_id"]: r["bits_per_token"]
        for r in self_score_perplexity(df).collect()
    }
    assert composed == fused
    with pytest.raises(ValueError):
        self_score_perplexity(df, k=0)


def test_incremental_near_dup_posting_cap_skew(spark):
    """A viral band key (shared boilerplate) gets dropped by the cap;
    pairs carried by non-hot keys still surface, and the dropped-key /
    dropped-posting metrics are emitted."""
    from lakehouse_ingestion_spark.operators.incremental_dedup import (
        hot_posting_keys,
        incremental_near_dup,
        minhash_index,
    )

    # 20 docs sharing identical boilerplate text -> every band key of
    # that text is viral; plus one genuine near-dup pair with unique
    # text (its band keys have exactly 2 postings).
    boiler = [(i, "shared boilerplate header repeated on every page of site")
              for i in range(20)]
    uniq = [
        (100, "a rare ecology treatise on alpine moss and lichen growth"),
        (101, "a rare ecology treatise on alpine moss and lichen decline"),
    ]
    df = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    hist = df.where("doc_id < 10 or doc_id = 100")
    batch = df.where("doc_id >= 10 and doc_id != 100")
    idx = minhash_index(hist, num_hashes=8, num_bands=4)

    metrics = []
    pairs, _ = incremental_near_dup(
        batch, idx, 0.3, num_hashes=8, num_bands=4,
        posting_cap=5, on_cap_metric=metrics.append,
    )
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # the genuine pair rides its non-hot keys
    assert (100, 101) in got
    # every boilerplate pair is capped away (all its keys are viral)
    assert not any(a < 100 and b < 100 for a, b in got)
    by_name = {m.name: m.value for m in metrics}
    assert by_name["incr_near_dup_capped_keys"] >= 1
    assert by_name["incr_near_dup_capped_postings"] > 5

    # uncapped control: boilerplate pairs DO appear without the cap
    pairs_u, _ = incremental_near_dup(batch, idx, 0.3, num_hashes=8, num_bands=4)
    got_u = {(r["doc_a"], r["doc_b"]) for r in pairs_u.collect()}
    assert any(a < 100 and b < 100 for a, b in got_u)
    assert (100, 101) in got_u

    # pre-filtered hot_keys path (caller-maintained counts)
    all_bands = idx.bands.unionByName(
        minhash_index(batch, num_hashes=8, num_bands=4).bands
    ).select("band", "key")
    hk = hot_posting_keys(all_bands, 5)
    pairs_h, _ = incremental_near_dup(
        batch, idx, 0.3, num_hashes=8, num_bands=4, hot_keys=hk,
    )
    got_h = {(r["doc_a"], r["doc_b"]) for r in pairs_h.collect()}
    assert got_h == got

    import pytest

    with pytest.raises(ValueError, match="posting_cap"):
        hot_posting_keys(all_bands, 0)


def test_leakage_safe_split_never_straddles_clusters(spark):
    """Every near-dup cluster lands wholly in one split; singletons get
    their own-id hash (so adding pairs later never moves untouched
    docs); the assignment matches hash_split on the representative."""
    from lakehouse_ingestion_spark.operators.sampling import hash_split
    from lakehouse_ingestion_spark.operators.split_guard import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # clusters: {0,1,2} via chain, {10,11}, {50,60,70} via star
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 60), (50, 70)],
        "doc_a long, doc_b long",
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="split"
    )
    rows = {r["doc_id"]: (r["rep"], r["split"]) for r in out.collect()}
    assert len(rows) == 200
    for cluster in ({0, 1, 2}, {10, 11}, {50, 60, 70}):
        splits = {rows[d][1] for d in cluster}
        reps = {rows[d][0] for d in cluster}
        assert len(splits) == 1, f"cluster {cluster} straddles {splits}"
        assert reps == {min(cluster)}
    # singletons: rep == own id, split == plain hash_split of doc_id
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
            seed="split",
        ).collect()
    }
    for d, (rep, split) in rows.items():
        if d not in {0, 1, 2, 10, 11, 50, 60, 70}:
            assert rep == d
            assert split == plain[d]
    # cluster members inherit the REP's plain assignment
    assert rows[2][1] == plain[0]
    assert rows[70][1] == plain[50]


def test_sticky_split_never_moves_assigned_docs_on_merge(spark):
    """The round-8 stickiness contract: ingest growth that MERGES two
    previously split clusters never moves an already-assigned document
    (pure hash-of-rep WOULD move the side whose representative
    changed); the would-have-moved docs surface in the audit frame
    instead."""
    from lakehouse_ingestion_spark.operators.split_guard import sticky_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs1 = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    pairs1 = spark.createDataFrame(
        [(0, 1), (2, 3), (50, 51)], "doc_a long, doc_b long"
    )
    out1, audit1 = sticky_split(docs1, pairs1, fr, assignments=None)
    assert audit1.count() == 0  # bootstrap: nothing to audit
    assign1 = {r["doc_id"]: r["split"] for r in out1.collect()}

    # epoch 2: corpus grows, and pair (1, 2) MERGES clusters {0,1} and
    # {2,3} — the merged rep is 0, so docs 2/3's hash input changed
    docs2 = spark.createDataFrame([(i,) for i in range(120)], "doc_id long")
    pairs2 = spark.createDataFrame(
        [(0, 1), (2, 3), (1, 2), (50, 51), (3, 100), (110, 111)],
        "doc_a long, doc_b long",
    )
    out2, audit2 = sticky_split(
        docs2, pairs2, fr,
        assignments=out1.select("doc_id", "split"),
    )
    rows2 = {r["doc_id"]: (r["rep"], r["split"]) for r in out2.collect()}
    assert len(rows2) == 120
    for d in range(100):
        assert rows2[d][1] == assign1[d], f"doc {d} moved on re-run"
    # merged cluster reps converged
    assert {rows2[d][0] for d in (0, 1, 2, 3, 100)} == {0}
    # the new member inherits a split its assigned cluster-mates hold
    assert rows2[100][1] in {assign1[d] for d in (0, 1, 2, 3)}
    # audit: every flagged doc has a real divergence or conflict
    audit_rows = audit2.collect()
    for r in audit_rows:
        if r["reason"] == "kept_prev":
            assert r["prev_split"] is not None
            assert r["prev_split"] != r["hash_split"]
            assert r["split"] == r["prev_split"]
    # if the two merged clusters had landed in different splits, the
    # whole merged cluster must be conflict-flagged
    if assign1[0] != assign1[2]:
        flagged = {r["doc_id"] for r in audit_rows if r["reason"] == "cluster_conflict"}
        assert {0, 1, 2, 3, 100} <= flagged


def test_sticky_split_majority_inheritance_and_conflict_audit(spark):
    """Handcrafted assignment state: kept-verbatim splits, majority
    inheritance with the deterministic fractions-order tie-break, and
    cluster_conflict audit rows across the whole merged cluster."""
    import pytest

    from lakehouse_ingestion_spark.errors import ConfigError
    from lakehouse_ingestion_spark.operators.split_guard import sticky_split

    fr = {"train": 0.5, "test": 0.5}
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 4, 5, 10, 11, 12, 20)], "doc_id long"
    )
    # one merged conflict cluster {0..5} (0,1 train / 2,3 test; 4,5 new),
    # one clean cluster {10,11,12} (10,11 test; 12 new), singleton 20
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (1, 2), (3, 4), (4, 5), (10, 11), (11, 12)],
        "doc_a long, doc_b long",
    )
    prev = spark.createDataFrame(
        [(0, "train"), (1, "train"), (2, "test"), (3, "test"),
         (10, "test"), (11, "test")],
        "doc_id long, split string",
    )
    out, audit = sticky_split(docs, pairs, fr, assignments=prev)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    # assigned docs keep their split verbatim, conflict or not
    assert rows[0] == rows[1] == "train"
    assert rows[2] == rows[3] == "test"
    assert rows[10] == rows[11] == "test"
    # 2-2 majority tie in {0..5} breaks toward the earlier fractions
    # entry: train
    assert rows[4] == rows[5] == "train"
    # clean inheritance: unanimous cluster majority
    assert rows[12] == "test"
    by_reason: dict[str, set] = {}
    for r in audit.collect():
        by_reason.setdefault(r["reason"], set()).add(r["doc_id"])
    assert by_reason.get("cluster_conflict") == {0, 1, 2, 3, 4, 5}
    assert 20 not in {d for s in by_reason.values() for d in s}

    with pytest.raises(ConfigError, match="assignments"):
        sticky_split(docs, pairs, fr, assignments=prev.drop("split"))


def test_incremental_near_dup_cap_organic_recall(spark):
    """Recall pin at the registry/probe geometry (8 hashes / 4 bands /
    t=0.3, round-7 verdict #5): with a viral cluster present, the cap
    must retain EVERY pair that does not touch the cluster — organic
    recall 1.0 — because the anti-join removes only hot (band, key)
    buckets and organic pairs ride untouched keys. The sf10 probe
    (tools/skew_probe.py, BASELINE.md round-7) is the scale version of
    this assertion."""
    import random

    from lakehouse_ingestion_spark.operators.incremental_dedup import (
        incremental_near_dup,
        minhash_index,
    )

    rng = random.Random(7)
    words = [f"w{i}" for i in range(400)]
    organic = []
    # 30 organic near-dup pairs: 20-token docs differing in one token
    for i in range(30):
        base = rng.sample(words, 20)
        organic.append((1000 + 2 * i, " ".join(base)))
        mut = list(base)
        mut[rng.randrange(20)] = "zz%d" % i
        organic.append((1000 + 2 * i + 1, " ".join(mut)))
    template = "subscribe newsletter terms privacy cookies rights contact"
    viral = [(2000 + i, f"{template} item{i}") for i in range(60)]
    df = spark.createDataFrame(organic + viral, "doc_id long, text string")
    batch = df.where("doc_id % 2 = 1")
    hist = df.where("doc_id % 2 = 0")
    idx = minhash_index(hist, num_hashes=8, num_bands=4)

    pairs_u, _ = incremental_near_dup(batch, idx, 0.3, num_hashes=8, num_bands=4)
    got_u = {(r["doc_a"], r["doc_b"]) for r in pairs_u.collect()}
    pairs_c, _ = incremental_near_dup(
        batch, idx, 0.3, num_hashes=8, num_bands=4, posting_cap=10,
        on_cap_metric=lambda m: None,
    )
    got_c = {(r["doc_a"], r["doc_b"]) for r in pairs_c.collect()}

    organic_u = {p for p in got_u if p[0] < 2000 and p[1] < 2000}
    organic_c = {p for p in got_c if p[0] < 2000 and p[1] < 2000}
    assert organic_u, "fixture must produce organic near-dup pairs"
    # organic recall == 1.0 at this geometry
    assert organic_c == organic_u
    # the viral cluster is capped away (posting lists of ~30 >> cap 10)
    assert any(p[0] >= 2000 and p[1] >= 2000 for p in got_u)
    assert not any(p[0] >= 2000 and p[1] >= 2000 for p in got_c)
    # capped output never invents pairs
    assert got_c <= got_u


def test_strip_duplicated_spans(spark):
    """Duplicated spans are cut token-exactly; clean docs pass through
    byte-identical (including original whitespace); fully-duplicated
    docs become empty strings."""
    from lakehouse_ingestion_spark.operators.substr_dedup import (
        dup_stats,
        strip_duplicated_spans,
    )

    docs = [
        (0, "alpha beta gamma delta unique tail zero"),
        (1, "alpha beta gamma delta other words here"),   # shares a 4-gram with 0
        (2, "totally   distinct\tcontent with  odd spacing"),  # clean, weird ws
        (3, "alpha beta gamma delta"),                    # becomes empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           strip_duplicated_spans(df, k=4).collect()}

    # span 'alpha beta gamma delta' removed from all three carriers
    assert out[0]["text"] == "unique tail zero"
    assert out[1]["text"] == "other words here"
    assert out[0]["n_stripped_tokens"] == 4
    # clean doc: byte-identical text (whitespace untouched), 0 stripped
    assert out[2]["text"] == docs[2][1]
    assert out[2]["n_stripped_tokens"] == 0
    # fully-duplicated doc -> empty string, not NULL
    assert out[3]["text"] == ""
    assert out[3]["n_stripped_tokens"] == 4

    # consistency with the audit: stripped count == dup_tokens
    audit_rows = {r["doc_id"]: r for r in dup_stats(df, k=4).collect()}
    for i in range(4):
        assert out[i]["n_stripped_tokens"] == audit_rows[i]["dup_tokens"]

    # idempotence on the cleaned corpus: no k-gram repeats remain
    cleaned = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in out.values()],
        "doc_id long, text string",
    )
    again = strip_duplicated_spans(cleaned, k=4)
    assert again.where(F.col("n_stripped_tokens") > 0).count() == 0
