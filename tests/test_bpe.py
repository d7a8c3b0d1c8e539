"""BPE training/encoding: reference equivalence, determinism, gates,
and the classic Sennrich worked example."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    encode_word,
    learn_merges,
)


def _reference_bpe(histogram, num_merges):
    """Independent reference: dict-of-tuples formulation (Sennrich
    pseudo-code), deliberately different data layout from learn_merges."""
    vocab = {tuple(list(w) + [EOW]): f for w, f in histogram if w}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_sennrich_worked_example():
    """The ACL'16 toy corpus: low/lower/newest/widest."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(hist, 4)
    assert merges == _reference_bpe(hist, 4)
    # 'es' (freq 9) is the first merge; 'est' family follows
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hist=st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=6),
            st.integers(1, 9),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(1, 8),
)
def test_learn_merges_matches_reference(hist, k):
    assert learn_merges(sorted(hist), k) == _reference_bpe(sorted(hist), k)


def test_encode_word_applies_ranks_lowest_first():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est", EOW]
    assert encode_word("", ranks) == [EOW]
    assert encode_word("zzz", ranks) == ["z", "z", "z", EOW]


def test_bpe_train_and_encode_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "newest newest newest newest newest newest"),
         (3, "widest widest widest")],
        "doc_id long, text string",
    )
    merges = bpe_train(df, num_merges=4)
    assert merges == learn_merges(
        sorted([("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]), 4
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    assert out[2]["n_bpe_tokens"] == 6 * len(
        encode_word("newest", {tuple(m): i for i, m in enumerate(merges)})
    )
    # determinism: same corpus, different partitioning -> same merges
    assert bpe_train(df.repartition(7), num_merges=4) == merges


def test_bpe_train_gates(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    with pytest.raises(ConfigError, match="num_merges"):
        bpe_train(df, 0)
    with pytest.raises(ConfigError, match="max_words"):
        bpe_train(df, 2, max_words=3)
    # min_freq prunes below the gate
    merges = bpe_train(df, 1, max_words=3, min_freq=2)
    assert merges == []  # nothing survives pruning -> no pairs to merge


def test_bpe_pipeline_op(spark):
    from lakehouse_ingestion_spark.pipeline import apply_transform

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest newest widest")],
        "doc_id long, text string",
    )
    out = apply_transform(df, "bpe_tokenize", {"num_merges": 3})
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert all(r["n_bpe_tokens"] > 0 for r in rows.values())


def test_bpe_encode_tokenization_matches_training_histogram(spark):
    """r11 ADVICE fix: the encoder segments words with the SAME Java \\s
    class the training histogram splits on.  U+00A0 (non-breaking space)
    is NOT Java whitespace, so 'ab\\u00a0ab' is ONE word in the histogram
    — the encoder must treat it as one word too (pre-fix, Python
    str.split() broke it into two 'ab's the histogram never counted)."""
    from lakehouse_ingestion_spark.operators.bpe import word_histogram

    nbsp_doc = "ab\u00a0ab ab\u00a0ab cd cd cd"
    df = spark.createDataFrame([(1, nbsp_doc)], "doc_id long, text string")
    hist = {r["word"]: r["freq"] for r in word_histogram(df).collect()}
    assert hist == {"ab\u00a0ab": 2, "cd": 3}
    merges = bpe_train(df, num_merges=2)
    out = bpe_encode(df, merges).collect()[0]
    # 2 occurrences of the NBSP word + 3 of 'cd', each encoded as >=1
    # symbol; token count must reflect 5 words, not 7 (the split bug)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    expected = 2 * len(encode_word("ab\u00a0ab", ranks)) + 3 * len(
        encode_word("cd", ranks)
    )
    assert out["n_bpe_tokens"] == expected
    # Java \s includes \x0B (vertical tab): both sides DO split on it
    vt = spark.createDataFrame([(1, "xx\x0byy xx yy")], "doc_id long, text string")
    hist2 = {r["word"]: r["freq"] for r in word_histogram(vt).collect()}
    assert hist2 == {"xx": 2, "yy": 2}
    merges2 = bpe_train(vt, num_merges=1)
    ranks2 = {tuple(m): i for i, m in enumerate(merges2)}
    out2 = bpe_encode(vt, merges2).collect()[0]
    assert out2["n_bpe_tokens"] == 2 * len(encode_word("xx", ranks2)) + 2 * len(
        encode_word("yy", ranks2)
    )


def _reconstruct_words(bpe_tokens):
    """Invert merge-free encoding: each word appears as its characters
    followed by EOW — split the stream on EOW to recover the words."""
    words, cur = [], []
    for tok in bpe_tokens:
        if tok == EOW:
            words.append("".join(cur))
            cur = []
        else:
            cur.append(tok)
    assert cur == []  # every word terminates with EOW
    return words


def _assert_encode_matches_histogram(spark, docs):
    """End-to-end casefold+segmentation parity: encoding with an empty
    merge table is invertible, so the multiset of words the ENCODER saw
    must equal the TRAINING histogram exactly — any train/encode drift
    in case mapping or whitespace splitting breaks the equality."""
    from collections import Counter

    from lakehouse_ingestion_spark.operators.bpe import word_histogram

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    hist = {
        r["word"]: r["freq"] for r in word_histogram(df).collect()
    }
    seen: Counter = Counter()
    for row in bpe_encode(df, merges=[]).collect():
        seen.update(_reconstruct_words(row["bpe_tokens"]))
    assert dict(seen) == hist


def test_bpe_casefold_parity_named_unicode_cases(spark):
    """r12 verdict #4: lowercasing now happens JVM-side in BOTH paths
    (bpe_encode lowers with F.lower before the Arrow stage), so the
    historically divergent mappings — Turkish I-with-dot, German sharp
    s, Greek final sigma, full-width forms, combining marks — cannot
    split train/encode."""
    docs = [
        "İstanbul Iık İİ",  # İstanbul, dotless ı, İİ
        "STRAßE straẞe groß",  # ß and capital ẞ
        "Σοφός ΣΑΣ",  # final sigma
        "ＡＢＣ ａｂ",  # full-width A B C a b
        "école ÉCOLE",  # combining acute
        "mixed\x0bCASE\tWords\nHERE",  # Java-\s separators
        "",
        "   \t\x0b  ",  # whitespace-only
    ]
    _assert_encode_matches_histogram(spark, docs)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(
            alphabet=(
                "aAİıIßẞΣσς"
                "Ａａ́éÉ "
                " \t\n\x0b\f\r"
            ),
            max_size=40,
        ),
        max_size=6,
    )
)
@pytest.mark.slow
def test_bpe_casefold_parity_property(spark, docs):
    """Random mixes of the nasty alphabet (cased Unicode + every Java
    whitespace char + NBSP-as-word-char) keep histogram == encoder
    word multiset."""
    _assert_encode_matches_histogram(spark, docs)
