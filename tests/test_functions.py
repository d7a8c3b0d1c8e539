import math

from pyspark.sql import functions as F

from lakehouse_ingestion_spark.functions import (
    cosine_similarity,
    fingerprint_md5,
    language_id,
    minhash_signature,
    quality_score,
    simhash64,
    token_count,
)
from lakehouse_ingestion_spark.functions.similarity import (
    hamming64,
    minhash_bands,
    ngram_jaccard,
    shingles,
)


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",)], "text string")
    assert [r[0] for r in df.select(token_count("text")).collect()] == [3, 0, 0]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], "text string")
    fps = [r[0] for r in df.select(fingerprint_md5("text")).collect()]
    assert fps[0] == fps[1]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and then it ran away fast",), ("x",), ("",)],
        "text string",
    )
    scores = [r[0] for r in df.select(quality_score("text")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]


def test_language_id(spark):
    df = spark.createDataFrame(
        [("the quick brown fox and the dog",), ("el que la de los gatos",), ("zzz qqq",)],
        "text string",
    )
    langs = [r[0] for r in df.select(language_id("text")).collect()]
    assert langs == ["en", "es", "und"]


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])], "a array<double>, b array<double>"
    )
    sims = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    assert math.isclose(sims[0], 0.0, abs_tol=1e-12)
    assert math.isclose(sims[1], 1.0, rel_tol=1e-12)


def test_shingles_word_and_char(spark):
    df = spark.createDataFrame([("a b c d",), ("ab",)], "text string")
    w = [r[0] for r in df.select(shingles("text", 3, "word")).collect()]
    assert w[0] == ["a b c", "b c d"]
    assert w[1] == []
    c = [r[0] for r in df.select(shingles("text", 2, "char")).collect()]
    assert c[1] == ["ab"]


def test_ngram_jaccard(spark):
    df = spark.createDataFrame([("a b c d e", "a b c d x")], "t1 string, t2 string")
    j = df.select(
        ngram_jaccard(shingles("t1", 2), shingles("t2", 2)).alias("j")
    ).collect()[0].j
    # t1 bigrams: {ab,bc,cd,de}; t2: {ab,bc,cd,dx}; inter=3, union=5
    assert math.isclose(j, 0.6)


def test_minhash_similar_docs_share_mins(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different words appear in this sentence here"),
        ],
        "id long, text string",
    )
    out = df.select(
        "id", minhash_signature(shingles("text", 3), num_hashes=32).alias("sig")
    ).collect()
    sigs = {r.id: r.sig for r in out}
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_12 > agree_13
    assert agree_12 >= 16  # ~78% true jaccard


def test_minhash_bands_shape(spark):
    df = spark.createDataFrame([(list(range(8)),)], "sig array<long>")
    bands = df.select(F.explode(minhash_bands(F.col("sig"), 4, 2)).alias("b")).collect()
    assert len(bands) == 4
    assert bands[0].b.key == "0_1"


def test_simhash_hamming(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "entirely unrelated text about spark engines"),
        ],
        "a string, b string, c string",
    )
    row = df.select(
        hamming64(simhash64("a"), simhash64("b")).alias("near"),
        hamming64(simhash64("a"), simhash64("c")).alias("far"),
    ).collect()[0]
    assert row.near < row.far


def test_bpe_token_count(spark):
    from lakehouse_ingestion_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [("It's a test, isn't it? 123 foo-bar!!",), ("",), ("one",)], "t string"
    )
    got = [r[0] for r in df.select(bpe_token_count("t")).collect()]
    # It|'s| a| test|,| isn|'t| it|?| 123| foo|-|bar|!! -> 14
    assert got == [14, 0, 1]


def test_fingerprint_rolling(spark):
    from lakehouse_ingestion_spark.functions.text import fingerprint_rolling

    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("hello worlds",), ("",)],
        "t string",
    )
    a, b, c, e = [r[0] for r in df.select(fingerprint_rolling("t")).collect()]
    assert a == b  # normalization: case + whitespace collapse
    assert b != c
    assert e == 0
