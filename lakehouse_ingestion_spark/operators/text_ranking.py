"""Aggregation-based text statistics and relevance scoring: n-gram
top-k, TF-IDF, and BM25 — the corpus-analysis layer of a training-data
pipeline (frequency dashboards, boilerplate detection, retrieval-style
relevance for mixture curation).

All three are pure DataFrame aggregations (explode -> partial-agg
groupBy), no Python in the hot path:

- n-gram counts: explode word n-grams, groupBy(group, ngram) with
  map-side combine; the ranking window runs over the AGGREGATED vocab,
  which is orders of magnitude smaller than the corpus.
- TF-IDF: (doc, term) tf + per-term df are both partial-aggregated;
  the global document count joins in via a broadcast crossJoin of a
  1-row aggregate (no collect, stays lazy).
- BM25: query terms filter the exploded tokens BEFORE any aggregation,
  so corpus volume drops to |matching tokens| in the map stage; avgdl
  and N are 1-row broadcast aggregates.

Scale posture at 100 TB: every groupBy here keys on (doc_id, term) or
(term) — high-cardinality, well-spread keys; skewed hot terms (e.g.
"the") only matter for the per-term df aggregate, which AQE skew-split
handles, and BM25 prunes to the query vocabulary first anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def _word_tokens(text_col: str) -> Column:
    """Lowercased whitespace tokens (the shared tokenization of this
    module; mirrors string_split_regex(trim(lower(text)), '\\s+'))."""
    return tokens(F.lower(F.col(text_col)))


def word_ngrams(text_col: str, n: int = 2) -> Column:
    """Array of space-joined word n-grams; fewer than ``n`` tokens ->
    empty array. Pure Column expression: n-1 chained ``zip_with`` s over
    shifted slices — n-1 array allocations per ROW, not one ``slice``
    per output gram (the per-gram form was 7x slower at sf1: HOFs are
    interpreted, so allocation count dominates)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    arr = _word_tokens(text_col)
    if n == 1:
        return arr
    size = F.size(arr)
    m = size - F.lit(n - 1)  # number of n-grams
    joined = F.slice(arr, 1, m)
    for off in range(1, n):
        shifted = F.slice(arr, 1 + off, m)
        joined = F.zip_with(
            joined, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(m >= 1, joined).otherwise(F.array().cast("array<string>"))


def ngram_topk(
    df: DataFrame,
    n: int = 2,
    k: int = 5,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k word n-grams by frequency per group (corpus-wide when
    ``group_cols`` is None). Returns (group cols..., ngram, n_occur, rk)
    with the deterministic tie-break (count desc, ngram asc).

    The ranking window partitions by the group columns; with
    ``group_cols=None`` it degrades to a single-task sort over the
    aggregated vocabulary — fine for top-k dashboards, but pass a group
    (language, source, shard) when the distinct-n-gram count is huge."""
    groups = list(group_cols or [])
    exploded = df.select(
        *groups, F.explode(word_ngrams(text_col, n)).alias("ngram")
    )
    counted = exploded.groupBy(*groups, "ngram").agg(
        F.count(F.lit(1)).alias("n_occur")
    )
    w = Window.partitionBy(*groups).orderBy(
        F.col("n_occur").desc(), F.col("ngram").asc()
    )
    return counted.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_size: int | None = None,
) -> DataFrame:
    """Frequency-ranked vocabulary over lowercased whitespace terms:
    (term, n_occur, vocab_id) with vocab_id = dense rank by
    (count desc, term asc) — deterministic across runs and engines.

    The ranking window is unpartitioned BUT runs over the aggregated
    term table (|vocab|, not |corpus|), and with a ``max_size`` cap
    Spark plans a WindowGroupLimit with a map-side partial limit, so
    only ~max_size rows per task reach the single ranking partition."""
    terms = df.select(F.explode(_word_tokens(text_col)).alias("term"))
    counted = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_occur"))
    w = Window.orderBy(F.col("n_occur").desc(), F.col("term").asc())
    ranked = counted.withColumn("vocab_id", F.row_number().over(w))
    if max_size is not None:
        ranked = ranked.filter(F.col("vocab_id") <= max_size)
    return ranked.select("term", "n_occur", "vocab_id")


def tokens_to_ids(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents against a vocabulary: (id_col, pos, token_id)
    with 0-based token positions; out-of-vocabulary tokens are DROPPED
    (a capped vocab is the caller's truncation policy — positions still
    reflect the original token stream, so gaps mark OOV sites).
    The vocab joins broadcast (it is max_size rows by construction)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(_word_tokens(text_col)).alias("pos", "term"),
    )
    return (
        toks.join(F.broadcast(vocab.select("term", "vocab_id")), "term")
        .select(id_col, "pos", F.col("vocab_id").alias("token_id"))
    )


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
) -> DataFrame:
    """Per-(document, term) TF-IDF over lowercased whitespace terms.
    Returns (id_col, term, tf, df, tfidf) where
    ``tfidf = tf * ln(N / df)`` (classic idf; terms present in every
    document score 0). N joins in as a broadcast 1-row aggregate."""
    terms = docs.select(
        F.col(id_col), F.explode(_word_tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    score = F.col("tf") * F.log(F.col("__n") / F.col("df"))
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", "tf", "df", score.alias("tfidf"))
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
) -> DataFrame:
    """BM25 relevance of every document for a bag of query terms.
    Returns (id_col, score) for documents matching >= 1 term.

    idf uses the standard Robertson-Sparck-Jones smooth form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive); the
    length normalization uses whitespace token counts with corpus-wide
    ``avgdl``. Query terms are lowercased; the exploded token stream is
    filtered to the query vocabulary BEFORE aggregation."""
    if not query_terms:
        raise ValueError("bm25 needs at least one query term")
    qt = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col), F.explode(_word_tokens(text_col)).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(qt))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(
        F.col(id_col), F.size(_word_tokens(text_col)).alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
    )
    avgdl = dl.agg(F.avg("dl").alias("__avgdl"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    score = F.sum(idf * norm)
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .groupBy(id_col)
        .agg(score.alias("score"))
    )
