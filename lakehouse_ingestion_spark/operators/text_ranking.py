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


def _bounded_single_partition(key_col: str) -> Column:
    """A constant partition key that survives the optimizer: a literal
    ``F.lit(0)`` is constant-folded out of the window spec, turning the
    deliberate bounded single-partition ranking back into an
    'unpartitioned' window (and its WindowExec warning). Deriving the
    zero from a column blocks the fold; the exchange still hashes every
    row to one partition — which is the point: the input is bounded to
    ``num_shards * limit`` survivors by construction."""
    return F.length(F.col(key_col)) * F.lit(0)


def _shard_topk(
    counted: DataFrame,
    key_col: str,
    order: list[Column],
    limit: int,
    num_shards: int,
) -> DataFrame:
    """Per-shard partial top-``limit`` prune: the global top-``limit``
    under a total order is a subset of the union of per-hash-shard
    top-``limit`` s, so the final ranking stage only sees
    ``num_shards * limit`` survivors instead of the whole table. The
    shard window is partitioned (distributed) — no single-task sort of
    the full aggregate."""
    shard = F.pmod(F.xxhash64(key_col), F.lit(num_shards))
    w = Window.partitionBy("__shard").orderBy(*order)
    return (
        counted.withColumn("__shard", shard)
        .withColumn("__srk", F.row_number().over(w))
        .filter(F.col("__srk") <= limit)
        .drop("__shard", "__srk")
    )


def _distributed_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number`` over ``order`` without moving the whole
    table to one window partition: range-repartition on the order keys,
    pin the partitioning with an eager ``localCheckpoint`` (range bounds
    are sampled, so two jobs over the same lineage could disagree),
    collect the tiny per-partition row counts, and add the cumulative
    offset of the preceding ranges to a per-partition row_number. Rank
    arithmetic is exact because range partitions are disjoint and
    ordered — partition p's rows all rank after every row of partitions
    < p. Costs one extra shuffle (the pid-window) plus the checkpoint
    write; use it when the ranked table is too big for a single task."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = df.repartitionByRange(n, *order).localCheckpoint()
    sizes = {
        r["__p"]: r["__cnt"]
        for r in parts.groupBy(F.spark_partition_id().alias("__p"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__p").orderBy(*order)
    return (
        parts.withColumn("__p", F.spark_partition_id())
        .withColumn(
            out_col,
            (F.row_number().over(w) + omap[F.col("__p")]).cast("int"),
        )
        .drop("__p")
    )


def ngram_topk(
    df: DataFrame,
    n: int = 2,
    k: int = 5,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    num_shards: int = 32,
) -> DataFrame:
    """Top-k word n-grams by frequency per group (corpus-wide when
    ``group_cols`` is None). Returns (group cols..., ngram, n_occur, rk)
    with the deterministic tie-break (count desc, ngram asc).

    Grouped: the ranking window partitions by the group columns.
    Corpus-wide: two-stage — per-hash-shard partial top-k over the
    aggregated n-gram table (distributed window), then the final rank
    over the ``num_shards * k`` survivors on one intentional
    ``partitionBy(lit(0))`` partition (bounded by construction; no
    unpartitioned-window sort of the full vocabulary)."""
    groups = list(group_cols or [])
    exploded = df.select(
        *groups, F.explode(word_ngrams(text_col, n)).alias("ngram")
    )
    counted = exploded.groupBy(*groups, "ngram").agg(
        F.count(F.lit(1)).alias("n_occur")
    )
    order = [F.col("n_occur").desc(), F.col("ngram").asc()]
    if groups:
        w = Window.partitionBy(*groups).orderBy(*order)
    else:
        counted = _shard_topk(counted, "ngram", order, k, num_shards)
        w = Window.partitionBy(_bounded_single_partition("ngram")).orderBy(
            *order
        )
    return counted.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_size: int | None = None,
    num_shards: int = 32,
) -> DataFrame:
    """Frequency-ranked vocabulary over lowercased whitespace terms:
    (term, n_occur, vocab_id) with vocab_id = rank by
    (count desc, term asc) — deterministic across runs and engines.

    Capped: per-shard partial top-``max_size`` (distributed window over
    hash shards), then the final rank over ``num_shards * max_size``
    survivors on one intentional bounded partition. Uncapped: a full
    distributed ranking via range repartition + cumulative partition
    offsets (``_distributed_row_number``) — the whole term table never
    sorts in a single task either way. The uncapped path materializes a
    ``localCheckpoint`` and runs a tiny per-partition-count job eagerly
    at call time."""
    terms = df.select(F.explode(_word_tokens(text_col)).alias("term"))
    counted = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_occur"))
    order = [F.col("n_occur").desc(), F.col("term").asc()]
    if max_size is not None:
        pruned = _shard_topk(counted, "term", order, max_size, num_shards)
        w = Window.partitionBy(_bounded_single_partition("term")).orderBy(
            *order
        )
        ranked = pruned.withColumn("vocab_id", F.row_number().over(w)).filter(
            F.col("vocab_id") <= max_size
        )
    else:
        ranked = _distributed_row_number(counted, order, "vocab_id")
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
    document score 0). N joins in as a broadcast 1-row aggregate.

    The per-term document frequency BROADCASTS back onto the tf table
    (|vocab| rows — term + count only) instead of shuffling tf by term:
    the big (doc, term) side never moves or sorts after its aggregation,
    and there is no hot-term skew hazard at all (a count window over
    ``partitionBy(term)`` was measured slower at sf1 — the mandatory
    partition-key sort of the tf table costs more than the df branch's
    re-aggregation, whose map-side partials shrink to |vocab| rows
    before its shuffle). N comes from a count-only scan (column-pruned,
    no tokenize)."""
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
        tf.join(F.broadcast(dfreq), "term")
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
    # ONE tokenized projection feeds tf AND dl (the old form tokenized
    # the corpus twice — once for the tf explode, once for the length
    # column — then sort-merge-joined them back on id). The alias is
    # referenced twice below, but regex tokenization is non-cheap, so
    # CollapseProject keeps it computed once per row.
    toked = docs.select(F.col(id_col), _word_tokens(text_col).alias("__toks"))
    # prune to the query vocabulary BEFORE the explode: the generator
    # emits only matching tokens, not the whole corpus token stream
    ex = toked.select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode(F.filter("__toks", lambda t: t.isin(qt))).alias("term"),
    )
    tf = ex.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    # df per query term as a COUNT window over the pruned tf table —
    # at most |query terms| distinct window keys, each holding one row
    # per matching document; deriving it with a second groupBy would
    # re-evaluate the whole tokenize/explode subtree (no cross-branch
    # plan reuse in Spark)
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    # N and avgdl need every document (matching or not): one 1-row
    # broadcast aggregate with its own column-pruned pass
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(_word_tokens(text_col))).alias("__avgdl"),
    )
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
        tf.withColumn("df", dfreq)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(score.alias("score"))
    )
