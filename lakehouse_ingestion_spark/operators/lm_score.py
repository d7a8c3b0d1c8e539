"""N-gram language-model perplexity scoring for corpus filtering.

CCNet (Wenzek et al., LREC 2020) and the Gopher/MassiveText pipeline
filter web documents by language-model perplexity: train a small n-gram
LM on a trusted corpus, score every candidate document, and drop (or
bucket) the tails. This module is that loop as pure DataFrame algebra —
a KenLM-shaped bigram model with add-k smoothing, where BOTH training
and scoring are joins/aggregations (no Python, no model object):

- ``train``: tokenize, explode bigrams, count — one shuffle keyed by
  (prev, word); unigram counts fold out of the same exploded frame.
- ``score``: explode the candidate corpus's bigrams, broadcast-join the
  model (a vocab²-bounded count table, tiny next to the corpus), and
  aggregate mean negative log₂ P(w | prev) per document.

P(w | prev) = (c(prev, w) + k) / (c(prev) + k·|V|), with unseen words
mapped to the same smoothed floor — every probability is strictly
positive, so log never sees zero.

100-TB posture: the model is data-independent in size (|V|² worst case,
far smaller in practice) and broadcasts; scoring is map-side join +
one groupBy(doc) — a single shuffle over (doc_id, logp) pairs. Nothing
iterates, nothing collects. Self-training (model corpus = scored
corpus) reuses one tokenized projection for both phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

BOS = "<s>"


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, prev, word) rows: one per token, with a BOS sentinel so the
    first token is conditioned too (every token scores exactly once)."""
    tk = tokens(F.lower(F.col(text_col)))
    padded = F.concat(F.array(F.lit(BOS)), tk)
    # guard: sequence(1, 0) DESCENDS in Spark ([1, 0]) — an empty doc
    # (padded = [BOS] alone) must yield zero bigrams, not bogus ones
    pairs = F.expr(
        "transform("
        "  if(size({p}) > 1, sequence(1, size({p}) - 1),"
        "     cast(array() as array<int>)),"
        "  i -> struct({p}[i-1] as prev, {p}[i] as word))".format(p="__padded")
    )
    return (
        df.select(F.col(id_col), padded.alias("__padded"))
        .select(F.col(id_col), F.explode(pairs).alias("bg"))
        .select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.word").alias("word"))
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """Count bigrams and contexts over the training corpus.

    Returns (bigram_counts(prev, word, c_bg), context_counts(prev, c_ctx),
    vocab_size). ``vocab_size`` counts distinct words INCLUDING the BOS
    context convention — it is the |V| in the add-k denominator. The two
    count frames come from one exploded pass (context counts fold from
    the bigram counts, not a second scan).
    """
    bg = _bigrams(df, text_col, id_col)
    bigram_counts = bg.groupBy("prev", "word").agg(
        F.count(F.lit(1)).alias("c_bg")
    )
    context_counts = bigram_counts.groupBy("prev").agg(
        F.sum("c_bg").alias("c_ctx")
    )
    vocab_size = bigram_counts.select("word").distinct().count()
    return bigram_counts, context_counts, vocab_size


def score_perplexity(
    df: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    out_col: str = "bits_per_token",
) -> DataFrame:
    """Mean negative log₂ P(w | prev) per document (bits/token — the
    standard LM-filtering statistic; perplexity = 2^bits). Documents
    with no tokens score NULL (curation length rules own them).

    The model frames broadcast (vocab-bounded); unseen bigrams and
    unseen contexts fall to the smoothed floor via left joins +
    coalesce, so scoring a corpus disjoint from the training corpus is
    well-defined.
    """
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    bg = _bigrams(df, text_col, id_col)
    joined = (
        bg.join(F.broadcast(bigram_counts), ["prev", "word"], "left")
        .join(F.broadcast(context_counts), ["prev"], "left")
        .select(
            id_col,
            (
                (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(k) * vocab_size)
            ).alias("__p"),
        )
    )
    neg_log2 = -F.log2(F.col("__p"))
    scored = joined.groupBy(id_col).agg(F.avg(neg_log2).alias(out_col))
    return df.join(scored, id_col, "left")


def self_score_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    out_col: str = "bits_per_token",
) -> DataFrame:
    """Train on ``df`` and score ``df`` (the CCNet self-scoring setup)
    sharing ONE bigram explode: train/score/vocab each need the exploded
    corpus, and composing ``train_bigram_lm`` + ``score_perplexity``
    re-tokenizes it three times (the vocab count is an eager job). The
    exploded frame persists across the three uses — the standard
    cache-the-shared-subtree trade: explode output is ~tokens-sized, so
    at true 100 TB prefer the recompute (drop the persist) or write the
    bigram frame once and read it back.
    """
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    bg_rows = _bigrams(df, text_col, id_col).persist()
    # the model table is ALSO cached (r12): its three consumers — its
    # own broadcast build, the context-count broadcast build, and the
    # |V| scalar — are separate jobs, so without the persist each one
    # re-ran the token-sized groupBy over the cached bigram frame
    # (3 corpus-token aggregations per call; the model itself is
    # vocab²-bounded, so this cache is small at any scale)
    bigram_counts = bg_rows.groupBy("prev", "word").agg(
        F.count(F.lit(1)).alias("c_bg")
    ).persist()
    context_counts = bigram_counts.groupBy("prev").agg(
        F.sum("c_bg").alias("c_ctx")
    )
    # |V| attached as a broadcast 1-row scalar (r12): the previous
    # ``.distinct().count()`` spent a separate eager job on the cached
    # bigram frame just to inline a literal; the arithmetic is the same
    # IEEE double product either way (k · |V| with |V| widened to
    # double), so scores are bit-identical.
    vocab = bigram_counts.agg(
        F.count_distinct(F.col("word")).alias("__vs")
    )
    joined = (
        bg_rows.join(F.broadcast(bigram_counts), ["prev", "word"], "left")
        .join(F.broadcast(context_counts), ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(k))
                / (
                    F.coalesce(F.col("c_ctx"), F.lit(0))
                    + F.lit(k) * F.col("__vs")
                )
            ).alias("__p"),
        )
    )
    # materialize the doc-sized score frame, then RELEASE the
    # token-sized bigram cache — without this every pipeline invocation
    # leaks a corpus-of-tokens cache into executor storage for the
    # session's lifetime (the eager checkpoint is what makes the
    # unpersist below safe to run before returning)
    scored = joined.groupBy(id_col).agg(
        F.avg(-F.log2(F.col("__p"))).alias(out_col)
    ).localCheckpoint(eager=True)
    bigram_counts.unpersist()
    bg_rows.unpersist()
    return df.join(scored, id_col, "left")
