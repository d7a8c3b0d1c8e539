"""Batch text retrieval: BM25 top-k search over the corpus for a SET of
queries in one corpus pass.

The retrieval counterpart of ``text_ranking.bm25`` (which scores one
query): RAG indexing-time jobs, dedup-against-query-logs, and eval-set
retrieval audits all ask "for each of these Q queries, the k best
documents".  Running ``bm25`` Q times would scan the corpus Q times; at
100 TB the design constraint is ONE pass regardless of Q:

- queries are config-sized by contract (thousands, not billions) — they
  are tokenized and collected ONCE on the driver (size-gated by
  ``max_query_terms``, the ``semantic_decon.max_eval`` posture), giving
  (a) the query vocabulary as a LITERAL in-filter so corpus tokens are
  pruned inside the explode generator (tokens not in any query never
  leave the scan projection), and (b) a tiny (query_id, term) frame that
  broadcast-joins onto the pruned token stream — no shuffle keyed by
  corpus size anywhere before the per-(query, doc) aggregate;
- document frequency per term rides a COUNT window over the pruned tf
  table (<= |vocab| window keys), corpus stats (N, avgdl) are a 1-row
  broadcast aggregate — the same shapes as ``bm25``, scored per query;
- top-k per query is a row_number window PARTITIONED BY query_id —
  parallelism = Q, each partition holding only that query's matching
  docs.  A query matching a huge corpus fraction skews its partition;
  that is inherent to "rank everything that matches" — tighten the
  query terms or raise retrieval to ANN (operators/ann.py) when match
  sets are corpus-sized.

Reference parity: the reference has no search operator; this extends the
LLM-curation surface (SURVEY.md "beyond the reference" tier) alongside
TF-IDF/BM25 scoring and the ANN family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.text_ranking import _word_tokens


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
    max_query_terms: int = 100_000,
) -> DataFrame:
    """Top-``k`` documents per query by BM25, one corpus pass for the
    whole query set.

    Returns (query_id, doc_id, score, rk) with rk 1..k per query,
    deterministic tie-break (score DESC, doc_id ASC).  Queries with no
    matching document produce no rows (a LEFT join against the query
    frame is the caller's presentation choice).

    ``max_query_terms`` gates the driver-collected (query_id, term)
    pairs — queries are config-sized by contract; crossing the gate
    raises instead of silently shipping an unbounded literal filter.
    """
    if k < 1:
        raise ConfigError(f"k must be >= 1, got {k}")
    # id types follow the INPUT frames (r10 ADVICE fix): string doc ids
    # used to get a long-typed empty-path schema and string query ids
    # died inside createDataFrame despite no documented long-only
    # contract — derive both from the schemas, as bpe_encode does.
    id_type = docs.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    q_pairs = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_word_tokens(query_text_col)).alias("term"),
        )
        .distinct()
        .collect()
    )
    if len(q_pairs) > max_query_terms:
        raise ConfigError(
            f"query set expands to {len(q_pairs)} (query, term) pairs > "
            f"max_query_terms={max_query_terms}; queries are config-sized "
            "by contract — split the query set or raise the gate"
        )
    if not q_pairs:
        return docs.sparkSession.createDataFrame(
            [], f"query_id {qid_type}, `{id_col}` {id_type}, score double, rk int"
        )
    vocab = sorted({r["term"] for r in q_pairs})
    spark = docs.sparkSession

    # ONE tokenized projection feeds tf and dl; the explode generator
    # emits only query-vocabulary tokens (literal in-filter pushed into
    # the lambda), so the token stream is |matches|-sized, not corpus-
    # token-sized (same pruning as text_ranking.bm25). The (n_docs,
    # avgdl) stats deliberately keep their own tokenize subtree: the
    # r13 one-pass alternative (explode_outer + pinned narrow rows +
    # per-doc first(dl) aggregate) measured SLOWER at sf0.1 (3.6 s vs
    # 2.4 s — the pin action and the extra doc-keyed exchange cost more
    # than the saved tokenization; see OPTIMIZATION_r13.md).
    toked = docs.select(F.col(id_col), _word_tokens(text_col).alias("__toks"))
    ex = toked.select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode(F.filter("__toks", lambda t: t.isin(vocab))).alias("term"),
    )
    tf = ex.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(_word_tokens(text_col))).alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    qmap = F.broadcast(
        spark.createDataFrame(
            [(r["query_id"], r["term"]) for r in q_pairs],
            f"query_id {qid_type}, term string",
        )
    )
    # df via count-over-Window, NOT a groupBy("term") aggregate +
    # broadcast join: dftab would derive from tf, and Catalyst does not
    # CSE sibling subtrees, so the broadcast BUILD re-runs the whole
    # tokenize+tf pipeline a second time (r13 A/B, interleaved with a
    # flat noise control: window 2.39 s vs agg+broadcast 3.19 s at
    # sf0.1). The window shares tf's rows and the term-keyed exchange
    # is |doc x matching-term| rows of 3 narrow columns — the sort is
    # cheaper than a second corpus pass at any scale.
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    scored = (
        tf.withColumn("df", dfreq)
        .join(qmap, "term")  # broadcast: fans each doc-term to its queries
        .crossJoin(F.broadcast(stats))  # 1-row scalar attach
        .groupBy("query_id", id_col)
        .agg(F.sum(idf * norm).alias("score"))
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score", "rk")
    )
