"""Context-window document chunking — split documents into (optionally
overlapping) token windows for training-example construction.

The step between curation and tokenization in an LLM data pipeline:
documents longer than the model context are cut into ``chunk_size``-token
windows every ``stride`` tokens (stride < chunk_size = overlapping
windows, the standard way to keep context across cut points).

Everything is built-in array expressions — tokenize once, generate the
window start offsets with ``sequence``, slice each window out of the
SAME token array, ``posexplode`` to rows. Map-only: zero shuffles, zero
Python, fully streaming-compatible; the per-row cost is one token-array
allocation plus one slice per emitted chunk. Contrast with a UDTF
formulation: same output shape, but row-at-a-time Python on the hottest
path of the whole pipeline.

Chunk identity: ``chunk_id`` is the 0-based window index within the
document; (doc_id, chunk_id) is the stable global key (deterministic
under retries — no monotonically_increasing_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 128,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode documents into token windows: (id_col, [keep_cols...,]
    chunk_id, n_tokens, chunk_text).

    ``keep_cols`` names document-level columns (split assignment, source
    domain, quality scores) replicated onto every chunk — curation
    metadata must survive chunking or the train/eval split is lost.

    ``stride`` defaults to ``chunk_size`` (disjoint windows); smaller
    strides overlap. Windows start at 0, stride, 2*stride, ... while the
    start is inside the document, so the final window may be short;
    ``min_tokens`` drops degenerate tails (an overlapping tail shorter
    than ``chunk_size - stride`` adds no tokens the previous window
    lacks). Empty documents emit no rows.
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    st = chunk_size if stride is None else stride
    if not 1 <= st <= chunk_size:
        raise ValueError(
            f"stride must be in [1, chunk_size], got {st} (chunk_size {chunk_size})"
        )
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(st))
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.least(F.lit(chunk_size), n - s).alias("n_tokens"),
            F.array_join(F.slice(toks, s + 1, chunk_size), " ").alias(
                "chunk_text"
            ),
        ),
    )
    keep = list(keep_cols or [])
    return (
        df.select(
            F.col(id_col), *keep, F.posexplode(chunks).alias("chunk_id", "__c")
        )
        .select(
            id_col,
            *keep,
            "chunk_id",
            F.col("__c.n_tokens").cast("long").alias("n_tokens"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )
