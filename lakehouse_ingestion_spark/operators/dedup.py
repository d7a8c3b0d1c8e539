"""Deduplication operators (SURVEY.md D5).

Reference declares Silver dedup by business key (``docs/00-architecture-
overview.md:226``, ``schemas/payments/transactions/README.md:66``). Two
flavors:

- ``dedup_exact``: drop fully-identical or key-identical rows
  nondeterministically (``dropDuplicates``) — cheapest, one shuffle on key.
- ``dedup_latest_by_key``: deterministic winner per key by ordering columns
  (e.g. latest event_time, then a unique tiebreaker) via one window — the
  production-correct variant, single shuffle, SQL-expressible
  (= ``row_number() over (partition by key order by ...desc) = 1``).

Scale: both shuffle on the key once. For skewed keys enable AQE skew
handling (on by default in session.py). ``dedup_latest_by_key`` avoids the
classic two-shuffle groupBy+join-back pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_exact(df: DataFrame, key_columns: list[str] | None = None) -> DataFrame:
    """Hash-based exact dedup. No keys -> whole-row dedup."""
    return df.dropDuplicates(key_columns) if key_columns else df.dropDuplicates()


def dedup_latest_by_key(
    df: DataFrame,
    key_columns: list[str],
    order_by: list[Column | str],
    keep: str = "first",
) -> DataFrame:
    """Deterministic dedup: keep the first row per key under ``order_by``.

    ``order_by`` should end with a unique tiebreaker for full determinism
    (e.g. ``[F.desc("ts"), F.desc("event_id")]``).
    ``keep="last"`` inverts the ordering; it requires plain-string
    ``order_by`` (a pre-built Column's direction can't be flipped).
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    if keep == "last":
        if not all(isinstance(c, str) for c in order_by):
            raise ValueError("keep='last' requires plain-string order_by columns")
        cols = [F.col(c).desc() for c in order_by]
    else:
        cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*key_columns).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_latest_agg(
    df: DataFrame,
    key_columns: list[str],
    max_by_columns: list[str],
) -> DataFrame:
    """Same result as ``dedup_latest_by_key`` with
    ``order_by=[desc(c) for c in max_by_columns]``, as a ``max_by``
    aggregation: keep the row whose ``(max_by_columns...)`` tuple is the
    lexicographic maximum per key.

    Scale: strictly dominates the window form at large N — partial
    aggregation collapses each map partition to at most one row per key
    BEFORE the shuffle (the window form shuffles every row), and a hot
    key degrades gracefully for the same reason. Use the window form
    when ordering needs mixed asc/desc or explicit null placement.

    ``max_by_columns`` must be non-null for well-defined ordering (null
    struct fields sort smallest, i.e. lose).
    """
    ordering = F.struct(*[F.col(c) for c in max_by_columns])
    row = F.struct(*[F.col(c) for c in df.columns])
    out = df.groupBy(*key_columns).agg(F.max_by(row, ordering).alias("__w"))
    return out.select(*[F.col(f"__w.{c}").alias(c) for c in df.columns])
