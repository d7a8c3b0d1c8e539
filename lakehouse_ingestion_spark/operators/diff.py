"""Snapshot diff: content-level comparison of two table versions.

The operational complement of the lakehouse write path: after every
reprocessing run ("new crawl", "rerun curation with new thresholds",
"backfill"), the first question is WHAT CHANGED — how many documents
appeared, vanished, or mutated, and which ones. Delta/Iceberg time
travel gives you the two frames; this operator gives the diff (the
reference has no diff surface; its docs stop at writing the new
version — `docs/00-architecture-overview.md`'s medallion flow).

Shape: ONE full outer join on the key, statuses decided by null-side
and a content hash over the compared columns (md5 of the
null-tagged concatenation — a raw ``concat_ws`` would collide
``("ab", "c")`` with ``("a", "bc")`` and NULL with empty, so fields are
length-prefixed). No collect, no window; the join is the only shuffle,
and at 100 TB both sides prune to the compared columns at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: list[str], side: DataFrame) -> Column:
    """Collision-safe row hash: every field length-prefixed and
    null-tagged before hashing, so field boundaries and NULL vs ''
    survive the concatenation."""
    parts = []
    for c in cols:
        s = side[c].cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("N:")).otherwise(
                F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat(*parts)) if parts else F.lit("")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "diff_status",
) -> DataFrame:
    """Row-level diff of ``new`` against ``old`` keyed by ``keys``.

    Output: one row per key present in either side, with ``status_col``
    in {'added', 'removed', 'changed', 'unchanged'} and both content
    hashes (``old_hash``/``new_hash`` — NULL on the absent side).
    ``compare_cols`` defaults to every shared non-key column. Aggregate
    the status column for the run report; filter it for the row-level
    drill-down.
    """
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    missing_old = [c for c in [*keys, *compare_cols] if c not in old.columns]
    missing_new = [c for c in [*keys, *compare_cols] if c not in new.columns]
    if missing_old or missing_new:
        raise ValueError(
            f"columns missing from old={missing_old} new={missing_new}"
        )

    o = old.select(*keys, _content_hash(compare_cols, old).alias("old_hash"))
    n = new.select(*keys, _content_hash(compare_cols, new).alias("new_hash"))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn(status_col, status)


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Status counts of ``snapshot_diff`` — the one-line run report."""
    d = snapshot_diff(old, new, keys, compare_cols)
    return d.groupBy("diff_status").agg(F.count(F.lit(1)).alias("n_rows"))
