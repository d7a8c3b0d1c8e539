"""Slowly-changing-dimension operators (SURVEY.md D8/D9).

Reference declares SCD Type 1 (overwrite in place) and Type 2 (history
rows with ``valid_from``/``valid_to``/``is_current`` — ``docs/00-
architecture-overview.md:230``, ``schemas/music_school/cdc/README.md:
116-122``).

Two execution styles:

- ``scd2_from_history``: rebuild the full SCD2 dimension from an event/
  change history in ONE pass — windows only (valid_to = lead(valid_from)),
  no merge, no driver loop. SQL-expressible, ideal for batch Gold rebuilds
  and for oracle checking.
- ``scd2_merge`` / ``scd1_apply``: incremental application of a change
  batch onto an existing dimension DataFrame. Implemented as pure
  DataFrame algebra (anti/union), so it works over plain Parquet; when a
  Delta/Iceberg table is the target, the same frames feed ``MERGE INTO``
  (the classic single-merge limitation — one merge cannot update the old
  row AND insert the new one from the same source row — is avoided by
  computing the post-image and overwriting, or by the union-with-
  sentinel-key trick at the sink layer).

Scale: one shuffle on the business key per operation; change detection
uses an attribute hash (xxhash64) instead of N column comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HIGH_DATE = "9999-12-31 23:59:59"


def _attr_hash(columns: list[str]) -> Column:
    # null-safe: hash the string forms with a sentinel for nulls
    return F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in columns])


def scd2_from_history(
    df: DataFrame,
    key_columns: list[str],
    ts_column: str,
    attr_columns: list[str] | None = None,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Rebuild SCD2 from a change history.

    Consecutive rows per key whose tracked attributes did not change are
    collapsed (no spurious versions). Output adds ``valid_from``,
    ``valid_to`` (null = open), ``is_current``.

    Plan: 1 shuffle (window partition by key), 3 window functions over the
    SAME window frame -> single exchange, single sort.
    """
    order = [F.col(ts_column).asc()] + [F.col(t).asc() for t in (tiebreakers or [])]
    w = Window.partitionBy(*key_columns).orderBy(*order)

    if attr_columns:
        h = _attr_hash(attr_columns)
        changed = (
            F.lag(h).over(w).isNull() | (F.lag(h).over(w) != h)
        )
        df = df.withColumn("__changed", changed).filter(F.col("__changed")).drop("__changed")

    w2 = Window.partitionBy(*key_columns).orderBy(*order)
    out = (
        df.withColumn("valid_from", F.col(ts_column))
        .withColumn("valid_to", F.lead(ts_column).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out


def scd1_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_columns: list[str],
) -> DataFrame:
    """SCD Type 1: updates overwrite matching keys; new keys insert.
    = whenMatchedUpdateAll / whenNotMatchedInsertAll as DataFrame algebra:
    (dim anti-join updates) union updates. One shuffle each side; the
    anti-join broadcasts when the update batch is small."""
    kept = dim.join(updates.select(*key_columns), on=key_columns, how="left_anti")
    return kept.unionByName(updates.select(*dim.columns))


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_columns: list[str],
    ts_column: str,
    attr_columns: list[str],
) -> DataFrame:
    """Incremental SCD2: close current rows whose attributes changed
    (set ``valid_to`` = update ts, ``is_current`` = false) and insert new
    current versions; unchanged keys untouched; brand-new keys insert as
    current.

    ``dim`` must already carry valid_from/valid_to/is_current.
    ``updates`` carries key + attrs + ts_column (the change timestamp).
    Deterministic: if several updates for one key are in the batch, each
    becomes a version (chained via scd2_from_history on the batch).
    """
    upd_hash = _attr_hash(attr_columns)
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    # latest state per key in the batch, with intra-batch versioning
    batch_versions = scd2_from_history(updates, key_columns, ts_column, attr_columns)

    # join current dim rows with the FIRST batch version per key to decide change
    first_batch = batch_versions.withColumn(
        "__rn", F.row_number().over(Window.partitionBy(*key_columns).orderBy(F.col(ts_column).asc()))
    ).filter(F.col("__rn") == 1).drop("__rn")

    cur_h = cur.withColumn("__h", _attr_hash(attr_columns))
    fb = first_batch.select(
        *[F.col(c).alias(f"__u_{c}") for c in key_columns],
        upd_hash.alias("__uh"),
        F.col(ts_column).alias("__uts"),
    )
    cond = None
    for c in key_columns:
        e = F.col(c) == F.col(f"__u_{c}")
        cond = e if cond is None else (cond & e)
    joined = cur_h.join(fb, on=cond, how="left")

    unchanged_cur = joined.filter(
        F.col("__uh").isNull() | (F.col("__uh") == F.col("__h"))
    ).select(*dim.columns)

    closed = (
        joined.filter(F.col("__uh").isNotNull() & (F.col("__uh") != F.col("__h")))
        .withColumn("valid_to", F.col("__uts"))
        .withColumn("is_current", F.lit(False))
        .select(*dim.columns)
    )

    # batch versions for keys that actually changed (or are new)
    changed_keys = (
        joined.filter(F.col("__uh").isNotNull() & (F.col("__uh") != F.col("__h")))
        .select(*[F.col(f"__u_{c}").alias(c) for c in key_columns])
    )
    new_keys = fb.join(
        cur.select(*key_columns),
        on=[F.col(f"__u_{c}") == F.col(c) for c in key_columns],
        how="left_anti",
    ).select(*[F.col(f"__u_{c}").alias(c) for c in key_columns])

    inserting_keys = changed_keys.unionByName(new_keys)
    inserts = batch_versions.join(inserting_keys, on=key_columns, how="left_semi").select(
        *[c for c in dim.columns]
    )

    return hist.unionByName(unchanged_cur).unionByName(closed).unionByName(inserts)
