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

    # drop the LEADING batch version when it merely repeats the current
    # dim attributes (a no-op replay); later versions for the same key
    # must still apply — comparing only the first version and declaring
    # the whole key unchanged would silently discard them
    cur_keyed = cur.select(
        *[F.col(c).alias(f"__c_{c}") for c in key_columns],
        _attr_hash(attr_columns).alias("__ch"),
    )
    key_cond = None
    for c in key_columns:
        e = F.col(c) == F.col(f"__c_{c}")
        key_cond = e if key_cond is None else (key_cond & e)
    bv = (
        batch_versions.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*key_columns).orderBy(F.col(ts_column).asc())
            ),
        )
        .join(cur_keyed, on=key_cond, how="left")
    )
    effective = bv.filter(
        ~((F.col("__rn") == 1) & F.col("__ch").isNotNull() & (upd_hash == F.col("__ch")))
    )

    # close current rows at the first effective version's timestamp
    closure = (
        effective.withColumn(
            "__ern",
            F.row_number().over(
                Window.partitionBy(*key_columns).orderBy(F.col(ts_column).asc())
            ),
        )
        .filter((F.col("__ern") == 1) & F.col("__ch").isNotNull())
        .select(
            *[F.col(f"__c_{c}").alias(f"__k_{c}") for c in key_columns],
            F.col(ts_column).alias("__close_ts"),
        )
    )
    close_cond = None
    for c in key_columns:
        e = F.col(c) == F.col(f"__k_{c}")
        close_cond = e if close_cond is None else (close_cond & e)
    closed = (
        cur.join(closure, on=close_cond, how="inner")
        .withColumn("valid_to", F.col("__close_ts"))
        .withColumn("is_current", F.lit(False))
        .select(*dim.columns)
    )
    unchanged_cur = cur.join(
        closure.select(*[F.col(f"__k_{c}").alias(c) for c in key_columns]),
        on=key_columns,
        how="left_anti",
    ).select(*dim.columns)

    inserts = effective.select(*dim.columns)

    return hist.unionByName(unchanged_cur).unionByName(closed).unionByName(inserts)


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row picks the SCD2 dimension
    version that was valid AT the fact's own timestamp
    (``valid_from <= ts < valid_to``, open version = null valid_to) —
    the join that makes a Type-2 dimension actually usable: enriching
    facts with TODAY'S attributes silently rewrites history.

    Because SCD2 intervals are non-overlapping per key, at most one
    version matches — no dedup pass needed. The plan is a plain
    equi-join on the keys with the interval predicate as a residual
    (broadcast when the dimension is small, sort-merge otherwise), so
    the fact table shuffles at most once; version counts per key are
    small, so the residual evaluates over a few candidate rows per
    fact.  ``how="left"`` keeps facts predating the first version,
    null-padded.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"pit_join supports inner/left, got {how!r}")
    f = facts.alias("__f")
    d = dim.alias("__d")
    cond = None
    for k in keys:
        eq = F.col(f"__f.{k}") == F.col(f"__d.{k}")
        cond = eq if cond is None else (cond & eq)
    ts = F.col(f"__f.{fact_ts}")
    cond = (
        cond
        & (F.col(f"__d.{valid_from}") <= ts)
        & (F.col(f"__d.{valid_to}").isNull() | (ts < F.col(f"__d.{valid_to}")))
    )
    out = f.join(d, cond, how)
    # drop the dimension's duplicated key columns
    return out.drop(*[d[k] for k in keys])
