"""CDC apply (SURVEY.md D7) — reconstruct table state from a Debezium-style
change stream.

Reference contract (``schemas/music_school/cdc/README.md:113-122``,
envelope ``schemas/music_school/cdc/v1.json``): events carry
``op`` (c=create, u=update, d=delete, r=snapshot-read), ``ts_ms``, row
payload in ``after`` (null for deletes, ``before`` holds the old image),
and ordering metadata (``source.lsn``, ``source.txId``).

Semantics implemented:
1. ``cdc_latest``: per key keep ONLY the latest event by the ordering
   columns (ts_ms, then lsn as tiebreaker) — one window, one shuffle.
2. ``cdc_apply``: latest event per key, then drop keys whose latest op is
   a delete; project the payload. Result = current table state.
3. ``cdc_apply_incremental``: merge a new micro-batch of events into an
   existing snapshot (for foreachBatch streaming upserts) — union the
   snapshot (as op='r' events at epoch order) with the batch, re-apply.
   Replays are idempotent: applying the same events twice yields the same
   state (winner selection is deterministic).

Scale: single shuffle on the key per apply; at 100 TB pair with a
partitioned target (e.g. bucketed by key) so the merge join co-locates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DELETE_OPS = ("d",)


def _order_cols(order_by: list[Column | str]) -> list[Column]:
    return [F.col(c).desc() if isinstance(c, str) else c for c in order_by]


def cdc_latest(
    df: DataFrame,
    key_columns: list[str],
    order_by: list[Column | str],
    strategy: str = "window",
) -> DataFrame:
    """Latest event per key. ``order_by`` columns are interpreted
    newest-first when given as plain strings (wrapped in desc()).

    ``strategy="window"`` (default): row_number over a per-key sort —
    fully codegen'd, measured ~25% faster than the agg form on local[32]
    at 100k-2M rows (see PLANS.md "formulation trade-off").
    ``strategy="agg"`` (requires plain-string ``order_by``): ``max_by``
    aggregation whose map-side partial collapses each partition to <=1
    row/key BEFORE the shuffle — the right choice when shuffle is
    network-bound (real clusters) or a key is hot enough to blow a
    single window partition; null ordering values lose (struct nulls
    sort smallest), matching desc_nulls_last.
    """
    if strategy == "agg":
        if not all(isinstance(c, str) for c in order_by):
            raise ValueError(
                "strategy='agg' requires plain-string order_by columns "
                "(max_by cannot honor per-column sort directions); use "
                "strategy='window' for Column expressions"
            )
        from lakehouse_ingestion_spark.operators.dedup import dedup_latest_agg

        return dedup_latest_agg(df, key_columns, list(order_by))
    w = Window.partitionBy(*key_columns).orderBy(*_order_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_apply(
    df: DataFrame,
    key_columns: list[str],
    order_by: list[Column | str],
    op_column: str = "op",
    delete_ops: tuple[str, ...] = DELETE_OPS,
    payload_columns: list[str] | None = None,
) -> DataFrame:
    """Current state = latest event per key, minus keys whose latest op is
    a delete. ``payload_columns`` projects the row image (defaults to all
    non-op columns)."""
    latest = cdc_latest(df, key_columns, order_by)
    alive = latest.filter(~F.col(op_column).isin(list(delete_ops)))
    if payload_columns is not None:
        alive = alive.select(*key_columns, *payload_columns)
    return alive


def cdc_apply_incremental(
    snapshot: DataFrame,
    events: DataFrame,
    key_columns: list[str],
    order_by: list[str],
    op_column: str = "op",
    delete_ops: tuple[str, ...] = DELETE_OPS,
) -> DataFrame:
    """Merge a CDC event batch into an existing snapshot.

    The snapshot is lifted to pseudo-events ranked below every real event
    (op='r', ordering columns nulled -> sort last under desc with
    nulls-last), then the standard apply runs. One union + one shuffle.
    ``snapshot`` columns must be a subset of the event payload columns.
    """
    evt_cols = events.columns
    lifted = snapshot
    for c in evt_cols:
        if c not in snapshot.columns:
            lifted = lifted.withColumn(c, F.lit(None))
    lifted = lifted.withColumn(op_column, F.lit("r")).select(*evt_cols)
    combined = events.unionByName(lifted)
    # cdc_apply ranks with the default window strategy (desc_nulls_last),
    # so the lifted snapshot rows' null ordering values sort last and
    # lose to any real event for the same key
    return cdc_apply(
        combined, key_columns, list(order_by), op_column=op_column, delete_ops=delete_ops
    ).drop(op_column)


def parse_debezium(
    raw: DataFrame,
    row_schema,
    value_column: str = "after",
) -> DataFrame:
    """Extract the typed row image from the JSON-string ``after``/``before``
    payload (reference stores them as JSON strings —
    ``schemas/music_school/cdc/v1.json:5-43``)."""
    return raw.withColumn("__row", F.from_json(F.col(value_column), row_schema))
