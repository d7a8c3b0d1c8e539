"""As-of (point-in-time) join — not present in the reference
(SURVEY.md §2C: "No theta/range/as-of/interval join anywhere in the
reference"); provided as a training-data / event-pipeline extension and
oracle-checked against DuckDB's native ``ASOF JOIN``.

Semantics (direction="backward", the default): for every left row, attach
the single right row with the same key and the greatest ``right_on`` time
satisfying ``right_on <= left_on`` (within ``tolerance`` if given).

Spark-first formulation — ONE shuffle, no join:
tag both sides, union them, and compute ``last(<right col>, ignorenulls)``
over a per-key window ordered by (time, side). Right rows sort before left
rows at equal timestamps, so ties match (``<=``). This scales as a single
hash-partition by key + per-partition sort — compare the naive
``left.join(right, key).filter(r.ts <= l.ts)`` + window-max, which
shuffles both sides AND explodes to |L|x|R| per key before pruning.
Skewed keys are handled by AQE skew-split on the one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import epoch_seconds

_SIDE = "__asof_side"
_TIME = "__asof_time"
_RTIME = "__asof_rtime"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_columns: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    ``value_columns``: right columns to attach (default: all non-key,
    non-time right columns). Attached columns keep their name unless it
    collides with a left column, in which case ``suffix`` is appended.
    Rows with no qualifying right match keep nulls (left-join semantics).
    """
    # relative time math on NTZ columns is only exact under a
    # fixed-offset session timezone — enforce, don't document
    from ..functions.timeutil import ensure_ntz_safe_session

    ensure_ntz_safe_session(left, [left_on], "asof_join")
    ensure_ntz_safe_session(right, [right_on], "asof_join")
    if value_columns is None:
        value_columns = [
            c for c in right.columns if c not in by and c != right_on
        ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in value_columns
    }

    # the entire right-row image travels as ONE struct: last(ignorenulls)
    # over separate columns would stitch values from DIFFERENT right rows
    # whenever the true match has a NULL field (an older non-null value
    # would leak through). The struct itself is non-null for every right
    # row, so the fill is atomic per matched row.
    from pyspark.sql.types import StructField, StructType

    payload_type = StructType(
        [
            *[
                StructField(out_names[c], right.schema[c].dataType, True)
                for c in value_columns
            ],
            StructField(_RTIME, right.schema[right_on].dataType, True),
        ]
    )

    l_tagged = left.select(
        *by,
        F.col(left_on).alias(_TIME),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left.columns if c not in by],
        F.lit(None).cast(payload_type).alias("__asof_payload"),
    )
    r_tagged = right.select(
        *by,
        F.col(right_on).alias(_TIME),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in value_columns],
            F.col(right_on).alias(_RTIME),
        ).alias("__asof_payload"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(_TIME).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("__asof_payload", ignorenulls=True).over(w).alias("__f")
    )

    matched = F.col("__f").isNotNull() & F.col(f"__f.{_RTIME}").isNotNull()
    if tolerance_seconds is not None:
        # NTZ-safe: the session-tz offset cancels in the difference
        matched = matched & (
            epoch_seconds(F.col(_TIME)) - epoch_seconds(F.col(f"__f.{_RTIME}"))
            <= tolerance_seconds
        )

    left_cols = [c for c in left.columns if c not in by]
    return filled.filter(F.col(_SIDE) == 1).select(
        *by,
        *left_cols,
        *[
            F.when(matched, F.col(f"__f.{out_names[c]}"))
            .otherwise(F.lit(None))
            .alias(out_names[c])
            for c in value_columns
        ],
        F.when(matched, F.col(f"__f.{_RTIME}"))
        .otherwise(F.lit(None))
        .alias("_asof_matched_time"),
    )
