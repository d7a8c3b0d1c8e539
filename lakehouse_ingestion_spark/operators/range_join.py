"""Bucketed range (interval) join — extension beyond the reference
(SURVEY.md §2C: no range/interval join exists there), needed for
time-proximity joins in event pipelines.

Problem: ``left JOIN right ON right.ts BETWEEN left.ts + lo AND
left.ts + hi`` has no equi-key, so Catalyst can only plan a broadcast
nested loop (O(|L| * |R|) comparisons — hopeless at scale).

Technique: quantize time into buckets of width ``hi - lo``; a right row
can only match left rows whose window overlaps its bucket, so exploding
each LEFT row to the (at most 2) buckets its window spans and
equi-joining on the bucket id turns the plan into a shuffle hash /
sort-merge join with a residual range filter. Replication factor is
bounded by ``ceil(span / width) + 1 = 2``, independent of data size —
the shuffle is on (bucket [, extra keys]), so AQE's skew handling
applies to hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds

_BUCKET = "__rj_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    extra_keys: list[str] | None = None,
    how: str = "inner",
    left_row_key: str | None = None,
) -> DataFrame:
    """Join rows where ``right.right_ts`` is within
    ``[left.left_ts + lower_seconds, left.left_ts + upper_seconds]``
    (and ``extra_keys`` match, if given). Columns of both sides are kept;
    ``how`` may be "inner" or "left" ("left" keeps unmatched left rows
    with nulls on the right side).

    ``left_row_key``: name of a column that uniquely keys left rows
    (a real primary key). With it, the left join plans as inner join +
    anti-join union — no window, so the (potentially huge) joined
    output is never sorted; the anti-join runs against the original
    un-exploded left. Without it, a synthetic row id + dedup window is
    used — correct for any schema, but the window sorts the joined
    output by row id (measured +170% on the sf1 bench query), and a
    synthetic id cannot safely cross the two jobs the anti-join
    formulation needs. Callers with a PK should pass it.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must be > lower_seconds")
    width = float(upper_seconds - lower_seconds)
    keys = list(extra_keys or [])

    # epoch_seconds is NTZ-safe (TIMESTAMP_NTZ can't cast straight to
    # double); only differences/bucket containment matter here, so the
    # session-tz interpretation offset cancels — PROVIDED the offset is
    # constant, which the guard enforces (DST zones raise).
    from ..functions.timeutil import ensure_ntz_safe_session

    ensure_ntz_safe_session(left, [left_ts], "range_join")
    ensure_ntz_safe_session(right, [right_ts], "range_join")
    l_sec = epoch_seconds(left_ts)
    r_sec = epoch_seconds(right_ts)

    # left explodes to every bucket its window [ts+lo, ts+hi] overlaps
    lo_b = F.floor((l_sec + lower_seconds) / width).cast("long")
    hi_b = F.floor((l_sec + upper_seconds) / width).cast("long")
    r_b = right.withColumn(_BUCKET, F.floor(r_sec / width).cast("long"))

    def _join_cond(l_exp: DataFrame) -> Column:
        cond: Column = l_exp[_BUCKET] == r_b[_BUCKET]
        for k in keys:
            cond = cond & (l_exp[k] == r_b[k])
        return cond & (
            epoch_seconds(r_b[right_ts])
            >= epoch_seconds(l_exp[left_ts]) + lower_seconds
        ) & (
            epoch_seconds(r_b[right_ts])
            <= epoch_seconds(l_exp[left_ts]) + upper_seconds
        )

    if how == "inner":
        l_exp = left.withColumn(_BUCKET, F.explode(F.sequence(lo_b, hi_b)))
        joined = l_exp.join(r_b, _join_cond(l_exp), "inner")
        # a (left row, right row) match appears once: the right row's
        # bucket is unique, so only one exploded left copy satisfies cond
        return joined.drop(r_b[_BUCKET]).drop(l_exp[_BUCKET]).drop(
            *[r_b[k] for k in keys]
        )
    if how == "left" and left_row_key is not None:
        if left_row_key not in left.columns:
            raise ValueError(
                f"left_row_key {left_row_key!r} not in left columns"
            )
        l_exp = left.withColumn(_BUCKET, F.explode(F.sequence(lo_b, hi_b)))
        inner = (
            l_exp.join(r_b, _join_cond(l_exp), "inner")
            .drop(r_b[_BUCKET])
            .drop(l_exp[_BUCKET])
            .drop(*[r_b[k] for k in keys])
        )
        matched = inner.select(left_row_key).distinct()
        right_out = [
            f for f in r_b.schema.fields
            if f.name not in keys and f.name != _BUCKET
        ]
        unmatched = left.join(matched, left_row_key, "left_anti").select(
            "*",
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in right_out
            ],
        )
        return inner.unionByName(unmatched)
    if how == "left":
        # unmatched left rows survive once per exploded bucket copy ->
        # keep one copy. The dedup window partitions by a synthetic
        # per-row id tagged BEFORE the explode (every bucket copy of a
        # left row shares it) — partitioning by all left columns would
        # shuffle the full row as the window key and break outright on
        # un-orderable types (maps).
        from pyspark.sql.window import Window

        lid = "__rj_lid"
        l_exp = (
            left.withColumn(lid, F.monotonically_increasing_id())
            .withColumn(_BUCKET, F.explode(F.sequence(lo_b, hi_b)))
        )
        joined = l_exp.join(r_b, _join_cond(l_exp), "left")
        matched_col = r_b[right_ts]
        part = Window.partitionBy(l_exp[lid])
        flagged = joined.withColumn(
            "__rj_has",
            F.max(F.when(matched_col.isNotNull(), 1).otherwise(0)).over(part),
        ).withColumn("__rj_minb", F.min(l_exp[_BUCKET]).over(part))
        return (
            flagged.filter(
                ((F.col("__rj_has") == 1) & matched_col.isNotNull())
                | (
                    (F.col("__rj_has") == 0)
                    & (l_exp[_BUCKET] == F.col("__rj_minb"))
                )
            )
            .drop("__rj_has", "__rj_minb", lid)
            .drop(l_exp[_BUCKET])
            .drop(r_b[_BUCKET])
            .drop(*[r_b[k] for k in keys])
        )
    raise ValueError(f"unsupported how={how!r}")
