"""Event-sequence analytics: ordered funnels and retention cohorts.

Extends the engine's events-table surface (sessionization, windowed
aggregates — ``streaming/windows.py``) with the two classic
product-analytics operators, both single-shuffle:

- ``funnel``: how far does each user progress through an ORDERED step
  sequence (view -> click -> purchase)? A user reaches stage i only via
  events at strictly increasing timestamps matching steps 1..i in
  order. One groupBy(user) collects the user's (ts, step) events;
  a single ``aggregate`` fold over the time-sorted array advances a
  (stage, last_ts) accumulator greedily — greedy earliest-match is
  equivalent to the iterative min-time formulation, and per-user state
  is bounded by that user's event count (the same per-key-bounded shape
  ClickHouse's windowFunnel uses). No k-way self-joins.
- ``retention``: cohort = the user's first-activity period; for every
  later period the user is active in, emit (cohort, offset). The cohort
  assignment is a window min over the user's distinct activity periods
  — one shuffle on user_id, no join-back.

Scale: both shuffle the events table once, keyed by user. At 100 TB the
funnel's collect_list is bounded per user (power users with millions of
events are the skew case — AQE skew handling applies; a horizon filter
on ts is the practical cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user funnel progress: columns ``(user, stage)`` where stage in
    [0, len(steps)] is the number of steps completed in order at
    strictly increasing timestamps."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])

    # null timestamps carry no ordering signal and would otherwise let a
    # stage-0 match advance for free (last_ts stays null, so EVERY later
    # matching event advances) — drop them, matching retention() and
    # streaming_funnel() semantics
    ev = df.filter(
        F.col(step_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user"),
        F.struct(F.col(ts_col).alias("ts"), F.col(step_col).alias("step")).alias(
            "__ev"
        ),
    )
    collected = ev.groupBy("user").agg(
        F.array_sort(F.collect_list("__ev")).alias("__evs")
    )

    ts_type = df.schema[ts_col].dataType.simpleString()
    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(ts_type).alias("last_ts"),
    )

    def step_fn(acc, e):
        want = F.element_at(steps_lit, acc["stage"] + 1)
        advance = (
            (acc["stage"] < k)
            & (e["step"] == want)
            & (acc["last_ts"].isNull() | (e["ts"] > acc["last_ts"]))
        )
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"), e["ts"].alias("last_ts")
            ),
        ).otherwise(acc)

    return collected.select(
        "user",
        F.aggregate("__evs", zero, step_fn, lambda acc: acc["stage"]).alias("stage"),
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Funnel summary: one row per step with the number of users who
    reached AT LEAST that step (columns ``stage, step, n_users``)."""
    stages = funnel_stages(df, user_col, ts_col, step_col, steps)
    per_stage = stages.groupBy("stage").agg(F.count(F.lit(1)).alias("__n"))
    # users reaching >= i: suffix sum over the tiny per-stage frame
    w = Window.orderBy(F.desc("stage")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = per_stage.withColumn("__cum", F.sum("__n").over(w)).filter(
        F.col("stage") > 0
    )
    steps_df = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "stage int, step string"
    )
    # left join: a step nobody reached still appears, with 0 users
    return (
        steps_df.join(
            ladder.select(
                "stage", F.col("__cum").alias("n_users")
            ),
            "stage",
            "left",
        )
        .select(
            "stage",
            "step",
            F.coalesce(
                F.max("n_users").over(
                    Window.orderBy(F.desc("stage")).rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("n_users"),
        )
    )


def retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: ``(cohort_start, period_offset, n_users)`` —
    users whose FIRST activity fell in cohort_start's period and who
    were active again period_offset periods later (offset 0 = the cohort
    size itself). Periods are fixed ``period_days`` windows anchored at
    the epoch, so bucketing is pure integer arithmetic on both engines."""
    bucket = (
        F.floor(
            F.unix_timestamp(F.col(ts_col).cast("timestamp"))
            / F.lit(86400 * period_days)
        )
    ).alias("__p")
    # null timestamps carry no activity signal: dropping them beats a
    # NULL cohort row silently absorbing those users
    activity = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("user"), bucket)
        .distinct()
    )
    w = Window.partitionBy("user")
    offsets = activity.select(
        "user",
        (F.col("__p") - F.min("__p").over(w)).cast("int").alias("period_offset"),
        F.min("__p").over(w).alias("__cohort"),
    )
    return offsets.groupBy("__cohort", "period_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        # bucket -> DATE via pure day arithmetic (no session-timezone
        # dependence: a tz-aware cast would shift the cohort date for
        # sessions west of UTC)
        F.date_from_unix_date((F.col("__cohort") * period_days).cast("int")).alias(
            "cohort_start"
        ),
        "period_offset",
        "n_users",
    )
