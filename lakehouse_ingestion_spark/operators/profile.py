"""Table profiling: per-column null counts, distinct counts, min/max and
average length — the "what is in this table" pass every ingestion team
runs on a new Bronze source before writing DQ rules.

The reference's DQ layer (``dq/DataQualityChecker.scala``) validates
EXPECTED properties; this operator is the discovery half that tells you
what to expect. Output feeds directly into ``dq/derive.py``'s
metadata-derived checks.

Shape: ONE ``agg`` over the table computing every per-column statistic,
then a ``stack`` of the single result row into one row per column — the
explode touches one row, so the whole profile costs a single scan.

100-TB posture: the default ``exact_distinct=False`` uses
``approx_count_distinct`` (HLL partials, map-side combinable) inside
the fused aggregate — one scan, no Expand — which is what you want on
raw facts. ``exact_distinct=True`` does NOT join the fused aggregate:
k exact COUNT(DISTINCT)s in one agg plan an Expand (k-way row
multiplication) under which EVERY aggregate expression — including the
string casts for min/max/avg_len — re-evaluates per replica (measured
14.7 s for 4 columns over 15M orders at sf10). Instead the distincts
run as a melted side pass: union of k single-column projections →
two-level partial-aggregated count, joined back to the fused row by
column name (measured 5.95 s median on the same input, 2.5× faster;
see BASELINE.md round-6). Distinctness is counted on the STRING cast
(the only type the melt can union) — injective for the int/string/
date/decimal types a profile meets, so counts equal native-type
COUNT(DISTINCT).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_distincts(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_distinct) via a melt: k column-pruned projections
    unioned, then distinct-then-count with partial aggregation at both
    levels — no Expand, low-cardinality columns collapse map-side."""
    parts = [
        df.where(F.col(c).isNotNull()).select(
            F.lit(c).alias("col_name"), F.col(c).cast("string").alias("__v")
        )
        for c in cols
    ]
    melted = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        melted.distinct()
        .groupBy("col_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per profiled column: ``col_name``, ``n_rows``, ``n_null``,
    ``n_distinct`` (NULLs excluded, per SQL COUNT(DISTINCT)), ``min_str``
    / ``max_str`` (string-cast extrema) and ``avg_len`` (average of the
    string-cast length, 2 decimals; NULLs skipped)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"__dist_{c}"))
        aggs.append(F.min(s).alias(f"__min_{c}"))
        aggs.append(F.max(s).alias(f"__max_{c}"))
        aggs.append(F.round(F.avg(F.length(s)), 2).alias(f"__len_{c}"))
    one = df.agg(*aggs)
    # stack the 1-row wide aggregate into one row per column; the stack
    # string is built from trusted column names only
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        if not exact_distinct:
            stack_args.append(f"`__dist_{c}`")
        stack_args.extend(
            [f"`__null_{c}`", f"`__min_{c}`", f"`__max_{c}`", f"`__len_{c}`"]
        )
    out_cols = (
        "(col_name, n_null, min_str, max_str, avg_len)"
        if exact_distinct
        else "(col_name, n_distinct, n_null, min_str, max_str, avg_len)"
    )
    expr = f"stack({len(cols)}, {', '.join(stack_args)}) as {out_cols}"
    stacked = one.select(F.col("__n").alias("n_rows"), F.expr(expr))
    if exact_distinct:
        # exact distincts ride the melted side pass (module docstring);
        # the k-row join is trivially broadcast
        stacked = stacked.join(
            F.broadcast(_exact_distincts(df, cols)), "col_name", "left"
        ).withColumn("n_distinct", F.coalesce("n_distinct", F.lit(0)))
    return stacked.select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str", "avg_len"
    )


def numeric_profile(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Reference profile for drift gating — the stored half of the
    profile -> ``DriftCheck`` loop (round 8): one fused aggregate pass
    over the reference slice producing one row per numeric column with
    ``col_name, n_rows, n_null, null_fraction, mean, std`` (population
    std — the same moments ``DriftCheck`` compares against). Persist
    the output (parquet) and point a config-driven drift check at it
    via ``profile_path`` — no hand-carried constants.

    ``columns`` defaults to every numeric column. Like
    ``profile_table``, this is ONE job regardless of column count; the
    profile is k rows, so the store/read side is negligible at any
    scale.
    """
    from pyspark.sql.types import NumericType

    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, NumericType)
        ]
        if not columns:
            raise ValueError("frame has no numeric columns to profile")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        d = F.col(c).cast("double")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.avg(d).alias(f"__mean_{c}"))
        aggs.append(F.stddev_pop(d).alias(f"__std_{c}"))
    one = df.agg(*aggs)
    stack_args = []
    for c in columns:
        stack_args.extend(
            [f"'{c}'", f"`__null_{c}`", f"`__mean_{c}`", f"`__std_{c}`"]
        )
    expr = (
        f"stack({len(columns)}, {', '.join(stack_args)})"
        " as (col_name, n_null, mean, std)"
    )
    return one.select(F.col("__n").alias("n_rows"), F.expr(expr)).select(
        "col_name",
        "n_rows",
        "n_null",
        (F.col("n_null").cast("double") / F.col("n_rows")).alias(
            "null_fraction"
        ),
        "mean",
        "std",
    )
