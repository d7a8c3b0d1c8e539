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

100-TB posture: with ``exact_distinct=True`` Spark plans one Expand (a
k-way row multiplication) to evaluate k COUNT(DISTINCT) aggregates in a
single pass — correct but k× shuffle volume. The default
``exact_distinct=False`` uses ``approx_count_distinct`` (HLL partials,
map-side combinable, no Expand), which is what you want on raw facts;
exact mode exists for oracle checking and small dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        d = (
            F.count_distinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(d.alias(f"__dist_{c}"))
        aggs.append(F.min(s).alias(f"__min_{c}"))
        aggs.append(F.max(s).alias(f"__max_{c}"))
        aggs.append(F.round(F.avg(F.length(s)), 2).alias(f"__len_{c}"))
    one = df.agg(*aggs)
    # stack the 1-row wide aggregate into one row per column; the stack
    # string is built from trusted column names only
    n_per = 5
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.extend(
            [f"`__null_{c}`", f"`__dist_{c}`", f"`__min_{c}`", f"`__max_{c}`", f"`__len_{c}`"]
        )
    expr = (
        f"stack({len(cols)}, {', '.join(stack_args)}) as "
        f"(col_name, n_null, n_distinct, min_str, max_str, avg_len)"
    )
    return one.select(F.col("__n").alias("n_rows"), F.expr(expr)).select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str", "avg_len"
    )
