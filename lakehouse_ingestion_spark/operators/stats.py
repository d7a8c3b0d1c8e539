"""Descriptive statistics operators: equi-width histograms, grouped
correlation / covariance panels, and quantile (ntile) bucketing.

The reference exposes aggregation capabilities in its declared Gold
surface (``core/IngestionJob.scala`` routes aggregate configs;
``README.md`` "aggregations" bullet) but ships no profiling/statistics
operators; these are the standard exploratory companions a lakehouse
team runs before modelling, expressed as single-pass JVM aggregates.

100-TB posture:

- ``equi_width_histogram`` with explicit bounds is ONE map-side-combined
  aggregate — the bucket id is a pure projection, so the shuffle carries
  at most ``nbins`` rows per map partition. With ``lo``/``hi`` omitted
  it first runs a 1-row min/max aggregate (a second full scan — pass
  bounds explicitly when you already know the domain).
- ``grouped_corr`` is one ``groupBy().agg()`` over co-moment aggregates
  (corr/covar/stddev are all streaming-combinable partials in Spark);
  nothing here is a window or a join.
- ``quantile_buckets`` uses ``ntile`` — a full sort of each partition
  key's rows, and the partitionless path is size-gated
  (``max_global_rows``). At fact-table scale use
  ``quantile_buckets_agg`` (exact percentile edges in ONE aggregate +
  broadcast comparison assignment — no row-wise sort anywhere) or the
  t-digest sketch path (``operators/sketches.py``) when approximate
  edges suffice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    nbins: int,
    lo: float | None = None,
    hi: float | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Equi-width histogram of ``value_col``: rows land in
    ``nbins`` buckets over ``[lo, hi)``; values outside the range clamp
    into the edge buckets (bucket 0 / nbins-1), NULLs are dropped.

    The bucket id uses the portable ``floor((x - lo) / w)`` formula
    (identical semantics in every ANSI engine) rather than
    ``width_bucket`` so results are cross-engine reproducible.

    Returns one row per non-empty bucket: ``bucket`` (0-based),
    ``bucket_lo``/``bucket_hi`` edges, ``n`` and any ``extra_aggs``.
    """
    if nbins < 1:
        raise ConfigError(f"nbins must be >= 1, got {nbins}")
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(value_col).cast("double"),
            F.max(value_col).cast("double"),
        ).first()
        lo = bounds[0] if lo is None else lo
        hi = bounds[1] if hi is None else hi
        if lo is None:  # all-NULL column
            raise ConfigError(f"cannot infer histogram bounds: {value_col} is all NULL")
    lo_f, hi_f = float(lo), float(hi)
    if not hi_f > lo_f:
        raise ConfigError(f"histogram needs hi > lo, got [{lo_f}, {hi_f})")
    width = (hi_f - lo_f) / nbins
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(lo_f)) / F.lit(width)).cast("int")
    bucket = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), raw))
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), *(extra_aggs or []))
        .withColumn("bucket_lo", F.round(F.lit(lo_f) + F.col("bucket") * F.lit(width), 6))
        .withColumn("bucket_hi", F.round(F.lit(lo_f) + (F.col("bucket") + 1) * F.lit(width), 6))
    )


def grouped_corr(
    df: DataFrame,
    group_by: list[str],
    pairs: list[tuple[str, str]],
    round_digits: int = 5,
) -> DataFrame:
    """Pearson correlation + sample covariance for each (x, y) column
    pair, per group, in ONE aggregate pass (all co-moment partials fold
    map-side). Output columns: ``corr_<x>_<y>`` and ``covar_<x>_<y>``.

    ``round_digits`` bounds cross-engine float drift: corr/covar are
    ratios of large co-moment sums whose partition fold order differs
    between engines; 5 decimals is far above double noise on realistic
    row counts yet strict enough to catch real bugs.

    Every rounded value gets ``+ 0.0`` appended: rounding a tiny
    negative co-moment yields IEEE ``-0.0`` under DuckDB's half-even
    round but ``0.0`` under Spark's HALF_UP — numerically equal, yet a
    byte-level hash of the result differs (CORRECTNESS_r06
    ``corr_panel``). ``x + 0.0`` collapses ``-0.0`` to ``+0.0`` in both
    engines and is the identity everywhere else.
    """
    if not pairs:
        raise ConfigError("grouped_corr needs at least one (x, y) pair")
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for x, y in pairs:
        aggs.append(
            (F.round(F.corr(x, y), round_digits) + F.lit(0.0)).alias(f"corr_{x}_{y}")
        )
        aggs.append(
            (F.round(F.covar_samp(x, y), round_digits) + F.lit(0.0)).alias(
                f"covar_{x}_{y}"
            )
        )
    return df.groupBy(*group_by).agg(*aggs)


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    nbuckets: int,
    partition_by: list[str] | None = None,
    tiebreak: list[str] | None = None,
    bucket_col: str = "q_bucket",
    max_global_rows: int | None = 2_000_000,
) -> DataFrame:
    """Assign every row an equal-frequency (quantile) bucket via
    ``ntile(nbuckets)`` ordered by ``value_col``. ``tiebreak`` columns
    make the assignment total (and therefore deterministic / oracle-
    checkable) when values tie — always pass a unique key.

    ntile sorts every partition's rows; with no ``partition_by`` that is
    a partitionless window — Spark moves EVERY row through ONE task
    (``WindowExec: No Partition Defined``). Fine for Gold-sized frames;
    a silent scale-killer on a fact table. So the partitionless path is
    size-gated by ``max_global_rows`` (same posture as
    ``semantic_decon``'s ``max_eval`` and ``graph.py``'s broadcast
    gate): crossing it raises ``ConfigError`` pointing at the scale
    path — t-digest edges (``operators/sketches.py``) +
    ``equi_width_histogram`` — instead of letting the single-task sort
    run. The gating ``count()`` is a scan+agg, cheap relative to the
    sort it guards; ``max_global_rows=None`` disables the gate for
    callers that have sized the frame themselves.
    """
    if nbuckets < 1:
        raise ConfigError(f"nbuckets must be >= 1, got {nbuckets}")
    order = [F.col(value_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order)
    else:
        if max_global_rows is not None:
            n = df.count()
            if n > max_global_rows:
                raise ConfigError(
                    f"quantile_buckets without partition_by sorts all {n} "
                    f"rows in ONE task (> max_global_rows={max_global_rows}). "
                    "Use quantile_buckets_agg (exact percentile edges + "
                    "broadcast assignment — no global sort) or t-digest "
                    "edges (operators/sketches.py) for fact-table scale, "
                    "pass partition_by, or raise max_global_rows explicitly."
                )
        w = Window.orderBy(*order)
    return df.withColumn(bucket_col, F.ntile(nbuckets).over(w))


def quantile_buckets_agg(
    df: DataFrame,
    value_col: str,
    nbuckets: int,
    partition_by: list[str] | None = None,
    bucket_col: str = "q_bucket",
    edge_round: int | None = 6,
) -> DataFrame:
    """Equal-frequency bucketing at fact-table scale: the bucket edges
    come from ONE exact-``percentile`` aggregation (sort-based partials
    — distributed, combinable), broadcast back, and every row's bucket
    is a pure comparison projection.  This is the scale path the
    :func:`quantile_buckets` gate points at — no partitionless window,
    no single-task sort; the only exchange is the (tiny) per-group edge
    aggregate.

    Semantics are VALUE-based: bucket k holds rows with
    ``edge[k-1] < value <= edge[k]`` (edge[0] = -inf).  Equal values
    always land in the same bucket — unlike ``ntile``, which splits ties
    across buckets by row position to force exactly equal counts.  On
    tie-free data the two agree; on heavy ties value-based is usually
    what analysis wants (a value should not straddle buckets).

    ``edge_round`` rounds interpolated edges (6dp default) so the
    assignment comparisons are stable across engines — exact linear
    interpolation agrees bit-for-bit on integer-valued columns, and
    rounding absorbs last-ulp drift on float columns.  NULL values get
    a NULL bucket (they are excluded from the edges, as percentile
    ignores nulls in both engines).
    """
    if nbuckets < 1:
        raise ConfigError(f"nbuckets must be >= 1, got {nbuckets}")
    probs = [i / nbuckets for i in range(1, nbuckets)]  # internal edges
    if not probs:  # nbuckets == 1
        return df.withColumn(
            bucket_col,
            F.when(F.col(value_col).isNotNull(), F.lit(1)).cast("int"),
        )
    def edge(p: float, i: int) -> Column:
        e = F.percentile(F.col(value_col), F.lit(p))
        if edge_round is not None:
            e = F.round(e, edge_round)
        return e.alias(f"__e{i}")

    edge_exprs = [edge(p, i) for i, p in enumerate(probs)]
    if partition_by:
        # null-SAFE equi-join (r10 ADVICE fix): groupBy computes edges
        # for the NULL-key group, and a plain USING join would never
        # match them back — null-key rows got NULL buckets despite
        # non-null values.  eqNullSafe keeps the broadcast hash join
        # (null-safe equality is still an equi-key to the planner).
        edges = df.groupBy(*partition_by).agg(*edge_exprs)
        for c in partition_by:
            edges = edges.withColumnRenamed(c, f"__k_{c}")
        cond = None
        for c in partition_by:
            this = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
            cond = this if cond is None else cond & this
        joined = df.join(F.broadcast(edges), cond, "left").drop(
            *[f"__k_{c}" for c in partition_by]
        )
    else:
        edges = df.agg(*edge_exprs)
        joined = df.crossJoin(F.broadcast(edges))  # 1-row scalar attach
    bucket = F.lit(1)
    for i in range(len(probs)):
        bucket = bucket + (
            F.col(value_col).cast("double") > F.col(f"__e{i}")
        ).cast("int")
    return joined.withColumn(
        bucket_col,
        F.when(F.col(value_col).isNotNull(), bucket).cast("int"),
    ).drop(*[f"__e{i}" for i in range(len(probs))])


def robust_scale(
    df: DataFrame,
    value_col: str,
    partition_by: list[str] | None = None,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    scaled_col: str = "scaled",
    ndigits: int | None = 6,
) -> DataFrame:
    """Winsorize + min-max scale ``value_col`` per group: clamp to the
    exact [p_lo, p_hi] percentiles, then map the clamped range to
    [0, 1] — the outlier-robust feature normalization (quality scores,
    lengths, perplexities) that plain min-max lacks (one extreme row
    drags every other value toward 0) and z-scoring lacks robustly
    (mean/std are themselves outlier-sensitive).

    Shape: ONE exact-percentile aggregate per group (sort-based
    distributed partials, same as ``quantile_buckets_agg``) + a
    broadcast join of the tiny per-group edge frame + a pure
    projection. No window functions, no second scan.

    Determinism across engines: the scale uses only the two
    interpolated percentile values (single-value linear interpolation
    — no large summation whose float result depends on reduction
    order, the hazard a mean/std scaler would carry), so the rounded
    output is oracle-stable. Degenerate groups (p_lo and p_hi edges
    equal) scale to 0.5.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ConfigError(
            f"robust_scale needs 0 <= p_lo < p_hi <= 1, got [{p_lo}, {p_hi}]"
        )
    partition_by = list(partition_by or [])
    v = F.col(value_col).cast("double")
    # BOTH edges from ONE percentile buffer (r12, guide §1.2 per-task
    # work): percentile(col, array(lo, hi)) sorts/merges the per-group
    # value map once and interpolates both edges from it, where two
    # scalar percentile() aggregates each maintained their own buffer —
    # identical interpolated values, half the aggregation state.
    edge_expr = F.expr(
        f"percentile({value_col}, array({p_lo!r}, {p_hi!r}))"
    ).alias("__pq")
    unpack = [
        F.col("__pq")[0].alias("__lo"),
        F.col("__pq")[1].alias("__hi"),
    ]
    if partition_by:
        edges = df.groupBy(*partition_by).agg(edge_expr).select(
            *[F.col(c).alias(f"__k_{c}") for c in partition_by], *unpack
        )
        cond = None
        for c in partition_by:
            this = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
            cond = this if cond is None else cond & this
        joined = df.join(F.broadcast(edges), cond, "left").drop(
            *[f"__k_{c}" for c in partition_by]
        )
    else:
        joined = df.crossJoin(F.broadcast(df.agg(edge_expr).select(*unpack)))
    lo, hi = F.col("__lo"), F.col("__hi")
    clamped = F.least(F.greatest(v, lo), hi)
    scaled = F.when(hi > lo, (clamped - lo) / (hi - lo)).otherwise(F.lit(0.5))
    if ndigits is not None:
        # ndigits=None skips the in-engine round: both engines produce
        # bit-identical IEEE quotients, while round() semantics differ
        # (Spark HALF_UP on shortest repr vs DuckDB on binary) — oracle
        # queries compare raw doubles and let the harness round
        scaled = F.round(scaled, ndigits)
    return joined.withColumn(
        scaled_col,
        F.when(v.isNotNull(), scaled),
    ).drop("__lo", "__hi")
