"""Gold-layer operators (SURVEY.md D11/D12): aggregations, roll-ups,
cubes, denormalized wide tables.

Reference declares \"Business metric calculations\", \"Aggregations and
roll-ups\" (``docs/00-architecture-overview.md:240-244``), e.g. daily
transaction volumes / revenue by merchant
(``schemas/payments/transactions/README.md:69``).

All declarative: ``groupBy/rollup/cube`` + aliased aggregate expressions.
Spec-level entry (AggSpec) exists so the YAML pipeline compiler can drive
these; the functions also take raw columns for library use.

Scale: groupBy aggregates do map-side partial aggregation automatically;
high-cardinality distinct counts should use approx_count_distinct (HLL)
— exposed via ``AGG_FUNCS['approx_count_distinct']``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AGG_FUNCS = {
    "sum": F.sum,
    "count": F.count,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count_distinct": lambda c: F.count_distinct(F.col(c) if isinstance(c, str) else c),
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev,
    "first": F.first,
    "last": F.last,
    "collect_set": F.collect_set,
    "median": F.median,
}


@dataclass
class AggSpec:
    func: str
    column: str
    alias: str | None = None

    def to_column(self) -> Column:
        fn = AGG_FUNCS[self.func]
        col = fn(self.column) if self.column != "*" else F.count(F.lit(1))
        return col.alias(self.alias or f"{self.func}_{self.column}")


def _agg_cols(aggs: list[AggSpec | Column]) -> list[Column]:
    return [a.to_column() if isinstance(a, AggSpec) else a for a in aggs]


def aggregate(df: DataFrame, group_by: list[str], aggs: list) -> DataFrame:
    return df.groupBy(*group_by).agg(*_agg_cols(aggs))


def rollup(df: DataFrame, group_by: list[str], aggs: list) -> DataFrame:
    """Hierarchical subtotals (explicitly declared: \"roll-ups\",
    ``docs/00-architecture-overview.md:242``)."""
    return df.rollup(*group_by).agg(*_agg_cols(aggs))


def cube(df: DataFrame, group_by: list[str], aggs: list) -> DataFrame:
    return df.cube(*group_by).agg(*_agg_cols(aggs))


def denormalize(
    fact: DataFrame,
    dims: list[tuple[DataFrame, list[str]]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Star-schema flattening into a wide table (D12): left-join each
    (dim, keys); dims broadcast by default."""
    out = fact
    for dim, keys in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=keys, how="left")
    return out
