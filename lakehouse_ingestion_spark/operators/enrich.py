"""Enrichment joins (SURVEY.md D10) and denormalization support.

Reference declares Silver \"Enrichment with reference data\" (``docs/00-
architecture-overview.md:231``; \"enrich with customer data\",
``schemas/payments/transactions/README.md:66``).

Scale posture: dimension sides are broadcast by default (explicit
``F.broadcast`` hint — at 100 TB the fact side must never shuffle for a
50 MB dimension). Multi-hop enrichment chains (fact->dim1->dim2) compose
into one plan; Catalyst pushes fact-side filters below the joins.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Enrichment:
    """One dimension attach: join ``dim`` on ``on`` (col name or (fact_col,
    dim_col) pairs), keeping ``select`` columns (None = all)."""

    dim: DataFrame
    on: list = field(default_factory=list)
    how: str = "left"
    select: list[str] | None = None
    broadcast: bool = True
    prefix: str = ""


def enrich(fact: DataFrame, *enrichments: Enrichment) -> DataFrame:
    out = fact
    for e in enrichments:
        dim = e.dim
        if e.select is not None:
            # keep join keys + selected payload
            keys = [p[1] if isinstance(p, (tuple, list)) else p for p in e.on]
            dim = dim.select(*dict.fromkeys([*keys, *e.select]))
        if e.prefix:
            keys = [p[1] if isinstance(p, (tuple, list)) else p for p in e.on]
            dim = dim.select(
                *[F.col(c).alias(c if c in keys else f"{e.prefix}{c}") for c in dim.columns]
            )
        if e.broadcast:
            dim = F.broadcast(dim)
        if e.on and isinstance(e.on[0], (tuple, list)):
            cond = None
            for fact_col, dim_col in e.on:
                c = out[fact_col] == dim[dim_col]
                cond = c if cond is None else (cond & c)
            out = out.join(dim, on=cond, how=e.how)
            # drop the dim-side key copies: when fact_col == dim_col the
            # output would otherwise carry two identically-named columns
            # (prefix mode exempts keys from renaming, guaranteeing it)
            for _, dim_col in e.on:
                out = out.drop(dim[dim_col])
        else:
            out = out.join(dim, on=list(e.on), how=e.how)
    return out
