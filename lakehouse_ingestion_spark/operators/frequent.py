"""Batch frequent-items (heavy hitters) with exact confirmed counts.

The batch companion to ``streaming/heavy_hitters.py``: find every item
whose global frequency is at least ``min_share`` of the total, with its
EXACT count, without ever building the full item->count table (which on
open vocabularies — URLs, n-grams, user agents — is the thing that
doesn't fit).

Two passes, the classic sketch-then-confirm shape:

1. CANDIDATES (map-only): each partition runs a Misra-Gries summary
   (Misra & Gries 1982) with ``capacity = ceil(1/min_share)`` counters
   over its local items. Pigeonhole: an item with global count
   > N * min_share must exceed the MG survival threshold
   ``n_p/(capacity+1)`` in at least one partition, so the UNION of
   per-partition candidate sets contains every globally frequent item —
   no false negatives. Candidate volume is bounded by
   capacity x partitions, independent of item cardinality.
2. CONFIRM (one aggregation over the semi-filtered input): broadcast
   the candidate set, count ONLY candidate rows exactly, keep items with
   ``count >= min_share * N``. False positives from pass 1 die here, so
   the result is EXACT — same answer as the full groupBy, at a fraction
   of its shuffle (only candidate-item rows shuffle, and the per-item
   partial counts are map-side combined).

At 100 TB this is the difference between shuffling every distinct URL
and shuffling a few thousand candidates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    df: DataFrame,
    item_col: str,
    min_share: float = 0.001,
) -> DataFrame:
    """Items of ``item_col`` with frequency >= ``min_share`` of non-null
    rows, exactly: ``(item, cnt, share)``, share emitted as a raw double
    (no rounding — since 0.8.0; see README changelog). NULL items are
    ignored (they are absent values, not an item)."""
    if not 0.0 < min_share < 1.0:
        raise ValueError(f"min_share must be in (0,1), got {min_share}")
    capacity = int(math.ceil(1.0 / min_share))
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )

    def _mg_candidates(batches):
        import pandas as _pd

        summary = _pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["item"].value_counts()
            # vectorized summary-merge fold: union-index add, then the
            # Misra-Gries decrement (subtract the (cap+1)-th largest,
            # drop non-positives -> <= capacity survive)
            summary = (
                summary.add(vc, fill_value=0).astype("int64")
                if len(summary)
                else vc.astype("int64")
            )
            if len(summary) > capacity:
                kth = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary - kth
                summary = summary[summary > 0]
        if len(summary):
            yield _pd.DataFrame({"item": summary.index})

    candidates = items.mapInPandas(_mg_candidates, "item string").distinct()

    total = items.agg(F.count(F.lit(1)).alias("__N"))
    confirmed = (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        confirmed.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double")
            >= F.lit(float(min_share)) * F.col("__N").cast("double")
        )
        .select(
            "item",
            "cnt",
            # raw ratio, not round(…, 6): the same-integer division is
            # IEEE-exact in every engine, while round() can tie at binary-
            # exact midpoints (odd/2^7) where Spark HALF_UP and DuckDB
            # half-even diverge (util.maybe_round rationale).
            (F.col("cnt").cast("double") / F.col("__N").cast("double")).alias(
                "share"
            ),
        )
    )
