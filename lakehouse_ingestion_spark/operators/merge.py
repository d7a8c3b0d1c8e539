"""Upsert / merge (SURVEY.md D6).

Reference declares Silver \"Upsert/Merge\" (``docs/00-architecture-
overview.md:253``, ``docs/04-low-level-design.md:158-161``) with Delta
``MERGE`` as the intended mechanism. This engine implements merge
semantics as DataFrame algebra so it runs over ANY store (plain Parquet
included); when delta-spark is importable the same call routes to a real
``DeltaTable.merge`` (see sinks/delta.py) which gives file-level pruning
at scale.

``upsert(target, source, keys)`` semantics ==
``whenMatchedUpdateAll().whenNotMatchedInsertAll()``:
rows in source replace key-matching rows in target; unmatched source rows
insert; unmatched target rows survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    key_columns: list[str],
    delete_condition=None,
) -> DataFrame:
    """Post-merge image as a DataFrame.

    ``delete_condition``: optional Column over source rows; matching source
    rows DELETE the target key instead of upserting (CDC-style
    ``whenMatchedDelete``).

    Plan shape: one left-anti join (target minus source keys) + union.
    With a small source batch the anti-join broadcasts -> no shuffle of the
    big target. Dedup of the source on key is the caller's job
    (use dedup_latest_by_key for deterministic winners).
    """
    if delete_condition is not None:
        # three-valued logic: a NULL condition must mean "not a delete",
        # else the row matches neither filter(cond) nor filter(~cond)
        # and silently vanishes from the merge
        cond = F.coalesce(delete_condition.cast("boolean"), F.lit(False))
        deletes = source.filter(cond).select(*key_columns)
        source = source.filter(~cond)
        target = target.join(deletes, on=key_columns, how="left_anti")
    kept = target.join(source.select(*key_columns), on=key_columns, how="left_anti")
    return kept.unionByName(source.select(*target.columns))
