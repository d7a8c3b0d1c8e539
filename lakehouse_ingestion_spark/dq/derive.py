"""Derive DQ checks from schema-field metadata.

The reference's schema files carry per-field metadata conventions
(``schemas/README.md`` \"Metadata Conventions\"; e.g. payments ``amount``
has ``min_value=0.01, max_value=999999.99``, ``currency`` has
``allowed_values``). SURVEY.md §1.2 calls for auto-deriving checks:

- ``nullable=false``           -> NotNullCheck
- ``min_value`` / ``max_value`` -> RangeCheck
- ``allowed_values``           -> SetMembershipCheck
- ``pattern``                  -> RegexCheck
- ``unique=true`` (or a dataset-level ``primary_key``) -> UniqueKeyCheck
"""

from __future__ import annotations

from pyspark.sql.types import StructType

from lakehouse_ingestion_spark.dq.checks import (
    DQCheck,
    NotNullCheck,
    RangeCheck,
    RegexCheck,
    SetMembershipCheck,
    UniqueKeyCheck,
)


def checks_from_schema(
    schema: StructType,
    failure_threshold: float = 0.0,
    primary_key: list[str] | None = None,
) -> list[DQCheck]:
    checks: list[DQCheck] = []
    unique_cols: list[str] = []
    for f in schema.fields:
        meta = dict(f.metadata or {})
        if meta.get("system_column"):
            continue
        if not f.nullable:
            checks.append(NotNullCheck(column=f.name, failure_threshold=failure_threshold))
        if "min_value" in meta or "max_value" in meta:
            checks.append(
                RangeCheck(
                    column=f.name,
                    min_value=meta.get("min_value"),
                    max_value=meta.get("max_value"),
                    failure_threshold=failure_threshold,
                )
            )
        if "allowed_values" in meta:
            checks.append(
                SetMembershipCheck(
                    column=f.name,
                    allowed_values=list(meta["allowed_values"]),
                    failure_threshold=failure_threshold,
                )
            )
        if "pattern" in meta:
            checks.append(
                RegexCheck(column=f.name, pattern=meta["pattern"], failure_threshold=failure_threshold)
            )
        if meta.get("unique"):
            unique_cols.append(f.name)
    for c in unique_cols:
        checks.append(UniqueKeyCheck(key_columns=[c], failure_threshold=failure_threshold))
    if primary_key:
        checks.append(UniqueKeyCheck(key_columns=list(primary_key), failure_threshold=failure_threshold))
    return checks
