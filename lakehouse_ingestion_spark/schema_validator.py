"""Schema validation — metadata comparison of a DataFrame against an
expected ``StructType``.

Parity with reference ``schema/SchemaValidator.scala:45-140``: missing
columns are errors; per-column type mismatches are errors (lenient on
decimal precision/scale); nullable-vs-not-null drift and extra columns are
warnings. The optional nullability *data* scan (``:102-120``) is a single
fused aggregate pass here instead of one count per column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DecimalType, StructType

from lakehouse_ingestion_spark.errors import SchemaValidationError


@dataclass
class ValidationResult:
    is_valid: bool
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def _types_match(actual: DataType, expected: DataType) -> bool:
    if isinstance(actual, DecimalType) and isinstance(expected, DecimalType):
        return True  # lenient on precision/scale, like the reference
    return actual.simpleString() == expected.simpleString()


def validate(df: DataFrame, expected: StructType) -> ValidationResult:
    actual = {f.name: f for f in df.schema.fields}
    errors: list[str] = []
    warnings: list[str] = []

    for exp in expected.fields:
        act = actual.get(exp.name)
        if act is None:
            # a missing NULLABLE column is an additive-evolution artifact
            # (schema grew, old data hasn't) — warn, don't fail; missing
            # NOT NULL columns remain hard errors. Keeps the registry's
            # compatible-in-place evolution (schema_registry.evolve) from
            # breaking running jobs.
            if exp.nullable:
                warnings.append(
                    f"missing nullable column: {exp.name} ({exp.dataType.simpleString()})"
                )
            else:
                errors.append(
                    f"missing column: {exp.name} ({exp.dataType.simpleString()})"
                )
            continue
        if not _types_match(act.dataType, exp.dataType):
            errors.append(
                f"type mismatch for {exp.name}: actual={act.dataType.simpleString()} "
                f"expected={exp.dataType.simpleString()}"
            )
        if act.nullable and not exp.nullable:
            warnings.append(f"column {exp.name} is nullable but declared NOT NULL")

    expected_names = {f.name for f in expected.fields}
    for name in actual:
        if name not in expected_names:
            warnings.append(f"extra column not in schema: {name}")

    return ValidationResult(is_valid=not errors, errors=errors, warnings=warnings)


def validate_or_throw(df: DataFrame, expected: StructType, context: str = "") -> ValidationResult:
    res = validate(df, expected)
    if not res.is_valid:
        raise SchemaValidationError(f"schema validation failed {context}: {res.errors}")
    return res


def validate_nullability(df: DataFrame, expected: StructType) -> dict[str, int]:
    """Count actual nulls in declared-NOT-NULL columns. ONE aggregate pass
    over the data (the reference runs one ``count()`` per column)."""
    not_null_cols = [f.name for f in expected.fields if not f.nullable and f.name in df.columns]
    if not not_null_cols:
        return {}
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in not_null_cols
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c] or 0) for c in not_null_cols}


def conform(df: DataFrame, expected: StructType, drop_extra: bool = True) -> DataFrame:
    """Type normalization (reference declared op D13): cast every schema
    column to its declared type, preserving schema order; optionally drop
    extra columns. Pure projection — stays in whole-stage codegen."""
    cols = []
    missing = []
    for f in expected.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.nullable:
            # additive evolution: inject the new nullable column as null
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            missing.append(f.name)
    if missing:
        raise SchemaValidationError(f"cannot conform, missing NOT NULL columns: {missing}")
    if not drop_extra:
        extra = [F.col(c) for c in df.columns if c not in {f.name for f in expected.fields}]
        cols = cols + extra
    return df.select(*cols)
