"""PII handling driven by schema-registry field metadata.

Reference schemas flag fields with ``pii: true``
(``schemas/payments/transactions/v1.json`` — customer_id) and
``schema_registry.field_metadata`` documents the convention; this
operator is the enforcement half: select the flagged columns from the
registry schema and mask them before the frame leaves a governed zone.

All strategies are built-in JVM expressions (no UDFs):

- ``hash``   — ``sha2(salt || value, 256)``: deterministic
  pseudonymization; equal inputs still join/group equal, which is what
  Silver-layer analytics want.
- ``redact`` — constant ``***REDACTED***`` literal.
- ``null``   — nulls the value out entirely (the GDPR-erasure shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lakehouse_ingestion_spark.errors import ConfigError

REDACTED = "***REDACTED***"
_STRATEGIES = ("hash", "redact", "null")


def pii_columns(schema: StructType) -> list[str]:
    """Column names whose field metadata marks ``pii: true``."""
    return [f.name for f in schema.fields if (f.metadata or {}).get("pii")]


def mask_pii(
    df: DataFrame,
    schema: StructType,
    strategy: str = "hash",
    salt: str = "",
    columns: list[str] | None = None,
) -> DataFrame:
    """Mask PII-flagged columns (per ``schema`` metadata, or an explicit
    ``columns`` override) in ``df``. Flagged columns absent from the
    frame are ignored — masking runs post-projection in pipelines.

    ``hash`` keeps the column's name but yields a 64-hex-char string
    (type change is intentional: the raw value must not survive);
    ``null`` preserves the original type.
    """
    if strategy not in _STRATEGIES:
        raise ConfigError(
            f"unknown pii strategy {strategy!r}; expected one of {_STRATEGIES}"
        )
    # `columns is None` means "use the schema flags"; an explicit [] means
    # "mask nothing" and must not fall through to the schema list
    wanted = pii_columns(schema) if columns is None else columns
    targets = [c for c in wanted if c in df.columns]
    out = df
    for c in targets:
        if strategy == "hash":
            masked = F.when(
                F.col(c).isNull(), F.lit(None).cast("string")
            ).otherwise(F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256))
        elif strategy == "redact":
            masked = F.when(
                F.col(c).isNull(), F.lit(None).cast("string")
            ).otherwise(F.lit(REDACTED))
        else:
            masked = F.lit(None).cast(df.schema[c].dataType)
        out = out.withColumn(c, masked)
    return out
