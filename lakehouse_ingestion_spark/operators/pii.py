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


# ---------------------------------------------------------------------------
# Free-text PII scrubbing (training-data curation)
# ---------------------------------------------------------------------------
#
# The column-level masking above handles STRUCTURED PII (a flagged
# `customer_id` field). Training-data pipelines also need UNSTRUCTURED
# scrubbing: emails, phone numbers, IPv4 addresses, SSN-/card-shaped
# digit runs embedded inside free text. This is the DataFrame-level
# operator over the Column primitives in ``functions/text.py``
# (``redact_pii`` / ``regexp_count``): one fused map-only projection,
# no shuffle, no Python — and each regex is deliberately written in the
# common Java-regex / RE2 subset (no lookahead/lookbehind/backrefs) so
# the DuckDB oracle runs the IDENTICAL pattern.
#
# Richer default list than ``functions.text.PII_RULES`` (which ends in
# a ``\d{7,}`` catch-all that would clobber the typed matches here).
# Order matters and is fixed: credit-card before phone (a 16-digit card
# with dashes would otherwise half-match the phone pattern), email
# before anything that could eat its digits.

PII_TEXT_PATTERNS: list[tuple[str, str, str]] = [
    # (name, java/re2-compatible regex, replacement token)
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
        "<CARD>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[ .-]\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
]


def scrub_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: list[tuple[str, str, str]] | None = None,
    count_cols: bool = True,
) -> DataFrame:
    """Scrub unstructured PII from ``text_col``.

    Adds ``out_col`` (default: replaces ``text_col``) with every pattern
    occurrence replaced by its token, plus — when ``count_cols`` —
    one ``pii_<name>_n`` LONG column per pattern counting the matches
    BEFORE scrubbing (audit trail: curation reports "how much PII did we
    remove" per source without a second pass).

    One fused projection: the counts and the rewrite share the scan;
    Catalyst keeps the whole chain inside one WholeStageCodegen stage.
    At 100 TB this is the ideal shape — embarrassingly parallel, zero
    shuffle, and the regex work rides the JVM (no Python workers).
    """
    from ..functions.text import redact_pii

    pats = PII_TEXT_PATTERNS if patterns is None else patterns
    if not pats:
        raise ConfigError("scrub_text needs at least one pattern")
    names = [n for n, _, _ in pats]
    if len(set(names)) != len(names):
        raise ConfigError(f"duplicate pattern names: {names}")
    dst = out_col or text_col
    t = F.col(text_col)
    out = df
    if count_cols:
        for name, rx, _tok in pats:
            out = out.withColumn(
                f"pii_{name}_n",
                F.coalesce(F.regexp_count(t, F.lit(rx)), F.lit(0)).cast("long"),
            )
    return out.withColumn(dst, redact_pii(t, pats))
