"""Quality-filter rule chains for training-data curation.

C4/Gopher-style document filters (length sanity, mean token length,
repetition, alphabetic ratio, stopword presence) expressed as a chain of
named rules evaluated in ONE fused projection — every rule is a pure
Column expression over the same tokenization, so a chain of N rules
costs one scan with zero shuffles and stays inside whole-stage codegen.
Extends the reference's DQ rule-set idea (conf/application.conf
`quality-checks`, SURVEY.md A12) from table-level checks to per-document
curation semantics: instead of failing the batch, each document carries
its failed-rule list so downstream can keep / quarantine / re-weight.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import LANG_MARKERS, token_count, tokens, word_match_count


@dataclass(frozen=True)
class QualityRule:
    """A named pass/fail predicate over the document text column.
    ``predicate`` maps the text Column to a boolean Column; True = pass.
    NULL predicate results count as failures (curation is allowlisting)."""

    name: str
    predicate: Callable[[Column], Column]


def default_quality_rules(
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    min_distinct_ratio: float = 0.3,
    min_alpha_ratio: float = 0.6,
    stopwords: list[str] | None = None,
) -> list[QualityRule]:
    """The standard curation chain (each mirrors a C4/Gopher heuristic):

    - ``length``: token count within [min_tokens, max_tokens]
    - ``mean_token_len``: mean token length within sane word bounds
    - ``repetition``: distinct-token ratio >= min_distinct_ratio
      (low ratio = boilerplate / keyword stuffing)
    - ``alpha_ratio``: alphabetic characters / all characters
    - ``stopword``: at least one marker stopword present
    """
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]

    def _length(t: Column) -> Column:
        n = token_count(t)
        return (n >= min_tokens) & (n <= max_tokens)

    def _mean_tok_len(t: Column) -> Column:
        n = token_count(t)
        mean = F.when(n > 0, F.length(t) / n).otherwise(F.lit(0.0))
        return (mean >= min_mean_token_len) & (mean <= max_mean_token_len)

    def _repetition(t: Column) -> Column:
        arr = tokens(F.lower(t))
        n = F.size(arr)
        ratio = F.when(n > 0, F.size(F.array_distinct(arr)) / n).otherwise(
            F.lit(0.0)
        )
        return ratio >= min_distinct_ratio

    def _alpha(t: Column) -> Column:
        n_chars = F.length(t)
        alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
        ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
        return ratio >= min_alpha_ratio

    def _stopword(t: Column) -> Column:
        return word_match_count(t, sw) > 0

    return [
        QualityRule("length", _length),
        QualityRule("mean_token_len", _mean_tok_len),
        QualityRule("repetition", _repetition),
        QualityRule("alpha_ratio", _alpha),
        QualityRule("stopword", _stopword),
    ]


def blocklist_rule(
    words: list[str],
    max_ratio: float = 0.0,
    name: str = "blocklist",
) -> QualityRule:
    """C4-style bad-words rule (C4 dropped any page containing a
    "List of Dirty, Naughty …" word; Gopher used thresholded ratios):
    the fraction of tokens appearing in ``words`` must be <=
    ``max_ratio`` (default 0.0 = zero tolerance, the C4 posture).

    Token-boundary matching via the same tokenization the rest of the
    chain shares — substring matching is deliberately NOT offered (the
    classic 'class'/'Scunthorpe' false-positive family). Documents
    with zero tokens pass (length rules own them). Case-insensitive;
    the word list becomes an ``InSet`` probe inside the fused
    projection, so a thousand-word list costs one hash lookup per
    token, still zero shuffles."""
    if not words:
        raise ValueError("blocklist_rule needs at least one word")
    if not 0.0 <= max_ratio < 1.0:
        raise ValueError(f"max_ratio must be in [0, 1), got {max_ratio}")

    def _pred(t: Column) -> Column:
        hits = word_match_count(t, words)
        if max_ratio == 0.0:
            return hits == 0
        n = token_count(t)
        return (n == 0) | (hits / n <= max_ratio)

    return QualityRule(name, _pred)


def apply_quality_rules(
    df: DataFrame,
    rules: list[QualityRule],
    text_col: str = "text",
    failed_col: str = "failed_rules",
    keep_col: str = "keep",
) -> DataFrame:
    """Evaluate the rule chain in one fused projection. Adds
    ``failed_col`` (array of failed rule names, chain order) and
    ``keep_col`` (True iff no rule failed). One scan, no shuffle."""
    if not rules:
        raise ValueError("apply_quality_rules needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    t = F.col(text_col)
    empty = F.array().cast("array<string>")
    parts = [
        # coalesce: a NULL predicate result is a failure, not a pass
        F.when(F.coalesce(r.predicate(t), F.lit(False)), empty).otherwise(
            F.array(F.lit(r.name))
        )
        for r in rules
    ]
    failed = F.concat(*parts) if len(parts) > 1 else parts[0]
    return df.withColumn(failed_col, failed).withColumn(
        keep_col, F.size(F.col(failed_col)) == 0
    )
