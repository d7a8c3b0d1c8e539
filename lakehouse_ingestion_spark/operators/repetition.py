"""Within-document repetition signals (Gopher-style), map-only.

Gopher's quality rules (Rae et al. 2021, §A1.1) flag documents whose
content is dominated by repeated lines / n-grams. This operator computes
the per-document repetition profile with ZERO shuffles: every signal is
a pure Column expression folding over the document's own token array, so
the whole thing is one projection inside the scan stage — the right
shape for a 100 TB curation pass (contrast a groupBy(doc, token)
formulation, which shuffles the full exploded token stream).

Signals (token-based — the synthetic corpus has no line structure; on
line-structured text pass a line splitter as ``tokenize``):

- ``n_tokens``: total tokens;
- ``distinct_ratio``: distinct / total (low = boilerplate);
- ``top_token_frac``: occurrences of the most frequent token / total;
- ``top_bigram_frac``: same over adjacent-token bigrams (Gopher's
  "fraction of characters in most common n-gram" analog);
- ``dup_bigram_frac``: fraction of bigram occurrences beyond their
  first occurrence (Gopher's "duplicate line fraction" analog).

The most-frequent count comes from a single ``aggregate`` fold over the
SORTED array (equal tokens are adjacent, so the longest run IS the top
frequency) carrying a (prev, run, best) struct accumulator — no map, no
explode, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import maybe_round

from ..functions.text import tokens


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array = the
    multiplicity of the most frequent element. Single fold, JVM-side."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        # NULL prev (first element) compares NULL -> otherwise() -> run 1
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, zero, step, lambda acc: acc["best"])


def _bigrams(toks: Column) -> Column:
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str,
    *,
    round_to: int | None = None,
) -> DataFrame:
    """Append the repetition profile columns to ``df`` (map-only)."""
    toks = tokens(F.lower(F.col(text_col)))
    big = _bigrams(toks)

    tok_sorted = F.array_sort(toks)
    big_sorted = F.array_sort(big)

    n_tok = F.size(toks)
    n_big = F.size(big)
    # raw ratios by default: same-integer division is IEEE-exact across
    # engines; round() can tie at binary midpoints (util.maybe_round).
    safe = lambda num, den: F.when(den > 0, maybe_round(num / den, round_to)).otherwise(  # noqa: E731
        F.lit(0.0)
    )

    return (
        df.withColumn("__toks", tok_sorted)
        .withColumn("__bigs", big_sorted)
        .select(
            "*",
            n_tok.cast("long").alias("n_tokens"),
            safe(F.size(F.array_distinct("__toks")).cast("double"), n_tok).alias(
                "distinct_ratio"
            ),
            safe(_max_run(F.col("__toks")).cast("double"), n_tok).alias(
                "top_token_frac"
            ),
            safe(_max_run(F.col("__bigs")).cast("double"), n_big).alias(
                "top_bigram_frac"
            ),
            safe(
                (n_big - F.size(F.array_distinct("__bigs"))).cast("double"), n_big
            ).alias("dup_bigram_frac"),
        )
        .drop("__toks", "__bigs")
    )
