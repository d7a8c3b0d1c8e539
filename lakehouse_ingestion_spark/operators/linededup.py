"""Line-level boilerplate removal across the corpus (CCNet-style).

Web-scale training corpora carry massive LINE-level duplication that
document-level dedup never sees: cookie banners, nav bars, footer
legalese repeated across millions of pages. CCNet (Wenzek et al.,
LREC 2020) and the RefinedWeb/Dolma pipelines therefore dedup at
paragraph/line granularity: hash every line, count occurrences across
the WHOLE corpus, and strip lines whose count exceeds a threshold
before reassembling documents.

Spark-first shape (vs the reference, which has no text surface at all —
SURVEY.md §2 classes this with the declared Silver curation layer):

1. ``posexplode`` the per-document line array — map-only explode, the
   position column preserves reassembly order.
2. Aggregate line-hash counts: ONE shuffle on the 16-byte ``md5`` of
   the normalized line (never the line text itself — shuffle volume is
   16 B + count per distinct line, not the corpus).
3. Join counts back and filter — the count side is vastly smaller than
   the exploded side (distinct lines ≪ total lines on real corpora);
   AQE picks broadcast when it fits, shuffle-hash otherwise.
4. Reassemble with ``sort_array(collect_list(struct(pos, line)))`` —
   one shuffle keyed by doc, struct-sort restores document order
   deterministically.

100-TB posture: two shuffles total (count, reassemble), both keyed on
high-cardinality keys; nothing collects to the driver; skewed lines
(the empty line, "Home") are exactly the ones the filter drops, and the
count aggregation partial-aggregates them map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Explode documents into (id, pos, line, line_hash) rows.

    ``normalize`` lowercases + trims before hashing (CCNet hashes
    normalized lines so near-identical boilerplate collapses) — the
    ORIGINAL line text is what survives into the output.
    Blank lines are kept (pos must stay dense for reassembly) but
    hash to the empty-string bucket, which any sane threshold drops.
    """
    # NB: Spark split() treats the separator as a REGEX — fine for the
    # default "\n"; callers passing metacharacters must escape them
    lines = F.split(F.col(text_col), F.lit(line_sep), -1)
    ex = df.select(
        F.col(id_col),
        F.posexplode(lines).alias("pos", "line"),
    )
    norm = F.trim(F.lower(F.col("line"))) if normalize else F.col("line")
    return ex.withColumn("line_hash", F.md5(norm))


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 1,
    line_sep: str = "\n",
    normalize: bool = True,
    drop_blank: bool = True,
    stats_col: str | None = "n_lines_dropped",
) -> DataFrame:
    """Remove corpus-frequent lines from every document.

    A line is dropped when its normalized form occurs more than
    ``max_occurrences`` times ACROSS THE CORPUS (1 = keep only
    corpus-unique lines; CCNet-style boilerplate removal typically uses
    a small threshold). ``drop_blank`` also removes whitespace-only
    lines regardless of count. Documents whose every line is dropped
    survive with empty text (curation length-filters handle them —
    silently losing rows here would corrupt joins downstream).

    Returns the input frame with ``text_col`` rewritten (document order
    preserved) plus ``stats_col`` counting removed lines per document.
    """
    if max_occurrences < 1:
        raise ValueError(f"max_occurrences must be >= 1, got {max_occurrences}")
    ex = line_stats(df, text_col, id_col, line_sep, normalize)
    # join only the lines whose count DECIDES anything (r13, guide §3.1):
    # keep ⇔ count <= max_occurrences ⇔ hash ∉ {over-threshold lines},
    # so the join's build side shrinks from EVERY distinct line to just
    # the boilerplate set (the filter sits below the broadcast/exchange).
    # On real corpora that is orders of magnitude smaller — the
    # difference between broadcasting the corpus's distinct-line table
    # and broadcasting its boilerplate — and the left join keeps every
    # exploded row exactly like the old inner join on the full counts
    # table did (every line_hash existed there by construction).
    bad = (
        ex.groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("__n_occur"))
        .filter(F.col("__n_occur") > F.lit(max_occurrences))
        .select("line_hash", F.lit(True).alias("__bad"))
    )
    joined = ex.join(bad, "line_hash", "left")
    keep = F.col("__bad").isNull()
    if drop_blank:
        keep = keep & (F.length(F.trim(F.col("line"))) > 0)
    marked = joined.withColumn("__keep", keep)
    rebuilt = marked.groupBy(id_col).agg(
        F.array_join(
            # struct sort orders by the first field (pos) — deterministic
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("__keep"), F.struct(F.col("pos"), F.col("line"))
                        )
                    )
                ),
                lambda s: s.getField("line"),
            ),
            line_sep,
        ).alias("__new_text"),
        # blank-only lines are dropped by drop_blank but NOT counted —
        # the stat reports removed BOILERPLATE, and a blank line carries
        # no content (also keeps the stat independent of trailing-newline
        # formatting quirks)
        F.sum(
            F.when(
                ~F.col("__keep") & (F.length(F.trim(F.col("line"))) > 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("__n_dropped"),
    )
    out = df.join(rebuilt, id_col, "left").withColumn(
        text_col, F.coalesce(F.col("__new_text"), F.lit(""))
    )
    if stats_col:
        out = out.withColumn(
            stats_col, F.coalesce(F.col("__n_dropped"), F.lit(0).cast("long"))
        )
    return out.drop("__new_text", "__n_dropped")
