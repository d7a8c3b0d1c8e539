"""Edit-distance similarity join (PassJoin-style segment filtering).

Finds all pairs with Levenshtein distance <= k — the string-similarity
tier for near-identical identifiers (titles, product names, URLs) where
token-set Jaccard (``operators/jaccard.py``) is too coarse: transposed
or substituted CHARACTERS barely move an n-gram set but matter for
entity resolution.

Candidate generation is the pigeonhole partition of PassJoin (Li,
Deng, Feng: "PASS-JOIN: A Partition-based Method for Similarity Joins",
VLDB'12): split every string into ``k + 1`` contiguous segments — two
strings within edit distance k MUST share at least one segment verbatim
(k edits can touch at most k segments), with the matching occurrence in
the other string shifted by at most k positions. So:

- index side A: each string's k+1 canonical segments, keyed
  (segment_id, segment_text);
- probe side B: for each segment slot, the substrings of the same
  length extracted at the canonical position shifted by -k..+k;
- equi-join the keys (plus a length filter ``|len(a) - len(b)| <= k``),
  distinct the candidate pairs, verify with the exact ``levenshtein``.

Fan-out is (k+1) rows per string on the index side and (k+1)(2k+1) on
the probe side — constants in k, independent of corpus size; the join
itself is a hash equi-join on short substrings. This beats the q-gram
count filter on corpora with long shared prefixes/suffixes (exactly the
structured-identifier case), where q-gram sets are nearly identical for
ALL pairs and prune nothing.

Verification stays JVM-side: ``F.levenshtein`` (with its threshold
argument, which lets Spark bail out of the DP early).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with Levenshtein(text_a, text_b) <= k.

    Returns ``id_a, id_b, distance``. Null texts join nothing; empty
    strings participate (lev("", s) = len(s), so they pair with strings
    of length <= k via the short-string fallback).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    nseg = k + 1

    src = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).cast("string").alias("__s"),
    ).filter(F.col("__s").isNotNull())
    src = src.withColumn("__len", F.length("__s"))

    # canonical even partition: segment i of a length-L string starts at
    # floor(i*L/nseg) and ends before floor((i+1)*L/nseg) (1-based substr)
    seg_id = F.explode(F.sequence(F.lit(0), F.lit(nseg - 1))).alias("__seg")
    with_seg = src.select("__id", "__s", "__len", seg_id)
    start = F.floor(F.col("__seg") * F.col("__len") / nseg).cast("int")
    seg_len = (
        F.floor((F.col("__seg") + 1) * F.col("__len") / nseg).cast("int") - start
    )
    index_a = with_seg.select(
        F.col("__id").alias("__ida"),
        F.col("__s").alias("__sa"),
        F.col("__len").alias("__la"),
        "__seg",
        F.substring(F.col("__s"), start + 1, seg_len).alias("__segtext"),
    ).filter(F.length("__segtext") > 0)

    # probe side: the untouched segment of A appears in B at A's
    # canonical position shifted by at most k — but A's segment geometry
    # depends on A's LENGTH, which differs from B's by up to k. So probe
    # with every plausible partner length la in [lb - k, lb + k]: extract
    # from B the substring of A's segment length at A's canonical start
    # +- k, and join it back against index rows of exactly that length.
    la = F.explode(
        F.sequence(
            F.greatest(F.col("__len") - k, F.lit(0)), F.col("__len") + k
        )
    ).alias("__la_t")
    shift = F.explode(F.sequence(F.lit(-k), F.lit(k))).alias("__shift")
    start_a = F.floor(F.col("__seg") * F.col("__la_t") / nseg).cast("int")
    seglen_a = (
        F.floor((F.col("__seg") + 1) * F.col("__la_t") / nseg).cast("int")
        - start_a
    )
    probes = (
        with_seg.select(
            F.col("__id").alias("__idb"),
            F.col("__s").alias("__sb"),
            F.col("__len").alias("__lb"),
            "__seg",
            la,
        )
        .select(
            "__idb", "__sb", "__lb", "__seg", "__la_t",
            start_a.alias("__start"), seglen_a.alias("__seglen"), shift,
        )
        # in-bounds shifts only: Spark's substring treats a negative pos
        # as counting from the END — an unguarded shift would fabricate
        # segments from the wrong end of the string
        .filter(
            (F.col("__start") + F.col("__shift") >= 0)
            & (
                F.col("__start") + F.col("__shift") + F.col("__seglen")
                <= F.col("__lb")
            )
        )
        .select(
            "__idb",
            "__sb",
            # probe-side key columns get their OWN names: both sides
            # descend from with_seg, and same-named keys make Spark log a
            # spurious "trivially true equals predicate __seg == __seg"
            # warning even though the analyzed plan resolves them to
            # distinct attributes
            F.col("__seg").alias("__segb"),
            "__la_t",
            F.substring(
                F.col("__sb"),
                F.col("__start") + F.col("__shift") + 1,
                F.col("__seglen"),
            ).alias("__segtextb"),
        )
        .filter(F.length("__segtextb") > 0)
    )

    # no distinct here: the union with the short-string fallback below
    # is followed by one distinct over the combined candidate set, and
    # distinct(A) ∪ B -> distinct ≡ distinct(A ∪ B) — the inner pass
    # cost a full extra Exchange + pre/post aggregates of the candidate
    # pairs for nothing (r13, guide §2.4; map-side partial aggregation
    # of the single distinct still collapses duplicate hits before the
    # one shuffle)
    cand = index_a.join(
        probes,
        (F.col("__seg") == F.col("__segb"))
        & (F.col("__segtext") == F.col("__segtextb"))
        & (F.col("__la") == F.col("__la_t"))
        & (F.col("__ida") < F.col("__idb")),
    ).select("__ida", "__idb", "__sa", "__sb")

    # short-string fallback: a string of length <= k has empty canonical
    # segments, and the pigeonhole's "untouched segment" may be exactly
    # an empty one — the index (which drops empty segments) would miss
    # its pairs. Strings that short pair only with strings of length
    # <= 2k, so both sides of the fallback are tiny, broadcastable
    # slices; the main index join stays the scale path.
    su = src.filter(F.col("__len") <= 2 * k).select(
        F.col("__id").alias("__ida"),
        F.col("__s").alias("__sa"),
        F.col("__len").alias("__la"),
    )
    sv = src.filter(F.col("__len") <= 2 * k).select(
        F.col("__id").alias("__idb"),
        F.col("__s").alias("__sb"),
        F.col("__len").alias("__lb"),
    )
    cand_short = (
        su.join(
            sv,
            (F.col("__ida") < F.col("__idb"))
            & ((F.col("__la") <= k) | (F.col("__lb") <= k))
            & (F.abs(F.col("__la") - F.col("__lb")) <= k),
        )
        .select("__ida", "__idb", "__sa", "__sb")
    )
    cand = cand.unionByName(cand_short).distinct()

    return (
        cand.withColumn(
            "distance", F.levenshtein(F.col("__sa"), F.col("__sb"), k)
        )
        .filter(F.col("distance") >= 0)  # threshold form returns -1 past k
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            "distance",
        )
    )
