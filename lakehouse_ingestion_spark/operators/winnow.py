"""Winnowing document fingerprints (MOSS): local, position-robust
near-dup detection.

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting" (SIGMOD 2003) — the algorithm behind MOSS.
Complements the existing near-dup family with a GUARANTEE the
probabilistic members lack: MinHash (``functions/similarity.py``)
bounds the *expected* Jaccard error and SimHash bounds Hamming
distance in distribution, but winnowing is deterministic — **any
shared substring of at least w + k - 1 characters is certain to
contribute at least one shared fingerprint** (the winnowing theorem;
property-tested in tests/test_winnow.py). That makes it the right
screen for copied passages / boilerplate / licence blocks, where the
overlap is a contiguous span rather than a bag-of-shingles overlap.

Algorithm per document (k = k-gram length, w = window size):

1. normalize (lower, collapse whitespace) — same canonicalization as
   every fingerprint in ``functions/text.py``;
2. hash all character k-grams (md5-based ``md5_hash60``: identical in
   Spark and DuckDB, so the oracle rebuilds the exact fingerprints);
3. slide a window of w consecutive k-gram hashes; record each
   window's MINIMUM hash; the distinct recorded hashes are the
   document's fingerprints. Selecting by hash VALUE (not position)
   keeps the guarantee and needs no tie-break: equal md5 hashes are
   equal k-grams.

Spark shape: steps 1-3 are ONE map-only projection of array
higher-order functions (``transform`` over ``sequence`` + ``array_min``
over ``slice``) — zero shuffles, no UDF, no window function; the only
exchange in the whole overlap pipeline is the fingerprint-keyed join.
Documents fingerprint independently, so the operator scales linearly
with corpus size and is trivially incremental (new docs fingerprint
alone, probe the existing posting table).

Hot fingerprints (boilerplate shared by thousands of docs) would blow
the pair join quadratically; ``winnow_overlap`` drops postings longer
than ``max_postings`` BEFORE pairing — the standard stop-fingerprint
cap, same posture as the banded-LSH posting cap in
``operators/incremental_dedup.py``, and expressible identically in the
SQL oracle (a HAVING on the posting count), so the cap itself is
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.functions.similarity import md5_hash60

_WS = r"\s+"


def kgram_hashes(text: Column, k: int = 8, normalize: bool = True) -> Column:
    """array<long> of md5-based hashes of every character k-gram of the
    normalized text (empty array below k chars).

    MATERIALIZE this as its own column in a separate ``select`` before
    window-min selection (``winnow_from_hashes``) — interpreted HOFs
    get no common-subexpression elimination, so an inlined hash array
    would be re-hashed once per window (O(n^2) per document); see the
    identical warning on ``functions/similarity.shingle_hashes``."""
    if k < 2:
        raise ConfigError(f"winnowing needs k >= 2, got k={k}")
    t = text
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    m = F.length(t) - F.lit(k - 1)  # number of k-grams
    hashes = F.transform(
        # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — clamp
        # to one element and blank the sub-k case with the outer when
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        lambda i: md5_hash60(t.substr(i, F.lit(k))),
    )
    return F.when(m <= 0, F.array().cast("array<long>")).otherwise(hashes)


def winnow_from_hashes(hashes: Column, w: int = 16) -> Column:
    """Distinct window-min fingerprints from a MATERIALIZED k-gram hash
    array. Documents with fewer than w k-grams contribute the single
    minimum of the partial window (short docs stay comparable instead
    of invisible); empty hash arrays yield an empty array."""
    if w < 1:
        raise ConfigError(f"winnowing needs w >= 1, got w={w}")
    m = F.size(hashes)
    n_windows = F.greatest(m - F.lit(w - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda s: F.array_min(F.slice(hashes, s, w)),
        )
    )
    empty = F.array().cast("array<long>")
    return F.when(m <= 0, empty).otherwise(fps)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """Posting rows ``(id, fp, n_grams)`` — one row per (document,
    distinct fingerprint). Map-only: two stacked projections (hash
    array materialized first — see ``kgram_hashes``) and an explode;
    zero shuffles. ``n_grams`` (the k-gram count) rides along for
    containment-style scoring: shared / min(n_a, n_b).

    The second projection references ``_hashes`` twice (the window
    transform AND the size) — that double reference is what keeps
    Catalyst's CollapseProject from inlining the non-cheap hash array
    back into the window lambda (single-referenced expressions are
    collapsed regardless of cost)."""
    hashed = df.select(
        F.col(id_col), kgram_hashes(F.col(text_col), k=k).alias("_hashes")
    )
    return hashed.select(
        F.col(id_col),
        F.explode(winnow_from_hashes(F.col("_hashes"), w=w)).alias("fp"),
        F.size("_hashes").alias("n_grams"),
    )


def winnow_overlap(
    postings: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_postings: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` fingerprints.

    Fingerprint-keyed equi-join (never all-pairs): group by fp, cap
    hot fingerprints at ``max_postings`` docs (stop-fingerprint rule —
    a fp shared by more docs than that is boilerplate, not signal),
    pair within the surviving postings, count shared fps per pair.
    Returns ``(a, b, shared)`` with a < b."""
    if min_shared < 1 or max_postings < 2:
        raise ConfigError(
            f"winnow_overlap needs min_shared >= 1 and max_postings >= 2, "
            f"got min_shared={min_shared} max_postings={max_postings}"
        )
    keep = (
        postings.groupBy("fp")
        .agg(F.count(F.col(id_col)).alias("_n"))
        .filter(F.col("_n") <= max_postings)
        .select("fp")
    )
    kept = postings.join(keep, "fp")
    a = kept.select("fp", F.col(id_col).alias("a"))
    b = kept.select("fp", F.col(id_col).alias("b"))
    pairs = a.join(b, "fp").filter(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("fp").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
