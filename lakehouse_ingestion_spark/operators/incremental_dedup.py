"""Incremental MinHash-LSH near-dup against a persisted index.

``q_near_dup`` (the batch formulation) rescans and re-signs the WHOLE
corpus every run — correct for a one-shot job, wrong for a corpus that
grows by continuous ingest: at 100 TB you cannot afford to re-shingle
petabytes to admit a 10 GB batch. The standard production shape (same
posture as ``operators/incremental.py``'s partial-aggregate lifting) is
an **index you maintain**:

- ``minhash_index`` distills a corpus (or a batch) into two frames:
  ``bands`` (doc, band, key — the LSH postings) and ``hashes`` (doc,
  distinct 60-bit shingle hashes — the verification sets). Both are
  write-once parquet/Delta appends, sized ~O(corpus docs), and both
  join on narrow keys.
- ``incremental_near_dup`` dedups a NEW batch in one pass: candidates =
  (batch bands ⋈ index bands) ∪ (batch self-join), verified by exact
  Jaccard over the hash sets, emitting ``(doc_a, doc_b, jaccard)``
  where ``doc_b`` is always the new document (historical partner first,
  both-new pairs canonicalized ``min, max``). Appending the batch's own
  index frames to the store completes the increment.

Per-batch cost scales with the BATCH (its shingling, its band joins),
never with the corpus: the index side of the candidate join is an
equi-join on (band, key) — bucket the stored postings by key at write
time (``sinks/parquet`` bucketing / Z-order in ``maintenance.py``) and
the shuffle touches only matching buckets. Nothing rescans history;
the verification join fetches only the candidates' hash sets.

Matches the batch operator exactly: running increments over any split
of a corpus yields the same verified pair set as ``q_near_dup`` on the
union, restricted to pairs involving the new docs (property-tested).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import maybe_round

from ..functions.similarity import (
    minhash_bands,
    minhash_from_hashes,
    ngram_jaccard,
    shingle_hashes,
    shingles,
)
from ..metrics import MetricValue

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class MinHashIndexFrames:
    """The two persisted faces of the LSH index (see module docstring)."""

    bands: DataFrame  # id, band, key
    hashes: DataFrame  # id, hs: array<long>


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
    num_bands: int = 8,
    seed: int = 42,
) -> MinHashIndexFrames:
    """Build the index frames for a corpus or batch. ``num_hashes`` must
    split evenly into ``num_bands`` (rows_per_band = the quotient)."""
    if num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide into num_bands"
            f" ({num_bands})"
        )
    rows = num_hashes // num_bands
    sh = df.select(
        F.col(id_col),
        shingles(F.col(text_col), shingle_n, "word").alias("__sh"),
    )
    hashes = sh.select(
        id_col, F.array_distinct(shingle_hashes(F.col("__sh"))).alias("hs")
    ).where(
        # docs shorter than the shingle width have an EMPTY hash set —
        # their MinHash signature is the all-sentinel vector, so every
        # short doc would share every band key with every other short
        # doc: O(short²) candidate rows that verification then discards
        # at jaccard 0. Excluding them is semantics-preserving (an empty
        # set can never reach a positive threshold) and kills the
        # quadratic blowup.
        F.size(F.col("hs")) > 0
    )
    sig = hashes.select(
        id_col, minhash_from_hashes(F.col("hs"), num_hashes, seed).alias("__sig")
    )
    bands = sig.select(
        id_col,
        F.explode(minhash_bands(F.col("__sig"), num_bands, rows)).alias("__b"),
    ).select(
        id_col,
        F.col("__b.band").alias("band"),
        F.col("__b.key").alias("key"),
    )
    return MinHashIndexFrames(bands=bands, hashes=hashes)


def hot_posting_keys(bands: DataFrame, posting_cap: int) -> DataFrame:
    """(band, key, n_postings) for LSH buckets whose posting list
    exceeds ``posting_cap``. Partial-aggregated count — a viral key
    combines map-side before it shuffles — and the result is bounded
    by |postings| / cap rows, so it is broadcast-sized by construction.
    """
    if posting_cap < 1:
        raise ValueError(f"posting_cap must be >= 1, got {posting_cap}")
    return (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n_postings"))
        .where(F.col("n_postings") > posting_cap)
    )


def incremental_near_dup(
    batch: DataFrame,
    index: MinHashIndexFrames | None,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
    num_bands: int = 8,
    seed: int = 42,
    round_to: int | None = None,
    posting_cap: int | None = None,
    hot_keys: DataFrame | None = None,
    on_cap_metric=None,
    precomputed_delta: MinHashIndexFrames | None = None,
) -> tuple[DataFrame, MinHashIndexFrames]:
    """Verified near-dup pairs for a new batch, plus the batch's index
    delta (append it to the store to complete the increment).

    ``index=None`` bootstraps: the batch dedups only against itself.
    Batch ids must be disjoint from index ids (ingest's append
    contract); hash-verification joins would silently mispair otherwise.

    **Candidate-volume guardrail** (same rationale as the short-doc
    exclusion above: an over-shared band key is boilerplate-driven and
    carries no near-dup specificity, only O(hot²) candidate rows):
    ``posting_cap`` drops every (band, key) bucket whose COMBINED
    index+batch posting count exceeds the cap from candidate
    generation — pairs from the other r-1 bands still surface any
    genuine near-dup, so non-hot buckets are unaffected. Deriving the
    cap set scans the stored postings' two narrow columns once
    (columnar, partial-aggregated — never re-shingles history);
    callers that maintain a persisted (band, key) count frame can pass
    it pre-filtered as ``hot_keys`` to skip even that. Dropped-key /
    dropped-posting totals are emitted as ``MetricValue``s through
    ``on_cap_metric`` (default: module logger) — the hot frame is
    broadcast-sized by construction, so it is collected ONCE: the
    metrics derive from the collected rows and the anti-join side is a
    local frame rebuilt from them (never a second postings scan).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # callers that already signed the batch (e.g. to maintain a posting-
    # count state BEFORE candidate generation — streaming/curation) pass
    # their frames back in; signing is the expensive map stage
    delta = precomputed_delta or minhash_index(
        batch, text_col, id_col, shingle_n, num_hashes, num_bands, seed
    )
    bb = delta.bands
    index_bands = index.bands if index is not None else None
    if posting_cap is not None or hot_keys is not None:
        if hot_keys is None:
            # the hot-key census consumes the batch's bands ONCE and the
            # candidate joins consume them again — without pinning, the
            # batch re-signs (shingle+minhash, the expensive map stage)
            # for each consumer. localCheckpoint is per-call (bench's
            # release contract: no sharing across calls) and bounded by
            # the BATCH's band count, never the corpus. Measured at the
            # sf10 skew probe: capped-run wall 229 -> 153 s.
            bb = bb.localCheckpoint(eager=True)
            all_bands = (
                index_bands.select("band", "key").unionByName(
                    bb.select("band", "key")
                )
                if index_bands is not None
                else bb.select("band", "key")
            )
            hot_keys = hot_posting_keys(all_bands, posting_cap)
        emit = on_cap_metric or (lambda m: log.info("lsh-cap %s", m))
        # ONE evaluation of the hot-keys plan: collect the (broadcast-
        # sized by construction) frame, derive the cap metrics from the
        # collected rows, and rebuild the anti-join side as a local
        # frame — previously the metric agg re-ran the full postings
        # scan+groupBy separately from the anti-joins, doubling the
        # postings scan per batch under continuous ingest.
        key_schema = hot_keys.select("band", "key").schema
        has_counts = "n_postings" in hot_keys.columns
        hot_rows = hot_keys.collect()
        emit(MetricValue("incr_near_dup_capped_keys", float(len(hot_rows))))
        emit(
            MetricValue(
                "incr_near_dup_capped_postings",
                float(
                    sum(r["n_postings"] or 0 for r in hot_rows)
                    if has_counts
                    else 0
                ),
            )
        )
        if hot_rows:
            spark = batch.sparkSession
            hot = F.broadcast(
                spark.createDataFrame(
                    [(r["band"], r["key"]) for r in hot_rows], key_schema
                )
            )
            bb = bb.join(hot, ["band", "key"], "left_anti")
            if index_bands is not None:
                index_bands = index_bands.join(
                    hot, ["band", "key"], "left_anti"
                )
    self_pairs = (
        bb.alias("a")
        .join(bb.alias("b"), ["band", "key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
    )
    if index is not None:
        cross = (
            index_bands.alias("i")
            .join(bb.alias("n"), ["band", "key"])
            .select(
                F.col(f"i.{id_col}").alias("doc_a"),
                F.col(f"n.{id_col}").alias("doc_b"),
            )
        )
        cand = cross.unionByName(self_pairs).distinct()
        all_hashes = index.hashes.unionByName(delta.hashes)
    else:
        cand = self_pairs.distinct()
        all_hashes = delta.hashes
    hs_a = all_hashes.select(
        F.col(id_col).alias("doc_a"), F.col("hs").alias("__hs_a")
    )
    hs_b = delta.hashes.select(
        F.col(id_col).alias("doc_b"), F.col("hs").alias("__hs_b")
    )
    verified = (
        cand.join(hs_a, "doc_a")
        .join(hs_b, "doc_b")
        .withColumn(
            "jaccard",
            maybe_round(ngram_jaccard(F.col("__hs_a"), F.col("__hs_b")), round_to),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified, delta
