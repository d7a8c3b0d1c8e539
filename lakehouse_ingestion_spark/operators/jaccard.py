"""Exact n-gram Jaccard similarity join with prefix filtering.

The exact counterpart to the MinHash-LSH near-dup path
(``functions/similarity``): finds ALL pairs with Jaccard(A, B) >=
threshold over distinct word/char n-gram sets — no banding false
negatives — while still avoiding the O(n^2) all-pairs comparison via the
prefix-filter principle of the set-similarity-join literature (SSJoin /
PPJoin, Chaudhuri et al. ICDE'06, Xiao et al. WWW'08):

    Order every document's n-gram set by one global total order. If
    J(A, B) >= t, then the first ``|A| - ceil(t * |A|) + 1`` elements of
    A and the first ``|B| - ceil(t * |B|) + 1`` elements of B must share
    at least one element. So an inverted index over PREFIXES alone
    generates a complete candidate set.

Pipeline (all DataFrame ops, JVM-side):

1. per doc: distinct sorted shingle array ``g`` + size (map-only);
2. prefix extraction under the chosen order (map-only for ``order=
   "hash"``; one extra aggregation pass for ``order="frequency"``);
3. inverted-index self-join on prefix n-grams with the size-ratio
   filter ``max(|A|, |B|) * t <= min(|A|, |B|)`` as a join residual;
4. candidate-pair distinct, then exact verification via
   ``array_intersect`` on the full sets.

Scale posture: the only data-sized shuffles are the prefix explode
(keyed by n-gram — the classic inverted index) and the two id-keyed
verification joins. ``order="hash"`` derives the prefix order from
md5(n-gram) — zero extra passes, uniform pruning. ``order="frequency"``
ranks rare n-grams first (the textbook choice, prunes hardest on skewed
vocabularies) at the cost of one global n-gram count and a rebuild of
each doc's ordered set. Stop-word-like n-grams shared by a large
fraction of the corpus make the index bucket for that n-gram quadratic —
exactly the skew AQE's skew-join split handles; for adversarial corpora
prefer "frequency" which pushes such n-grams OUT of prefixes.

The reference has no similarity operators (SURVEY.md §2C "Joins: ...
No theta/range/as-of/interval join anywhere"); this extends the declared
dedup capability (docs/00-architecture-overview.md:226) to fuzzy
matching with exact guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import md5_hash60, shingles


def jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    mode: str = "word",
    threshold: float = 0.3,
    order: str = "hash",
    round_to: int | None = 6,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with n-gram Jaccard >= threshold.

    Returns columns ``id_a, id_b, jaccard`` (exact, not approximate).
    ``order`` picks the prefix-filter total order: "hash" (map-only,
    default) or "frequency" (rare-first, strongest pruning).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if order not in ("hash", "frequency"):
        raise ValueError(f"unknown prefix order: {order!r}")

    src = df.select(
        F.col(id_col).alias("__id"),
        F.array_sort(shingles(F.col(text_col), n=n, mode=mode)).alias("__g"),
    ).withColumn("__sz", F.size("__g"))
    # empty sets pair with nothing (J(∅, X) = 0 < threshold always)
    src = src.filter(F.col("__sz") > 0)

    # prefix length: |A| - ceil(t * |A|) + 1  (Jaccard prefix bound)
    plen = (F.col("__sz") - F.ceil(F.col("__sz") * F.lit(float(threshold))) + 1).cast(
        "int"
    )

    if order == "hash":
        # order by md5-hash: a fixed pseudo-random total order computed
        # map-side — sort the hashes, slice the prefix, map back through
        # a hash->ngram map (collisions within one doc's small set are
        # vanishingly rare and only ever ADD a candidate, never drop one)
        ordered = src.withColumn(
            "__prefix",
            F.slice(
                F.array_sort(
                    F.transform(
                        "__g", lambda s: F.struct(md5_hash60(s).alias("h"), s.alias("s"))
                    )
                ),
                F.lit(1),
                plen,
            ),
        ).select(
            "__id",
            "__sz",
            "__g",
            F.transform("__prefix", lambda st: st["s"]).alias("__prefix"),
        )
        prefixes = ordered.select(
            "__id", "__sz", F.explode("__prefix").alias("__ng")
        )
    else:
        exploded = src.select("__id", "__sz", F.explode("__g").alias("__ng"))
        freq = exploded.groupBy("__ng").agg(F.count(F.lit(1)).alias("__df"))
        # rebuild each doc's set ordered rare-first, slice the prefix
        prefixes = (
            exploded.join(freq, "__ng")
            .groupBy("__id", "__sz")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__df"), F.col("__ng")))
                ).alias("__ord")
            )
            .select(
                "__id",
                "__sz",
                F.explode(
                    F.slice(
                        F.transform("__ord", lambda st: st["__ng"]),
                        F.lit(1),
                        plen,
                    )
                ).alias("__ng"),
            )
        )

    a = prefixes.select(
        F.col("__id").alias("__ida"), F.col("__sz").alias("__sza"), "__ng"
    )
    b = prefixes.select(
        F.col("__id").alias("__idb"), F.col("__sz").alias("__szb"), "__ng"
    )
    t = F.lit(float(threshold))
    cand = (
        a.join(
            b,
            (a["__ng"] == b["__ng"])
            & (F.col("__ida") < F.col("__idb"))
            # size-ratio filter: J >= t  =>  max(sa, sb) * t <= min(sa, sb)
            & (
                F.greatest("__sza", "__szb") * t
                <= F.least("__sza", "__szb")
            ),
        )
        .select("__ida", "__idb")
        .distinct()
    )

    ga = src.select(F.col("__id").alias("__ida"), F.col("__g").alias("__ga"))
    gb = src.select(F.col("__id").alias("__idb"), F.col("__g").alias("__gb"))
    inter = F.size(F.array_intersect("__ga", "__gb"))
    union = F.size("__ga") + F.size("__gb") - inter
    jac = inter.cast("double") / union
    if round_to is not None:
        jac = F.round(jac, round_to)
    return (
        cand.join(ga, "__ida")
        .join(gb, "__idb")
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )
