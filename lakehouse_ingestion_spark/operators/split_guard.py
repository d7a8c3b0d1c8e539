"""Leakage-safe dataset splitting: near-duplicate clusters never
straddle a train/validation/test boundary.

Plain hash splitting (``operators/sampling.hash_split``) assigns each
document independently — two near-duplicate documents land in different
splits with probability 1 - Σfᵢ², silently leaking training content
into evaluation (the classic contamination mode; see Lee et al., ACL
2022 §6.2 on duplicated train/test examples inflating scores). The fix
is structural: split by the near-dup CLUSTER, not the document.

Pipeline shape (all building blocks already scale-adjudicated):

1. near-dup pairs from banded MinHash-LSH (``operators/dedup.py`` /
   ``incremental_dedup.py``) — candidates ≪ n², never all-pairs;
2. ``operators/graph.connected_components`` — O(log n) label rounds,
   per-round checkpoint release;
3. each document's split = deterministic hash of its cluster
   REPRESENTATIVE (min doc id; singletons represent themselves), using
   the same half-open-interval partition as ``hash_split`` — so a
   corpus re-run, or ingest growth that doesn't merge clusters, never
   reassigns an existing document, and merged clusters move as one.

The reference declares only Bronze ingestion (no split tooling);
this operator serves the training-data-pipeline surface the build
brief makes first-class (deduplication → curation → split).

100-TB posture: the ONLY corpus-sized operations are one broadcast-or-
sort-merge join of (id → rep) onto the corpus and the label rounds on
the (much smaller) pair set; the split assignment itself is a pure
projection (md5 hash + interval compare, whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.graph import connected_components
from lakehouse_ingestion_spark.operators.sampling import hash_split


def cluster_reps(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """(node, rep) for every node that appears in a near-dup pair; the
    rep is the component's minimum id (deterministic canonical)."""
    comp = connected_components(pairs, src=a_col, dst=b_col)
    return comp.select(
        F.col("node"), F.col("cluster_id").alias("rep")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    seed: str = "split",
    split_col: str = "split",
    rep_col: str = "rep",
) -> DataFrame:
    """``df`` plus ``rep_col`` (the cluster representative; own id for
    singletons) and ``split_col``, where every member of a near-dup
    cluster receives the SAME split.

    ``pairs`` is any (a_col, b_col) near-dup pair frame — LSH-verified
    jaccard pairs, semantic-dedup pairs, exact-hash groups exploded to
    pairs. Pair ids must come from ``df[id_col]``'s domain.
    """
    if id_col not in df.columns:
        raise ConfigError(f"id_col {id_col!r} not in frame columns")
    reps = cluster_reps(pairs, a_col, b_col)
    out = (
        df.join(reps, df[id_col] == reps["node"], "left")
        .drop("node")
        # singleton documents (no near-dup edge) represent themselves
        .withColumn(rep_col, F.coalesce(F.col(rep_col), F.col(id_col)))
    )
    return hash_split(out, rep_col, fractions, seed=seed, split_col=split_col)
