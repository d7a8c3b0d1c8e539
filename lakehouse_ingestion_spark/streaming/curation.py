"""Streaming leakage-safe dataset splitting: sticky train/val/test
assignment over a continuous document stream.

The batch story (``operators/split_guard``) made splits cluster-safe
and sticky; this module runs the same contract per micro-batch via
foreachBatch, maintaining THREE parquet-backed states:

* the MinHash-LSH pair index (``operators/incremental_dedup`` — bands
  + hash sets), so each batch finds near-dups against ALL history at
  batch-sized cost;
* the connected-components label table
  (``operators/graph.incremental_components`` — merges contract onto
  reps, CC rounds never see the corpus);
* the assignment table (``operators/split_guard.sticky_split`` — first
  assignment wins, merges audited, never silently moved).

Why foreachBatch and not a stateful operator: all three states are
corpus-sized and must be queryable offline (the batch pipeline reads
the same tables via ``labels_path``/``assignments_path`` — streaming
and batch curation share state by construction). The state store
keeps nothing.

Crash ordering (same stance as ``streaming/near_dup.py``: fail-safe,
never silently wrong). Within a batch: sink first, then assignment
append, label overwrite, index append LAST. Every prefix of that
order replays idempotently:

* crash before any state write — redelivery recomputes identically
  (states unchanged);
* after the assignment append — redelivered docs are kept verbatim
  (same values; the append-only table dedups on read);
* after the label overwrite — the redelivered batch's edges are all
  intra-cluster, so the label fold is a no-op;
* after the index append — the batch's ids are detected in the stored
  hash sets up front and EXCLUDED from the index/pair machinery
  (``incremental_near_dup`` requires batch∕index id disjointness), so
  a fully-committed batch replays as pure re-emission.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.graph import incremental_components
from lakehouse_ingestion_spark.operators.incremental_dedup import (
    MinHashIndexFrames,
    incremental_near_dup,
)
from lakehouse_ingestion_spark.operators.split_guard import sticky_split


def _read_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if (e.getErrorClass() or "") != "PATH_NOT_FOUND":
            raise
        return None


def sticky_split_foreach_batch(
    state_dir: str,
    fractions: dict[str, float],
    threshold: float,
    sink: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "split",
    split_col: str = "split",
    rep_col: str = "rep",
    audit_sink: Callable[[DataFrame, int], None] | None = None,
    shingle_n: int = 3,
    num_hashes: int = 64,
    num_bands: int = 8,
    lsh_seed: int = 42,
    posting_cap: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function. State tables live under
    ``state_dir`` (``bands``/``hashes``/``labels``/``assignments``),
    created on the first batch; the batch pipeline's
    ``leakage_safe_split`` stage reads the same ``labels``/
    ``assignments`` layout, so a stream and a backfill job can share
    one split state.

    Per batch: detect replayed ids (already in the stored hash sets)
    and exclude them from index/pair work; find the new slice's
    near-dup pairs against all history; fold the pairs into the label
    table; run the sticky assignment over the FULL batch (replayed
    docs are kept verbatim through the assignment table); emit
    ``sink(labeled_batch, epoch)`` and optionally
    ``audit_sink(audit, epoch)``; then commit states in the
    crash-ordered sequence documented in the module docstring.
    """
    if not 0.0 < threshold <= 1.0:
        raise ConfigError(f"threshold must be in (0, 1], got {threshold}")
    bands_path = f"{state_dir}/bands"
    hashes_path = f"{state_dir}/hashes"
    labels_path = f"{state_dir}/labels"
    assign_path = f"{state_dir}/assignments"

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            hashes = _read_if_exists(spark, hashes_path)
            index = None
            fresh_batch = batch_df
            if hashes is not None:
                index = MinHashIndexFrames(
                    bands=spark.read.parquet(bands_path), hashes=hashes
                )
                # replayed ids (a prior attempt committed the index)
                # must not re-enter the pair machinery: the incremental
                # index requires batch/index id disjointness
                fresh_batch = batch_df.join(
                    hashes.select(F.col(id_col)).distinct(),
                    id_col,
                    "left_anti",
                )
            pairs, delta = incremental_near_dup(
                fresh_batch,
                index,
                threshold,
                text_col=text_col,
                id_col=id_col,
                shingle_n=shingle_n,
                num_hashes=num_hashes,
                num_bands=num_bands,
                seed=lsh_seed,
                posting_cap=posting_cap,
            )
            # pin: the pair plan reads the index paths appended below,
            # and pairs feed both the label fold and nothing else —
            # one materialization, no read-after-append hazard
            pairs = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
            prev_labels = _read_if_exists(spark, labels_path)
            labels = incremental_components(
                prev_labels, pairs, "doc_a", "doc_b"
            ).localCheckpoint(eager=True)  # reads labels_path: pin pre-overwrite
            prev_assign = _read_if_exists(spark, assign_path)
            if prev_assign is not None:
                # append-only state: redelivered appends are exact
                # duplicate rows — dedup on read
                prev_assign = prev_assign.select(id_col, split_col).distinct()
            out, audit = sticky_split(
                batch_df,
                pairs,
                fractions,
                assignments=prev_assign,
                id_col=id_col,
                seed=seed,
                split_col=split_col,
                rep_col=rep_col,
                reps=labels.select(
                    "node", F.col("cluster_id").alias("rep")
                ),
            )
            # out/audit read assign_path — pin before the state append
            out = out.localCheckpoint(eager=True)
            if audit_sink is not None:
                audit = audit.localCheckpoint(eager=True)
            sink(out, epoch_id)
            if audit_sink is not None:
                audit_sink(audit, epoch_id)
            out.select(id_col, split_col).write.mode("append").parquet(
                assign_path
            )
            labels.write.mode("overwrite").parquet(labels_path)
            # index LAST (hashes before bands: orphaned postings whose
            # candidates vanish at verification are the forever-wrong
            # order — see streaming/near_dup.py); the delta covers only
            # the fresh slice, so replays never bloat the store
            delta.hashes.write.mode("append").parquet(hashes_path)
            delta.bands.write.mode("append").parquet(bands_path)
        finally:
            batch_df.unpersist()

    return _fn
