"""Table maintenance: small-file compaction and statistics collection.

The small-files problem is endemic to streaming ingest (every micro-batch
writes a file per partition); compaction rewrites a path/partition into
~target-sized files so scans stop paying per-file open costs. The
reference's docs prescribe 128 MB-1 GB files
(``docs/07-developer-guide.md:504-507``) but ship no tooling; Delta/
Iceberg have native OPTIMIZE — this is the plain-parquet equivalent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

DEFAULT_TARGET_BYTES = 256 * 1024 * 1024


def _require_local_path(path: str) -> None:
    # sizes come from os.path.getsize and the swap from shutil.move —
    # both local-FS only. Silently returning n_files=0 for s3a://hdfs://
    # would misreport "nothing to compact"; fail loudly instead.
    if "://" in path and not path.startswith("file:"):
        from lakehouse_ingestion_spark.errors import UnsupportedFeatureError

        raise UnsupportedFeatureError(
            f"compaction supports local filesystem paths only, got {path!r}; "
            "use Delta/Iceberg OPTIMIZE (or a Hadoop-FS rewrite job) for object stores"
        )


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Inspect a parquet path: file count, total bytes, and the output
    file count a compaction would produce. Driver-side file listing via
    the input_file_name of a metadata-only scan."""
    _require_local_path(path)
    files = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    import os

    sizes = []
    for r in files:
        p = r["f"].removeprefix("file:")
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            pass
    total = sum(sizes)
    target_files = max(1, round(total / target_file_bytes)) if total else 0
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "target_files": target_files,
        "worth_it": len(sizes) > max(1, target_files) * 2,
    }


def zorder_column(
    df: DataFrame, columns: list[str], bits: int = 16
) -> "F.Column":
    """Interleaved-bit Z-order value over 2+ numeric/date/timestamp
    columns — the multi-column clustering key behind Delta OPTIMIZE
    ZORDER BY. A single-column range sort prunes scans on THAT column
    only; sorting by the Z-value keeps files tight on EVERY participating
    column simultaneously (each file covers a small hyper-rectangle of
    the key space), so min/max row-group stats prune selective predicates
    on any of them.

    Each column is linearly scaled to ``[0, 2^bits)`` between its global
    min and max (ONE aggregate pass, driver-resident scalars — standard
    for numeric keys; heavily skewed columns cluster unevenly, in which
    case pre-bucket by rank upstream). NULLs map to bucket 0. The bit
    interleave itself is a pure JVM expression tree (shift/and/or), fully
    codegen'd — no Python anywhere.
    """
    if len(columns) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_by for one)")
    if not 4 <= bits <= 20:
        raise ValueError(f"bits must be in [4, 20], got {bits}")
    # every interleaved bit must fit in the 63 value bits of a signed
    # long: position (bits-1)*ncols + (ncols-1) is the highest. Beyond
    # 63 the top column's bit lands in the SIGN bit (rows sort negative)
    # and shifts >= 64 wrap mod 64 in the JVM, silently scrambling the
    # ordering — reduce bits (e.g. 4 cols -> bits <= 15).
    n = len(columns)
    max_pos = (bits - 1) * n + (n - 1)
    if max_pos > 62:
        max_bits = (63 - n) // n + 1
        raise ValueError(
            f"bits={bits} x {n} columns needs bit position {max_pos} — "
            f"exceeds a signed long's 63 value bits; use bits <= {max_bits}"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{i}") for i, c in enumerate(columns)],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{i}") for i, c in enumerate(columns)],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(columns):
        mn, mx = stats[f"__mn_{i}"], stats[f"__mx_{i}"]
        if mn is None or mx is None or mx <= mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        s = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn)))
            / F.lit(float(mx - mn))
            * F.lit(float(top))
        ).cast("long")
        scaled.append(F.coalesce(s, F.lit(0)))
    ncols = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    return z


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` into ~target-sized parquet files (coalesce to the
    planned file count; repartition by partition columns when given so
    each Hive partition compacts independently).

    ``sort_by`` clusters the rewrite on the given columns — the
    plain-parquet analogue of Delta OPTIMIZE ZORDER / Iceberg
    ``sort_order``: a range repartition puts disjoint key ranges in
    disjoint files and the within-partition sort tightens row-group
    min/max stats, so point/range predicates on those columns prune
    whole files and row groups at scan time (the lever that matters at
    100 TB, where unpruned scans dominate cost). With ``partition_by``
    the sort applies within each Hive partition's tasks instead (range
    clustering across partition dirs is meaningless).

    Crash safety: the rewrite lands in a temp sibling first, so a crash
    BEFORE the swap leaves the original untouched. The swap itself is two
    renames, NOT atomic — a crash between them leaves no data at ``path``,
    but the full original survives at ``<path>__compact_old`` for manual
    rollback; that backup is only deleted after the new ``path`` has been
    verified readable. (True atomicity needs a transactional table format
    — the Delta/Iceberg sinks' OPTIMIZE path at scale.)"""
    import shutil

    if sort_by and zorder_by:
        raise ValueError("pass sort_by OR zorder_by, not both")
    if zorder_by and partition_by:
        raise ValueError(
            "zorder_by within Hive partitions is not supported; "
            "z-cluster each partition separately"
        )
    stats = plan_compaction(spark, path, target_file_bytes)
    if stats["target_files"] == 0:
        return {**stats, "rewritten": False}

    df: DataFrame = spark.read.parquet(path)
    if zorder_by:
        # multi-column clustering: range-partition + sort on the
        # interleaved Z-value (dropped before write); same salt logic as
        # sort_by for hot Z-values
        z = zorder_column(df, zorder_by)
        salt = F.pmod(F.hash(*df.columns), F.lit(1 << 20))
        out = (
            df.withColumn("__z", z)
            .repartitionByRange(stats["target_files"], F.col("__z"), salt)
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif partition_by:
        # hash on (partition cols + rand) with the planned task count:
        # plain repartition(*partition_by) would route each Hive
        # partition value to ONE task/file regardless of its size
        out = df.repartition(
            max(stats["target_files"], 1), *partition_by, F.rand(seed=42)
        )
        if sort_by:
            out = out.sortWithinPartitions(*partition_by, *sort_by)
    elif sort_by:
        # deterministic per-row salt as the LAST range key: a range
        # partitioner cannot split rows with equal sort keys, so one hot
        # key value would otherwise become one enormous file no matter
        # what target_file_bytes says; the salt spreads equal keys over
        # adjacent partitions while keeping inter-file key ranges
        # disjoint-or-touching (min/max pruning still works)
        salt = F.pmod(F.hash(*df.columns), F.lit(1 << 20))
        out = df.repartitionByRange(
            stats["target_files"], *sort_by, salt
        ).sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(stats["target_files"])

    _swap_rewrite(spark, path, out, partition_by)
    log.info("compacted %s: %s files -> %s", path, stats["n_files"], stats["target_files"])
    return {**stats, "rewritten": True}


def _swap_rewrite(
    spark: SparkSession,
    path: str,
    out: DataFrame,
    partition_by: list[str] | None = None,
) -> None:
    """Write ``out`` beside ``path``, then swap it in (see
    compact_parquet's crash-safety docstring: temp write first, backup
    kept until the swapped-in copy verifies readable)."""
    import shutil

    tmp = path.rstrip("/") + "__compact_tmp"
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)

    # footer-only count (no data scan) — baseline for post-swap verification
    expected = spark.read.parquet(tmp).count()

    backup = path.rstrip("/") + "__compact_old"
    shutil.move(path, backup)
    shutil.move(tmp, path)
    # verify the swapped-in data before destroying the only rollback copy:
    # count() touches EVERY file's footer (schema inference alone can
    # succeed on a partially-copied directory when move degrades to
    # copy+delete across filesystems); on failure the backup remains
    actual = spark.read.parquet(path).count()
    if actual != expected:
        raise RuntimeError(
            f"compact_parquet: post-swap row count {actual} != {expected}; "
            f"original preserved at {backup}"
        )
    shutil.rmtree(backup)


def compact_minhash_index(
    spark: SparkSession,
    bands_path: str,
    hashes_path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Compact the incremental near-dup index store
    (``operators/incremental_dedup``: ``bands`` postings +``hashes``
    verification sets). Crash-redelivered batches re-append both frames
    — the hashes-first append order makes that harmless to
    CORRECTNESS (``streaming/near_dup.py``), but duplicate rows bloat
    every subsequent batch: each duplicate posting multiplies the
    band-join candidate fan-out, and duplicate hash rows multiply the
    verification join.

    Rewrite (same temp-write + verified swap as ``compact_parquet``):

    - ``bands``: distinct ``(id, band, key)``, range-clustered on
      ``(band, key)`` — the probe side's join key, so each batch's
      candidate join prunes to the matching key ranges;
    - ``hashes``: one row per id (duplicates are byte-identical by
      construction — same doc, same shingle set), clustered on id for
      the verification join.

    Returns per-frame before/after row counts. Run it when
    ``plan_compaction`` says the file count is worth it, or after any
    crash-redelivery window.
    """
    _require_local_path(bands_path)
    _require_local_path(hashes_path)
    bands = spark.read.parquet(bands_path)
    hashes = spark.read.parquet(hashes_path)
    id_col = [c for c in hashes.columns if c != "hs"][0]
    stats = {
        "bands_rows_before": bands.count(),
        "hashes_rows_before": hashes.count(),
    }

    b_files = plan_compaction(spark, bands_path, target_file_bytes)
    b_out = (
        bands.distinct()
        .repartitionByRange(
            max(b_files["target_files"], 1), "band", "key"
        )
        .sortWithinPartitions("band", "key")
    )
    _swap_rewrite(spark, bands_path, b_out)

    h_files = plan_compaction(spark, hashes_path, target_file_bytes)
    h_out = (
        hashes.dropDuplicates([id_col])
        .repartitionByRange(max(h_files["target_files"], 1), id_col)
        .sortWithinPartitions(id_col)
    )
    _swap_rewrite(spark, hashes_path, h_out)

    after_b = spark.read.parquet(bands_path).count()
    after_h = spark.read.parquet(hashes_path).count()
    out = {
        **stats,
        "bands_rows_after": after_b,
        "hashes_rows_after": after_h,
    }
    log.info("compacted minhash index: %s", out)
    return out


def analyze_table(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """Collect table (and optionally column) statistics for the
    cost-based optimizer: ndv/min/max/null counts feed join reordering
    and broadcast decisions."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
