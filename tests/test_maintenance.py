"""Compaction + statistics tests (operators/maintenance.py)."""

from __future__ import annotations

from lakehouse_ingestion_spark.operators.maintenance import (
    analyze_table,
    compact_parquet,
    plan_compaction,
)


def test_plan_and_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    # simulate streaming ingest: 40 tiny files
    spark.range(0, 4000, 1, 40).selectExpr("id", "id * 2 as v").write.parquet(path)

    before = plan_compaction(spark, path, target_file_bytes=1024 * 1024)
    assert before["n_files"] == 40
    assert before["worth_it"]

    result = compact_parquet(spark, path, target_file_bytes=1024 * 1024)
    assert result["rewritten"]

    after = plan_compaction(spark, path, target_file_bytes=1024 * 1024)
    assert after["n_files"] < 40
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert back.selectExpr("sum(v)").collect()[0][0] == 2 * sum(range(4000))


def test_compact_partitioned(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(0, 1000, 1, 16).selectExpr("id", "id % 3 as p")
    df.write.partitionBy("p").parquet(path)
    result = compact_parquet(spark, path, partition_by=["p"])
    assert result["rewritten"]
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert set(r["p"] for r in back.select("p").distinct().collect()) == {0, 1, 2}


def test_analyze_table_feeds_cbo(spark):
    spark.range(100).selectExpr("id", "id % 5 as k").write.mode(
        "overwrite"
    ).saveAsTable("mt_stats")
    try:
        analyze_table(spark, "mt_stats", columns=["k"])
        stats_row = [
            r for r in spark.sql("DESCRIBE TABLE EXTENDED mt_stats").collect()
            if r["col_name"] == "Statistics"
        ]
        assert stats_row and "rows" in stats_row[0]["data_type"]
    finally:
        spark.sql("DROP TABLE IF EXISTS mt_stats")


def test_compact_sorted_clusters_for_pruning(spark, tmp_path):
    """sort_by rewrites into range-disjoint files whose row-group min/max
    stats admit file-level pruning on the cluster column."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "clust")
    # write shuffled keys across many tiny files: every file spans almost
    # the full key range, so nothing can prune
    spark.range(0, 20000, 1, 20).selectExpr(
        "pmod(id * 2654435761, 20000) as k", "id as v"
    ).write.parquet(path)

    result = compact_parquet(
        spark, path, target_file_bytes=64 * 1024, sort_by=["k"]
    )
    assert result["rewritten"]

    back = spark.read.parquet(path)
    assert back.count() == 20000
    files = sorted(
        str(p) for p in __import__("pathlib").Path(path).glob("*.parquet")
    )
    assert len(files) > 1
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        ci = [
            md.row_group(g).column(
                next(
                    i for i in range(md.num_columns)
                    if md.row_group(g).column(i).path_in_schema == "k"
                )
            ).statistics
            for g in range(md.num_row_groups)
        ]
        spans.append((min(s.min for s in ci), max(s.max for s in ci)))
    spans.sort()
    # disjoint key ranges: each file's max stays below the next file's min
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b


def test_zorder_compaction_tightens_both_columns(spark, tmp_path):
    """Z-order clustering vs single-column sort: the linear sort leaves
    the SECOND column spanning its full range in every file; the Z-order
    rewrite keeps per-file spans tight on BOTH columns, which is what
    lets min/max stats prune predicates on either one."""
    from pyspark.sql import functions as F

    from lakehouse_ingestion_spark.operators.maintenance import (
        compact_parquet,
        zorder_column,
    )

    n = 40_000
    df = (
        spark.range(0, n, 1, 8)
        .select(
            # two independent uniform keys (bit-mixed from id)
            F.pmod(F.hash(F.col("id")), F.lit(10_000)).alias("x"),
            F.pmod(F.hash(F.col("id") + 1_000_000), F.lit(10_000)).alias("y"),
        )
    )

    def file_spans(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        assert len(per_file) > 4  # multiple files or the test is vacuous
        return sum(r["span"] for r in per_file) / len(per_file) / 10_000.0

    linear = str(tmp_path / "linear")
    df.write.parquet(linear)
    compact_parquet(spark, linear, target_file_bytes=16_000, sort_by=["x"])
    zord = str(tmp_path / "zord")
    df.write.parquet(zord)
    compact_parquet(
        spark, zord, target_file_bytes=16_000, zorder_by=["x", "y"]
    )

    # same rows either way
    assert spark.read.parquet(zord).count() == n
    lin_x, lin_y = file_spans(linear, "x"), file_spans(linear, "y")
    z_x, z_y = file_spans(zord, "x"), file_spans(zord, "y")
    assert lin_x < 0.25          # the sorted column is tight
    assert lin_y > 0.9           # ...but y spans everything per file
    assert z_x < 0.6 and z_y < 0.6  # z-order: BOTH dimensions bounded
    assert max(z_x, z_y) < lin_y / 1.5


def test_zorder_validation(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from lakehouse_ingestion_spark.operators.maintenance import (
        compact_parquet,
        zorder_column,
    )

    df = spark.range(5).select(
        F.col("id").alias("x"), (F.col("id") * 2).alias("y")
    )
    with pytest.raises(ValueError, match=">= 2"):
        zorder_column(df, ["x"])
    with pytest.raises(ValueError, match="bits"):
        zorder_column(df, ["x", "y"], bits=2)

    p = str(tmp_path / "t")
    df.write.parquet(p)
    with pytest.raises(ValueError, match="not both"):
        compact_parquet(spark, p, sort_by=["x"], zorder_by=["x", "y"])
    with pytest.raises(ValueError, match="partition"):
        compact_parquet(spark, p, partition_by=["x"], zorder_by=["x", "y"])

    # constant / all-null columns degrade to bucket 0, not an error
    c = spark.range(10).select(
        F.lit(1).alias("x"), F.lit(None).cast("long").alias("y")
    )
    assert c.select(zorder_column(c, ["x", "y"]).alias("z")).distinct().count() == 1


def test_compact_minhash_index_dedupes_and_preserves_results(spark, tmp_path):
    """Simulated crash redelivery (same batch appended twice): the
    compacted index returns the IDENTICAL verified pair set for the
    next batch, with duplicate postings/hash rows gone."""
    from lakehouse_ingestion_spark.operators.incremental_dedup import (
        MinHashIndexFrames,
        incremental_near_dup,
        minhash_index,
    )
    from lakehouse_ingestion_spark.operators.maintenance import (
        compact_minhash_index,
    )

    hist = spark.createDataFrame(
        [
            (0, "a rare ecology treatise on alpine moss and lichen growth"),
            (1, "completely different words about spark and parquet files"),
        ],
        "doc_id long, text string",
    )
    bands_path = str(tmp_path / "bands")
    hashes_path = str(tmp_path / "hashes")
    idx = minhash_index(hist, num_hashes=8, num_bands=4)
    # redelivered append: every row lands twice
    for _ in range(2):
        idx.bands.write.mode("append").parquet(bands_path)
        idx.hashes.write.mode("append").parquet(hashes_path)

    batch = spark.createDataFrame(
        [(10, "a rare ecology treatise on alpine moss and lichen decline")],
        "doc_id long, text string",
    )

    def pairs():
        stored = MinHashIndexFrames(
            bands=spark.read.parquet(bands_path),
            hashes=spark.read.parquet(hashes_path),
        )
        got, _ = incremental_near_dup(batch, stored, 0.3, num_hashes=8, num_bands=4)
        return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in got.collect()}

    before = pairs()
    assert any(a == 0 and b == 10 for a, b, _ in before)

    st = compact_minhash_index(spark, bands_path, hashes_path)
    assert st["bands_rows_before"] == 2 * st["bands_rows_after"]
    assert st["hashes_rows_before"] == 2 * st["hashes_rows_after"]
    assert pairs() == before
