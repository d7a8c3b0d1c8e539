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
