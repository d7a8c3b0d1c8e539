from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from lakehouse_ingestion_spark.catalog import NoopCatalogAdapter, SparkCatalogAdapter
from lakehouse_ingestion_spark.metrics import ObservedMetrics


def test_noop_catalog():
    c = NoopCatalogAdapter()
    assert c.table_exists("any.table") is False
    c.create_table_if_not_exists("any.table", StructType([]))


def test_spark_catalog_create_and_exists(spark):
    cat = SparkCatalogAdapter(spark)
    schema = StructType(
        [StructField("id", LongType(), True), StructField("name", StringType(), True)]
    )
    assert not cat.table_exists("default.t_cat_test")
    cat.create_table_if_not_exists("default.t_cat_test", schema)
    assert cat.table_exists("default.t_cat_test")
    cat.create_table_if_not_exists("default.t_cat_test", schema)  # idempotent
    spark.sql("DROP TABLE default.t_cat_test")


def test_observed_metrics_no_extra_action(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    om = ObservedMetrics.attach(
        df, "m", {"rows": F.count(F.lit(1)), "max_v": F.max("v")}
    )
    om.df.write.format("noop").mode("overwrite").save()  # the ONLY action
    got = om.get()
    assert got["rows"] == 100
    assert got["max_v"] == 198


def test_lsh_bucket_groups_similar_vectors(spark):
    from lakehouse_ingestion_spark.functions.similarity import (
        lsh_bucket,
        random_hyperplanes,
    )

    planes = random_hyperplanes(4, 6, seed=1)
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, [1.01, 2.01, 3.01, 4.01]),  # nearly identical direction
            (3, [-1.0, -2.0, -3.0, -4.0]),  # opposite
        ],
        "id long, v array<double>",
    )
    out = {r.id: r.b for r in df.select("id", lsh_bucket("v", planes).alias("b")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert len(out[1]) == 6


def test_streaming_listener_records_metrics(spark, tmp_path):
    import json as _json
    import time as _time

    from pyspark.sql.types import LongType, StructField, StructType

    from lakehouse_ingestion_spark.metrics import LoggingStreamListener

    src = tmp_path / "in"
    src.mkdir()
    (src / "f.jsonl").write_text("\n".join(_json.dumps({"id": i}) for i in range(5)))

    lst = LoggingStreamListener()
    handle = lst.attach(spark)
    try:
        q = (
            spark.readStream.schema(StructType([StructField("id", LongType())]))
            .json(str(src))
            .writeStream.format("noop")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener callbacks are async; give the bus a moment
        for _ in range(20):
            if any(m.name == "stream_input_rows" and m.value == 5.0 for m in lst.records):
                break
            _time.sleep(0.5)
        assert any(m.name == "stream_input_rows" and m.value == 5.0 for m in lst.records)
        assert any(m.tags.get("query") == "metrics_probe" for m in lst.records)
    finally:
        spark.streams.removeListener(handle)
