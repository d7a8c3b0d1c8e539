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


def test_prometheus_exporter_exposition_format(tmp_path, spark):
    """Batch observed metrics + streaming MetricValues render as valid
    text exposition format and land atomically in a textfile."""
    from lakehouse_ingestion_spark.metrics import (
        MetricValue,
        ObservedMetrics,
        PrometheusExporter,
    )

    exp = PrometheusExporter(textfile_path=str(tmp_path / "job.prom"))

    # batch path: observe-based metrics from a real Spark action
    df = spark.range(50).withColumn("v", F.col("id") * 3)
    om = ObservedMetrics.attach(
        df, "ing", {"rows": F.count(F.lit(1)), "max_v": F.max("v")}
    )
    om.df.write.format("noop").mode("overwrite").save()
    exp.record_observed("ingest", om.get(), tags={"table": "bronze.events"})

    # streaming-listener path: the exporter IS the emit callable
    exp(MetricValue("stream_input_rows", 5.0,
                    tags={"query": "q1", "batch": "0"}))
    exp(MetricValue("stream_input_rows", 7.0,
                    tags={"query": "q1", "batch": "1"}))  # last write wins per labelset... distinct batch label -> both kept

    payload = exp.flush()
    assert payload == (tmp_path / "job.prom").read_text()
    lines = payload.splitlines()
    assert "# TYPE lakehouse_ingest_rows gauge" in lines
    assert 'lakehouse_ingest_rows{table="bronze.events"} 50' in lines
    assert 'lakehouse_ingest_max_v{table="bronze.events"} 147' in lines
    assert 'lakehouse_stream_input_rows{batch="0",query="q1"} 5' in lines
    assert 'lakehouse_stream_input_rows{batch="1",query="q1"} 7' in lines
    # every non-comment line: name{labels} value — exposition shape
    import re as _re

    for ln in lines:
        if not ln.startswith("#"):
            assert _re.fullmatch(
                r"[a-zA-Z_:][a-zA-Z0-9_:]*(\{[^}]*\})? -?[0-9.e+-]+", ln
            ), ln


def test_prometheus_exporter_sanitization_and_overwrite():
    from lakehouse_ingestion_spark.metrics import PrometheusExporter

    exp = PrometheusExporter(prefix="")
    exp.record("9weird name!", 1.5, tags={"bad-label": 'va"l\n'})
    exp.record("9weird name!", 2.5, tags={"bad-label": 'va"l\n'})  # overwrites
    out = exp.render()
    assert out == '# TYPE _9weird_name_ gauge\n_9weird_name_{bad_label="va\\"l\\n"} 2.5\n'


def test_prometheus_pushgateway_protocol(tmp_path):
    """flush() PUTs the payload to /metrics/job/<job>/<grouping keys>."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from lakehouse_ingestion_spark.metrics import PrometheusExporter

    hits = []

    class H(BaseHTTPRequestHandler):
        def do_PUT(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            hits.append((self.path, body.decode(), self.headers["Content-Type"]))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        exp = PrometheusExporter(
            job="ingest job",
            pushgateway_url=f"http://127.0.0.1:{srv.server_port}",
            grouping_key={"env": "dev"},
        )
        exp.record("rows", 42)
        exp.flush()
    finally:
        srv.shutdown()
    path, body, ctype = hits[0]
    assert path == "/metrics/job/ingest%20job/env/dev"
    assert "lakehouse_rows 42" in body
    assert ctype.startswith("text/plain")
