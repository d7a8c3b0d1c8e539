"""CLI tests (python -m lakehouse_ingestion_spark ...)."""

from __future__ import annotations

import json

import pytest
import yaml
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from lakehouse_ingestion_spark.__main__ import main
from lakehouse_ingestion_spark.schema_registry import SchemaRegistry


@pytest.fixture()
def setup(tmp_path):
    reg = SchemaRegistry(tmp_path / "schemas")
    reg.register(
        "demo",
        "events",
        "v1",
        StructType(
            [
                StructField("event_id", LongType(), False),
                StructField("amount", DoubleType(), True, metadata={"min_value": 0.0}),
            ]
        ),
    )
    src = tmp_path / "in.jsonl"
    src.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"event_id": 1, "amount": 5.0},
                {"event_id": 2, "amount": -1.0},
            ]
        )
    )
    cfg = {
        "env": "test",
        "schema_registry_path": str(tmp_path / "schemas"),
        "jobs": [
            {
                "name": "ingest",
                "layer": "bronze",
                "source_system": "cli-test",
                "source": {"type": "json", "options": {"path": str(src), "format": "json"}},
                "schema": {"domain": "demo", "dataset": "events", "version": "v1"},
                "data_quality": {
                    "on_fail": "QUARANTINE",
                    "derive_from_schema": True,
                    "quarantine_path": str(tmp_path / "quarantine"),
                },
                "target": {
                    "format": "parquet",
                    "options": {"path": str(tmp_path / "out"), "mode": "overwrite"},
                },
            }
        ],
    }
    cfg_path = tmp_path / "pipe.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return tmp_path, cfg_path


def test_validate_ok(setup):
    _, cfg_path = setup
    assert main(["validate", "--config", str(cfg_path)]) == 0


def test_validate_bad_schema_ref(setup):
    tmp_path, cfg_path = setup
    raw = yaml.safe_load(cfg_path.read_text())
    raw["jobs"][0]["schema"]["dataset"] = "missing"
    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump(raw))
    assert main(["validate", "--config", str(bad)]) == 1


def test_schemas_listing(setup, capsys):
    tmp_path, _ = setup
    assert main(["schemas", "--registry", str(tmp_path / "schemas")]) == 0
    assert "demo/events: v1" in capsys.readouterr().out


def test_run_end_to_end(setup, spark, capsys):
    tmp_path, cfg_path = setup
    # keep-session: the test session is shared; stopping it would break
    # subsequent tests
    assert main(["run", "--config", str(cfg_path), "--keep-session"]) == 0
    out_lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert out_lines[0]["rows_written"] == 1
    assert out_lines[0]["dq_status"] == "FAIL"
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1
    assert spark.read.parquet(str(tmp_path / "quarantine")).count() == 1
