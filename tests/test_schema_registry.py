import json

import pytest
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from lakehouse_ingestion_spark.errors import SchemaNotFoundError
from lakehouse_ingestion_spark.schema_registry import SchemaRegistry, field_metadata

SCHEMA = StructType(
    [
        StructField("transaction_id", StringType(), False),
        StructField(
            "amount",
            DecimalType(10, 2),
            False,
            metadata={"min_value": 0.01, "max_value": 999999.99},
        ),
        StructField(
            "currency",
            StringType(),
            False,
            metadata={"allowed_values": ["USD", "EUR", "GBP", "JPY"]},
        ),
        StructField("transaction_time", TimestampType(), False),
        StructField("retries", IntegerType(), True),
    ]
)


@pytest.fixture()
def registry(tmp_path):
    r = SchemaRegistry(tmp_path)
    r.register("payments", "transactions", "v1", SCHEMA)
    return r


def test_roundtrip(registry):
    s = registry.get_schema("payments", "transactions", "v1")
    assert s == SCHEMA


def test_latest_version_numeric_sort(registry, tmp_path):
    registry.register("payments", "transactions", "v2", SCHEMA)
    registry.register("payments", "transactions", "v10", SCHEMA)
    assert registry.latest_version("payments", "transactions") == "v10"
    assert registry.get_schema("payments", "transactions", "latest") == SCHEMA
    assert registry.list_versions("payments", "transactions") == ["v1", "v2", "v10"]


def test_missing_schema_raises(registry):
    with pytest.raises(SchemaNotFoundError):
        registry.get_schema("payments", "transactions", "v99")
    with pytest.raises(SchemaNotFoundError):
        registry.get_schema("nope", "nothing")


def test_malformed_file_raises(tmp_path):
    r = SchemaRegistry(tmp_path)
    d = tmp_path / "x" / "y"
    d.mkdir(parents=True)
    (d / "v1.json").write_text("{not json")
    from lakehouse_ingestion_spark.errors import SchemaParseError

    with pytest.raises(SchemaParseError):
        r.get_schema("x", "y", "v1")
    # corrupt-but-present must NOT report as absent
    with pytest.raises(SchemaParseError):
        r.schema_exists("x", "y", "v1")


def test_field_metadata(registry):
    s = registry.get_schema("payments", "transactions")
    meta = field_metadata(s, "amount")
    assert meta["min_value"] == 0.01
    assert field_metadata(s, "currency")["allowed_values"] == ["USD", "EUR", "GBP", "JPY"]


def test_spark_datatype_json_compat(registry, tmp_path):
    """Schema files are Spark's own DataType JSON format."""
    raw = json.loads((tmp_path / "payments" / "transactions" / "v1.json").read_text())
    assert StructType.fromJson(raw) == SCHEMA


def test_check_evolution_rules():
    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from lakehouse_ingestion_spark.schema_registry import check_evolution

    old = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("amount", DecimalType(10, 2), True),
            StructField("name", StringType(), True),
        ]
    )
    # compatible: widen int->long, widen decimal precision, add nullable col,
    # relax nullability
    ok = StructType(
        [
            StructField("id", LongType(), True),
            StructField("amount", DecimalType(12, 2), True),
            StructField("name", StringType(), True),
            StructField("note", StringType(), True),
        ]
    )
    assert check_evolution(old, ok) == []

    # breaking: drop, narrow, tighten nullability, add NOT NULL
    bad = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("amount", DoubleType(), True),      # decimal->double: retype
            StructField("name", StringType(), False),       # tightened
            StructField("req", StringType(), False),        # new NOT NULL
        ]
    )
    problems = check_evolution(old, bad)
    assert len(problems) == 3
    assert any("type change for amount" in p for p in problems)
    assert any("nullability tightened" in p for p in problems)
    assert any("NOT NULL column: req" in p for p in problems)
    # decimal scale reduction is breaking too
    assert check_evolution(
        StructType([StructField("d", DecimalType(10, 4), True)]),
        StructType([StructField("d", DecimalType(10, 2), True)]),
    )


def test_evolve_gates_versions(tmp_path):
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    from lakehouse_ingestion_spark.schema_registry import SchemaRegistry, evolve

    reg = SchemaRegistry(tmp_path)
    v1 = StructType([StructField("id", IntegerType(), False)])
    assert evolve(reg, "d", "t", v1) == ("v1", False)
    # widening: stays v1
    widened = StructType([StructField("id", LongType(), False)])
    assert evolve(reg, "d", "t", widened) == ("v1", False)
    # breaking: bumps to v2
    renamed = StructType([StructField("ident", LongType(), False)])
    assert evolve(reg, "d", "t", renamed) == ("v2", True)
    assert reg.list_versions("d", "t") == ["v1", "v2"]
    assert reg.get_schema("d", "t", "latest")["ident"].dataType == LongType()


def test_package_resource_fallback(tmp_path, monkeypatch):
    """Schemas bundled inside an installed package resolve when no
    filesystem dir has them — the reference's classpath fallback
    (schema/SchemaRegistry.scala:58-69) via importlib.resources."""
    import sys

    pkg = tmp_path / "bundled_schemas_pkg"
    d = pkg / "payments" / "transactions"
    d.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (d / "v1.json").write_text(json.dumps(SCHEMA.jsonValue()))
    (d / "v2.json").write_text(json.dumps(SCHEMA.jsonValue()))
    monkeypatch.syspath_prepend(str(tmp_path))

    # package-only registry
    r = SchemaRegistry(package="bundled_schemas_pkg")
    assert r.list_versions("payments", "transactions") == ["v1", "v2"]
    assert r.get_schema("payments", "transactions") == SCHEMA
    assert r.list_datasets() == [("payments", "transactions")]
    with pytest.raises(ValueError, match="read-only"):
        r.register("payments", "transactions", "v3", SCHEMA)

    # filesystem-first: a local override of the SAME file wins, but
    # version listing is the UNION across roots — a filesystem dir with
    # fewer versions must not shadow packaged ones, so latest/vN agree
    # with _load's per-file fallthrough
    fs = tmp_path / "fs_schemas"
    r2 = SchemaRegistry(fs, package="bundled_schemas_pkg")
    override = StructType([StructField("only_local", StringType(), True)])
    r2.register("payments", "transactions", "v1", override)
    r2._cache.clear()
    assert r2.get_schema("payments", "transactions", "v1") == override
    assert r2.list_versions("payments", "transactions") == ["v1", "v2"]
    # latest resolves v2 from the package even though the fs dir exists
    assert r2.latest_version("payments", "transactions") == "v2"
    assert r2.get_schema("payments", "transactions") == SCHEMA
    # an EMPTY filesystem dir (exists, no vN.json) must not hide the
    # packaged versions either
    empty = fs / "payments" / "refunds"
    empty.mkdir(parents=True)
    d2 = pkg / "payments" / "refunds"
    d2.mkdir(parents=True)
    (d2 / "v1.json").write_text(json.dumps(SCHEMA.jsonValue()))
    assert r2.list_versions("payments", "refunds") == ["v1"]
    assert r2.get_schema("payments", "refunds") == SCHEMA
    sys.modules.pop("bundled_schemas_pkg", None)


def test_registry_requires_some_root():
    with pytest.raises(ValueError, match="base_path"):
        SchemaRegistry()
