"""Pipeline spec: YAML/JSON -> typed dataclasses, with eager validation.

Parity with reference ``config/ConfigModels.scala:41-57`` (PipelineConfig
-> jobs; each job = source + target + schema ref + DQ policy) and
``config/ConfigLoader.scala:29-100`` (parse then eagerly verify every
referenced schema exists before any Spark work).

Extensions beyond the reference model (declared capabilities the config
must drive): per-job transform chain (dedup / cdc_apply / scd2 / enrich /
aggregate / conform — SURVEY.md D5-D13) and a real DQ block with derived
checks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import yaml

from lakehouse_ingestion_spark.dq.ruleset import OnFailPolicy
from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.schema_registry import SchemaRegistry


@dataclass
class SchemaRef:
    domain: str
    dataset: str
    version: str = "latest"


@dataclass
class SourceConfig:
    type: str  # kafka | file | csv | json | parquet | avro | jdbc
    options: dict = field(default_factory=dict)


@dataclass
class TargetConfig:
    format: str  # parquet | delta | iceberg
    options: dict = field(default_factory=dict)  # path/table/mode/partition_by/...


@dataclass
class DQConfig:
    on_fail: OnFailPolicy = OnFailPolicy.LOG_ONLY
    checks: list[dict] = field(default_factory=list)  # explicit check specs
    derive_from_schema: bool = True
    quarantine_path: str | None = None
    failure_threshold: float = 0.0


@dataclass
class TransformConfig:
    op: str  # dedup | cdc_apply | scd2 | enrich | aggregate | conform | sql | ...
    options: dict = field(default_factory=dict)


@dataclass
class JobConfig:
    name: str
    source: SourceConfig
    target: TargetConfig
    schema: SchemaRef | None = None
    layer: str = "bronze"  # bronze | silver | gold (MedallionLayer parity)
    source_system: str = "unknown"
    transforms: list[TransformConfig] = field(default_factory=list)
    data_quality: DQConfig | None = None


@dataclass
class PipelineConfig:
    env: str
    jobs: list[JobConfig]
    schema_registry_path: str | None = None


def load_config(path: str | Path, schema_registry: SchemaRegistry | None = None) -> PipelineConfig:
    """Parse + validate a pipeline spec file (.yaml/.yml/.json)."""
    p = Path(path)
    if not p.is_file():
        raise ConfigError(f"config file not found: {p}")
    try:
        raw = (
            json.loads(p.read_text()) if p.suffix == ".json" else yaml.safe_load(p.read_text())
        )
    except Exception as e:
        raise ConfigError(f"failed to parse {p}: {e}") from e
    return parse_config(raw, schema_registry)


def parse_config(raw: dict, schema_registry: SchemaRegistry | None = None) -> PipelineConfig:
    if not isinstance(raw, dict) or "jobs" not in raw:
        raise ConfigError("pipeline config must be a mapping with a 'jobs' list")
    if not isinstance(raw["jobs"], list):
        raise ConfigError(
            f"'jobs' must be a list, got {type(raw['jobs']).__name__} "
            "(a bare 'jobs:' key in YAML parses as null)"
        )
    jobs = []
    for i, j in enumerate(raw["jobs"]):
        try:
            jobs.append(_parse_job(j))
        except ConfigError:
            raise
        except Exception as e:
            raise ConfigError(f"job[{i}] invalid: {e}") from e
    cfg = PipelineConfig(
        env=raw.get("env", "dev"),
        jobs=jobs,
        schema_registry_path=raw.get("schema_registry_path"),
    )
    # eager schema validation (ConfigLoader.scala:69-100 parity)
    registry = schema_registry or (
        SchemaRegistry(cfg.schema_registry_path) if cfg.schema_registry_path else None
    )
    if registry is not None:
        for job in cfg.jobs:
            if job.schema is not None and not registry.schema_exists(
                job.schema.domain, job.schema.dataset, job.schema.version
            ):
                raise ConfigError(
                    f"job '{job.name}' references missing schema "
                    f"{job.schema.domain}/{job.schema.dataset}/{job.schema.version}"
                )
    return cfg


def _parse_job(j: dict) -> JobConfig:
    for req in ("name", "source", "target"):
        if req not in j:
            raise ConfigError(f"job missing required key '{req}'")
    src = j["source"]
    tgt = j["target"]
    schema = None
    if "schema" in j:
        s = j["schema"]
        schema = SchemaRef(s["domain"], s["dataset"], s.get("version", "latest"))
    dq = None
    if "data_quality" in j:
        d = j["data_quality"]
        dq = DQConfig(
            on_fail=OnFailPolicy(d.get("on_fail", "LOG_ONLY").upper()),
            checks=d.get("checks", []),
            derive_from_schema=d.get("derive_from_schema", True),
            quarantine_path=d.get("quarantine_path"),
            failure_threshold=float(d.get("failure_threshold", 0.0)),
        )
    transforms = [
        TransformConfig(op=t["op"], options={k: v for k, v in t.items() if k != "op"})
        for t in j.get("transforms", [])
    ]
    return JobConfig(
        name=j["name"],
        source=SourceConfig(type=src["type"], options=src.get("options", {})),
        target=TargetConfig(format=tgt["format"], options=tgt.get("options", {})),
        schema=schema,
        layer=j.get("layer", "bronze"),
        source_system=j.get("source_system", "unknown"),
        transforms=transforms,
        data_quality=dq,
    )
