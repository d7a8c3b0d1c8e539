"""File-based versioned schema registry.

Parity with reference ``schema/SchemaRegistry.scala:71-150,248-265``:
schemas live at ``{base}/{domain}/{dataset}/{vN}.json`` in Spark's own
``DataType`` JSON format, keyed by ``(domain, dataset, version)``;
``version="latest"`` resolves to the max numeric ``vN``; results cached.

Lookup is filesystem-first with an optional installed-package fallback
(``package="my_artifact.schemas"`` via ``importlib.resources``) — the
Python analogue of the reference's filesystem-then-classpath dispatch
(``schema/SchemaRegistry.scala:58-69,155-200``) for containerized
deploys that bundle schemas inside the artifact.

The JSON files parse via ``StructType.fromJson`` — byte-compatible with the
reference's schema files (``schemas/payments/transactions/v1.json`` etc.).
"""

from __future__ import annotations

import json
import re
from importlib import resources
from pathlib import Path

from pyspark.sql.types import StructField, StructType

from lakehouse_ingestion_spark.errors import SchemaNotFoundError, SchemaParseError

_VERSION_RE = re.compile(r"^v(\d+)$")


class SchemaRegistry:
    def __init__(self, base_path: str | Path | None = None, package: str | None = None):
        if base_path is None and package is None:
            raise ValueError("SchemaRegistry needs a base_path, a package, or both")
        self.base_path = Path(base_path) if base_path is not None else None
        self.package = package
        self._cache: dict[tuple[str, str, str], StructType] = {}

    def _roots(self):
        """Schema roots in lookup order: filesystem first, then the
        installed package's resources (both expose the Traversable
        surface this class uses: ``/``, is_dir/is_file, iterdir,
        read_text, name)."""
        if self.base_path is not None:
            yield self.base_path
        if self.package is not None:
            yield resources.files(self.package)

    # -- public API ---------------------------------------------------------
    def get_schema(self, domain: str, dataset: str, version: str = "latest") -> StructType:
        if version == "latest":
            version = self.latest_version(domain, dataset)
        key = (domain, dataset, version)
        if key not in self._cache:
            self._cache[key] = self._load(domain, dataset, version)
        return self._cache[key]

    def list_versions(self, domain: str, dataset: str) -> list[str]:
        """Union of versions across ALL roots — matching ``_load``'s
        per-file fallthrough. Returning from the first root whose dir
        merely EXISTS would let an empty (or stale) filesystem dir
        shadow packaged versions, making ``latest`` raise or resolve
        stale while ``get_schema("vN")`` still succeeds via the next
        root."""
        found: set[int] = set()
        any_dir = False
        for root in self._roots():
            d = root / domain / dataset
            if not d.is_dir():
                continue
            any_dir = True
            for f in d.iterdir():
                m = _VERSION_RE.match(f.name.removesuffix(".json"))
                if m and f.name.endswith(".json"):
                    found.add(int(m.group(1)))
        if not any_dir:
            raise SchemaNotFoundError(
                f"no schema dir for {domain}/{dataset} under "
                f"{self.base_path or self.package}"
            )
        return [f"v{n}" for n in sorted(found)]

    def list_datasets(self) -> list[tuple[str, str]]:
        """All (domain, dataset) pairs that have at least one vN.json
        in any root (filesystem entries listed first)."""
        out: list[tuple[str, str]] = []
        for root in self._roots():
            if not root.is_dir():
                continue
            for dom in sorted(root.iterdir(), key=lambda p: p.name):
                if not dom.is_dir():
                    continue
                for ds in sorted(dom.iterdir(), key=lambda p: p.name):
                    if not ds.is_dir():
                        continue
                    has_version = any(
                        f.name.endswith(".json")
                        and _VERSION_RE.match(f.name.removesuffix(".json"))
                        for f in ds.iterdir()
                    )
                    pair = (dom.name, ds.name)
                    if has_version and pair not in out:
                        out.append(pair)
        return out

    def latest_version(self, domain: str, dataset: str) -> str:
        versions = self.list_versions(domain, dataset)
        if not versions:
            raise SchemaNotFoundError(f"no versions for {domain}/{dataset}")
        return versions[-1]

    def schema_exists(self, domain: str, dataset: str, version: str = "latest") -> bool:
        try:
            self.get_schema(domain, dataset, version)
            return True
        except SchemaNotFoundError:
            return False

    def register(self, domain: str, dataset: str, version: str, schema: StructType) -> Path:
        """Write a schema file (used by tests / bootstrap tooling).
        Filesystem-root only — package resources are read-only."""
        if self.base_path is None:
            raise ValueError(
                "register() needs a filesystem base_path; the package root is read-only"
            )
        d = self.base_path / domain / dataset
        d.mkdir(parents=True, exist_ok=True)
        path = d / f"{version}.json"
        path.write_text(json.dumps(schema.jsonValue(), indent=2))
        self._cache[(domain, dataset, version)] = schema
        return path

    # -- internal -----------------------------------------------------------
    def _load(self, domain: str, dataset: str, version: str) -> StructType:
        for root in self._roots():
            path = root / domain / dataset / f"{version}.json"
            if not path.is_file():
                continue
            try:
                raw = json.loads(path.read_text())
                return StructType.fromJson(raw)
            except Exception as e:
                # NOT SchemaNotFoundError: schema_exists() swallows that
                # and config validation would report a present-but-corrupt
                # file as missing. A corrupt filesystem copy is an error,
                # not a trigger to fall through to the packaged copy —
                # silently serving a stale bundled schema would mask it.
                raise SchemaParseError(f"failed to parse schema {path}: {e}") from e
        raise SchemaNotFoundError(
            f"schema file not found: {domain}/{dataset}/{version}.json "
            f"(roots: {self.base_path or ''} {self.package or ''})"
        )


def field_metadata(schema: StructType, column: str) -> dict:
    """Per-field metadata map (description / pii / allowed_values /
    min_value / max_value ... — reference ``schemas/README.md`` conventions)."""
    f: StructField = schema[column]
    return dict(f.metadata or {})


# -- schema evolution (reference policy: schemas/README.md "Schema
# Evolution" + docs/08-schema-governance.md:389-418 — additive-nullable
# and widening changes in place; anything else needs a new vN file) -----

_WIDENINGS = {
    ("integer", "long"),
    ("float", "double"),
    ("integer", "double"),
    ("date", "timestamp"),
}


def _is_widening(old, new) -> bool:
    if old.typeName() == "decimal" and new.typeName() == "decimal":
        return (
            new.precision >= old.precision
            and new.scale >= old.scale
            and new.precision - new.scale >= old.precision - old.scale
        )
    return (old.typeName(), new.typeName()) in _WIDENINGS


def check_evolution(old: StructType, new: StructType) -> list[str]:
    """Return the list of BREAKING changes from ``old`` to ``new``
    (empty list = compatible in place). Compatible: adding a nullable
    column, widening a type, relaxing nullability. Breaking: dropping or
    renaming a column, narrowing/retyping, adding a NOT-NULL column,
    tightening nullability."""
    breaking: list[str] = []
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}

    for name, f in old_fields.items():
        if name not in new_fields:
            breaking.append(f"dropped column: {name}")
            continue
        nf = new_fields[name]
        if nf.dataType != f.dataType and not _is_widening(f.dataType, nf.dataType):
            breaking.append(
                f"type change for {name}: "
                f"{f.dataType.simpleString()} -> {nf.dataType.simpleString()}"
            )
        if f.nullable and not nf.nullable:
            breaking.append(f"nullability tightened for {name}")
    for name, nf in new_fields.items():
        if name not in old_fields and not nf.nullable:
            breaking.append(f"added NOT NULL column: {name}")
    return breaking


def evolve(
    registry: SchemaRegistry,
    domain: str,
    dataset: str,
    new_schema: StructType,
) -> tuple[str, bool]:
    """Registry-gated evolution: a compatible change overwrites the
    latest version in place; a breaking change writes the next vN.
    Returns (version_written, was_breaking)."""
    try:
        latest = registry.latest_version(domain, dataset)
    except SchemaNotFoundError:
        registry.register(domain, dataset, "v1", new_schema)
        return "v1", False
    old = registry.get_schema(domain, dataset, latest)
    breaking = check_evolution(old, new_schema)
    if breaking:
        next_v = f"v{int(latest[1:]) + 1}"
        registry.register(domain, dataset, next_v, new_schema)
        return next_v, True
    registry.register(domain, dataset, latest, new_schema)
    return latest, False
