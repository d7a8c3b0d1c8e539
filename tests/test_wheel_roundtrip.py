"""Wheel round-trip for the classpath-style schema registry (verdict #7).

The reference resolves schemas from the CLASSPATH in containerized
deploys (``schema/SchemaRegistry.scala:58-69``); the Python analogue is
``SchemaRegistry(package="lakehouse_ingestion_spark.schemas")`` reading
``importlib.resources`` out of the INSTALLED artifact. The unit tests
exercise that against the in-tree package; this test exercises the real
deployment shape: build the wheel, pip-install it into an empty target
dir, and load a schema from the installed copy in a subprocess whose
only source of the package is that install.

The wheel is assembled with the stdlib ``zipfile`` (PEP 427 layout:
package tree + ``dist-info/{METADATA,WHEEL,RECORD}``) because the
sandbox has no ``wheel``/``build`` backend for ``pip wheel`` to drive —
pip's INSTALL path (the part deployment exercises) needs none of them.
"""

from __future__ import annotations

import json
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "lakehouse_ingestion_spark"

DIST = "lakehouse_ingestion_spark"
VERSION = "0.1.0"


def _build_wheel(out_dir: Path) -> Path:
    whl = out_dir / f"{DIST}-{VERSION}-py3-none-any.whl"
    dist_info = f"{DIST}-{VERSION}.dist-info"
    records: list[str] = []
    with zipfile.ZipFile(whl, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(PKG.rglob("*")):
            if not f.is_file() or "__pycache__" in f.parts:
                continue
            if f.suffix not in (".py", ".json"):
                continue
            arc = f.relative_to(REPO).as_posix()
            z.write(f, arc)
            records.append(f"{arc},,")
        meta = (
            "Metadata-Version: 2.1\n"
            f"Name: {DIST.replace('_', '-')}\n"
            f"Version: {VERSION}\n"
        )
        wheel_meta = (
            "Wheel-Version: 1.0\n"
            "Generator: test_wheel_roundtrip\n"
            "Root-Is-Purelib: true\n"
            "Tag: py3-none-any\n"
        )
        z.writestr(f"{dist_info}/METADATA", meta)
        records.append(f"{dist_info}/METADATA,,")
        z.writestr(f"{dist_info}/WHEEL", wheel_meta)
        records.append(f"{dist_info}/WHEEL,,")
        records.append(f"{dist_info}/RECORD,,")
        z.writestr(f"{dist_info}/RECORD", "\n".join(records) + "\n")
    return whl


def test_schema_loads_from_installed_wheel(tmp_path):
    whl = _build_wheel(tmp_path)
    site = tmp_path / "site"
    subprocess.run(
        [
            sys.executable,
            "-m",
            "pip",
            "install",
            "--quiet",
            "--no-index",
            "--no-deps",
            "--target",
            str(site),
            str(whl),
        ],
        check=True,
    )
    assert (site / "lakehouse_ingestion_spark" / "schemas").is_dir()
    # resolve from the INSTALLED artifact only: cwd-independent
    # subprocess whose sys.path leads with the install target (the repo
    # checkout is not importable from there)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from lakehouse_ingestion_spark.schema_registry import SchemaRegistry\n"
        "import lakehouse_ingestion_spark\n"
        "assert lakehouse_ingestion_spark.__file__.startswith(sys.argv[1]), "
        "lakehouse_ingestion_spark.__file__\n"
        "r = SchemaRegistry(package='lakehouse_ingestion_spark.schemas')\n"
        "s = r.get_schema('payments', 'transactions')\n"
        "assert r.list_versions('payments', 'transactions') == ['v1']\n"
        "assert ('payments', 'transactions') in r.list_datasets()\n"
        "print(','.join(f.name for f in s.fields))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe, str(site)],
        check=True,
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    fields = out.stdout.strip().split(",")
    assert len(fields) >= 3  # a real struct came back from the artifact


def test_bundled_schemas_match_canonical_registry():
    """lakehouse_ingestion_spark/schemas mirrors schemas_registry/ —
    the canonical human-edited copy; a drift here would ship stale
    schemas inside the wheel."""
    canonical = REPO / "schemas_registry"
    bundled = PKG / "schemas"
    want = {
        p.relative_to(canonical).as_posix()
        for p in canonical.rglob("*.json")
    }
    have = {
        p.relative_to(bundled).as_posix() for p in bundled.rglob("*.json")
    }
    assert want == have, f"missing={want - have} extra={have - want}"
    for rel in want:
        a = json.loads((canonical / rel).read_text())
        b = json.loads((bundled / rel).read_text())
        assert a == b, f"schema drift in {rel}"
