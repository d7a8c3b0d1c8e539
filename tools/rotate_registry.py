#!/usr/bin/env python
"""Mechanize the driver-window rotation for ``__spark_entry__.queries()``.

The build driver's per-round correctness sweep hashes only the FIRST
``WINDOW`` (50) entries of ``queries()``; everything after rides on a
prior round's hash.  To keep every query's driver-hash evidence fresh,
each round must front-load:

1. queries that have NEVER been hashed (new this round),
2. queries whose most recent hash was RED (``hash_match`` false or
   ``err`` set) — they need re-verification after a fix,
3. then least-recently-hashed first, until the window is full.

This tool reads every ``CORRECTNESS_r*.json`` at the repo root, computes
each registry query's last-hashed round and verdict, and either

* prints the priority-ordered window proposal (default), or
* ``--check`` exits non-zero unless the CURRENT registry order already
  front-loads the top-``WINDOW`` priority set (the invariant
  ``tests/test_rotation.py`` pins every round).

Priority never reorders *within* a tier: ties keep current registry
order, so the proposal is a stable, minimal shuffle of the dict.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

WINDOW = 50
REPO = Path(__file__).resolve().parent.parent


def load_hash_history(repo: Path = REPO) -> dict[str, tuple[int, bool]]:
    """name -> (last round whose sweep included it, was it green there).

    Green = rows/schema/hash all true and no err. A query appearing in
    multiple rounds keeps the LATEST round's verdict.
    """
    history: dict[str, tuple[int, bool]] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                # hash_match None = weaker rows-only check (no oracle SQL);
                # treat as green — re-running it cannot upgrade the evidence.
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, green)
    return history


def priority_order(
    registry_order: list[str], history: dict[str, tuple[int, bool]]
) -> list[str]:
    """Stable sort: never-hashed & latest-red first (tier 0), then by
    last-hashed round ascending; ties keep current registry order."""
    pos = {name: i for i, name in enumerate(registry_order)}

    def key(name: str) -> tuple[int, int]:
        entry = history.get(name)
        if entry is None or not entry[1]:
            return (0, pos[name])
        return (entry[0], pos[name])

    return sorted(registry_order, key=key)


def check_window(
    registry_order: list[str],
    history: dict[str, tuple[int, bool]],
    window: int = WINDOW,
) -> list[str]:
    """Return the list of violations (empty = invariant holds): every
    query in the top-``window`` priority set must sit inside the first
    ``window`` registry positions."""
    want = set(priority_order(registry_order, history)[:window])
    have = set(registry_order[:window])
    missing = sorted(want - have)
    return [
        f"{name}: priority-window query at registry position "
        f"{registry_order.index(name) + 1} (> {window})"
        for name in missing
    ]


def _registry_order() -> list[str]:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry  # noqa: PLC0415

    return list(entry.queries().keys())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true", help="verify, don't print")
    ap.add_argument("--window", type=int, default=WINDOW)
    args = ap.parse_args()

    order = _registry_order()
    history = load_hash_history()
    if args.check:
        violations = check_window(order, history, args.window)
        for v in violations:
            print(f"VIOLATION {v}")
        print("ROTATION OK" if not violations else f"{len(violations)} violations")
        return 1 if violations else 0

    for name in priority_order(order, history):
        entry = history.get(name)
        if entry is None:
            tag = "never-hashed"
        elif not entry[1]:
            tag = f"RED in r{entry[0]:02d}"
        else:
            tag = f"green r{entry[0]:02d}"
        print(f"{name:28s} {tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
