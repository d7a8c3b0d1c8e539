"""Pin the driver-window rotation invariant (round-7 verdict task #8).

The build driver's correctness sweep hashes only the FIRST 50 entries of
``__spark_entry__.queries()``.  ``tools/rotate_registry.py`` computes,
from every ``CORRECTNESS_r*.json``, which queries most need a fresh hash
(never-hashed, latest-RED, then least-recently-hashed).  This test fails
the suite whenever the registry order drifts out of that priority order —
e.g. a new query appended at the end instead of inside the window.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from rotate_registry import (  # noqa: E402
    WINDOW,
    check_window,
    load_hash_history,
    priority_order,
)

import __spark_entry__ as entry  # noqa: E402


def test_first_window_contains_every_priority_query():
    order = list(entry.queries().keys())
    violations = check_window(order, load_hash_history())
    assert not violations, "\n".join(violations)


def test_red_and_never_hashed_lead_the_window():
    """Tier-0 queries (never hashed, or RED in their latest sweep) must all
    sit inside the window — they are the reason the rotation exists."""
    order = list(entry.queries().keys())
    history = load_hash_history()
    window = set(order[:WINDOW])
    for name in order:
        hist = history.get(name)
        if hist is None or not hist[1]:
            assert name in window, (
                f"{name} has no green driver hash but is outside the "
                f"first {WINDOW} registry entries"
            )


def test_priority_order_is_stable_permutation():
    order = list(entry.queries().keys())
    ranked = priority_order(order, load_hash_history())
    assert sorted(ranked) == sorted(order)
    assert len(set(ranked)) == len(ranked)
