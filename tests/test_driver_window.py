"""The driver samples the first ~50 registry entries per round; the
per-round window lists live in driver_window.json (append-only audit
trail). These tests pin the contract between that file and registry().
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _windows():
    with open(os.path.join(REPO, "driver_window.json")) as fh:
        return json.load(fh)["rounds"]


def test_newest_window_is_exactly_50_and_leads_the_registry():
    """The r6 lesson: a window longer than 50 silently drops its tail
    off the driver's sample. The newest round's list must be exactly 50
    unique names and must be the registry's first 50 entries, in order."""
    rounds = _windows()
    newest = max(rounds, key=lambda r: r["round"])
    names = newest["names"]
    assert len(names) == 50
    assert len(set(names)) == 50
    ordered = list(entry_mod.registry())
    assert ordered[:50] == names


def test_every_window_name_resolves_and_registry_is_complete():
    """Every name in every round's window must still exist in the
    registry (a rename would silently un-gate a query), and the
    reordering must be a permutation — nothing dropped or duplicated."""
    reg = entry_mod.registry()
    for rnd in _windows():
        missing = [n for n in rnd["names"] if n not in reg]
        assert not missing, f"round {rnd['round']}: {missing}"
    assert len(reg) == len(set(reg))


def test_windows_are_per_round_and_monotonic():
    rounds = [r["round"] for r in _windows()]
    assert rounds == sorted(rounds)
    assert len(rounds) == len(set(rounds))
