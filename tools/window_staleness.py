"""Driver-sample staleness audit: last green round per registry query.

Reads every CORRECTNESS_r*.json next to the repo root plus the current
registry, and reports (a) queries whose most recent green driver row is
older than a threshold round, (b) queries never sampled, (c) queries
red at their latest sample. This is the input for building the next
round's ``driver_window.json`` entry (the front-loaded re-verification
schedule) — the r6/r7 verdict goal is "no query's most recent green row
older than N-5".

Usage: python tools/window_staleness.py [--stale-before ROUND]
Prints one JSON blob; exits nonzero if any query is currently red.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    stale_before = None
    args = sys.argv[1:]
    if args and args[0] == "--stale-before":
        stale_before = int(args[1])

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())

    last_green: dict[str, int] = {}
    last_sample: dict[str, int] = {}
    latest_status: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = bool(row.get("rows_match")) and row.get("hash_match") is not False
            last_sample[name] = max(rnd, last_sample.get(name, 0))
            if last_sample[name] == rnd:
                latest_status[name] = ok
            if ok:
                last_green[name] = max(rnd, last_green.get(name, 0))

    never_sampled = sorted(n for n in names if n not in last_sample)
    currently_red = sorted(
        n for n in names if n in latest_status and not latest_status[n]
    )
    rounds = sorted({r for r in last_green.values()})
    # Newest round comes from *samples*, not greens: a newest round whose
    # sampled rows were all red must still advance the staleness cutoff
    # (ADVICE r8 — otherwise an all-red round freezes the cutoff).
    newest = max(last_sample.values()) if last_sample else 0
    cutoff = stale_before if stale_before is not None else newest - 4
    stale = sorted(
        (n, last_green[n]) for n in names if n in last_green and last_green[n] < cutoff
    )
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_window

    out = {
        "newest_sampled_round": newest,
        "stale_cutoff_round": cutoff,
        "n_registry": len(names),
        "never_sampled": never_sampled,
        "currently_red": currently_red,
        "stale": [{"query": n, "last_green": r} for n, r in stale],
        "last_green_histogram": {
            str(r): sum(1 for v in last_green.values() if v == r) for r in rounds
        },
        # does the 50-slot budget absorb the must-sample load for the
        # next two auto-composed rounds? (VERDICT r9 stretch #8)
        "headroom": make_window.headroom(names),
    }
    print(json.dumps(out, indent=1))
    if currently_red:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
