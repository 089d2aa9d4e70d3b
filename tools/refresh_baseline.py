"""Min-merge BENCH_BASELINE.json from the latest bench_queries.json.

Baseline policy: per-query minimum of (existing baseline, latest run) —
the baseline tracks the best observed time per query so the bench's
regression guard compares against known-good, not against a possibly
noisy previous round. Queries new in the latest run enter at their
first measured time; queries removed from the registry are dropped.

Usage: python tools/refresh_baseline.py
       python tools/refresh_baseline.py --reset name ... --reason "why"

``--reset``: take the named queries' times from the latest run INSTEAD
of min-merging — for when a query's SEMANTICS changed and the old min
belongs to a different computation (approx_sketches' r1–r3 min predates
the self-validating exact-grading pass, so min-merging pinned the
sketch-only cost as the bar forever).

``--reason``: REQUIRED with ``--reset``. Every reset is appended to
``BASELINE_RESETS.json`` (query, reason, old/new values, bench sf) —
the audit trail ``tests/test_baseline_guard.py`` checks, so a baseline
entry can never be raised without a named, committed justification.
A reset without a reason is exactly the laundering path the guard
exists to close; the tool refuses it.

``--refound run1.json run2.json [run3.json ...] --reason "why"``:
REPLACE the whole baseline with the per-query MEDIAN of the given
bench_queries.json runs (each value is already that run's
min-of-REPS). Motivation (r7 drift attribution, SCALE.md): the
min-merge floor is the luckiest scheduling window ever observed —
isolated re-runs of sub-second queries sit 1.4–2.2× above their
historical minima even on a quiet host, so the 2× regression gate
drifts toward measuring host luck. A median-of-mins floor from one
quiet session is reproducible. Every query whose floor RISES gets its
own BASELINE_RESETS.json entry (shared reason, ``refound: true``,
``n_samples``) so the raise-requires-audit guard stays intact.

Refound guardrails (ADVICE r8): the tool REFUSES when the run set would
drop baseline entries (queries absent from every run — their gates
would silently vanish; ``--allow-dropped`` overrides) or when a floor
would rise >2x its historical value (``--allow-large-raises``
overrides; such entries are marked ``large_raise`` in the audit).
Queries backed by a single observation are listed as
``single_sample`` in the summary.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _append_audit(entries: list[dict]) -> None:
    audit_path = os.path.join(REPO, "BASELINE_RESETS.json")
    audit = []
    if os.path.exists(audit_path):
        with open(audit_path) as f:
            audit = json.load(f)
    audit.extend(entries)
    with open(audit_path, "w") as f:
        json.dump(audit, f, indent=1)


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def _refound(run_files: list[str], reason: str, allow_flags: set[str]) -> None:
    runs = []
    for p in run_files:
        with open(p) as f:
            runs.append(json.load(f))
    sfs = {r["sf"] for r in runs}
    if len(sfs) != 1:
        raise SystemExit(f"--refound runs span multiple sf values: {sorted(sfs)}")
    sf = sfs.pop()
    names = set().union(*(r["queries"] for r in runs))
    merged = {
        n: round(_median([r["queries"][n] for r in runs if n in r["queries"]]), 4)
        for n in sorted(names)
    }
    # ADVICE r8: a refound from a stale/partial run set must not
    # silently remove gates or found a "median" on one observation.
    n_samples = {
        n: sum(1 for r in runs if n in r["queries"]) for n in sorted(names)
    }
    single_sample = sorted(n for n, c in n_samples.items() if c < 2)
    ph_names = set().union(*(r.get("phases", {}) for r in runs))
    phases = {
        p: round(_median([r["phases"][p] for r in runs if p in r.get("phases", {})]), 4)
        for p in sorted(ph_names)
    }
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    old_q: dict = {}
    if os.path.exists(base_path):
        with open(base_path) as f:
            prev = json.load(f)
        if prev.get("sf") == sf:
            old_q = prev.get("queries", {})
    raised = sorted(
        n for n, v in merged.items() if n in old_q and v > old_q[n] + 1e-9
    )
    dropped = sorted(set(old_q) - set(merged))
    if dropped and "--allow-dropped" not in allow_flags:
        raise SystemExit(
            f"--refound would DROP {len(dropped)} baseline entries absent "
            f"from every supplied run (their regression gates vanish): "
            f"{dropped}. Re-run with --allow-dropped to confirm, or supply "
            "runs covering the full registry."
        )
    # A raise beyond 2x of the historical floor widens the effective
    # tolerance (floor x gate) past 4x of best-known — demand explicit
    # acknowledgment rather than hiding it in a shared reason string.
    large_raises = {
        n: round(merged[n] / old_q[n], 2)
        for n in raised
        if old_q[n] > 0 and merged[n] > 2.0 * old_q[n]
    }
    if large_raises and "--allow-large-raises" not in allow_flags:
        raise SystemExit(
            f"--refound raises {len(large_raises)} floors by >2x "
            f"{large_raises}; re-run with --allow-large-raises if the old "
            "minima are genuinely unreproducible (the audit will mark them)."
        )
    _append_audit(
        [
            {
                "query": n,
                "reason": reason,
                "old": old_q[n],
                "new": merged[n],
                "sf": sf,
                "refound": True,
                "n_samples": n_samples[n],
                **({"large_raise": True} if n in large_raises else {}),
            }
            for n in raised
        ]
    )
    with open(base_path, "w") as f:
        json.dump({"sf": sf, "queries": merged, "phases": phases}, f, indent=1)
    print(
        json.dumps(
            {
                "refound": True,
                "n_runs": len(runs),
                "n_queries": len(merged),
                "n_raised": len(raised),
                "n_lowered": sum(
                    1 for n, v in merged.items() if n in old_q and v < old_q[n] - 1e-9
                ),
                "dropped": dropped,
                "single_sample": single_sample,
                "large_raises": large_raises,
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    reset: set[str] = set()
    reason = None
    if args and args[0] == "--refound":
        rest = args[1:]
        allow_flags = {
            a for a in rest if a in ("--allow-dropped", "--allow-large-raises")
        }
        rest = [a for a in rest if a not in allow_flags]
        if "--reason" not in rest:
            raise SystemExit(
                '--refound requires --reason "<why the floor is re-founded>"; '
                "the raises are recorded in BASELINE_RESETS.json"
            )
        i = rest.index("--reason")
        reason = " ".join(rest[i + 1 :]).strip()
        run_files = rest[:i]
        if len(run_files) < 2 or not reason:
            raise SystemExit(
                "--refound needs >=2 bench_queries.json run files and a "
                "non-empty --reason"
            )
        _refound(run_files, reason, allow_flags)
        return
    if args:
        # strict: a transposed or misspelled invocation must fail loudly,
        # not silently min-merge while the operator believes a stale
        # entry was discarded.
        if args[0] != "--reset" or len(args) < 2:
            raise SystemExit(
                f"unrecognized arguments {args!r}; usage: "
                'refresh_baseline.py [--reset name ... --reason "why"]'
            )
        rest = args[1:]
        if "--reason" in rest:
            i = rest.index("--reason")
            reason = " ".join(rest[i + 1 :]).strip()
            rest = rest[:i]
        reset = set(rest)
        if not reset:
            raise SystemExit("--reset given with no query names")
        if not reason:
            raise SystemExit(
                "--reset requires --reason \"<why the old min no longer "
                "applies>\"; the reset is recorded in BASELINE_RESETS.json"
            )
    with open(os.path.join(REPO, "bench_queries.json")) as f:
        latest = json.load(f)
    unknown = reset - set(latest["queries"])
    if unknown:
        raise SystemExit(
            f"--reset names not present in the latest bench run: {sorted(unknown)}"
        )
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    base = {"sf": latest["sf"], "queries": {}, "phases": {}}
    if os.path.exists(base_path):
        with open(base_path) as f:
            prev = json.load(f)
        if prev.get("sf") == latest["sf"]:
            base = prev
    merged = {
        name: round(
            dt if name in reset else min(dt, base["queries"].get(name, dt)), 4
        )
        for name, dt in latest["queries"].items()
    }
    phases = {
        ph: round(min(dt, base.get("phases", {}).get(ph, dt)), 4)
        for ph, dt in latest["phases"].items()
    }
    dropped = sorted(set(base["queries"]) - set(merged))
    if reset:
        _append_audit(
            [
                {
                    "query": name,
                    "reason": reason,
                    "old": base["queries"].get(name),
                    "new": merged[name],
                    "sf": latest["sf"],
                }
                for name in sorted(reset)
            ]
        )
    with open(base_path, "w") as f:
        json.dump({"sf": latest["sf"], "queries": merged, "phases": phases}, f, indent=1)
    print(
        json.dumps(
            {
                "n_queries": len(merged),
                "new": sorted(set(merged) - set(base["queries"])),
                "dropped": dropped,
                "reset": sorted(reset & set(merged)),
            }
        )
    )


if __name__ == "__main__":
    main()
