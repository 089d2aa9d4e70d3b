"""Baseline-reset guard (VERDICT r6 #7): the min-merge bench baseline
can only move DOWN, except through an explicitly annotated reset —
``refresh_baseline.py --reset ... --reason ...`` appends to
``BASELINE_RESETS.json``, and these tests fail any working tree where a
baseline entry was raised without a matching audit record. Laundering a
regression through a reset now requires editing the audit file, which
is a visible, reviewable diff."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    with open(os.path.join(REPO, path)) as f:
        return json.load(f)


def _head_version(path):
    try:
        out = subprocess.run(
            ["git", "show", f"HEAD:{path}"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except Exception:
        return None
    if out.returncode != 0:
        return None
    return json.loads(out.stdout)


def test_baseline_raises_require_audit_entry():
    base = _load("BENCH_BASELINE.json")
    head = _head_version("BENCH_BASELINE.json")
    if head is None or head.get("sf") != base.get("sf"):
        pytest.skip("no committed baseline at the same sf to compare against")
    audit = []
    if os.path.exists(os.path.join(REPO, "BASELINE_RESETS.json")):
        audit = _load("BASELINE_RESETS.json")
    annotated = {r["query"] for r in audit}
    raised = sorted(
        q
        for q, v in base["queries"].items()
        if q in head["queries"] and v > head["queries"][q] + 1e-9
    )
    unannotated = [q for q in raised if q not in annotated]
    assert not unannotated, (
        "baseline entries raised without a BASELINE_RESETS.json record "
        f"(run refresh_baseline.py --reset ... --reason ...): {unannotated}"
    )


def test_audit_entries_are_substantive():
    path = os.path.join(REPO, "BASELINE_RESETS.json")
    if not os.path.exists(path):
        pytest.skip("no resets recorded yet")
    audit = _load("BASELINE_RESETS.json")
    assert isinstance(audit, list)
    for entry in audit:
        assert entry.get("query"), entry
        # a one-liner like "slow" is not a justification; demand a real
        # sentence naming what changed
        assert len(entry.get("reason", "")) >= 40, (
            f"reset of {entry.get('query')} lacks a substantive reason"
        )
        assert "new" in entry and entry["new"] is not None, entry


def test_refound_takes_medians_and_audits_raises(tmp_path):
    """--refound replaces the floor with per-query medians of the given
    runs; queries whose floor RISES get audit entries (refound: true),
    and the mode refuses to run without --reason."""
    import shutil

    runs = []
    for i, vals in enumerate([{"a": 1.0, "b": 2.0}, {"a": 1.2, "b": 1.8}, {"a": 1.1, "b": 2.2}]):
        p = tmp_path / f"r{i}.json"
        p.write_text(json.dumps({"sf": 0.1, "queries": vals, "phases": {"import": 0.1}}))
        runs.append(str(p))
    sandbox = tmp_path / "repo"
    (sandbox / "tools").mkdir(parents=True)
    shutil.copy(os.path.join(REPO, "tools", "refresh_baseline.py"), sandbox / "tools")
    (sandbox / "BENCH_BASELINE.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 0.5, "b": 3.0}, "phases": {}})
    )
    tool = str(sandbox / "tools" / "refresh_baseline.py")
    reason = [
        "--reason",
        "median-of-mins re-founding: the min-merge floor was extreme-value biased",
    ]
    # a: 0.5 -> median 1.1 is a 2.2x raise — the ADVICE-r8 guardrail
    # must refuse without explicit acknowledgment...
    out0 = subprocess.run(
        [sys.executable, tool, "--refound", *runs, *reason],
        capture_output=True, text=True, timeout=60,
    )
    assert out0.returncode != 0
    assert "large" in (out0.stderr + out0.stdout)
    out = subprocess.run(
        [sys.executable, tool, "--refound", *runs, "--allow-large-raises", *reason],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    base = json.loads((sandbox / "BENCH_BASELINE.json").read_text())
    assert base["queries"] == {"a": 1.1, "b": 2.0}
    audit = json.loads((sandbox / "BASELINE_RESETS.json").read_text())
    assert [e["query"] for e in audit] == ["a"]  # only the raised floor
    assert audit[0]["refound"] is True
    assert audit[0]["large_raise"] is True
    assert audit[0]["n_samples"] == 3
    # a run set missing a baselined query must refuse (its gate would
    # silently vanish) unless --allow-dropped is given
    (sandbox / "BENCH_BASELINE.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.1, "b": 2.0, "gone": 9.9}, "phases": {}})
    )
    out3 = subprocess.run(
        [sys.executable, tool, "--refound", *runs, *reason],
        capture_output=True, text=True, timeout=60,
    )
    assert out3.returncode != 0
    assert "gone" in (out3.stderr + out3.stdout)
    out4 = subprocess.run(
        [sys.executable, tool, "--refound", *runs, "--allow-dropped", *reason],
        capture_output=True, text=True, timeout=60,
    )
    assert out4.returncode == 0, out4.stderr
    summary = json.loads(out4.stdout)
    assert summary["dropped"] == ["gone"]
    out2 = subprocess.run(
        [sys.executable, tool, "--refound", *runs],
        capture_output=True, text=True, timeout=60,
    )
    assert out2.returncode != 0
    assert "--reason" in (out2.stderr + out2.stdout)


def test_refresh_tool_refuses_reset_without_reason():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "refresh_baseline.py"),
         "--reset", "approx_sketches"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode != 0
    assert "--reason" in (out.stderr + out.stdout)
