"""Smoke tests for scripts/round_checklist.py (VERDICT r12 ask #5):
the plan, step selection, and status aggregation — NOT the 45-minute
full run, which is the script's production use."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import round_checklist as rc

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "round_checklist.py",
)


def test_dry_run_lists_all_four_steps():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--dry-run"], capture_output=True, text=True
    )
    assert proc.returncode == 0
    for step in ("suite", "driver", "sf1", "bench"):
        assert f"would run {step}" in proc.stdout


def test_dry_run_respects_step_selection():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--dry-run", "bench"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0
    assert "would run bench" in proc.stdout
    assert "would run suite" not in proc.stdout


def test_unknown_step_is_rejected():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "nope"], capture_output=True, text=True
    )
    assert proc.returncode == 2
    assert "unknown steps" in proc.stdout


def test_status_aggregation_exit_codes(monkeypatch):
    # FAIL anywhere -> 1; NOISE without FAIL -> 3; all PASS -> 0
    def fake(status):
        return lambda: (status, "detail")

    for statuses, expected in (
        (("PASS", "PASS"), 0),
        (("PASS", "NOISE"), 3),
        (("NOISE", "FAIL"), 1),
    ):
        monkeypatch.setattr(
            rc,
            "STEPS",
            {f"s{i}": (f"t{i}", fake(s)) for i, s in enumerate(statuses)},
        )
        assert rc.main([]) == expected


# --- bench retry loop (VERDICT r13 ask #6) ---


import json as _json
import subprocess as _subprocess


def _fake_bench_run(payloads):
    """Substitute for rc._run: each call pops the next bench payload."""
    calls = []

    def run(cmd, log_name=None, **kw):
        calls.append(cmd)
        payload = payloads.pop(0)
        return _subprocess.CompletedProcess(
            cmd, returncode=0, stdout=_json.dumps(payload) + "\n", stderr="")

    return run, calls


def test_bench_step_retries_until_qualifying(monkeypatch):
    monkeypatch.setenv("ROUND_CHECKLIST_BENCH_ATTEMPTS", "3")
    monkeypatch.setattr(rc, "_wait_for_calm", lambda *a, **k: True)
    run, calls = _fake_bench_run([
        {"value": 60.0, "qualifies": False, "warm_spread": 0.3},
        {"value": 47.0, "qualifies": True, "warm_spread": 0.03,
         "canary_ratio": 1.0, "steal_pct": 0.001},
    ])
    monkeypatch.setattr(rc, "_run", run)
    status, detail = rc.step_bench()
    assert status == "PASS"
    assert "attempt 2/3" in detail
    assert len(calls) == 2


def test_bench_step_noise_after_bounded_attempts(monkeypatch):
    monkeypatch.setenv("ROUND_CHECKLIST_BENCH_ATTEMPTS", "2")
    monkeypatch.setattr(rc, "_wait_for_calm", lambda *a, **k: False)
    run, calls = _fake_bench_run([
        {"value": 60.0, "qualifies": False, "warm_spread": 0.3},
        {"value": 61.0, "qualifies": False, "warm_spread": 0.25},
    ])
    monkeypatch.setattr(rc, "_run", run)
    status, detail = rc.step_bench()
    assert status == "NOISE"
    assert "no qualifying sitting in 2 attempts" in detail
    assert len(calls) == 2


def test_bench_step_fail_stops_retries(monkeypatch):
    # a broken bench (errors in the payload) is FAIL immediately, not
    # a retryable noise sitting
    monkeypatch.setenv("ROUND_CHECKLIST_BENCH_ATTEMPTS", "3")
    monkeypatch.setattr(rc, "_wait_for_calm", lambda *a, **k: True)
    run, calls = _fake_bench_run([
        {"value": 60.0, "qualifies": False, "errors": {"q1": "boom"}},
        {"value": 47.0, "qualifies": True},
    ])
    monkeypatch.setattr(rc, "_run", run)
    status, detail = rc.step_bench()
    assert status == "FAIL"
    assert len(calls) == 1


def test_steal_under_load_returns_fraction():
    s = rc._steal_under_load(0.3)
    assert s is None or 0.0 <= s <= 1.0
