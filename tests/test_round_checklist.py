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
