"""Unit tests for scripts/warm_probe.py's failure isolation (ADVICE
r14): one failing query mid-probe must not abort the run or lose prior
pass timings, and the SparkSession must stop even when a pass raises.
Uses fake sessions/queries — no SparkSession, runs in milliseconds."""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_spec = importlib.util.spec_from_file_location(
    "warm_probe", os.path.join(_REPO, "scripts", "warm_probe.py")
)
wp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(wp)


class _FakeWriter:
    def __init__(self, fail: bool):
        self._fail = fail

    def format(self, _fmt):
        return self

    def mode(self, _mode):
        return self

    def save(self):
        if self._fail:
            raise RuntimeError("boom")


class _FakeFrame:
    def __init__(self, fail: bool):
        self.write = _FakeWriter(fail)


class _FakeSpark:
    def __init__(self):
        self.stopped = False
        self.catalog = types.SimpleNamespace(clearCache=lambda: None)

    def stop(self):
        self.stopped = True


def _run_probe(monkeypatch, capsys, queries, argv_queries, runs=3):
    fake = _FakeSpark()
    monkeypatch.setattr(wp, "get_spark", lambda **_kw: fake)
    monkeypatch.setattr(
        wp, "q", types.SimpleNamespace(register_all=lambda: None, QUERIES=queries)
    )
    monkeypatch.setattr(
        sys,
        "argv",
        ["warm_probe.py", "--queries", argv_queries, "--runs", str(runs),
         "--sf-dir", "/nonexistent"],
    )
    wp.main()
    out = json.loads(capsys.readouterr().out.strip())
    return fake, out


def test_failing_query_does_not_lose_other_timings(monkeypatch, capsys):
    queries = {
        "ok": lambda _s, _d: _FakeFrame(fail=False),
        "bad": lambda _s, _d: _FakeFrame(fail=True),
    }
    fake, out = _run_probe(monkeypatch, capsys, queries, "ok,bad", runs=3)
    assert len(out["probe"]["ok"]) == 3  # every pass kept
    assert out["probe"]["bad"] == []
    assert "bad" in out["errors"] and "RuntimeError: boom" in out["errors"]["bad"]
    assert out["warm_median"]["ok"] is not None
    assert out["warm_median"]["bad"] is None
    assert fake.stopped  # stop in finally


def test_spark_stops_when_probe_body_raises(monkeypatch, capsys):
    # a non-query failure (e.g. clearCache dying) still stops the session
    fake = _FakeSpark()

    def _explode():
        raise OSError("catalog gone")

    fake.catalog = types.SimpleNamespace(clearCache=_explode)
    monkeypatch.setattr(wp, "get_spark", lambda **_kw: fake)
    monkeypatch.setattr(
        wp,
        "q",
        types.SimpleNamespace(
            register_all=lambda: None,
            QUERIES={"ok": lambda _s, _d: _FakeFrame(fail=False)},
        ),
    )
    monkeypatch.setattr(
        sys, "argv", ["warm_probe.py", "--queries", "ok", "--runs", "2"]
    )
    with pytest.raises(OSError):
        wp.main()
    assert fake.stopped


def test_all_clean_probe_has_no_errors_key(monkeypatch, capsys):
    queries = {"ok": lambda _s, _d: _FakeFrame(fail=False)}
    _fake, out = _run_probe(monkeypatch, capsys, queries, "ok", runs=2)
    assert "errors" not in out
    assert len(out["probe"]["ok"]) == 2
