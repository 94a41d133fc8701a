"""Unit tests for bench.py's backend-recovery mechanics (no TPU needed).

The end-to-end bench contract is exercised on the real device by
tests/test_tpu_smoke.py::test_bench_contract_quick; these tests cover the
host-side wedge handling: a hung axon worker blocks device init
indefinitely, so bench probes the backend in a timed subprocess and waits
(bounded) for recovery before starting the measured run.
"""
import importlib.util
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_for_backend_returns_on_success(bench_mod, monkeypatch):
    calls = []

    def fake_run(*a, **k):
        calls.append(a)
        return subprocess.CompletedProcess(a, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench_mod._wait_for_backend(10.0)
    assert len(calls) == 1


def test_wait_for_backend_retries_then_succeeds(bench_mod, monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, **k):
        state["n"] += 1
        if state["n"] < 3:
            raise subprocess.TimeoutExpired(cmd, k.get("timeout", 0))
        return subprocess.CompletedProcess(cmd, 0)

    slept = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench_mod.time, "sleep", slept.append)
    bench_mod._wait_for_backend(3600.0)
    assert state["n"] == 3
    assert slept == [120, 120]


def test_wait_for_backend_gives_up_at_deadline(bench_mod, monkeypatch, capsys):
    def fake_run(cmd, **k):
        raise subprocess.CalledProcessError(1, cmd)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    # deadline in the past relative to the first failure -> exactly one
    # probe, then proceed (main() surfaces the real error)
    bench_mod._wait_for_backend(0.0)
    err = capsys.readouterr().err
    assert "never succeeded" in err


def test_quick_mode_caps_deadline(bench_mod, monkeypatch):
    """TCT_BENCH_QUICK children run under the smoke tier's own timeout;
    the probe loop must stay well inside it."""
    monkeypatch.setenv("TCT_BENCH_QUICK", "1")
    monkeypatch.delenv("TCT_BENCH_BACKEND_DEADLINE", raising=False)

    seen = {}

    def fake_run(cmd, **k):
        seen["timeout"] = k.get("timeout")
        return subprocess.CompletedProcess(cmd, 0)

    t = {"now": 0.0}
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench_mod.time, "time", lambda: t["now"])
    bench_mod._wait_for_backend(1500.0)
    assert seen["timeout"] == 300
