"""bench.py supervisor: probe/fallback plumbing, no accelerator needed.

The supervisor wraps the measurement in a watchdog subprocess chain
(liveness probe -> accelerator attempt -> degraded CPU fallback).  These
tests drive ``supervise()`` against a mocked ``subprocess.run`` and pin
the decision ladder: probe timeouts, env overrides, and which attempt
each outcome leads to.  The probe default must stay wide enough for a
healthy-but-cold relay (first contact after a long idle measured 122.8 s,
results/tpu_r16.jsonl) — a too-tight probe records the degraded CPU
fallback on a working backend.
"""

import importlib.util
import json
import pathlib
import subprocess
import sys

import pytest

_BENCH_PY = str(pathlib.Path(__file__).resolve().parents[1] / "bench.py")

_OK_PROBE = json.dumps({"probe": "ok", "backend": "axon"})
_RESULT = json.dumps(
    {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0}
)


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod_under_test", _BENCH_PY
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["benchmod_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


class _FakeProc:
    def __init__(self, stdout):
        self.stdout = stdout
        self.stderr = ""


def _run_supervise(bench, monkeypatch, script):
    """Run supervise() with subprocess.run scripted; return the call log."""
    calls = []
    it = iter(script)

    def fake_run(argv, env=None, capture_output=None, text=None,
                 timeout=None):
        calls.append(
            {
                "probe": bool(env.get("XMT_BENCH_PROBE")),
                "cpu": bool(env.get("XMT_FORCE_CPU")),
                "timeout": timeout,
            }
        )
        action = next(it)
        if action == "TIMEOUT":
            raise subprocess.TimeoutExpired(argv, timeout)
        return _FakeProc(action)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr("time.sleep", lambda s: None)
    bench.supervise()
    return calls


class TestSupervisorLadder:
    def test_healthy_relay_runs_accelerator_attempt(
        self, bench, monkeypatch, capsys
    ):
        monkeypatch.delenv("XMT_BENCH_PROBE_TIMEOUT_S", raising=False)
        calls = _run_supervise(bench, monkeypatch, [_OK_PROBE, _RESULT])
        assert calls[0]["probe"] and not calls[0]["cpu"]
        # Cold-relay first contact measured at 122.8 s: the probe window
        # must comfortably cover it.
        assert calls[0]["timeout"] >= 240
        assert calls[1] == {"probe": False, "cpu": False, "timeout": 700}
        out = capsys.readouterr().out.strip()
        assert json.loads(out)["value"] == 1.0

    def test_probe_timeout_env_override(self, bench, monkeypatch, capsys):
        monkeypatch.setenv("XMT_BENCH_PROBE_TIMEOUT_S", "7")
        calls = _run_supervise(bench, monkeypatch, [_OK_PROBE, _RESULT])
        assert calls[0]["timeout"] == 7
        capsys.readouterr()

    def test_attempt_timeout_env_override(self, bench, monkeypatch, capsys):
        monkeypatch.setenv("XMT_BENCH_ATTEMPT_TIMEOUT_S", "1234")
        calls = _run_supervise(bench, monkeypatch, [_OK_PROBE, _RESULT])
        assert calls[1]["timeout"] == 1234
        capsys.readouterr()

    def test_wedged_relay_falls_back_to_cpu(self, bench, monkeypatch, capsys):
        monkeypatch.setenv("XMT_BENCH_PROBE_TIMEOUT_S", "7")
        calls = _run_supervise(
            bench, monkeypatch, ["TIMEOUT", "TIMEOUT", _RESULT]
        )
        assert [c["probe"] for c in calls] == [True, True, False]
        assert calls[2]["cpu"] and calls[2]["timeout"] == 420
        rec = json.loads(capsys.readouterr().out.strip())
        # The degraded record must say why and point at committed evidence.
        assert "unreachable at probe" in rec["degraded_reason"]
        assert "BENCH_r03.json" in rec["degraded_reason"]

    def test_cpu_fallback_probe_counts_as_down(
        self, bench, monkeypatch, capsys
    ):
        """A probe answered by the CPU platform is NOT a live accelerator.

        A fast axon-init failure falls through to cpu
        (jax_platforms="axon,cpu"); committing the 700 s attempt to a CPU
        worker burns the deadline on a fit it cannot finish and then
        mislabels the record "exceeded its deadline after a live probe".
        """
        cpu_probe = json.dumps({"probe": "ok", "backend": "cpu"})
        calls = _run_supervise(
            bench, monkeypatch, [cpu_probe, cpu_probe, _RESULT]
        )
        assert [c["probe"] for c in calls] == [True, True, False]
        assert calls[2]["cpu"] and calls[2]["timeout"] == 420
        rec = json.loads(capsys.readouterr().out.strip())
        assert "unreachable at probe" in rec["degraded_reason"]

    def test_live_probe_slow_attempt_is_annotated(
        self, bench, monkeypatch, capsys
    ):
        calls = _run_supervise(
            bench, monkeypatch, [_OK_PROBE, "TIMEOUT", _RESULT]
        )
        assert calls[2]["cpu"]
        rec = json.loads(capsys.readouterr().out.strip())
        assert "exceeded its deadline" in rec["degraded_reason"]

    def test_healthy_record_is_not_annotated(self, bench, monkeypatch, capsys):
        _run_supervise(bench, monkeypatch, [_OK_PROBE, _RESULT])
        rec = json.loads(capsys.readouterr().out.strip())
        assert "degraded_reason" not in rec

    def test_everything_down_reports_zero(self, bench, monkeypatch, capsys):
        monkeypatch.setenv("XMT_BENCH_PROBE_TIMEOUT_S", "7")
        _run_supervise(bench, monkeypatch, ["TIMEOUT", "TIMEOUT", "TIMEOUT"])
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["value"] == 0.0 and rec["fallback"] is True
        assert "degraded_reason" in rec

    def test_probe_worker_reports_ok_on_cpu(self):
        """End-to-end probe worker subprocess on the CPU backend."""
        import os

        env = dict(
            os.environ,
            XMT_BENCH_PROBE="1",
            XMT_BENCH_WORKER="1",
            JAX_PLATFORMS="cpu",
            XMT_FORCE_CPU="1",
            PALLAS_AXON_POOL_IPS="",
        )
        proc = subprocess.run(
            [sys.executable, _BENCH_PY],
            env=env,
            capture_output=True,
            text=True,
            timeout=180,
        )
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec == {"probe": "ok", "backend": "cpu"}
