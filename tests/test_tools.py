"""Gate-tooling tests (no Spark): the bench_trend regression gate
(VERDICT r5 #5 — promoted from FYI to a failing gate) and its
run_gates wiring."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREND = os.path.join(ROOT, "tools", "bench_trend.py")


def _history(tmp_path, latest_q_slow: float):
    """Two same-(sf,cpus) records; q_slow's min is 1.0."""
    recs = [
        {"sf": 0.1, "_cpus": 16, "queries": {"q_ok": 2.0, "q_slow": 1.0}},
        {"sf": 0.1, "_cpus": 16, "queries": {"q_ok": 2.1, "q_slow": latest_q_slow}},
    ]
    p = tmp_path / "hist.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    return str(p)


def _run(args):
    return subprocess.run(
        [sys.executable, TREND, *args], capture_output=True, text=True
    )


def test_trend_gate_fails_on_slowed_query(tmp_path):
    """A deliberately-slowed query (latest 3x its historical min)
    fails the gate and is named in the output."""
    hist = _history(tmp_path, 3.0)
    p = _run(["--history", hist, "--gate", "--factor", "2.0"])
    assert p.returncode == 1
    assert "GATE FAIL" in p.stdout and "q_slow" in p.stdout


def test_trend_gate_passes_within_factor(tmp_path):
    hist = _history(tmp_path, 1.9)
    p = _run(["--history", hist, "--gate", "--factor", "2.0"])
    assert p.returncode == 0


def test_trend_gate_respects_exempt_list(tmp_path):
    """The documented flaky list is printed but never gates."""
    hist = _history(tmp_path, 3.0)
    p = _run(["--history", hist, "--gate", "--factor", "2.0",
              "--exempt", "q_slow"])
    assert p.returncode == 0
    assert "exempt" in p.stdout


def test_trend_without_gate_flag_never_fails(tmp_path):
    """Standalone triage use keeps exit 0 (gating is opt-in)."""
    hist = _history(tmp_path, 5.0)
    p = _run(["--history", hist])
    assert p.returncode == 0
    assert "flagged" in p.stdout


def test_trend_single_run_never_gates(tmp_path):
    """One record = no history to regress against: a query seen once
    (a brand-new bench entry) must not gate."""
    rec = {"sf": 0.1, "_cpus": 16, "queries": {"q_new": 9.9}}
    p_hist = tmp_path / "hist.jsonl"
    p_hist.write_text(json.dumps(rec) + "\n")
    p = _run(["--history", str(p_hist), "--gate", "--factor", "2.0"])
    assert p.returncode == 0


def test_run_gates_wires_trend_as_gate():
    """run_gates must invoke bench_trend with --gate + the exempt
    list and record a 'bench_trend' failure on nonzero exit (the
    full chain is a 20-minute run; the gating unit is subprocess-
    tested above, this pins the wiring)."""
    src = open(os.path.join(ROOT, "tools", "run_gates.py")).read()
    assert '"--gate"' in src
    assert "TREND_EXEMPT" in src
    assert 'failures.append("bench_trend")' in src
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_gates", os.path.join(ROOT, "tools", "run_gates.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert "grinch_flat_clusters" in m.TREND_EXEMPT
