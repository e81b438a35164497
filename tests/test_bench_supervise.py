"""bench.py outage-resilience: the parent/child supervision logic.

Round-4 lesson: a wedged relay burned the whole round's bench record
(0.0 after one 1500-s hang). These tests cover the pure pieces — final
record assembly from partial/complete status, and the preflight probe's
kill-safe timeout — without touching any device.
"""

import json
import subprocess
import sys
import time

import bench


def test_final_record_complete():
    status = {
        "done": True, "phase": "done",
        "detail": {"fused_e2e_ms": 40.0, "batch8_per_invoice_ms": 32.0,
                   "det_960_ms": 25.0, "passes_ms": {"det": [25.0]}},
        "passes": {"det": [25.0]},
    }
    rec = bench._final_record(status, ["+10s preflight ok"], None)
    # headline = best of fused and batch-per-invoice rates
    assert rec["value"] == round(1000.0 / 32.0, 3)
    assert rec["metric"] == "e2e_invoices_per_sec"
    assert "partial" not in rec
    assert "error" not in rec
    assert rec["detail"]["supervise"] == ["+10s preflight ok"]


def test_final_record_partial_with_fused():
    """A wedge after the fused pass still yields a nonzero headline plus
    the partial marker and the supervise history."""
    status = {
        "done": False, "phase": "rec",
        "detail": {"fused_e2e_ms": 50.0, "det_960_ms": 25.0},
        "passes": {"det": [25.0], "fused": [50.0], "rec": [], "batch8": []},
    }
    rec = bench._final_record(status, ["+5s preflight ok", "+700s wedged"],
                              "device wedged mid-run (last phase: rec)")
    assert rec["value"] == 20.0
    assert rec["partial"] is True
    assert "wedged" in rec["error"]
    # raw passes survive into the detail for auditability
    assert rec["detail"]["passes_ms"]["fused"] == [50.0]


def test_final_record_nothing_completed():
    rec = bench._final_record(None, ["+0s preflight wedged"] * 3,
                              "device wedged: no measurement completed")
    assert rec["value"] == 0.0
    assert rec["partial"] is True
    assert rec["vs_baseline"] == 0.0
    assert len(rec["detail"]["supervise"]) == 3


def test_preflight_kills_wedged_probe(monkeypatch):
    """A probe that never returns must be SIGKILLed at the timeout and
    reported as 'wedged' (not hang the parent)."""
    monkeypatch.setattr(bench, "_PROBE_CODE", "import time; time.sleep(600)")
    t0 = time.time()
    assert bench._preflight(1.5) == "wedged"
    assert time.time() - t0 < 10


def test_preflight_detects_absent_backend(monkeypatch):
    monkeypatch.setattr(
        bench, "_PROBE_CODE",
        "raise RuntimeError('Unable to initialize backend: no TPU')")
    assert bench._preflight(30) == "absent"


def test_preflight_detects_cpu_fallback(monkeypatch):
    """A silent CPU fallback is 'absent': benching the CPU would record a
    garbage-but-nonzero number."""
    monkeypatch.setattr(bench, "_PROBE_CODE", "print('PROBE_OK cpu')")
    assert bench._preflight(30) == "absent"


def test_preflight_ok(monkeypatch):
    monkeypatch.setattr(bench, "_PROBE_CODE", "print('PROBE_OK tpu')")
    assert bench._preflight(30) == "ok"


def test_status_written_atomically(tmp_path):
    p = tmp_path / "st.json"
    st = bench._Status(str(p))
    st.record("det_960_ms", 25.0)
    d = json.loads(p.read_text())
    assert d["detail"]["det_960_ms"] == 25.0
    assert d["done"] is False
