"""bench.py claim watchdog: a wedged TPU claim must yield one error
JSON line and a hard exit, never an indefinite hang (the driver runs
bench.py unattended at round end)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_fires_with_error_json():
    code = (
        "import sys, time; sys.path.insert(0, %r); "
        "import bench; bench._claim_watchdog(0.3); time.sleep(30)"
        % REPO)
    for mode, env_extra in (("train", {}), ("serving",
                                            {"BENCH_MODE": "serving"})):
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=60,
                              env={**os.environ, **env_extra})
        assert proc.returncode == 2, (proc.returncode, proc.stderr)
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        assert out["value"] is None
        assert "claim did not complete" in out["error"]
        assert out["metric"] == f"{mode}_images_per_sec_per_chip"


def test_compile_watchdog_names_its_phase():
    # the second deadline (remote compiler wedge, observed 2026-08-20:
    # claim succeeds, then lower+compile makes no progress) reuses the
    # same helper with what="compile+warmup" — the error line must name
    # the phase so a driver log distinguishes the two wedge modes
    code = (
        "import sys, time; sys.path.insert(0, %r); "
        "import bench; bench._claim_watchdog(0.3, what='compile+warmup'); "
        "time.sleep(30)" % REPO)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 2, (proc.returncode, proc.stderr)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] is None
    assert "compile+warmup did not complete" in out["error"]


def test_watchdog_disarms_on_claim():
    code = (
        "import sys, time; sys.path.insert(0, %r); "
        "import bench; ok = bench._claim_watchdog(0.3); ok.set(); "
        "time.sleep(0.6); print('alive')"
        % REPO)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, (proc.returncode, proc.stderr)
    assert proc.stdout.strip() == "alive"
