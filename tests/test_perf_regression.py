"""Perf regression guards (xslow, chip-gated) — VERDICT r3 #4.

The framework's differentiator is performance, yet through round 3 the
PERF.md bands (train ~3,200 img/s/chip, fused-GGNN >= masked, ViT stream
>= per-block) were point measurements: a refactor that quietly cost 10%
failed nothing.  These tests re-measure on the LIVE chip and fail when:

  * train throughput drops >7% below the recorded band,
  * the fused Pallas GGNN propagate loses to the masked XLA path,
  * the ViT stream stack loses to the per-block kernel path.

Mechanics: the test process itself is pinned to CPU (conftest), so each
guard spawns a subprocess with the CPU-forcing env stripped; the
subprocess claims the TPU tunnel exactly as bench.py does.  Skipped
(not failed) when no TPU is reachable — these guards are for the chip
rig; run `pytest -m xslow tests/test_perf_regression.py` there.

Bands cite PERF.md (r3-final): train 3,201-3,220 img/s/chip at the
parity config; GGNN masked ~13.4 ms vs fused ~12.0 ms (B=1536);
ViT stream ~84 ms/step win vs per-block at the L/14 parity shape.
Thresholds leave the tunnel's measured ±10% kernel-timing jitter
(verify-skill r6 note) outside the failure region for the ratio guards
by requiring only >= 1.0.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.xslow, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the PERF.md train band (img/s/chip) and the allowed regression
TRAIN_BAND_IMG_S = 3201.0
TRAIN_REGRESSION_FRACTION = 0.07


def _chip_env() -> dict:
    """Env for a subprocess that should see the real TPU, not the
    conftest's CPU forcing."""
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        env.pop(k, None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        t for t in flags.split()
        if not t.startswith("--xla_force_host_platform_device_count"))
    return env


def _chip_reachable() -> bool:
    probe = ("import jax; import sys; "
             "sys.exit(0 if jax.default_backend() == 'tpu' else 3)")
    try:
        p = subprocess.run([sys.executable, "-c", probe], cwd=REPO,
                           env=_chip_env(), capture_output=True,
                           timeout=300)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


@pytest.fixture(scope="module")
def chip():
    if os.environ.get("SRTPU_PERF_GUARD", "1") == "0":
        pytest.skip("SRTPU_PERF_GUARD=0")
    if not _chip_reachable():
        pytest.skip("no TPU reachable from this host")


def _last_json_line(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    raise AssertionError(f"no JSON line in output:\n{out[-2000:]}")


def test_train_throughput_band(chip):
    env = _chip_env()
    env["BENCH_SECONDARY"] = "0"        # train guard only — keep it tight
    p = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, p.stderr[-2000:]
    rec = _last_json_line(p.stdout)
    assert rec.get("value") is not None, rec
    floor = TRAIN_BAND_IMG_S * (1.0 - TRAIN_REGRESSION_FRACTION)
    assert rec["value"] >= floor, (
        f"train throughput regressed: {rec['value']:.1f} img/s/chip < "
        f"{floor:.1f} (band {TRAIN_BAND_IMG_S}, -{TRAIN_REGRESSION_FRACTION:.0%} "
        f"allowed) — see PERF.md")


def test_kernel_ratios(chip):
    p = subprocess.run([sys.executable, "tools/perf_guard.py"], cwd=REPO,
                       env=_chip_env(), capture_output=True, text=True,
                       timeout=1500)
    assert p.returncode == 0, p.stderr[-2000:]
    rec = _last_json_line(p.stdout)
    assert rec["ggnn_ratio"] >= 1.0, (
        f"fused Pallas GGNN lost to the masked XLA path: "
        f"{rec['ggnn_pallas_ms']} ms vs {rec['ggnn_masked_ms']} ms — "
        f"the kernel no longer pays for itself (PERF.md band: 12.0 vs "
        f"13.4 ms)")
    assert rec["vit_ratio"] >= 1.0, (
        f"ViT stream stack lost to the per-block path: "
        f"{rec['vit_stream_ms']} ms vs {rec['vit_block_ms']} ms "
        f"(PERF.md: the stream stack exists because it wins)")
