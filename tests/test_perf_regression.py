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

Bands cite PERF.md.  r5 re-methodology (VERDICT r4 weak #2): the kernel
A/B now measures DEVICE time via tools/perf_guard.py's scan-slope
harness (K kernel iterations inside one jit, two rep counts, slope
cancels the constant tunnel dispatch+sync overhead) — measured
repeatability ~1% (masked read 12.23 then 12.20 ms across processes;
a deliberately 2x-handicapped kernel read 20.79 vs 2x10.49=20.98
expected).  That resolution makes real margins possible: the healthy
GGNN ratio band is ~1.17, the hard floor 1.05 sits 11 sigma of jitter
below it, and a genuine kernel regression to parity (ratio 1.0) FAILS
instead of coin-flipping.  Per-kernel sanity bounds catch methodology
breakage (a slope near 0 or wildly off-band means the harness, not the
kernel, broke).
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


# device-time bands measured r5 with the scan-slope harness (PERF.md r5):
# GGNN fused 10.49 ms vs masked 12.23 ms (ratio 1.166, ~1% jitter).
# Floors sit far above measurement noise and strictly below the healthy
# band, so a pass is meaningful and a fail is a real regression.
GGNN_RATIO_FLOOR = 1.05
VIT_RATIO_FLOOR = 1.05    # healthy band ~1.19 (stream 46.99 ms vs
#                           block 55.74 ms, r5 slope harness)


def test_kernel_ratios(chip):
    p = subprocess.run([sys.executable, "tools/perf_guard.py"], cwd=REPO,
                       env=_chip_env(), capture_output=True, text=True,
                       timeout=2400)
    assert p.returncode == 0, p.stderr[-2000:]
    rec = _last_json_line(p.stdout)
    # methodology sanity: per-kernel DEVICE times in a plausible absolute
    # band (the old per-call-synced harness read ~76 ms for a 12 ms
    # kernel; a broken slope would read near 0 or tunnel-sized numbers)
    assert 4.0 < rec["ggnn_pallas_ms"] < 40.0, rec
    assert 4.0 < rec["ggnn_masked_ms"] < 40.0, rec
    assert rec["ggnn_ratio"] >= GGNN_RATIO_FLOOR, (
        f"fused Pallas GGNN no longer clears the masked XLA path by the "
        f"recorded margin: {rec['ggnn_pallas_ms']} ms vs "
        f"{rec['ggnn_masked_ms']} ms, ratio {rec['ggnn_ratio']} < "
        f"{GGNN_RATIO_FLOOR} (healthy band ~1.17, jitter ~1% — this is a "
        f"real regression, see PERF.md r5)")
    assert rec["vit_ratio"] >= VIT_RATIO_FLOOR, (
        f"ViT stream stack lost its margin over the per-block path: "
        f"{rec['vit_stream_ms']} ms vs {rec['vit_block_ms']} ms, ratio "
        f"{rec['vit_ratio']} < {VIT_RATIO_FLOOR} (PERF.md: the stream "
        f"stack exists because it wins)")
