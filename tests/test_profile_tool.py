"""tools/profile_step.py: trace parsing units + a CPU end-to-end drive."""

import gzip
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_parse_trace_tpu_lanes(tmp_path):
    """TPU-style trace: per-op rows come from the 'XLA Ops' lane only,
    module spans are totalled separately, 'end:' markers are skipped,
    and times divide by the step count."""
    from profile_step import parse_trace

    meta = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 5, "name": "thread_name",
         "args": {"name": "python"}},
    ]
    ops = [
        # 2 steps of a conv fusion: 3 + 5 ms
        {"ph": "X", "pid": 3, "tid": 1, "name": "convolution_fusion.1",
         "ts": 0, "dur": 3000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "convolution_fusion.1",
         "ts": 9000, "dur": 5000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.7",
         "ts": 3000, "dur": 1000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "end: fusion.7",
         "ts": 4000, "dur": 500},                      # skipped
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step(123)",
         "ts": 0, "dur": 20000},                       # module lane
        {"ph": "X", "pid": 9, "tid": 5, "name": "PjitFunction(step)",
         "ts": 0, "dur": 999999},                      # host lane: ignored
    ]
    rows, dev_ms, module_ms = parse_trace(_write_trace(tmp_path, meta + ops),
                                          steps=2)
    by_name = {r["op"]: r for r in rows}
    assert by_name["convolution_fusion.1"]["ms_per_step"] == pytest.approx(4.0)
    assert by_name["convolution_fusion.1"]["calls_per_step"] == 1.0
    assert by_name["convolution_fusion.1"]["category"] == "convolution fusion"
    assert by_name["fusion.7"]["category"] == "other fusion"
    assert "end: fusion.7" not in by_name
    assert "PjitFunction(step)" not in by_name
    assert dev_ms == pytest.approx(4.5)
    assert module_ms == pytest.approx(10.0)


def test_parse_trace_cpu_lanes(tmp_path):
    """CPU-style trace: XLA:CPU client lanes count as device lanes;
    executor bookkeeping is categorized as runtime."""
    from profile_step import parse_trace

    events = [
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 4, "name": "thread_name",
         "args": {"name": "tf_XLAPjRtCpuClient/12345"}},
        {"ph": "X", "pid": 9, "tid": 4, "name": "dot_general.4",
         "ts": 0, "dur": 2000},
        {"ph": "X", "pid": 9, "tid": 4,
         "name": "ThunkExecutor::Execute (wait for completion)",
         "ts": 0, "dur": 8000},
    ]
    rows, dev_ms, _ = parse_trace(_write_trace(tmp_path, events), steps=1)
    by_name = {r["op"]: r for r in rows}
    assert by_name["dot_general.4"]["ms_per_step"] == pytest.approx(2.0)
    assert (by_name["ThunkExecutor::Execute (wait for completion)"]
            ["category"] == "runtime (host executor)")
    assert dev_ms == pytest.approx(10.0)


def test_parse_trace_missing_dir(tmp_path):
    from profile_step import parse_trace

    with pytest.raises(FileNotFoundError):
        parse_trace(str(tmp_path), steps=1)


@pytest.mark.slow
def test_profile_tool_end_to_end_cpu(tmp_path):
    out_json = str(tmp_path / "prof.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["BENCH_BATCH"] = "8"
    env["BENCH_BACKBONE"] = "mini"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_step.py"),
         "--platform", "cpu", "--steps", "2", "--top", "5",
         "--json", out_json],
        capture_output=True, text=True, timeout=570, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "# train step profile" in r.stdout
    assert "# category totals" in r.stdout
    with open(out_json) as f:
        prof = json.load(f)
    assert prof["backend"] == "cpu"
    assert prof["device_ms_per_step"] > 0
    assert prof["ops"], "no ops parsed"
