#!/usr/bin/env python
"""Per-op step profiler: where does the train/eval step's device time go?

Productizes the per-fusion analysis behind PERF.md ("Where the 238 ms
goes"): runs the compiled step N times under ``jax.profiler.trace``,
parses the device lanes out of the trace, and prints a per-HLO-op time
table (ms/step, % of device time, calls/step) with category totals
(convolution fusions, loop fusions, Mosaic/Pallas custom calls,
collectives, copies).  This is the first tool to reach for before
attributing a throughput change — the reference stack has no profiling
story at all (SURVEY §5a).

Usage:
  python tools/profile_step.py                  # train step, 4 steps
  python tools/profile_step.py --mode eval --steps 8 --top 40
  python tools/profile_step.py --json prof.json --keep-trace out/

Env knobs (same as bench.py): BENCH_BATCH (per-chip batch; default 768
on TPU / 8 on CPU), BENCH_BACKBONE (resnet152|vit_l14|...|mini),
BENCH_FROZEN_BN (train|eval).

Works on the real TPU (lane "XLA Ops") and on CPU (XLA:CPU client
lanes) — on CPU the numbers are for pipeline debugging only, not
hardware attribution.  For profiling a REAL training run (live data
pipeline included), set SRTPU_PROFILE_DIR instead — the Trainer traces
its first epoch there (utils/logging.py::jax_profile_trace).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _category(name: str) -> str:
    n = name.lower()
    if "::" in name or n.startswith(("threadpool", "thunk")):
        # XLA:CPU thunk-executor bookkeeping; on CPU the per-op compute
        # often hides inside these (upstream tracing limitation) — use
        # the TPU for hardware attribution
        return "runtime (host executor)"
    if "mosaic" in n or "custom-call" in n or "tpu_custom_call" in n:
        return "custom-call (Pallas)"
    if "fusion" in n:
        if n.startswith(("convolution", "cudnn")) or ".conv" in n:
            return "convolution fusion"
        if n.startswith(("input", "loop", "output")):
            return "loop fusion"
        return "other fusion"
    if n.startswith(("convolution", "dot", "dot_general", "einsum")):
        return "matmul/conv (unfused)"
    if n.startswith(("all-reduce", "all-gather", "reduce-scatter",
                     "collective", "ppermute")):
        return "collective"
    if n.startswith(("copy", "bitcast", "transpose", "reshape")):
        return "copy/layout"
    if n.startswith(("dynamic", "slice", "gather", "scatter", "concatenate",
                     "pad", "select", "reduce", "sort", "iota", "rng",
                     "wrapped", "broadcast", "compare", "add", "multiply",
                     "subtract", "divide", "tanh", "exponential", "log")):
        return "elementwise/data-movement"
    return "other"


def parse_trace(trace_dir: str, steps: int):
    """Aggregate device-lane op events from the newest trace under
    ``trace_dir`` → (per-op rows, total device µs, module µs).

    Device lanes: on TPU the process named ``/device:TPU:N`` carries the
    per-op timeline in its "XLA Ops" thread (plus whole-executable spans
    in "XLA Modules"); on CPU the XLA:CPU client publishes one lane per
    executor thread (named ``tf_XLAPjRtCpuClient/...``).

    TPU events carry XLA's own per-op metadata — ``hlo_category``,
    ``model_flops``, ``bytes_accessed``, ``tf_op`` (the JAX source op),
    ``source_stack`` — which is what turns the table into a roofline:
    each op's floor is max(flops/peak_flops, bytes/peak_bw)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    procs, threads = {}, collections.defaultdict(dict)
    for e in events:
        if e.get("ph") == "M" and "args" in e:
            if e.get("name") == "process_name":
                procs[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                threads[e["pid"]][e.get("tid")] = e["args"].get("name", "")

    # name -> [us, count, flops, bytes, category, tf_op, source]
    ops = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, "", "", ""])
    module_us = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        proc = procs.get(e.get("pid"), "")
        lane = threads[e.get("pid")].get(e.get("tid"), "")
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        if proc.startswith("/device:") and lane == "XLA Modules":
            module_us += dur
            continue
        is_dev_lane = (proc.startswith("/device:") and lane == "XLA Ops") \
            or lane.startswith("tf_XLAPjRtCpuClient")
        if not is_dev_lane or name.startswith("end:"):
            continue
        a = e.get("args", {})
        rec = ops[name]
        rec[0] += dur
        rec[1] += 1
        rec[2] += float(a.get("model_flops", 0) or 0)
        rec[3] += float(a.get("raw_bytes_accessed",
                              a.get("bytes_accessed", 0)) or 0)
        if not rec[4]:
            rec[4] = a.get("hlo_category", "") or _category(name)
            rec[5] = a.get("tf_op", "").rstrip(":")
            rec[6] = (a.get("source_stack", "").split("\n", 1)[0]
                      or a.get("source", ""))

    rows = [{"op": k, "ms_per_step": v[0] / 1e3 / steps,
             "calls_per_step": v[1] / steps,
             "flops_per_step": v[2] / steps,
             "bytes_per_step": v[3] / steps,
             "category": v[4], "tf_op": v[5], "source": v[6]}
            for k, v in ops.items()]
    rows.sort(key=lambda r: -r["ms_per_step"])
    total_us = sum(v[0] for v in ops.values())
    return rows, total_us / 1e3 / steps, module_us / 1e3 / steps


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--mode", choices=["train", "eval"], default="train")
    ap.add_argument("--steps", type=int, default=4,
                    help="profiled steps (after 2 warmup steps)")
    ap.add_argument("--top", type=int, default=30,
                    help="rows to print")
    ap.add_argument("--json", default="",
                    help="also write the full table as JSON")
    ap.add_argument("--keep-trace", default="", metavar="DIR",
                    help="keep the raw profiler trace here (default: a "
                         "temp dir, deleted on exit); open it with "
                         "TensorBoard's profile plugin for the timeline")
    ap.add_argument("--platform", choices=["auto", "cpu", "tpu"],
                    default="auto",
                    help="force the JAX platform (config-level — the "
                         "JAX_PLATFORMS env var loses to site device "
                         "plugins)")
    ap.add_argument("--peak_tflops", type=float, default=-1,
                    help="peak TFLOP/s for the roofline columns "
                         "(default: 197 bf16 on TPU — v5e; 0 disables)")
    ap.add_argument("--peak_gbps", type=float, default=-1,
                    help="peak HBM GB/s for the roofline columns "
                         "(default: 819 on TPU — v5e; 0 disables)")
    args = ap.parse_args()

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from situation_recognition_tpu.data.encoder import ImsituEncoder
    from situation_recognition_tpu.parallel.mesh import make_mesh
    from situation_recognition_tpu.train import (
        Trainer, TrainerConfig, default_hidden)

    on_tpu = jax.default_backend() == "tpu"
    # share bench.py's env-knob parsing/defaults (and its validation —
    # a typo'd BENCH_FROZEN_BN would otherwise silently profile the
    # train-BN path, misattributing the numbers)
    from bench import bench_batch_backbone

    batch, backbone = bench_batch_backbone(on_tpu)
    frozen_bn = os.environ.get("BENCH_FROZEN_BN", "train")
    if frozen_bn not in ("train", "eval"):
        raise SystemExit(
            f"BENCH_FROZEN_BN must be train|eval, got {frozen_bn!r}")
    encoder = ImsituEncoder.synthetic_full()
    mesh = make_mesh(num_devices=len(jax.devices()))
    cfg = TrainerConfig(
        hidden=default_hidden(backbone),
        batch_size=batch * mesh.shape["data"],
        backbone=backbone,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        frozen_backbone_bn=frozen_bn)
    trainer = Trainer(encoder, cfg, mesh=mesh)

    B = cfg.batch_size
    rng = np.random.default_rng(0)
    host = {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "flip": rng.random(B) < 0.5,
        "verbs": rng.integers(0, encoder.get_num_verbs(), B).astype(np.int32),
        "labels": rng.integers(0, encoder.get_num_labels(),
                               (B, 3, encoder.max_role_count)).astype(np.int32),
    }
    arrays, valid, _ = trainer._pad_batch(host)
    arrays = {k: jax.device_put(v, trainer._bsh) for k, v in arrays.items()}
    valid = jax.device_put(valid, trainer._bsh)

    if args.mode == "eval":
        def step(i):
            losses, _ = trainer._eval_step(
                trainer.head_params, trainer.backbone_params,
                trainer.backbone_stats, arrays["images"], arrays["verbs"],
                arrays["labels"], valid)
            return losses
    else:
        def step(i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            (trainer.head_params, trainer.opt_state, trainer.backbone_stats,
             losses, _) = trainer._train_step(
                trainer.head_params, trainer.opt_state,
                trainer.backbone_params, trainer.backbone_stats, key,
                arrays["images"], arrays["flip"], arrays["verbs"],
                arrays["labels"], valid)
            return losses

    # warmup/compile; sync via a scalar host transfer (block_until_ready
    # does not reliably wait through the axon TPU tunnel)
    float(step(0)[0])
    float(step(1)[0])

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="srtpu_prof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        losses = None
        for i in range(2, 2 + args.steps):
            losses = step(i)
        sync = float(losses[0])
    wall = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(sync)

    rows, dev_ms, module_ms = parse_trace(trace_dir, args.steps)

    on_tpu_now = jax.default_backend() == "tpu"
    peak_tf = args.peak_tflops if args.peak_tflops >= 0 else \
        (197.0 if on_tpu_now else 0.0)
    peak_gb = args.peak_gbps if args.peak_gbps >= 0 else \
        (819.0 if on_tpu_now else 0.0)
    roofline = peak_tf > 0 and peak_gb > 0
    if roofline:
        for r in rows:
            # per-op floor (PERF.md r4 methodology): the op cannot beat
            # max(MXU time, HBM time) for its own flops/bytes
            floor = max(r["flops_per_step"] / (peak_tf * 1e9),
                        r["bytes_per_step"] / (peak_gb * 1e6))
            r["floor_ms"] = floor
            r["x_floor"] = r["ms_per_step"] / floor if floor > 0 else None

    cats = collections.defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        cats[r["category"]][0] += r["ms_per_step"]
        cats[r["category"]][1] += r.get("floor_ms", 0.0)

    print(f"# {args.mode} step profile: backbone={backbone} "
          f"batch={batch}/chip x {mesh.shape['data']} "
          f"frozen_bn={frozen_bn} backend={jax.default_backend()}")
    print(f"# device time {dev_ms:.2f} ms/step (module span "
          f"{module_ms:.2f}), host wall {wall * 1e3:.2f} ms/step, "
          f"{len(rows)} distinct ops")
    if roofline:
        tot_floor = sum(r.get("floor_ms", 0.0) for r in rows)
        ratio = (f"(step runs {dev_ms / tot_floor:.2f}x its floor) "
                 if tot_floor > 0 else
                 "(no per-op flops/bytes metadata in this trace) ")
        print(f"# per-op roofline floor {tot_floor:.2f} ms/step "
              f"{ratio}at peaks "
              f"{peak_tf:.0f} TFLOP/s / {peak_gb:.0f} GB/s")
    print()
    hdr = f"{'ms/step':>9}  {'%dev':>5}  {'calls':>5}"
    hdr += f"  {'GB/s':>5}  {'xfloor':>6}" if roofline else ""
    print(hdr + f"  {'category':<22} op [jax op]")
    for r in rows[:args.top]:
        pct = 100 * r["ms_per_step"] / dev_ms if dev_ms else 0.0
        line = (f"{r['ms_per_step']:9.3f}  {pct:5.1f}  "
                f"{r['calls_per_step']:5.1f}")
        if roofline:
            gbps = (r["bytes_per_step"] / (r["ms_per_step"] * 1e6)
                    if r["ms_per_step"] else 0.0)
            xf = f"{r['x_floor']:.2f}" if r.get("x_floor") else "-"
            line += f"  {gbps:5.0f}  {xf:>6}"
        tf_op = r["tf_op"].split("/")[-1] if r["tf_op"] else ""
        line += (f"  {r['category']:<22} {r['op'][:44]}"
                 + (f" [{tf_op[:38]}]" if tf_op else ""))
        print(line)
    print("\n# category totals" + ("  (ms, floor, x)" if roofline else ""))
    for c, (ms, fl) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        line = (f"{ms:9.3f}  {100 * ms / dev_ms if dev_ms else 0:5.1f}  "
                f"{c}")
        if roofline and fl > 0:
            line += f"  (floor {fl:.2f} ms, {ms / fl:.2f}x)"
        print(line)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"mode": args.mode, "backbone": backbone,
                       "batch_per_chip": batch,
                       "backend": jax.default_backend(),
                       "device_ms_per_step": dev_ms,
                       "module_ms_per_step": module_ms,
                       "host_wall_ms_per_step": wall * 1e3,
                       "categories": {c: {"ms": v[0], "floor_ms": v[1]}
                                      for c, v in cats.items()},
                       "ops": rows}, f, indent=1)
        print(f"\nwrote {args.json}")
    if not args.keep_trace:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"trace kept at {trace_dir} (open with TensorBoard: "
              f"tensorboard --logdir {trace_dir})")


if __name__ == "__main__":
    main()
