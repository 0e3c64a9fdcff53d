#!/usr/bin/env python
"""Benchmark: flagship train-step throughput (images/sec/chip).

Measures the full jitted training step — device-side uint8 preprocessing,
one frozen ResNet-152 bf16 forward, stacked FCGGNN head forward+backward,
masked losses, adamax update, on-device top-k — on synthetic device-resident
batches, steady-state after compile.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference (vFones/situation-recognition) publishes no
throughput numbers (BASELINE.md).  The denominator is a documented estimate
of its per-GPU rate: the reference runs 3 full ResNet-152 passes per step
(model.py:171-180) plus per-batch host-side Python adjacency/role loops and
DataParallel scatter/gather; a V100-class GPU sustains ~700 img/s fp16 on
single-pass ResNet-152 inference, so the reference is bounded by ~233 img/s
per GPU before host overheads.  REFERENCE_IMG_PER_SEC_PER_CHIP = 200 is the
generous estimate used here (BASELINE target: >= 8x this).

In the default train mode, after the train measurement the bench spends
any wall-clock headroom left inside the driver window measuring the eval
step and the serving artifact too, and appends "eval_img_s" /
"serving_img_s" to the SAME JSON line (VERDICT r3 #2) — strictly
additive fields; a tight window or a wedged secondary phase degrades to
the train-only line.  BENCH_SECONDARY=0 disables; BENCH_TOTAL_BUDGET
(default 480 s) is the soft wall-clock budget for the whole bench
(undercuts the driver's observed ~600 s kill).

Env knobs: BENCH_MODE=train|eval|serving, BENCH_BATCH (default 768/chip),
BENCH_BACKBONE (resnet152|vit_l14|vit_b16|...), BENCH_STEPS,
BENCH_IMAGE_SIZE (input resolution, default 224; e.g. 336 for the CLIP
ViT-L/14@336 grid), BENCH_FROZEN_BN=train|eval,
BENCH_TRAIN_BACKBONE=1 (time the --train_backbone fine-tuning step,
remat on; use BENCH_BATCH<=256 — the backbone backward does not fit
HBM at the frozen default 768); serving mode adds
BENCH_WEIGHTS=f32|bf16|int8,
BENCH_BAKE=0 (weights-external artifact), BENCH_TARGET=tpu (keep the
fused Pallas kernels in the exported program).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_IMG_PER_SEC_PER_CHIP = 200.0


def bench_batch_backbone(on_tpu: bool):
    """The flagship bench defaults, shared with tools/bench_e2e.py: the
    reference global batch 6144 over 8 chips = 768/chip."""
    batch = int(os.environ.get("BENCH_BATCH", 768 if on_tpu else 8))
    backbone = os.environ.get("BENCH_BACKBONE",
                              "resnet152" if on_tpu else "mini")
    return batch, backbone


def _claim_watchdog(timeout_s: float, metric: str | None = None,
                    what: str = "device claim"):
    """Guard a wedgeable phase with a hard deadline.

    The axon tunnel can wedge indefinitely on the remote side in two
    places: the pool claim (observed 2026-08-17/18: ``jax.devices()``
    never returns, and the plugin's ``claim_timeout_s`` is not honored
    through the loopback relay) and the remote compiler (observed
    2026-08-20: the claim succeeds, then the step's lower+compile makes
    no progress for 12+ minutes).  A bench that hangs forever is worse
    than one that reports failure — if the guarded phase hasn't
    completed within ``timeout_s``, print an error JSON line (same
    one-line contract) and exit hard.  Disarmed by ``set()`` on the
    returned event.

    The deadlines must undercut the DRIVER's own ~10-minute kill: round
    2's bench was killed at rc=124 with no output because its watchdogs
    (600 s claim / 1800 s compile) outlived the driver window, so a slow
    remote compile produced neither a result nor the error line
    (VERDICT round 2 weak-1).  Defaults are now 240 s claim / 480 s
    compile — on a warm persistent compile cache (enabled in main(),
    same repo-local dir as cli.py) the whole bench finishes well inside
    that, and a cold-or-wedged compiler still gets its failure
    recorded before the driver kill."""
    import threading

    ok = threading.Event()

    if metric is None:
        metric = (os.environ.get("BENCH_MODE", "train")
                  + "_images_per_sec_per_chip")

    def watch():
        if not ok.wait(timeout_s):
            print(json.dumps({
                "metric": metric,
                "value": None,
                "unit": "img/s/chip",
                "error": (f"{what} did not complete within "
                          f"{timeout_s:.0f}s (wedged TPU tunnel?)"),
            }), flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return ok


def _load_benchstep_module():
    """tools/export_benchstep.py as a module (tools/ is not a package)."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "export_benchstep.py")
    spec = importlib.util.spec_from_file_location("export_benchstep", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def maybe_bench_artifact(mode: str, batch: int, backbone: str,
                         image_size: int, frozen_bn: str,
                         register_trees=()):
    """Pre-exported StableHLO of the bench step (tools/export_benchstep.py)
    — skips the ~310 s 1-core Python trace of the flagship step that
    otherwise dominates the driver window.  Returns
    (deserialized_exported, manifest_cost) or (None, None) when the
    artifact is absent or STALE (fingerprint covers every package source
    + jax version; config covers the bench knobs): a mismatch silently
    falls back to the live trace — a stale artifact can cost time, never
    correctness.  BENCH_ARTIFACT=0 forces the live path."""
    if os.environ.get("BENCH_ARTIFACT", "1") == "0":
        return None, None
    try:
        import jax

        ebs = _load_benchstep_module()
        with open(os.path.join(ebs.ART_DIR, "manifest.json")) as f:
            man = json.load(f)
        if (man["fingerprint"] != ebs.source_fingerprint()
                or man["jax_version"] != jax.__version__
                or man["backend"] != jax.default_backend()
                or man["config"] != ebs.bench_config_key(
                    "train", batch, backbone, image_size, frozen_bn)):
            print(f"[bench] {mode} artifact stale/mismatched — live trace",
                  file=sys.stderr)
            return None, None
        step = man["steps"][mode]
        with open(os.path.join(ebs.ART_DIR, step["file"]), "rb") as f:
            blob = f.read()
        # namedtuple treedefs (optax states, GGNNParams) must be
        # registered on the deserialize side too
        ebs.register_tree_serialization(*register_trees)
        return jax.export.deserialize(blob), step.get("cost") or None
    except (OSError, KeyError, ValueError):
        return None, None


# ------------------------------------------------- pallas FLOP accounting
#
# XLA's cost_analysis() reports flops=0 for Mosaic custom calls, so any
# step routing work through the fused Pallas kernels under-reports MFU —
# by ~2 points on the ResNet train step (one GGNN propagate) and by
# nearly the whole backbone on ViT runs (every encoder block is a custom
# call; PERF.md's "~67% true MFU" was hand-computed around exactly this
# hole).  The counters below mirror the kernels' ACTUAL matmul
# structure — padded row counts included, matching cost_analysis's
# performed-FLOPs semantics — and are accumulated by counting wrappers
# installed ONLY around the single .lower() trace, so the supplement
# reflects exactly the kernel calls the compiled module contains
# (gating/fallback paths never reach the wrapped primals and count 0).
# "bytes accessed" is NOT supplemented: XLA prices custom-call operand/
# output buffers itself, so the HBM figure has no equivalent hole.


def ggnn_kernel_flops(b: int, r: int, d: int, steps: int) -> float:
    """FLOPs of one fused GGNN propagate call (ops/ggnn_pallas.py
    _folded_kernel): per step per (bm, d) block, one (bm,bm)@(bm,d)
    adjacency matmul + gate matmuls (d,3d) + (d,2d) + (d,d)."""
    import situation_recognition_tpu.ops.ggnn_pallas as gp

    m = b * r
    bm = gp._pick_bm(m, r, d)
    m_pad = -(-m // bm) * bm
    return float(steps) * (2.0 * m_pad * bm * d + 12.0 * m_pad * d * d)


def vit_stream_flops(b: int, n: int, d: int, hid: int,
                     blocks: int) -> float:
    """FLOPs of one fused ViT stream-stack call (ops/vit_pallas.py
    _fused_stack_impl): per block, QKV (3) + out-proj (1) matmuls on the
    padded (B*n8, d) stream, fc1/fc2 against hid, and the attention
    core's two (n, dh)x(n, dh) dots per head on the n VALID rows.  The
    qkv/mlp matmuls run over the stream rows rounded up to the kernel's
    bm=min(m, _BM) tile — counted at that padded row count to match
    cost_analysis's performed-FLOPs semantics (ADVICE r2 #2)."""
    import situation_recognition_tpu.ops.vit_pallas as vp

    n8 = -(-n // 8) * 8
    m = b * n8
    bm = min(m, vp._BM)
    mp = -(-m // bm) * bm
    per_block = (8.0 * mp * d * d + 4.0 * mp * d * hid
                 + 4.0 * b * n * n * d)
    return blocks * per_block


def vit_block_flops(b: int, n: int, d: int, hid: int) -> float:
    """FLOPs of one fused PER-BLOCK ViT kernel call (ops/vit_pallas.py
    _fused_impl, the fallback when the stream-stack gate fails at the
    padded token count): rows m=b*n padded to the bm=min(m, _BM) tile
    (no n8 rounding — the per-block kernel pads the flat stream
    directly); same matmul structure as one stream-stack block."""
    import situation_recognition_tpu.ops.vit_pallas as vp

    m = b * n
    bm = min(m, vp._BM)
    mp = -(-m // bm) * bm
    return 8.0 * mp * d * d + 4.0 * mp * d * hid + 4.0 * b * n * n * d


def vit_ft_attn_flops(b: int, n: int, d: int, blocks: int,
                      remat: bool) -> float:
    """FLOPs of the ft stream's Pallas attention custom calls for one
    _ft_cls_stack trace under jax.grad (ops/vit_pallas.py): forward core
    2 dots (scores + context) = 4*b*n^2*d per block — run TWICE under
    per-block jax.checkpoint (recomputed inside the backward) — plus the
    flash-style backward kernel's 5 dots (scores recompute, dv, dp, dq,
    dk) = 10*b*n^2*d.  The stream's LN/QKV/MLP are plain jnp and already
    priced by cost_analysis."""
    fwd = 4.0 * b * n * n * d
    bwd = 10.0 * b * n * n * d
    return blocks * ((2.0 * fwd if remat else fwd) + bwd)


def install_pallas_flop_counters():
    """Wrap the Pallas kernel primals with FLOP accumulators.  Returns
    (total_fn, restore_fn); call restore_fn right after .lower()."""
    import situation_recognition_tpu.ops.ggnn_pallas as gp
    import situation_recognition_tpu.ops.vit_pallas as vp

    total = [0.0]
    orig_g = gp._propagate_fwd_impl
    orig_s = vp._fused_stack_impl
    orig_b = vp._fused_impl
    orig_ft = vp._ft_cls_stack

    def counting_ggnn(params, hidden, mask, num_steps, interpret):
        b, r, d = hidden.shape
        total[0] += ggnn_kernel_flops(b, r, d, num_steps)
        return orig_g(params, hidden, mask, num_steps, interpret)

    def counting_stack(x, w_flat, **kw):
        b, n, d = x.shape
        hid = w_flat[12].shape[-1]          # w1 of block 0 is (d, hid)
        total[0] += vit_stream_flops(b, n, d, hid, len(w_flat) // 16)
        return orig_s(x, w_flat, **kw)

    def counting_ft(x, w_flat, **kw):
        b, n, d = x.shape
        total[0] += vit_ft_attn_flops(b, n, d, len(w_flat) // 16,
                                      bool(kw.get("remat", False)))
        return orig_ft(x, w_flat, **kw)

    def counting_block(x, *w, **kw):
        # per-block kernel path (SRTPU_VIT_STREAM=0, or the stream gate
        # fails at the padded token count while the per-block gate
        # passes) — previously uncounted, silently under-reporting MFU
        # on exactly that path (ADVICE r2 #1)
        b, n, d = x.shape
        hid = w[12].shape[-1]               # w1 is (d, hid)
        total[0] += vit_block_flops(b, n, d, hid)
        return orig_b(x, *w, **kw)

    gp._propagate_fwd_impl = counting_ggnn
    vp._fused_stack_impl = counting_stack
    vp._fused_impl = counting_block
    vp._ft_cls_stack = counting_ft

    def restore():
        gp._propagate_fwd_impl = orig_g
        vp._fused_stack_impl = orig_s
        vp._fused_impl = orig_b
        vp._ft_cls_stack = orig_ft

    return (lambda: total[0]), restore


def main():
    t_start = time.perf_counter()

    def _elapsed() -> float:
        return time.perf_counter() - t_start

    def _phase(name: str) -> None:
        # phase timestamps to stderr: the window budget decisions below
        # (and the driver-window postmortems) need to know where the
        # wall went — claim vs weight upload vs compile vs timed loop
        print(f"[bench] t={_elapsed():.1f}s {name}", file=sys.stderr,
              flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from situation_recognition_tpu.data.encoder import ImsituEncoder
    from situation_recognition_tpu.parallel.mesh import make_mesh
    from situation_recognition_tpu.train import Trainer, TrainerConfig

    # persistent XLA compilation cache (same mechanism as cli.py): the
    # flagship train step costs ~11 min to lower+compile through the
    # remote-compile tunnel; a warm cache cuts repeat bench invocations
    # to ~2 min, which is what lets the driver's timed run (and the
    # tightened watchdogs above) succeed.  Repo-local so the round's
    # warming run and the driver's end-of-round run share it.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)  # cache the ~270 tiny init jits too:
        # each is a ~0.5 s REMOTE compile round-trip on the axon
        # tunnel (~2 min of every bench/CLI start measured r4);
        # sub-second entries are a few KB each and cut that to
        # local cache loads

    claimed = _claim_watchdog(
        float(os.environ.get("BENCH_CLAIM_TIMEOUT", "240")))
    on_tpu = jax.default_backend() == "tpu"
    claimed.set()
    _phase('device claimed')
    # per-chip batch: reference global 6144 over 8 chips = 768/chip
    batch, backbone = bench_batch_backbone(on_tpu)
    steps = int(os.environ.get("BENCH_STEPS", 20 if on_tpu else 3))
    # BENCH_MODE=eval times the fwd-only eval step (the fused pallas GGNN
    # runs on every propagate there); default times the full train step
    # BENCH_MODE=serving times the LOADED export artifact (StableHLO via
    # jax.export — serving.py) end-to-end: uint8 images in, verb + noun
    # logits out, single device
    mode = os.environ.get("BENCH_MODE", "train")
    if mode not in ("train", "eval", "serving"):
        raise SystemExit(
            f"BENCH_MODE must be train|eval|serving, got {mode!r}")
    frozen_bn = os.environ.get("BENCH_FROZEN_BN", "train")
    if frozen_bn not in ("train", "eval"):
        raise SystemExit(
            f"BENCH_FROZEN_BN must be train|eval, got {frozen_bn!r}")
    # BENCH_IMAGE_SIZE: model input resolution (default 224, the parity
    # size; e.g. 336 measures the CLIP ViT-L/14@336 grid)
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "224"))
    # BENCH_TRAIN_BACKBONE=1: time the fine-tuning step (--train_backbone
    # — backbone inside the grad closure, per-block remat on; BENCH_REMAT=0
    # measures the no-remat backward at the same batch).  Backward
    # activations scale with the batch: use BENCH_BATCH<=256 for
    # ResNet-152 (the frozen default 768 OOMs a 16 GB chip when the
    # backbone backward is live)
    train_bb = os.environ.get("BENCH_TRAIN_BACKBONE", "0") == "1"
    bb_remat = train_bb and os.environ.get("BENCH_REMAT", "1") == "1"

    # full-size synthetic vocab: 504 verbs / 190 roles / 2001 labels / R=6
    # (the tiny fixture would understate the classifier + GGNN width)
    encoder = ImsituEncoder.synthetic_full()

    from situation_recognition_tpu.train import default_hidden

    n_dev = len(jax.devices())
    mesh = make_mesh(num_devices=n_dev)
    cfg = TrainerConfig(
        hidden=default_hidden(backbone),
        batch_size=batch * mesh.shape["data"],
        backbone=backbone,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        frozen_backbone_bn=frozen_bn,
        image_size=image_size,
        train_backbone=train_bb,
        remat_backbone=bb_remat,
    )
    trainer = Trainer(encoder, cfg, mesh=mesh)
    _phase('trainer built (weights uploaded)')

    B = cfg.batch_size
    rng = np.random.default_rng(0)
    batch_host = {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "flip": rng.random(B) < 0.5,
        "verbs": rng.integers(0, encoder.get_num_verbs(), B).astype(np.int32),
        "labels": rng.integers(0, encoder.get_num_labels(),
                               (B, 3, encoder.max_role_count)).astype(np.int32),
    }
    arrays, valid, _ = trainer._pad_batch(batch_host)
    arrays = {k: jax.device_put(v, trainer._bsh) for k, v in arrays.items()}
    _phase('batch uploaded')
    valid = jax.device_put(valid, trainer._bsh)

    # second deadline: the remote compiler (and the serving export path)
    # can wedge after a successful claim — same one-JSON-line contract.
    # Disarmed once the first timed iteration's output reaches the host.
    compile_ok = _claim_watchdog(
        float(os.environ.get(
            "BENCH_COMPILE_TIMEOUT",
            "900" if mode == "serving" else "480")),
        what="compile+warmup")

    if mode == "serving":
        import tempfile

        from situation_recognition_tpu.serving import (
            export_inference, load_inference)

        art = tempfile.mkdtemp(prefix="srtpu_serving_")
        # BENCH_WEIGHTS=f32|bf16|int8 selects the artifact weight encoding
        # (int8 = 4x smaller kernels; see serving._quantize_tree);
        # BENCH_BAKE=0 benches a weights-external artifact (side-file
        # weights, program-only StableHLO — serving.export_inference)
        # BENCH_TARGET=tpu benches a TPU-native artifact (fused Pallas
        # kernels kept in the exported program — serving.export_inference
        # platform="tpu")
        weights = os.environ.get("BENCH_WEIGHTS", "f32")
        bake = os.environ.get("BENCH_BAKE", "1") != "0"
        target = os.environ.get("BENCH_TARGET", "portable")
        export_inference(trainer, art, batch_size=batch, weights=weights,
                         bake_weights=bake, platform=target)
        fn = load_inference(art)
        imgs = jax.device_put(batch_host["images"][:batch])
        verbs = jax.device_put(batch_host["verbs"][:batch])
        for _ in range(2):                       # warm both entries
            out = fn(imgs)
            float(np.asarray(out[1])[0])
            gt = fn.gt(imgs, verbs)
            float(np.asarray(gt)[0, 0, 0])
        compile_ok.set()
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(imgs)
        float(np.asarray(out[1])[0])
        dt = time.perf_counter() - t0
        # the gt entry is timed with a strictly-alternating per-call-synced
        # A/B instead of a queued loop: queueing N async dispatches and
        # syncing once misattributes queue drain to whichever entry runs
        # second (earlier harnesses printed 178-253 ms for gt that way;
        # the device profiles always matched — PERF.md r6).  The paired
        # argmax per-call median is printed too, so gt <= argmax (its
        # strictly-smaller compute) is visible in the output itself.
        # sync on a SCALAR slice (4-byte transfer): np.asarray(gt) here
        # would drag the full (B, R, L) f32 noun logits through the dev
        # rig's ~30 MB/s tunnel (~1.2 s for 37 MB — measured), swamping
        # the 160 ms compute being timed
        pa, pg = [], []
        for _ in range(8):
            t0b = time.perf_counter()
            o = fn(imgs)
            float(o[1][0])
            pa.append(time.perf_counter() - t0b)
            t0b = time.perf_counter()
            g = fn.gt(imgs, verbs)
            float(g[0, 0, 0])
            pg.append(time.perf_counter() - t0b)
        out = {
            "metric": "serving_images_per_sec_per_chip",
            "value": round(batch * steps / dt, 2),
            "unit": "img/s/chip",
            "step_ms": round(dt / steps * 1e3, 2),
            "gt_entry_percall_ms": round(float(np.median(pg)) * 1e3, 2),
            "argmax_percall_ms": round(float(np.median(pa)) * 1e3, 2),
        }
        if weights != "f32":
            out["weights"] = weights
        if not bake:
            out["bake_weights"] = False
        if target != "portable":
            out["target"] = target
        print(json.dumps(out))
        return

    # AOT lower+compile ONCE and drive the loop through the same
    # executable the MFU telemetry reads cost_analysis from — calling
    # .lower().compile() after a jit-warmed loop would compile the
    # identical step a SECOND time (the AOT path bypasses the jit cache),
    # roughly doubling bench wall time on the serialized remote compiler
    pallas_flops, _restore_counters = install_pallas_flop_counters()
    art_cost = None
    if mode == "eval":
        art, art_cost = maybe_bench_artifact(
            "eval", batch, backbone, image_size, frozen_bn,
            register_trees=(trainer.opt_state,))
        if art is not None:
            print("[bench] using pre-exported eval-step artifact",
                  file=sys.stderr)
            eval_fn = jax.jit(art.call)
        else:
            eval_fn = trainer._eval_step
        compiled = eval_fn.lower(
            trainer.head_params, trainer.backbone_params,
            trainer.backbone_stats, arrays["images"], arrays["verbs"],
            arrays["labels"], valid).compile()

        def step(i):
            losses, topk = compiled(
                trainer.head_params, trainer.backbone_params,
                trainer.backbone_stats, arrays["images"], arrays["verbs"],
                arrays["labels"], valid)
            return losses
    elif train_bb:
        compiled = trainer._train_step_ft.lower(
            trainer._trainable(), trainer.opt_state,
            trainer.backbone_stats, jax.random.PRNGKey(0),
            arrays["images"], arrays["flip"], arrays["verbs"],
            arrays["labels"], valid).compile()

        def step(i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            (tp, trainer.opt_state, trainer.backbone_stats,
             losses, topk) = compiled(
                trainer._trainable(), trainer.opt_state,
                trainer.backbone_stats, key, arrays["images"],
                arrays["flip"], arrays["verbs"], arrays["labels"], valid)
            trainer.head_params = tp["head"]
            trainer.backbone_params = tp["backbone"]
            return losses
    else:
        art, art_cost = maybe_bench_artifact(
            "train", batch, backbone, image_size, frozen_bn,
            register_trees=(trainer.opt_state,))
        if art is not None:
            print("[bench] using pre-exported train-step artifact "
                  "(skips the ~310s 1-core trace)", file=sys.stderr)
            step_fn = jax.jit(art.call)
        else:
            step_fn = trainer._train_step

        def _lower_compile(fn):
            lowered = fn.lower(
                trainer.head_params, trainer.opt_state,
                trainer.backbone_params, trainer.backbone_stats,
                jax.random.PRNGKey(0), arrays["images"], arrays["flip"],
                arrays["verbs"], arrays["labels"], valid)
            _phase('lowered (trace done)')
            return lowered.compile()

        try:
            compiled = _lower_compile(step_fn)
        except Exception:  # noqa: BLE001
            # a stale-in-ways-the-manifest-missed artifact (shardings,
            # device count, avals) must cost time, never the bench line:
            # fall back to the live trace (ADVICE r4)
            if art is None:
                raise
            print("[bench] pre-exported artifact failed to lower/compile "
                  "— falling back to the live trace", file=sys.stderr)
            compiled = _lower_compile(trainer._train_step)

        def step(i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            out = compiled(
                trainer.head_params, trainer.opt_state,
                trainer.backbone_params, trainer.backbone_stats, key,
                arrays["images"], arrays["flip"],
                arrays["verbs"], arrays["labels"], valid)
            (trainer.head_params, trainer.opt_state, trainer.backbone_stats,
             losses, topk) = out
            return losses

    _restore_counters()
    _phase('lower+compile done')

    # warmup/compile; synchronize via host transfer (block_until_ready does
    # not reliably wait through the remote TPU tunnel)
    losses = step(0)
    float(losses[0])
    losses = step(1)
    float(losses[0])
    compile_ok.set()
    _phase('warmup done')

    t0 = time.perf_counter()
    for i in range(2, 2 + steps):
        losses = step(i)
    sync = float(losses[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(sync)

    img_per_sec = B * steps / dt
    img_per_sec_per_chip = img_per_sec / n_dev
    step_ms = dt / steps * 1000.0

    # MFU / HBM utilization from the compiled step's own cost analysis —
    # measured FLOPs and bytes, not estimates (VERDICT round 1 asked for a
    # roofline argument with numbers).  Peak table per generation.
    peaks = {  # (bf16 TFLOP/s, HBM GB/s) per chip
        "v4": (275e12, 1228e9), "v5e": (197e12, 819e9),
        "v5p": (459e12, 2765e9), "v6e": (918e12, 1640e9),
    }
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if not gen and on_tpu:
        gen = "v5e"
        print("[bench] PALLAS_AXON_TPU_GEN unset — assuming v5e peaks for "
              "MFU/HBM figures", file=sys.stderr)
    mfu = hbm_util = None
    try:
        try:
            cost = compiled.cost_analysis() or {}
        except Exception:  # noqa: BLE001
            cost = {}
        if not cost.get("flops") and art_cost:
            # pre-exported artifact path: the manifest carries the cost
            # numbers recorded by tools/export_benchstep.py from an
            # identical compile
            cost = dict(art_cost)
        if gen in peaks and cost.get("flops"):
            # cost_analysis reports the PER-DEVICE (SPMD-partitioned)
            # module's flops/bytes — verified empirically — so per-device
            # cost / per-device time / per-chip peak needs NO further
            # division by n_dev (dividing again understated MFU n_dev-fold
            # on multi-chip runs).  Custom-call (Pallas kernel) FLOPs are
            # invisible to cost_analysis and added back from the analytic
            # counters (live trace) or the manifest's recorded counter
            # value (artifact path); traced shapes are GLOBAL, so the
            # supplement is divided per-device to match.
            peak_f, peak_b = peaks[gen]
            kf = pallas_flops() / n_dev
            if not kf and art_cost and art_cost.get("pallas_flops"):
                kf = float(art_cost["pallas_flops"]) / n_dev
            if kf:
                print(f"[bench] + {kf/1e9:.1f} GFLOP/step inside pallas "
                      "custom calls (cost_analysis-invisible, counted "
                      "analytically)", file=sys.stderr)
            mfu = (float(cost["flops"]) + kf) / (step_ms / 1e3) / peak_f
            if cost.get("bytes accessed"):
                hbm_util = (float(cost["bytes accessed"])
                            / (step_ms / 1e3) / peak_b)
    except Exception as e:  # cost analysis is best-effort telemetry
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    if mfu is not None:
        print(f"[bench] step {step_ms:.1f} ms | MFU {mfu*100:.1f}% | "
              f"HBM {hbm_util*100:.1f}% of peak" if hbm_util is not None
              else f"[bench] step {step_ms:.1f} ms | MFU {mfu*100:.1f}%",
              file=sys.stderr)

    out = {
        "metric": f"{mode}_images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 2),
        "unit": "img/s/chip",
    }
    if mode == "train":
        # the baseline estimate is a TRAIN-step rate; a fwd-only eval rate
        # against it would be apples-to-oranges.  The denominator is an
        # ESTIMATE (the reference publishes no throughput numbers) — say
        # so IN the recorded line, so no consumer can mistake the
        # multiple for a measured ratio (VERDICT r3 weak-2)
        out["vs_baseline"] = round(img_per_sec_per_chip
                                   / REFERENCE_IMG_PER_SEC_PER_CHIP, 2)
        out["baseline"] = ("estimated-200-img/s-per-gpu "
                           "(unpublished; derivation in bench.py docstring)")
    if frozen_bn != "train":
        out["frozen_bn"] = frozen_bn
    if train_bb:
        out["train_backbone"] = True
    if image_size != 224:
        out["image_size"] = image_size
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    if hbm_util is not None:
        out["hbm_util"] = round(hbm_util, 4)

    # ---- secondary surfaces in the SAME recorded line (VERDICT r3 #2):
    # after the train measurement, spend any wall-clock headroom left
    # inside the driver's kill window measuring the eval step (and the
    # serving artifact) too, so BENCH_r*.json carries driver-recorded
    # evidence for more than one mode.  Strictly additive: extra JSON
    # fields cannot break the driver's parser, and any wedge/overrun in
    # a secondary phase degrades to printing the train-only line.
    # once-latch for the recorded JSON line: the secondary-phase watchdog
    # fires from a Timer thread while the main thread may be mutating
    # ``out`` — without the latch the driver could read a torn or
    # duplicate last line (ADVICE r4).  Exactly one thread ever prints.
    import threading

    _emit_lock = threading.Lock()
    _emitted = [False]

    if (mode == "train" and not train_bb and on_tpu
            and os.environ.get("BENCH_SECONDARY", "1") == "1"):
        budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "480"))

        def bail(reason: str):
            with _emit_lock:
                if _emitted[0]:
                    return
                _emitted[0] = True
                # dict copy is atomic under the GIL; serializing the
                # snapshot cannot race the main thread's key assignments
                snap = dict(out)
                snap["secondary_skipped"] = reason
                print(json.dumps(snap))
                sys.stdout.flush()
            os._exit(0)

        guard = threading.Timer(max(5.0, budget - _elapsed()),
                                lambda: bail("secondary phase overran the "
                                             "window budget"))
        guard.daemon = True
        guard.start()
        try:
            if _elapsed() < budget - 45:
                e_art, _e_cost = maybe_bench_artifact(
                    "eval", batch, backbone, image_size, frozen_bn,
                    register_trees=(trainer.opt_state,))
                e_fn = (jax.jit(e_art.call) if e_art is not None
                        else trainer._eval_step)
                if e_art is not None:
                    print("[bench] secondary eval via pre-exported "
                          "artifact", file=sys.stderr)

                def _e_lower_compile(fn):
                    return fn.lower(
                        trainer.head_params, trainer.backbone_params,
                        trainer.backbone_stats, arrays["images"],
                        arrays["verbs"], arrays["labels"], valid).compile()

                try:
                    e_compiled = _e_lower_compile(e_fn)
                except Exception:  # noqa: BLE001 — same fallback rule as
                    if e_art is None:    # the train artifact (ADVICE r4)
                        raise
                    print("[bench] eval artifact failed to lower/compile "
                          "— live trace", file=sys.stderr)
                    e_compiled = _e_lower_compile(trainer._eval_step)

                def estep():
                    losses, _ = e_compiled(
                        trainer.head_params, trainer.backbone_params,
                        trainer.backbone_stats, arrays["images"],
                        arrays["verbs"], arrays["labels"], valid)
                    return losses
                float(estep()[0])                        # warm
                t0 = time.perf_counter()
                for _ in range(max(5, steps // 2)):
                    losses = estep()
                float(losses[0])
                edt = time.perf_counter() - t0
                out["eval_img_s"] = round(
                    B * max(5, steps // 2) / edt / n_dev, 2)
            if _elapsed() < budget - 120:
                import shutil
                import tempfile

                from situation_recognition_tpu.serving import (
                    export_inference, load_inference)

                art = tempfile.mkdtemp(prefix="srtpu_bench_serving_")
                try:
                    export_inference(trainer, art, batch_size=batch,
                                     weights="f32", bake_weights=True)
                    sfn = load_inference(art)
                    imgs = jax.device_put(batch_host["images"][:batch])
                    for _ in range(2):                   # warm
                        o = sfn(imgs)
                        float(np.asarray(o[1])[0])
                    sN = max(5, steps // 2)
                    t0 = time.perf_counter()
                    for _ in range(sN):
                        o = sfn(imgs)
                    float(np.asarray(o[1])[0])
                    sdt = time.perf_counter() - t0
                    out["serving_img_s"] = round(batch * sN / sdt, 2)
                finally:
                    shutil.rmtree(art, ignore_errors=True)
        except Exception as e:  # noqa: BLE001 — never lose the train line
            out["secondary_error"] = str(e)[:200]
        guard.cancel()
    with _emit_lock:
        if not _emitted[0]:
            _emitted[0] = True
            print(json.dumps(out))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
