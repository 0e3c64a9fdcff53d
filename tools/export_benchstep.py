#!/usr/bin/env python
"""Pre-export the bench's train/eval steps as StableHLO artifacts.

Why this exists (r4 measurement): `python bench.py` on this rig spends
its driver window almost entirely on fixed startup costs —

    claim ~1 s | trainer init ~15 s (warm tiny-jit cache; 120 s cold)
    | batch upload ~8 s | **.lower() ~310 s** | compile ~250 s (miss)
    / ~20 s (hit) | timed loop ~10 s

The 310 s is PYTHON TRACING of the flagship train step on the 1-core
host — deterministic, code-dependent, paid every invocation, and the
reason the driver's ~600 s kill window left no room for the secondary
(eval/serving) measurements VERDICT r3 #2 asked for.  ``jax.export``
serializes the lowered module once; ``bench.py`` then deserializes
(<1 s) and goes straight to the (cache-warm) compile.

The artifact is only valid for the exact code that produced it, so the
manifest records a fingerprint (sha256 over every ``*.py`` in the
package + jax version + the bench config tuple); ``bench.py`` verifies
it and silently falls back to the live-trace path on any mismatch —
a stale artifact can cost time, never correctness.

This tool also WARMS the persistent compile cache for the artifact's
modules (it compiles them exactly the way bench.py will) and records
their ``cost_analysis`` numbers in the manifest as a fallback for the
MFU/HBM telemetry.

Run on the chip rig after any change to the train step's HLO
(trainer/model/ops defaults), before the end-of-round commit:

    python tools/export_benchstep.py            # train + eval
"""

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART_DIR = os.path.join(REPO, ".bench_artifacts")


def source_fingerprint() -> str:
    """sha256 over the package sources + jax version: ANY package edit
    invalidates the artifact (conservative by design — re-export is one
    tool run; a stale artifact silently falling back costs ~5 min of
    driver window)."""
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    pkg = os.path.join(REPO, "situation_recognition_tpu")
    for root, _dirs, files in sorted(os.walk(pkg)):
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()


def bench_config_key(mode: str, batch: int, backbone: str,
                     image_size: int, frozen_bn: str) -> str:
    # device count is baked into the exported module's shardings
    # (len(jax.devices()) at export); computed live on BOTH sides, so an
    # artifact exported on a different-chip-count rig reads as stale
    # instead of failing shape/sharding checks at compile (ADVICE r4)
    import jax

    return (f"{mode}-{backbone}-b{batch}-s{image_size}-bn{frozen_bn}"
            f"-d{jax.device_count()}")


def register_tree_serialization(*trees) -> None:
    """Register every namedtuple type in ``trees`` for jax.export
    (de)serialization — optax optimizer states (EmptyState,
    ScaleBy*State, ...) and this package's GGNNParams are namedtuples
    jax.export refuses to serialize unregistered.  Must run on BOTH the
    export and the deserialize side with the same naming scheme."""
    from jax import export as jex

    def visit(obj):
        if isinstance(obj, tuple) and hasattr(obj, "_fields"):
            t = type(obj)
            try:
                jex.register_namedtuple_serialization(
                    t, serialized_name=f"{t.__module__}.{t.__qualname__}")
            except ValueError:
                pass                      # already registered
        if isinstance(obj, (tuple, list)):
            for v in obj:
                visit(v)
        elif isinstance(obj, dict):
            for v in obj.values():
                visit(v)

    for tree in trees:
        visit(tree)


def build_bench_trainer():
    """The EXACT trainer bench.py builds at driver defaults."""
    import jax
    import jax.numpy as jnp

    from situation_recognition_tpu.data.encoder import ImsituEncoder
    from situation_recognition_tpu.parallel.mesh import make_mesh
    from situation_recognition_tpu.train import (Trainer, TrainerConfig,
                                                 default_hidden)

    encoder = ImsituEncoder.synthetic_full()
    n_dev = len(jax.devices())
    mesh = make_mesh(num_devices=n_dev)
    cfg = TrainerConfig(
        hidden=default_hidden("resnet152"),
        batch_size=768 * mesh.shape["data"],
        backbone="resnet152",
        compute_dtype=jnp.bfloat16,
        frozen_backbone_bn="train",
        image_size=224,
    )
    return Trainer(encoder, cfg, mesh=mesh), encoder


def export_step(trainer, encoder, mode: str) -> dict:
    import jax
    import numpy as np

    B = trainer.config.batch_size
    rng = np.random.default_rng(0)
    batch_host = {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "flip": rng.random(B) < 0.5,
        "verbs": rng.integers(0, encoder.get_num_verbs(), B)
        .astype(np.int32),
        "labels": rng.integers(0, encoder.get_num_labels(),
                               (B, 3, encoder.max_role_count))
        .astype(np.int32),
    }
    arrays, valid, _ = trainer._pad_batch(batch_host)
    arrays = {k: jax.device_put(v, trainer._bsh) for k, v in arrays.items()}
    valid = jax.device_put(valid, trainer._bsh)

    if mode == "train":
        fn = trainer._train_step
        args = (trainer.head_params, trainer.opt_state,
                trainer.backbone_params, trainer.backbone_stats,
                jax.random.PRNGKey(0), arrays["images"], arrays["flip"],
                arrays["verbs"], arrays["labels"], valid)
    else:
        fn = trainer._eval_step
        args = (trainer.head_params, trainer.backbone_params,
                trainer.backbone_stats, arrays["images"],
                arrays["verbs"], arrays["labels"], valid)

    register_tree_serialization(args)

    t0 = time.time()
    # count the Pallas-kernel FLOPs of THIS trace the same way bench.py
    # does for the live path (cost_analysis cannot see custom calls);
    # recorded in the manifest so the artifact path's MFU stays truthful
    import bench as bench_mod

    pallas_flops, restore = bench_mod.install_pallas_flop_counters()
    guard = _stall_watchdog(900.0, f"{mode} trace+export")
    try:
        exported = jax.export.export(fn)(*args)
    finally:
        restore()
    guard.set()
    print(f"[export] {mode}: traced+exported in {time.time()-t0:.1f}s",
          flush=True)
    blob = exported.serialize()

    # warm the compile cache the way bench.py will consume the artifact
    # (deserialize -> jit(call) -> lower -> compile), and record the
    # cost analysis for the MFU fallback
    t0 = time.time()
    reloaded = jax.export.deserialize(blob)
    guard = _stall_watchdog(900.0, f"{mode} artifact compile")
    compiled = jax.jit(reloaded.call).lower(*args).compile()
    guard.set()
    print(f"[export] {mode}: artifact compile (cache warm) "
          f"{time.time()-t0:.1f}s", flush=True)
    cost = {}
    try:
        c = compiled.cost_analysis()
        if c:
            cost = {k: float(c[k]) for k in ("flops", "bytes accessed")
                    if c.get(k)}
    except Exception as e:  # noqa: BLE001 — telemetry only
        print(f"[export] {mode}: cost_analysis unavailable: {e}",
              file=sys.stderr)
    if pallas_flops():
        cost["pallas_flops"] = pallas_flops()

    name = f"{mode}_step.bin"
    with open(os.path.join(ART_DIR, name), "wb") as f:
        f.write(blob)
    return {"file": name, "bytes": len(blob), "cost": cost}


def _stall_watchdog(timeout_s: float, what: str):
    """The axon tunnel can wedge indefinitely (claim or any remote
    compile round-trip — two wedges observed in one evening, r4); a
    tool that hangs silently burns the whole session.  Exit 3 if the
    guarded phase doesn't finish in time; callers retry."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(f"[export] WEDGED: {what} exceeded {timeout_s:.0f}s — "
                  f"exiting for retry", flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    os.makedirs(ART_DIR, exist_ok=True)
    guard = _stall_watchdog(300.0, "claim + trainer init")
    trainer, encoder = build_bench_trainer()
    guard.set()
    print("[export] trainer built", flush=True)
    manifest = {
        "fingerprint": source_fingerprint(),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "config": bench_config_key("train", 768, "resnet152", 224, "train"),
        "steps": {},
    }
    for mode in ("train", "eval"):
        manifest["steps"][mode] = export_step(trainer, encoder, mode)
    with open(os.path.join(ART_DIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"[export] manifest -> {ART_DIR}/manifest.json")


if __name__ == "__main__":
    main()
