#!/usr/bin/env python
"""Chip-measured perf guards: kernel-level A/B bands as ONE JSON line.

VERDICT r3 #4: the PERF.md numbers (GGNN fused kernel beating the masked
XLA path, the ViT stream stack beating the per-block path) were point
measurements — nothing failed if a refactor quietly regressed them.
This probe re-measures both on the live chip with strictly-alternating
per-call-synced A/B pairs (medians; the queued-loop harnesses
misattribute queue drain — PERF.md r6) and prints:

  {"ggnn_pallas_ms": .., "ggnn_masked_ms": .., "ggnn_ratio": ..,
   "vit_stream_ms": .., "vit_block_ms": .., "vit_ratio": ..}

ratio > 1.0 means the optimized path wins.  Consumed by
tests/test_perf_regression.py (xslow tier); also runnable by hand.

Env: PERF_GUARD_ITERS (default 12 pairs), PERF_GUARD_SKIP_VIT=1.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _median_ab(fa, fb, pairs: int):
    """Strictly-alternating per-call-synced A/B; returns (med_a, med_b) s."""
    ta, tb = [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        fa()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fb()
        tb.append(time.perf_counter() - t0)
    return float(np.median(ta)), float(np.median(tb))


def ggnn_ab(pairs: int) -> dict:
    """Fused Pallas GGNN propagate vs the masked XLA path, flagship shape
    (B=1536, R=6, D=2048, bf16, 4 steps — the verify-skill reference
    config; r3 band: masked ~13.4 ms, fused ~12.0 ms)."""
    import jax
    import jax.numpy as jnp

    from situation_recognition_tpu.ops.ggnn import (
        ggnn_propagate, init_ggnn_params)
    from situation_recognition_tpu.ops.ggnn_pallas import (
        ggnn_propagate_pallas)

    B, R, D = 1536, 6, 2048
    key = jax.random.PRNGKey(0)
    params = init_ggnn_params(key, D)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((B, R, D)) * 0.1, jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, R)) < 0.8, jnp.float32)

    f_pallas = jax.jit(functools.partial(ggnn_propagate_pallas, num_steps=4))
    f_masked = jax.jit(functools.partial(ggnn_propagate, num_steps=4))

    def run_pallas():
        out = f_pallas(params, hidden, mask)
        float(out[0, 0, 0])            # scalar sync through the tunnel

    def run_masked():
        out = f_masked(params, hidden, mask)
        float(out[0, 0, 0])

    run_pallas(); run_masked()         # compile
    run_pallas(); run_masked()         # settle
    p_ms, m_ms = _median_ab(run_pallas, run_masked, pairs)
    return {"ggnn_pallas_ms": round(p_ms * 1e3, 2),
            "ggnn_masked_ms": round(m_ms * 1e3, 2),
            "ggnn_ratio": round(m_ms / p_ms, 3)}


def vit_ab(pairs: int) -> dict:
    """Fused ViT stream stack vs the per-block kernel path, L/14 parity
    shape (B=256, N=257, D=1024, 4 blocks, bf16; r2/r3 band: the stream
    stack wins — that is the reason it exists)."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_vit_block import WIDTHS, _params

    from situation_recognition_tpu.ops.vit_pallas import (
        fused_encoder_block, fused_encoder_cls_stack)

    w = WIDTHS["l14"]
    n, d, heads = w["n"], w["d"], w["heads"]
    rng = np.random.default_rng(0)
    blocks = [_params(rng, d) for _ in range(4)]
    x = jnp.asarray(rng.standard_normal((256, n, d)) * 0.1, jnp.bfloat16)

    @jax.jit
    def f_stream(x):
        return fused_encoder_cls_stack(
            x, blocks, heads=heads, eps=1e-6)

    block = ft.partial(fused_encoder_block, heads=heads, eps=1e-6,
                       quick_gelu=False)

    @jax.jit
    def f_block(x):
        h = x
        for bw in blocks:
            h = block(h, *bw)
        return h[:, 0, :]

    def run_stream():
        float(f_stream(x)[0, 0])

    def run_block():
        float(f_block(x)[0, 0])

    run_stream(); run_block()          # compile
    run_stream(); run_block()          # settle
    s_ms, b_ms = _median_ab(run_stream, run_block, pairs)
    return {"vit_stream_ms": round(s_ms * 1e3, 2),
            "vit_block_ms": round(b_ms * 1e3, 2),
            "vit_ratio": round(b_ms / s_ms, 3)}


def main():
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)  # cache the ~270 tiny init jits too:
        # each is a ~0.5 s REMOTE compile round-trip on the axon
        # tunnel (~2 min of every bench/CLI start measured r4);
        # sub-second entries are a few KB each and cut that to
        # local cache loads
    assert jax.default_backend() == "tpu", (
        "perf_guard measures the live chip; run without the CPU forcing "
        "env (backend is %r)" % jax.default_backend())
    pairs = int(os.environ.get("PERF_GUARD_ITERS", "12"))
    out = ggnn_ab(pairs)
    if os.environ.get("PERF_GUARD_SKIP_VIT") != "1":
        out.update(vit_ab(pairs))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
