#!/usr/bin/env python
"""Chip-measured perf guards: kernel-level A/B bands as ONE JSON line.

VERDICT r3 #4 created this probe; VERDICT r4 weak #2 showed its first
methodology (strictly-alternating per-call-synced A/B) cannot resolve a
12-vs-13 ms kernel through this rig's TPU tunnel: every call pays
~60-70 ms of dispatch/sync overhead, so both paths read ~76 ms and the
ratio is a coin flip.

The r5 methodology measures DEVICE time by construction: each candidate
is wrapped in ``lax.scan`` inside ONE jit (one dispatch, one scalar
sync, K serial kernel iterations on device), timed at two rep counts,
and the per-kernel time is the SLOPE (t_big - t_small) / (K_big -
K_small) — the constant dispatch+sync overhead cancels exactly.  With
K spans of 24 iterations, a 12 ms kernel contributes ~290 ms of device
time per timed call, two orders of magnitude above the tunnel's per-call
jitter on the residual.  Prints:

  {"ggnn_pallas_ms": .., "ggnn_masked_ms": .., "ggnn_ratio": ..,
   "vit_stream_ms": .., "vit_block_ms": .., "vit_ratio": ..}

ratio > 1.0 means the optimized path wins.  Consumed by
tests/test_perf_regression.py (xslow tier); also runnable by hand.

Env:
  PERF_GUARD_ITERS      timed calls per (candidate, rep-count); default 5
  PERF_GUARD_SKIP_VIT=1 skip the ViT A/B
  PERF_GUARD_HANDICAP=N run each candidate kernel N times per scan
                        iteration (sensitivity check: N=2 must halve the
                        measured "per-kernel" speed of BOTH paths — and
                        PERF_GUARD_HANDICAP_ONLY=pallas|masked|stream|
                        block handicaps just one side, which must flip
                        the corresponding ratio guard; recorded in
                        PERF.md r5 as the proof the guard can fail)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS_SMALL = 4
REPS_BIG = 28


def _handicap(name: str) -> int:
    n = int(os.environ.get("PERF_GUARD_HANDICAP", "1"))
    only = os.environ.get("PERF_GUARD_HANDICAP_ONLY", "")
    if only and only != name:
        return 1
    return max(1, n)


def _scan_ms(step_fn, x0, sync, pairs: int, handicap: int = 1) -> float:
    """Median per-iteration DEVICE ms of ``step_fn`` (carry -> carry) via
    the two-rep-count slope: jit(scan(step, len=K)) for K in {small, big},
    each timed over ``pairs`` calls with a 4-byte scalar sync, slope
    cancels the constant dispatch/sync overhead."""
    import jax

    def make(reps):
        @jax.jit
        def run(x):
            def body(c, _):
                for _i in range(handicap):
                    c = step_fn(c)
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c

        return run

    run_small, run_big = make(REPS_SMALL), make(REPS_BIG)
    # compile + settle both programs
    for f in (run_small, run_big):
        sync(f(x0))
        sync(f(x0))
    ts, tb = [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        sync(run_small(x0))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(run_big(x0))
        tb.append(time.perf_counter() - t0)
    slope = (float(np.median(tb)) - float(np.median(ts))) \
        / (REPS_BIG - REPS_SMALL)
    return slope * 1e3


def ggnn_ab(pairs: int) -> dict:
    """Fused Pallas GGNN propagate vs the masked XLA path, flagship shape
    (B=1536, R=6, D=2048, bf16, 4 steps — the verify-skill reference
    config; r3 device band: masked ~13.4 ms, fused ~12.0 ms)."""
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

    f_pallas = functools.partial(ggnn_propagate_pallas, num_steps=4)
    f_masked = functools.partial(ggnn_propagate, num_steps=4)

    def sync(out):
        float(out[0, 0, 0])            # 4-byte transfer through the tunnel

    # the propagate output has the hidden's shape, so the scan carry is
    # the natural chain (gated updates keep it bounded across reps)
    p_ms = _scan_ms(lambda h: f_pallas(params, h, mask), hidden, sync,
                    pairs, _handicap("pallas"))
    m_ms = _scan_ms(lambda h: f_masked(params, h, mask), hidden, sync,
                    pairs, _handicap("masked"))
    return {"ggnn_pallas_ms": round(p_ms, 2),
            "ggnn_masked_ms": round(m_ms, 2),
            "ggnn_ratio": round(m_ms / p_ms, 3)}


def vit_ab(pairs: int) -> dict:
    """Fused ViT stream stack vs the per-block kernel path, L/14 parity
    shape (B=256, N=257, D=1024, 4 blocks, bf16; r2/r3 band: the stream
    stack wins — that is the reason it exists)."""
    import functools as ft

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

    block = ft.partial(fused_encoder_block, heads=heads, eps=1e-6,
                       quick_gelu=False)

    # neither path maps tokens->tokens (both reduce to the CLS row), so
    # the scan chains through a numerically-negligible feedback term:
    # x + 1e-30*cls underflows to x in bf16 but keeps the data
    # dependency, forcing serial device execution of every iteration
    def chain_stream(c):
        cls = fused_encoder_cls_stack(c, blocks, heads=heads, eps=1e-6)
        return c + jnp.float32(1e-30).astype(c.dtype) * cls[:, None, :]

    def chain_block(c):
        h = c
        for bw in blocks:
            h = block(h, *bw)
        cls = h[:, 0, :]
        return c + jnp.float32(1e-30).astype(c.dtype) * cls[:, None, :]

    def sync(out):
        float(out[0, 0, 0])

    s_ms = _scan_ms(chain_stream, x, sync, pairs, _handicap("stream"))
    b_ms = _scan_ms(chain_block, x, sync, pairs, _handicap("block"))
    return {"vit_stream_ms": round(s_ms, 2),
            "vit_block_ms": round(b_ms, 2),
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
    pairs = int(os.environ.get("PERF_GUARD_ITERS", "5"))
    out = ggnn_ab(pairs)
    if os.environ.get("PERF_GUARD_SKIP_VIT") != "1":
        out.update(vit_ab(pairs))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
