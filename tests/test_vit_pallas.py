"""Fused ViT encoder-block kernels (ops/vit_pallas.py): interpret-mode
differential tests vs the flax composition, custom-VJP grad routing, and
the support gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.models.vit import EncoderBlock
from situation_recognition_tpu.ops.vit_pallas import (
    _reference_block, fused_block_supported, fused_encoder_block)

# smallest supported shape: d % 128 == 0, dh % 64 == 0, rows >= 1024
B, N, D, HEADS = 8, 129, 128, 2


def _params_and_x(seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    d, hid = D, 4 * D

    def w(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale,
                           dtype=jnp.float32)

    p = dict(wq=w(d, d), bq=w(d), wk=w(d, d), bk=w(d), wv=w(d, d),
             bv=w(d), wo=w(d, d), bo=w(d), g1=1.0 + w(d), bb1=w(d),
             g2=1.0 + w(d), bb2=w(d), w1=w(d, hid), b1=w(hid),
             w2=w(hid, d), b2=w(d))
    x = jnp.asarray(rng.standard_normal((B, N, d)), dtype=dtype)
    return p, x


def _args(p):
    return (p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], p["g1"], p["bb1"], p["g2"], p["bb2"],
            p["w1"], p["b1"], p["w2"], p["b2"])


def test_supported_gate():
    assert fused_block_supported(1024, 16, 257, 256)       # ViT-L/14
    assert fused_block_supported(768, 12, 197, 256)        # ViT-B/16
    assert not fused_block_supported(64, 2, 50, 256)       # vit_tiny width
    assert not fused_block_supported(1024, 16, 257, 1)     # too few rows
    assert not fused_block_supported(1056, 16, 257, 256)   # d % 128 != 0
    assert fused_block_supported(1024, 8, 257, 256)        # dh=128 fine
    assert not fused_block_supported(768, 16, 257, 256)    # dh=48 not 64-aligned


@pytest.mark.slow
def test_fused_kernels_match_reference_interpret():
    """Interpret-mode kernels vs the jnp reference block: bf16-class
    agreement (the kernels keep softmax/LN in f32, flax/bf16 reference
    rounds differently)."""
    p, x = _params_and_x()
    want = _reference_block(x, *_args(p), heads=HEADS, eps=1e-6,
                            quick_gelu=False)
    got = fused_encoder_block(x, *_args(p), heads=HEADS, eps=1e-6,
                              quick_gelu=False, interpret=True)
    assert got.shape == want.shape and got.dtype == want.dtype
    diff = np.max(np.abs(np.asarray(got, np.float32)
                         - np.asarray(want, np.float32)))
    scale = np.max(np.abs(np.asarray(want, np.float32)))
    assert diff <= 0.03 * max(scale, 1.0), (diff, scale)


@pytest.mark.slow
def test_fused_kernels_quick_gelu_interpret():
    p, x = _params_and_x(seed=1)
    want = _reference_block(x, *_args(p), heads=HEADS, eps=1e-5,
                            quick_gelu=True)
    got = fused_encoder_block(x, *_args(p), heads=HEADS, eps=1e-5,
                              quick_gelu=True, interpret=True)
    diff = np.max(np.abs(np.asarray(got, np.float32)
                         - np.asarray(want, np.float32)))
    scale = np.max(np.abs(np.asarray(want, np.float32)))
    assert diff <= 0.03 * max(scale, 1.0), (diff, scale)


def test_grad_routes_to_reference():
    """Differentiated calls run XLA AD over _reference_block (the GGNN
    routing contract) — grads are bit-identical to differentiating the
    reference directly, and no pallas call is traced."""
    p, x = _params_and_x(seed=2, dtype=jnp.float32)
    x = x.astype(jnp.bfloat16)

    def loss_fused(x, wq):
        args = (wq,) + _args(p)[1:]
        out = fused_encoder_block(x, *args, heads=HEADS, eps=1e-6,
                                  quick_gelu=False, interpret=False)
        return jnp.sum(out.astype(jnp.float32))

    def loss_ref(x, wq):
        args = (wq,) + _args(p)[1:]
        out = _reference_block(x, *args, heads=HEADS, eps=1e-6,
                               quick_gelu=False)
        return jnp.sum(out.astype(jnp.float32))

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, p["wq"])
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, p["wq"])
    np.testing.assert_array_equal(np.asarray(gx_f, np.float32),
                                  np.asarray(gx_r, np.float32))
    np.testing.assert_array_equal(np.asarray(gw_f, np.float32),
                                  np.asarray(gw_r, np.float32))


@pytest.mark.slow
def test_encoder_block_module_fused_path_interpret():
    """The EncoderBlock module's fused path (param tree built by the flax
    submodules, values routed into the kernels) agrees with its own flax
    path on the same parameters."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3,
                    dtype=jnp.bfloat16)
    flax_block = EncoderBlock(D, HEADS, dtype=jnp.bfloat16,
                              block_impl="flax")
    fused_block = EncoderBlock(D, HEADS, dtype=jnp.bfloat16,
                               block_impl="pallas", interpret=True)
    v = flax_block.init(jax.random.PRNGKey(0), x)
    v2 = fused_block.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (structure AND values: same submodules,
    # same RNG folding)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    want = flax_block.apply(v, x)
    got = fused_block.apply(v, x)
    diff = np.max(np.abs(np.asarray(got, np.float32)
                         - np.asarray(want, np.float32)))
    scale = np.max(np.abs(np.asarray(want, np.float32)))
    assert diff <= 0.03 * max(scale, 1.0), (diff, scale)


def test_encoder_block_auto_is_flax_on_cpu():
    """auto resolves to the flax path off-TPU: outputs are bit-identical
    to block_impl='flax' (no kernels, no numeric drift)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.3,
                    dtype=jnp.bfloat16)
    auto = EncoderBlock(D, HEADS, dtype=jnp.bfloat16)
    flax_block = EncoderBlock(D, HEADS, dtype=jnp.bfloat16,
                              block_impl="flax")
    v = auto.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(auto.apply(v, x), np.float32),
        np.asarray(flax_block.apply(v, x), np.float32))
