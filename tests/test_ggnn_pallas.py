"""Fused Pallas GGNN kernel vs the masked-sum XLA implementation
(interpret mode on CPU; the real-TPU comparison runs in bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.ops.ggnn import ggnn_propagate, init_ggnn_params
from situation_recognition_tpu.ops.ggnn_pallas import (
    ggnn_propagate_pallas, pack_weights)


def _setup(d=256, B=16, R=6, seed=0):
    params = init_ggnn_params(jax.random.PRNGKey(seed), d)
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((B, R, d)) * 0.5, jnp.float32)
    counts = rng.integers(1, R + 1, B)
    mask = jnp.asarray((np.arange(R)[None, :] < counts[:, None]), jnp.float32)
    return params, h, mask


@pytest.mark.parametrize("steps", [1, 4])
def test_pallas_matches_masked(steps):
    params, h, mask = _setup()
    want = ggnn_propagate(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params),
        h.astype(jnp.bfloat16), mask, num_steps=steps).astype(jnp.float32)
    got = ggnn_propagate_pallas(params, h, mask, steps, True)
    # both run bf16 matmuls; agreement at bf16 resolution
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
    # and against the fp32 oracle within bf16 tolerance
    ref = ggnn_propagate(params, h, mask, num_steps=steps)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.15, err


def test_pallas_small_node_dim_padding():
    # R=4 (fixture-sized) exercises the NODE_TILE padding path
    params, h, mask = _setup(d=128, B=8, R=4, seed=1)
    want = ggnn_propagate(params, h, mask, num_steps=2)
    got = ggnn_propagate_pallas(params, h, mask, 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)
    assert got.shape == h.shape


def test_pallas_grad_matches_masked_grad():
    """The custom VJP differentiates the masked XLA path at the saved f32
    residuals, so under a FIXED cotangent (a linear functional — the
    cotangent then cannot inherit the forward's bf16 rounding) the two
    gradient paths must agree to float tolerance, not a loose bound."""
    params, h, mask = _setup(d=128, B=8, R=6, seed=2)
    ct = jnp.asarray(
        np.random.default_rng(7).standard_normal(h.shape), jnp.float32)

    def loss_pallas(p, h):
        return jnp.sum(ggnn_propagate_pallas(p, h, mask, 2, True) * ct)

    def loss_masked(p, h):
        return jnp.sum(ggnn_propagate(p, h, mask, num_steps=2) * ct)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(params, h)
    gm = jax.grad(loss_masked, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def quad_pallas(p, h):
        return jnp.sum(ggnn_propagate_pallas(p, h, mask, 2, True) ** 2)

    # quadratic loss: the cotangent 2*out carries the forward's bf16
    # rounding; bound = that rounding propagated through the linear VJP
    gq = jax.grad(quad_pallas, argnums=(0, 1))(params, h)
    gr = jax.grad(lambda p, h: jnp.sum(
        ggnn_propagate(p, h, mask, num_steps=2) ** 2), argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gq), jax.tree.leaves(gr)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() / scale < 0.02, np.abs(a - b).max()


def test_pack_weights_shapes():
    params = init_ggnn_params(jax.random.PRNGKey(0), 128)
    wp, bp, wz, bz, wr, br, wc, bc = pack_weights(params)
    assert wp.shape == (128, 128)
    assert wz.shape == (256, 128) and wr.shape == (256, 128)
    assert wc.shape == (256, 128)
    assert bz.shape == (1, 128)
    # bias packing: combined W+U biases; [W; U] stacking along k
    np.testing.assert_allclose(
        np.asarray(bz[0]), np.asarray(params.b_wz + params.b_uz), rtol=1e-6)
    import jax.numpy as jnp

    np.testing.assert_array_equal(
        np.asarray(wc[:128]), np.asarray(params.w_h.astype(jnp.bfloat16)))
    np.testing.assert_array_equal(
        np.asarray(wc[128:]), np.asarray(params.u_h.astype(jnp.bfloat16)))
