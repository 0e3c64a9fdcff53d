"""GGNN propagation tests: masked-sum == dense adjacency == torch oracle.

The torch oracle replicates the reference's literal op order
(/root/reference/model.py:59-86): expand h to (B, N, N, D), multiply by the
adjacency mask, apply the W_p Linear to EVERY slot (so its bias fires N
times per node, masked or not), sum over slots, then the GRU-style gated
update, 4 steps.  Net effect: n_i = (sum_j A_ij h_j) @ W_p + N * b_p.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.ops.ggnn import (
    GGNNParams, ggnn_propagate, ggnn_propagate_dense, ggnn_propagate_verb,
    init_ggnn_params)


def torch_oracle(params: GGNNParams, h, adj=None, steps=4):
    """h: (B,N,D) or (B,D) for verb mode (adj=None)."""
    t = lambda a: torch.from_numpy(np.asarray(a, dtype=np.float64))
    w_p, b_p = t(params.w_p), t(params.b_p)
    w_z, b_wz, u_z, b_uz = t(params.w_z), t(params.b_wz), t(params.u_z), t(params.b_uz)
    w_r, b_wr, u_r, b_ur = t(params.w_r), t(params.b_wr), t(params.u_r), t(params.b_ur)
    w_h, b_wh, u_h, b_uh = t(params.w_h), t(params.b_wh), t(params.u_h), t(params.b_uh)
    h = t(h)
    A = t(adj) if adj is not None else None
    for _ in range(steps):
        if A is not None:
            # reference noun mode (model.py:66-77): expand -> mask -> W_p
            # Linear on every slot (bias included) -> sum over slots
            nb = h.unsqueeze(1).expand(h.shape[0], h.shape[1],
                                       h.shape[1], h.shape[2])
            nb = nb * A.unsqueeze(-1)
            nb = nb @ w_p + b_p
            n = nb.sum(dim=2)
        else:
            # reference verb mode (model.py:62-64): single self-message
            n = h @ w_p + b_p
        z = torch.sigmoid(n @ w_z + b_wz + h @ u_z + b_uz)
        r = torch.sigmoid(n @ w_r + b_wr + h @ u_r + b_ur)
        c = torch.tanh(n @ w_h + b_wh + (r * h) @ u_h + b_uh)
        h = (1 - z) * h + z * c
    return h.numpy()


def _setup(d=32, B=8, seed=0):
    enc = ImsituEncoder.load(None) if False else None
    import json, os
    with open(os.path.join(os.path.dirname(__file__), "fixtures", "overfitting.json")) as f:
        enc = ImsituEncoder(json.load(f), verbose=False)
    key = jax.random.PRNGKey(seed)
    params = init_ggnn_params(key, d)
    rng = np.random.default_rng(seed)
    verbs = rng.integers(0, enc.get_num_verbs(), B)
    h = rng.standard_normal((B, enc.max_role_count, d)).astype(np.float32)
    mask = enc.get_verb2role_encoding_batch(verbs)
    adj = enc.get_adj_matrix_noself(verbs)
    return params, h, mask, adj


def test_masked_equals_dense():
    params, h, mask, adj = _setup()
    out_masked = ggnn_propagate(params, jnp.asarray(h), jnp.asarray(mask))
    out_dense = ggnn_propagate_dense(params, jnp.asarray(h), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-5)


def test_dense_matches_torch_oracle():
    params, h, mask, adj = _setup()
    out = np.asarray(ggnn_propagate_dense(params, jnp.asarray(h), jnp.asarray(adj)))
    want = torch_oracle(params, h, adj)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_masked_matches_torch_oracle():
    params, h, mask, adj = _setup(seed=3)
    out = np.asarray(ggnn_propagate(params, jnp.asarray(h), jnp.asarray(mask)))
    want = torch_oracle(params, h, adj)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_verb_mode_matches_torch_oracle():
    params, h, _, _ = _setup(seed=1)
    hv = h[:, 0, :]  # (B, D) single node
    out = np.asarray(ggnn_propagate_verb(params, jnp.asarray(hv)))
    want = torch_oracle(params, hv[:, None, :], None)[:, 0, :]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_pad_nodes_evolve_independently():
    """Pad nodes have self-loop-only adjacency: their output must not depend
    on real-node values."""
    params, h, mask, adj = _setup(seed=2)
    h2 = h.copy()
    # perturb all real-node states
    real = mask.astype(bool)
    h2[real] += 1.0
    out1 = np.asarray(ggnn_propagate(params, jnp.asarray(h), jnp.asarray(mask)))
    out2 = np.asarray(ggnn_propagate(params, jnp.asarray(h2), jnp.asarray(mask)))
    pad = ~real
    np.testing.assert_allclose(out1[pad], out2[pad], rtol=1e-6, atol=1e-6)
    assert not np.allclose(out1[real], out2[real])


def test_zero_steps_identity():
    params, h, mask, _ = _setup()
    out = ggnn_propagate(params, jnp.asarray(h), jnp.asarray(mask), num_steps=0)
    np.testing.assert_array_equal(np.asarray(out), h)


def test_jit_and_grad():
    params, h, mask, _ = _setup(d=16, B=4)

    @jax.jit
    def loss(p, h):
        return jnp.sum(ggnn_propagate(p, h, jnp.asarray(mask)) ** 2)

    g = jax.grad(loss)(params, jnp.asarray(h))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_remat_matches_plain():
    params, h, mask, _ = _setup(seed=5)
    plain = ggnn_propagate(params, jnp.asarray(h), jnp.asarray(mask))
    remat = ggnn_propagate(params, jnp.asarray(h), jnp.asarray(mask), remat=True)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(remat),
                               rtol=1e-6, atol=1e-6)

    def loss(p, fn_kwargs):
        return jnp.sum(ggnn_propagate(p, jnp.asarray(h), jnp.asarray(mask),
                                      **fn_kwargs) ** 2)

    g1 = jax.grad(lambda p: loss(p, {}))(params)
    g2 = jax.grad(lambda p: loss(p, {"remat": True}))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
