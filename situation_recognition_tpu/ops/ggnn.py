"""Gated Graph Neural Network propagation over the imSitu role graph.

TPU-first redesign of the reference GGSNN (``/root/reference/model.py:38-86``).
The reference materializes a per-example (N, N) adjacency on the host each
step and computes, via an expanded (B, N, N, D) tensor (model.py:66-77):
mask each neighbour slot (``A_ij h_j``), apply the ``W_p`` Linear **to every
one of the N slots** (bias included, even for zeroed slots), then sum over
slots.  Because ``Linear`` adds its bias per slot regardless of the mask,
every node receives exactly ``N`` bias contributions:

    n_i = (sum_j A_ij h_j) @ W_p + N * b_p        (N = max_role_count)

and because the imSitu adjacency is structurally
``A = m m^T - diag(m) + diag(1-m)`` for the binary role mask ``m`` (real roles
fully connected without self-loops; pad roles self-loop only,
imsitu_encoder.py:209-229), the adjacency contraction collapses to a masked
sum — no adjacency tensor, no batched tiny matmuls, pure VPU work before one
dense projection:

    s     = sum_j m_j h_j
    agg_i = m_i ? (s - h_i) : h_i
    n_i   = agg_i @ W_p + N * b_p

The constant ``N * b_p`` term (NOT ``degree_i * b_p``) is load-bearing for
bit-compatibility with converted reference checkpoints: the reference's
per-slot bias fires for masked-out slots too.

The GRU-style update (model.py:80-84) is unchanged mathematically:

    z = sigmoid(n W_z + b_wz + h U_z + b_uz)
    r = sigmoid(n W_r + b_wr + h U_r + b_ur)
    c = tanh   (n W_h + b_wh + (r*h) U_h + b_uh)
    h' = (1-z) h + z c

Three interchangeable implementations (differentially tested):
* ``ggnn_propagate``        — masked-sum formulation (default, fastest)
* ``ggnn_propagate_dense``  — explicit adjacency einsum (oracle / parity)
* ``ops.ggnn_pallas``       — fused Pallas TPU kernel (see that module)

Weights are stored (D_in, D_out) for ``x @ W`` (JAX convention; the torch
checkpoint converter transposes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GGNNParams(NamedTuple):
    """The 7 dense layers of the reference GGSNN (model.py:46-56)."""

    w_p: jax.Array
    b_p: jax.Array
    w_z: jax.Array
    b_wz: jax.Array
    u_z: jax.Array
    b_uz: jax.Array
    w_r: jax.Array
    b_wr: jax.Array
    u_r: jax.Array
    b_ur: jax.Array
    w_h: jax.Array
    b_wh: jax.Array
    u_h: jax.Array
    b_uh: jax.Array


def init_ggnn_params(key: jax.Array, d: int, dtype=jnp.float32) -> GGNNParams:
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in)) for both
    weight and bias (same scheme the reference trains from)."""
    bound = 1.0 / np.sqrt(d)
    keys = jax.random.split(key, 14)
    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, -bound, bound)
    ws = [u(keys[2 * i], (d, d)) for i in range(7)]
    bs = [u(keys[2 * i + 1], (d,)) for i in range(7)]
    return GGNNParams(
        ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
        ws[4], bs[4], ws[5], bs[5], ws[6], bs[6])


def _gru_update(p: GGNNParams, n: jax.Array, h: jax.Array) -> jax.Array:
    """The gated update shared by all formulations. n, h: (..., D)."""
    z = jax.nn.sigmoid(n @ p.w_z + p.b_wz + h @ p.u_z + p.b_uz)
    r = jax.nn.sigmoid(n @ p.w_r + p.b_wr + h @ p.u_r + p.b_ur)
    c = jnp.tanh(n @ p.w_h + p.b_wh + (r * h) @ p.u_h + p.b_uh)
    return (1.0 - z) * h + z * c


def ggnn_propagate(
    params: GGNNParams,
    hidden: jax.Array,   # (B, N, D) node states
    mask: jax.Array,     # (B, N) binary role mask (1 = real role)
    num_steps: int = 4,
    remat: bool = False,
) -> jax.Array:
    """Masked-sum GGNN propagation, ``num_steps`` unrolled (static).

    ``remat=True`` wraps each step in ``jax.checkpoint``: the backward pass
    recomputes the step's gate activations instead of storing ~16 (B*N, D)
    tensors across the 4 steps — trades ~33% extra forward FLOPs in the
    GGNN for a ~4x cut in its activation memory (useful for large per-chip
    batches)."""
    mask = mask.astype(hidden.dtype)[..., None]          # (B, N, 1)
    n_slots = hidden.shape[1]                            # reference N = R_max

    def step(h):
        s = jnp.sum(mask * h, axis=1, keepdims=True)      # (B, 1, D)
        agg = jnp.where(mask > 0, s - h, h)               # (B, N, D)
        n = agg @ params.w_p + n_slots * params.b_p       # (B, N, D)
        return _gru_update(params, n, h)

    if remat:
        step = jax.checkpoint(step)
    h = hidden
    for _ in range(num_steps):
        h = step(h)
    return h


def ggnn_propagate_dense(
    params: GGNNParams,
    hidden: jax.Array,   # (B, N, D)
    adjacency: jax.Array,  # (B, N, N) — reference get_adj_matrix_noself output
    num_steps: int = 4,
) -> jax.Array:
    """Reference formulation with an explicit adjacency contraction
    (model.py:66-77).  Kept as the parity oracle for the masked form.

    Op order matches the reference exactly: mask, then the ``W_p`` Linear per
    slot (its bias firing N times per node), then the slot sum — which
    commutes to ``(A h) @ W_p + N * b_p``."""
    h = hidden
    n_slots = hidden.shape[1]
    adjacency = adjacency.astype(hidden.dtype)
    for _ in range(num_steps):
        n = jnp.einsum("bij,bjd->bid", adjacency, h) @ params.w_p \
            + n_slots * params.b_p
        h = _gru_update(params, n, h)
    return h


def ggnn_propagate_verb(
    params: GGNNParams,
    hidden: jax.Array,   # (B, D) single-node graphs
    num_steps: int = 4,
    remat: bool = False,
) -> jax.Array:
    """Verb branch: one node, self-message only (model.py:62-64).

    ``remat`` checkpoints each step like ``ggnn_propagate`` does."""
    def step(h):
        n = h @ params.w_p + params.b_p
        return _gru_update(params, n, h)

    if remat:
        step = jax.checkpoint(step)
    h = hidden
    for _ in range(num_steps):
        h = step(h)
    return h
