"""Fused Pallas TPU kernel for one GGNN propagation step.

BASELINE north star: "the GGNN — role-graph adjacency matmul propagation plus
GRU-style gated node updates — fuses into a single Pallas kernel per
message-passing step."  This kernel computes, in ONE ``pallas_call`` per
step, what the reference does with 8 separate torch ops per step
(/root/reference/model.py:59-86):

    s   = sum over each example's masked nodes of h
    agg = mask ? (s - h) : h                (adjacency contraction —
                                             masked-sum form, see ops/ggnn.py)
    n   = agg @ W_p + N * b_p               (the reference's per-slot Linear
                                             fires its bias N times per node)
    zr = sigmoid([n; h] @ [[W_z W_r]; [U_z U_r]] + b_zr)
    c  = tanh([n; r*h] @ [[W_h]; [U_h]] + b_c)
    h' = (1 - z) * h + z * c

Layout: rows are (example, node) pairs with the node dim padded to
``NODE_TILE = 8`` (sublane-friendly); extra pad nodes carry mask 0 and evolve
independently (self-message), exactly like the reference's pad roles, and
are sliced off by the wrapper.  The three matmul groups stream their weight
k-tiles HBM→VMEM with double-buffered async DMA while accumulating in fp32
VMEM scratch; gates and the blend are fused in-register (VPU) before the
single bf16 write-back of h'.

The wrapper ``ggnn_propagate_pallas`` is a drop-in replacement for
``ops.ggnn.ggnn_propagate`` with a ``jax.custom_vjp``: forward runs this
kernel; backward differentiates the (mathematically identical) masked-sum
XLA implementation, recomputing activations (rematerialization — the fused
forward never writes intermediates to HBM, so there is nothing to save).

Measured on TPU v5e (B=1536, R=6, D=2048, 4 steps, bf16): this kernel runs
at 32 ms (67 TF/s effective) vs 12.8 ms (169 TF/s, ~86% of nominal peak)
for the plain-XLA masked-sum formulation — XLA's matmul codegen + epilogue
fusion already saturates the MXU for these large dense GEMMs, so the fused
kernel is kept as an optional implementation (``TrainerConfig.ggnn_impl =
"pallas"``) and correctness oracle, while ``masked`` remains the production
default.  Numerical agreement: max |diff| = 0.008-0.016 (bf16 resolution)
over 4 steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from situation_recognition_tpu.ops.ggnn import GGNNParams, ggnn_propagate

NODE_TILE = 8


def _step_kernel(h_ref, mask_ref, wp_ref, bp_ref, wzr_ref, bzr_ref,
                 wc_ref, bc_ref, out_ref,
                 acc_ref, xnh_ref, zr_ref, wbuf_p, wbuf_zr, wbuf_c, sem,
                 *, bm: int, d: int, kt: int, bias_mult: float):
    """One fused GGNN step for a (bm, d) row block.

    acc_ref  (bm, d)  f32  scratch — projection then candidate accumulator
    xnh_ref  (bm, 2d) bf16 scratch — [n | h] for group 2, [n | r*h] for
                                     group 3 (contiguous so k-tiles slice
                                     one ref without per-tile control flow)
    zr_ref   (bm, 2d) f32  scratch — z|r pre-activation accumulator
    wbuf_*   (2, kt, ...) bf16 scratch — double-buffered weight tiles
    """
    h = h_ref[:]                                    # (bm, d) bf16

    def stream_matmul(acc, w_hbm, wbuf, x_ref, total_k):
        """acc += sum_k x_ref[:, k-tile] @ w_hbm[k-tile, :]."""
        nk = total_k // kt

        def dma(slot, ki):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(ki * kt, kt), :], wbuf.at[slot], sem.at[slot])

        dma(0, 0).start()

        def body(ki, _):
            slot = ki % 2

            @pl.when(ki + 1 < nk)
            def _():
                dma((ki + 1) % 2, ki + 1).start()

            dma(slot, ki).wait()
            acc[:] += jnp.dot(x_ref[:, pl.ds(ki * kt, kt)], wbuf[slot],
                              preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nk, body, 0, unroll=False)

    # ---- neighbour aggregation (masked sum per example, pre-projection) --
    mask = mask_ref[:]                              # (bm, 1) f32
    groups = bm // NODE_TILE
    hg = h.astype(jnp.float32).reshape(groups, NODE_TILE, d)
    mg = mask.reshape(groups, NODE_TILE, 1)
    s = jnp.sum(hg * mg, axis=1, keepdims=True)     # (groups, 1, d)
    agg = jnp.where(mg > 0, s - hg, hg).reshape(bm, d)
    xnh_ref[:, :d] = agg.astype(jnp.bfloat16)

    # ---- group 1: n = agg @ W_p + N * b_p (per-slot bias, see ops/ggnn) --
    acc_ref[:] = jnp.zeros((bm, d), jnp.float32)
    stream_matmul(acc_ref, wp_ref, wbuf_p, xnh_ref, d)
    n = acc_ref[:] + bias_mult * bp_ref[:]          # (bm, d) f32
    xnh_ref[:, :d] = n.astype(jnp.bfloat16)
    xnh_ref[:, d:] = h

    # ---- group 2: zr = sigmoid([n; h] @ Wzr + b_zr) ----------------------
    zr_ref[:] = jnp.zeros((bm, 2 * d), jnp.float32)
    stream_matmul(zr_ref, wzr_ref, wbuf_zr, xnh_ref, 2 * d)
    zr = jax.nn.sigmoid(zr_ref[:] + bzr_ref[:])
    z = zr[:, :d]
    r = zr[:, d:]

    # ---- group 3: c = tanh([n; r*h] @ Wc + b_c) --------------------------
    acc_ref[:] = jnp.zeros((bm, d), jnp.float32)
    xnh_ref[:, d:] = (r * h.astype(jnp.float32)).astype(jnp.bfloat16)
    stream_matmul(acc_ref, wc_ref, wbuf_c, xnh_ref, 2 * d)
    c = jnp.tanh(acc_ref[:] + bc_ref[:])

    # ---- blend -----------------------------------------------------------
    hf = h.astype(jnp.float32)
    out_ref[:] = ((1.0 - z) * hf + z * c).astype(out_ref.dtype)


def pack_weights(params: GGNNParams, dtype=jnp.bfloat16):
    """Pack the 7 dense layers into the kernel's 3 matmul groups."""
    wp = params.w_p.astype(dtype)
    bp = params.b_p.astype(jnp.float32)[None, :]
    wzr = jnp.block([[params.w_z, params.w_r],
                     [params.u_z, params.u_r]]).astype(dtype)
    bzr = jnp.concatenate([params.b_wz + params.b_uz,
                           params.b_wr + params.b_ur]
                          ).astype(jnp.float32)[None, :]
    wc = jnp.concatenate([params.w_h, params.u_h], axis=0).astype(dtype)
    bc = (params.b_wh + params.b_uh).astype(jnp.float32)[None, :]
    return wp, bp, wzr, bzr, wc, bc


def ggnn_step_pallas(packed, h, mask_rows, *, bm: int = 128,
                     kt: int = 128, bias_mult: float = 1.0,
                     interpret: bool = False):
    """One fused step.  h (M, D) bf16, mask_rows (M, 1) f32; M % bm == 0,
    bm % 8 == 0, D % kt == 0.  ``bias_mult`` is the logical node count N
    (the reference's per-slot bias fires N times per node)."""
    wp, bp, wzr, bzr, wc, bc = packed
    m, d = h.shape
    assert m % bm == 0 and bm % NODE_TILE == 0 and d % kt == 0, (m, bm, d, kt)

    kernel = functools.partial(_step_kernel, bm=bm, d=d, kt=kt,
                               bias_mult=bias_mult)
    grid = (m // bm,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # wp  (d, d)
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # wzr (2d, 2d)
            pl.BlockSpec((1, 2 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # wc  (2d, d)
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.float32),        # acc
            pltpu.VMEM((bm, 2 * d), jnp.bfloat16),   # [n | h] / [n | r*h]
            pltpu.VMEM((bm, 2 * d), jnp.float32),    # zr acc
            pltpu.VMEM((2, kt, d), jnp.bfloat16),    # wp tiles
            pltpu.VMEM((2, kt, 2 * d), jnp.bfloat16),
            pltpu.VMEM((2, kt, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(h, mask_rows, wp, bp, wzr, bzr, wc, bc)


def _propagate_fwd_impl(params: GGNNParams, hidden, mask, num_steps: int,
                        interpret: bool):
    """hidden (B, R, D), mask (B, R) → (B, R, D) via the fused kernel."""
    b, r, d = hidden.shape
    dtype = hidden.dtype
    # pad node dim to NODE_TILE with mask-0 nodes (independent, sliced off)
    if r < NODE_TILE:
        hidden = jnp.pad(hidden, ((0, 0), (0, NODE_TILE - r), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, NODE_TILE - r)))
    m = b * NODE_TILE
    # bm=128/kt=128 is the validated config: bm=192 exceeds the 16M VMEM
    # budget (Pallas double-buffers the I/O blocks) and kt=64 crashes the
    # Mosaic compiler; see module docstring for measured numbers.
    bm = 128 if m % 128 == 0 else NODE_TILE
    kt = 128 if d % 128 == 0 else d
    h = hidden.reshape(m, d).astype(jnp.bfloat16)
    mask_rows = mask.reshape(m, 1).astype(jnp.float32)
    packed = pack_weights(params)
    for _ in range(num_steps):
        h = ggnn_step_pallas(packed, h, mask_rows, bm=bm, kt=kt,
                             bias_mult=float(r), interpret=interpret)
    return h.reshape(b, NODE_TILE, d)[:, :r, :].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ggnn_propagate_pallas(params: GGNNParams, hidden, mask,
                          num_steps: int = 4, interpret: bool = False):
    """Drop-in fused-kernel replacement for ``ggnn_propagate``.

    Backward differentiates the identical masked-sum XLA formulation with
    full recomputation (the fused forward stores no intermediates).
    """
    return _propagate_fwd_impl(params, hidden, mask, num_steps, interpret)


def _fwd(params, hidden, mask, num_steps, interpret):
    out = _propagate_fwd_impl(params, hidden, mask, num_steps, interpret)
    return out, (params, hidden, mask)


def _bwd(num_steps, interpret, res, g):
    params, hidden, mask = res
    _, vjp = jax.vjp(
        lambda p, h: ggnn_propagate(p, h, mask, num_steps), params, hidden)
    dp, dh = vjp(g)
    return dp, dh, None


ggnn_propagate_pallas.defvjp(_fwd, _bwd)
