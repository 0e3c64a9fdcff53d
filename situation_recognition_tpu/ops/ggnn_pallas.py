"""Fused Pallas TPU kernel: the ENTIRE 4-step GGNN propagation in one
``pallas_call``.

BASELINE north star: "the GGNN — role-graph adjacency matmul propagation plus
GRU-style gated node updates — fuses into a single Pallas kernel per
message-passing step."  This kernel goes further than per-step fusion: each
grid block holds whole examples (the role graph is ≤ R nodes, so propagation
never crosses block boundaries) and runs ALL ``num_steps`` steps before
writing h back, eliminating every intermediate HBM round-trip.  Per step and
block it computes what the reference does with 8 separate torch ops
(/root/reference/model.py:59-86):

    agg = E @ h                      (adjacency contraction, MXU — E is the
                                      block-diagonal imSitu adjacency built
                                      in-kernel from the role mask:
                                      E = same_example * m m^T + diag(1-2m))
    n   = agg @ W_p + R * b_p        (the reference's per-slot Linear fires
                                      its bias R = max_role_count times)
    z   = sigmoid([n; h] @ [W_z; U_z] + b_z)
    r   = sigmoid([n; h] @ [W_r; U_r] + b_r)
    c   = tanh([n; r*h] @ [W_h; U_h] + b_c)
    h'  = (1 - z) * h + z * c

Design notes (v5e, B=1536, R=6, D=2048, 4 steps, bf16):

* **Native R rows.**  The round-1 kernel padded the node dim 6→8 for sublane
  alignment — 33% wasted FLOPs.  Here rows stay at R per example; the
  per-example masked sum is an (bm, bm) @ (bm, d) MXU matmul against the
  block-diagonal adjacency (≈3% FLOP overhead), so no sublane-hostile
  reshape is needed and bm only has to be a multiple of lcm(R, 16).
* **4-step fusion amortizes weight streaming.**  All 7 weight matrices are
  ~59 MB bf16 — too big for VMEM — so they stream per (block, step) as
  double-buffered kt-wide k-tiles.  Fewer, larger row blocks (bm=288, the
  VMEM ceiling at d=2048) cut total weight traffic to ~7.5 GB per propagate
  (the round-1 per-step kernel moved ~22 GB and was DMA-bound at 32 ms).
* **One f32 accumulator.**  z/r/c are computed sequentially through a single
  (bm, d) f32 scratch instead of a (bm, 2d) zr accumulator — that VMEM saving
  is what allows bm=288 (round 1's ceiling was bm=192; bm=384 still exceeds
  the 16 MB budget by 1.6 MB).

Measured (flagship shape, 20-iter steady state, kt=256, statically unrolled
k-loop): **15.1 ms vs round 1's 32 ms** — but plain XLA masked-sum runs the
same math at **13.5 ms (160 TF/s, ~81% MXU)**, so ``masked`` remains the
production default.  Why XLA keeps a ~12% edge here: its 7 separate d×d
GEMMs hold each weight matrix resident in VMEM and stream only activations
(~0.65 GB/step), which is optimal when activations (38 MB) are smaller than
the weight set (59 MB); the fused kernel must re-stream all 59 MB per
288-row block (7.5 GB per propagate ≈ 9.2 ms of DMA against ~11 ms of MXU
work), and Mosaic cannot lower bf16 transcendentals, so the gate epilogues
pay full-f32 VPU traffic.  The op is compute-bound under XLA, so the fusion
win (no intermediate HBM round-trips) has nothing to buy back.  Numerical
agreement with the XLA path: max |diff| ≈ 0.016 (bf16 resolution, 4 steps).

The wrapper ``ggnn_propagate_pallas`` is a drop-in replacement for
``ops.ggnn.ggnn_propagate`` with a ``jax.custom_vjp``: forward runs this
kernel; backward differentiates the (mathematically identical) masked-sum
XLA implementation, recomputing activations (rematerialization — the fused
forward never writes intermediates to HBM, so there is nothing to save).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from situation_recognition_tpu.ops.ggnn import GGNNParams, ggnn_propagate


def _block_adjacency(mask_ref, e_ref, bm: int, r: int):
    """Write the block-diagonal imSitu adjacency into e_ref (bf16):
    E[i,j] = same_example(i,j) * m_i * m_j for i != j, E[i,i] = 1 - m_i —
    exactly the reference get_adj_matrix_noself tiles.  Shared by both
    kernel variants so the semantics live in one place."""
    m = mask_ref[:]                                       # (bm, 1) f32
    ii = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 1)
    same = (ii // r == jj // r).astype(jnp.float32)
    diag = (ii == jj).astype(jnp.float32)
    e = same * (m * m.reshape(1, bm)) + diag * (1.0 - 2.0 * m)
    e_ref[:] = e.astype(jnp.bfloat16)



def _propagate_kernel(h_ref, mask_ref, wp_ref, bp_ref, wz_ref, bz_ref,
                      wr_ref, br_ref, wc_ref, bc_ref, out_ref,
                      xn_ref, xh_ref, acc_ref, z_ref, e_ref, wbuf0, wbuf1,
                      sem,
                      *, bm: int, d: int, kt: int, r: int, steps: int,
                      bias_mult: float):
    """num_steps of GGNN for one (bm, d) block of whole examples.

    xn_ref  (bm, d)  bf16 — agg for group 1, then n for the gate groups
    xh_ref  (bm, d)  bf16 — h for z/r, r*h for c (kt divides d, so weight
                            k-tiles never straddle the [n | h] boundary —
                            two separate refs avoid the lane-misaligned
                            sub-128 slices Mosaic rejects at small d)
    acc_ref (bm, d)  f32  — shared matmul accumulator
    z_ref   (bm, d)  bf16 — update gate, kept across the c-group matmul
    e_ref   (bm, bm) bf16 — block-diagonal adjacency (built once per block)
    wbuf0/1 (kt, d) bf16 — double-buffered weight k-tiles (two standalone
                           scratches, not a stacked (2, kt, d): at small d
                           Mosaic lane-fuses the stack and ``.at[slot]``
                           becomes an unaligned lane slice)
    """
    tiles_per_part = d // kt
    wbufs = (wbuf0, wbuf1)

    def stream_matmul(w_hbm, parts):
        """acc_ref = sum over the k-tiles of concat(parts) @ w_hbm tiles
        (f32 accum).  Statically unrolled (nk is compile-time): no
        loop/branch overhead, and the first tile writes acc directly."""
        nk = tiles_per_part * len(parts)

        def dma(slot, ki):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(ki * kt, kt), :], wbufs[slot], sem.at[slot])

        def x_tile(ki):
            ref = parts[ki // tiles_per_part]
            if tiles_per_part == 1:
                return ref[:]
            return ref[:, pl.ds((ki % tiles_per_part) * kt, kt)]

        dma(0, 0).start()
        for ki in range(nk):
            slot = ki % 2
            if ki + 1 < nk:
                dma((ki + 1) % 2, ki + 1).start()
            dma(slot, ki).wait()
            tile = jnp.dot(x_tile(ki), wbufs[slot][:],
                           preferred_element_type=jnp.float32)
            if ki == 0:
                acc_ref[:] = tile
            else:
                acc_ref[:] += tile

    # once per block; the mask is constant across steps
    _block_adjacency(mask_ref, e_ref, bm, r)

    out_ref[:] = h_ref[:]

    for _ in range(steps):
        h = out_ref[:]                                    # (bm, d) bf16
        # adjacency contraction on the MXU
        agg = jnp.dot(e_ref[:], h, preferred_element_type=jnp.float32)
        xn_ref[:] = agg.astype(jnp.bfloat16)
        # n = agg @ W_p + R * b_p  (per-slot bias, see ops/ggnn.py)
        stream_matmul(wp_ref, (xn_ref,))
        n = acc_ref[:] + bias_mult * bp_ref[:]
        xn_ref[:] = n.astype(jnp.bfloat16)
        xh_ref[:] = h
        # gates stay f32: Mosaic cannot lower bf16 transcendentals
        # (vector.broadcast element-type verification failure)
        # z = sigmoid([n; h] @ [W_z; U_z] + b_z)
        stream_matmul(wz_ref, (xn_ref, xh_ref))
        z_ref[:] = jax.nn.sigmoid(acc_ref[:] + bz_ref[:]).astype(jnp.bfloat16)
        # r = sigmoid([n; h] @ [W_r; U_r] + b_r)
        stream_matmul(wr_ref, (xn_ref, xh_ref))
        rr = jax.nn.sigmoid(acc_ref[:] + br_ref[:])
        hf = h.astype(jnp.float32)
        xh_ref[:] = (rr * hf).astype(jnp.bfloat16)
        # c = tanh([n; r*h] @ [W_h; U_h] + b_c)
        stream_matmul(wc_ref, (xn_ref, xh_ref))
        c = jnp.tanh(acc_ref[:] + bc_ref[:])
        z = z_ref[:].astype(jnp.float32)
        out_ref[:] = ((1.0 - z) * hf + z * c).astype(out_ref.dtype)


def _propagate_kernel_small(h_ref, mask_ref, wp, bp, wz, bz, wr, br, wc, bc,
                            uz, ur, uh, out_ref, e_ref,
                            *, bm: int, d: int, r: int, steps: int,
                            bias_mult: float):
    """Small-d variant (d <= 512): every weight is a whole VMEM block, so
    there is no k-tile streaming and no sub-128 lane slicing (which Mosaic
    rejects below the 128 tile).  Used by tests / tiny configs; production
    d=2048 takes the streaming kernel."""
    _block_adjacency(mask_ref, e_ref, bm, r)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] = h_ref[:]
    for _ in range(steps):
        h = out_ref[:]
        agg = dot(e_ref[:], h).astype(jnp.bfloat16)
        n = (dot(agg, wp[:]) + bias_mult * bp[:]).astype(jnp.bfloat16)
        z = jax.nn.sigmoid(dot(n, wz[:]) + dot(h, uz[:]) + bz[:])
        rr = jax.nn.sigmoid(dot(n, wr[:]) + dot(h, ur[:]) + br[:])
        hf = h.astype(jnp.float32)
        rh = (rr * hf).astype(jnp.bfloat16)
        c = jnp.tanh(dot(n, wc[:]) + dot(rh, uh[:]) + bc[:])
        out_ref[:] = ((1.0 - z) * hf + z * c).astype(out_ref.dtype)


def _propagate_small(params: GGNNParams, h, mask_rows, *, r: int,
                     steps: int, bias_mult: float, bm: int, m_padded: int,
                     interpret: bool):
    m, d = h.shape
    cast = lambda x: x.astype(jnp.bfloat16)
    vec = lambda x: x.astype(jnp.float32)[None, :]
    weights = [cast(params.w_p), vec(params.b_p),
               cast(params.w_z), vec(params.b_wz + params.b_uz),
               cast(params.w_r), vec(params.b_wr + params.b_ur),
               cast(params.w_h), vec(params.b_wh + params.b_uh),
               cast(params.u_z), cast(params.u_r), cast(params.u_h)]
    kernel = functools.partial(_propagate_kernel_small, bm=bm, d=d, r=r,
                               steps=steps, bias_mult=bias_mult)
    wspecs = []
    for w in weights:
        shape = w.shape
        wspecs.append(pl.BlockSpec(shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(m_padded // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_padded, d), h.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bm), jnp.bfloat16)],
        interpret=interpret,
    )(h, mask_rows, *weights)


def pack_weights(params: GGNNParams, dtype=jnp.bfloat16):
    """Pack the 7 dense layers into the kernel's 4 matmul groups
    (all (., d)-shaped outputs so one weight buffer serves every stream)."""
    wp = params.w_p.astype(dtype)
    bp = params.b_p.astype(jnp.float32)[None, :]
    wz = jnp.concatenate([params.w_z, params.u_z], axis=0).astype(dtype)
    bz = (params.b_wz + params.b_uz).astype(jnp.float32)[None, :]
    wr = jnp.concatenate([params.w_r, params.u_r], axis=0).astype(dtype)
    br = (params.b_wr + params.b_ur).astype(jnp.float32)[None, :]
    wc = jnp.concatenate([params.w_h, params.u_h], axis=0).astype(dtype)
    bc = (params.b_wh + params.b_uh).astype(jnp.float32)[None, :]
    return wp, bp, wz, bz, wr, br, wc, bc


def _pick_bm(m: int, r: int, d: int) -> int:
    """Block size: multiple of lcm(r, 16) (whole examples + bf16 sublane
    alignment), as large as the VMEM budget allows — weight traffic scales
    with the block count.  288 is the ceiling at d=2048 (bm=384 needs
    17.6 MB vs the 16 MB budget).  Rows are padded up to a bm multiple by
    the wrapper; when the whole problem is smaller than one tile, the whole
    array is the block (always a legal Pallas block shape)."""
    import math

    unit = (r * 16) // math.gcd(r, 16)
    if m <= unit:
        return m

    def footprint(bm: int) -> int:
        # xn+xh+z bf16 (3*2) + acc f32 (4) + double-buffered in/out blocks
        # bf16 (2 bufs * 2 blocks * 2 bytes = 8)  => 18 bytes/elem of (bm,d)
        # + the (bm, bm) bf16 adjacency + two (kt<=256, d) bf16 weight bufs
        return 18 * bm * d + 2 * bm * bm + 2 * 2 * 256 * d

    # measured ceiling at d=2048: bm=288 fits (12.8 MB of 16), 384 does not
    budget = 13_500_000
    bm = (min(288, m) // unit) * unit
    while bm >= unit and footprint(bm) > budget:
        bm -= unit
    if bm < unit:
        if footprint(unit) > budget:
            raise NotImplementedError(
                f"GGNN Pallas kernel: one example-group (lcm(R={r}, 16) = "
                f"{unit} rows) already exceeds the VMEM block budget; use "
                f"ggnn_impl='masked'")
        bm = unit
    return bm


def ggnn_propagate_fused(packed, h, mask_rows, *, r: int, steps: int,
                         bias_mult: float, kt: int = 256,
                         bm: int | None = None, m_padded: int | None = None,
                         interpret: bool = False):
    """h (M, D) bf16 rows of whole examples, pre-padded to a bm multiple
    (M % bm == 0); mask (M, 1) f32."""
    m, d = h.shape
    bm = bm if bm is not None else _pick_bm(m, r, d)
    m_padded = m_padded if m_padded is not None else m
    assert m_padded % bm == 0, (m_padded, bm)
    kernel = functools.partial(_propagate_kernel, bm=bm, d=d,
                               kt=kt if d % kt == 0 else d, r=r, steps=steps,
                               bias_mult=bias_mult)
    return pl.pallas_call(
        kernel,
        grid=(m_padded // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),             # wp  (d, d)
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),             # wz  (2d, d)
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),             # wr  (2d, d)
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),             # wc  (2d, d)
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_padded, d), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.bfloat16),       # xn
            pltpu.VMEM((bm, d), jnp.bfloat16),       # xh
            pltpu.VMEM((bm, d), jnp.float32),        # acc
            pltpu.VMEM((bm, d), jnp.bfloat16),       # z
            pltpu.VMEM((bm, bm), jnp.bfloat16),      # E
            pltpu.VMEM((kt if d % kt == 0 else d, d), jnp.bfloat16),
            pltpu.VMEM((kt if d % kt == 0 else d, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(h, mask_rows, *packed)


def _propagate_fwd_impl(params: GGNNParams, hidden, mask, num_steps: int,
                        interpret: bool):
    """hidden (B, R, D), mask (B, R) → (B, R, D) via the fused kernel.

    d <= 512 (tests / tiny configs) takes the weights-resident small kernel
    — the weight set fits VMEM and the streaming kernel's sub-128 lane
    slices are illegal there; production d takes the streaming kernel."""
    import os

    b, r, d = hidden.shape
    dtype = hidden.dtype
    h = hidden.reshape(b * r, d).astype(jnp.bfloat16)
    mask_rows = mask.reshape(b * r, 1).astype(jnp.float32)
    m = b * r
    bm = _pick_bm(m, r, d)
    if m % bm != 0:
        # pad with whole dummy examples (mask 0 — evolve independently,
        # sliced off by the callee) so every block holds complete examples
        pad = bm - m % bm
        h = jnp.pad(h, ((0, pad), (0, 0)))
        mask_rows = jnp.pad(mask_rows, ((0, pad), (0, 0)))
    m_padded = h.shape[0]
    if d <= 512:
        out = _propagate_small(params, h, mask_rows, r=r, steps=num_steps,
                               bias_mult=float(r), bm=bm, m_padded=m_padded,
                               interpret=interpret)
    else:
        packed = pack_weights(params)
        kt = int(os.environ.get("SRTPU_GGNN_KT", 256))
        out = ggnn_propagate_fused(packed, h, mask_rows, r=r,
                                   steps=num_steps, bias_mult=float(r),
                                   kt=kt, bm=bm, m_padded=m_padded,
                                   interpret=interpret)
    return out[:m].reshape(b, r, d).astype(dtype)


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
