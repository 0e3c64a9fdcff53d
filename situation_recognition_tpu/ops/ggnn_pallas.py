"""Fused Pallas TPU kernel: the ENTIRE 4-step GGNN propagation in one
``pallas_call`` — weights VMEM-resident, W_p algebraically folded away.

BASELINE north star: "the GGNN — role-graph adjacency matmul propagation plus
GRU-style gated node updates — fuses into a single Pallas kernel per
message-passing step."  This kernel goes further: each grid block holds whole
examples (the role graph is ≤ R nodes, so propagation never crosses block
boundaries) and runs ALL ``num_steps`` steps before writing h back, so no
intermediate ever touches HBM.  Mathematically it computes exactly what the
reference does with 8 separate torch ops per step
(/root/reference/model.py:59-86):

    agg = E @ h                      (adjacency contraction, MXU — E is the
                                      block-diagonal imSitu adjacency built
                                      in-kernel from the role mask:
                                      E = same_example * m m^T + diag(1-2m))
    n   = agg @ W_p + R * b_p        (the reference's per-slot Linear fires
                                      its bias R = max_role_count times)
    z   = sigmoid(n @ W_z + h @ U_z + b_z)
    r   = sigmoid(n @ W_r + h @ U_r + b_r)
    c   = tanh   (n @ W_h + (r*h) @ U_h + b_c)
    h'  = (1 - z) * h + z * c

Two measured insights turned the round-1/2 streaming kernel (which LOST to
plain XLA) into one that wins:

* **The whole weight set fits VMEM.**  Earlier revisions assumed a ~16 MB
  VMEM budget and streamed all ~59 MB of weights HBM→VMEM once per row block
  (7.5 GB of DMA per propagate; 22 GB in the round-1 per-step variant).
  The v5e exposes far more: with ``vmem_limit_bytes`` raised, every weight
  is passed as a whole VMEM block with a constant index map, so Pallas
  fetches it ONCE for the entire grid.  Weight traffic drops 128×; the
  kernel becomes purely compute-bound.
* **W_p folds into the gate weights** (exact algebra, not an approximation):
  ``n`` feeds only the three gate matmuls, so with W_pz := W_p W_z etc.,

      n @ W_z = agg @ W_pz + R * (b_p W_z)

  eliminating the n-projection matmul entirely — 7 d×d matmuls per step
  become 6, a 14% FLOP cut — and the three agg-side products concatenate
  into ONE (d, 3d) matmul, the z/r h-side pair into ONE (d, 2d).  Per step:
  the adjacency contraction + 3 fat matmuls.  The fold products are
  computed in f32 outside the kernel (once per propagate; CSE'd across the
  verb/noun branches inside a jitted train step).

Measured on v5e at the flagship shape (B=1536, R=6, D=2048, 4 steps, bf16,
20-iter steady state):

    plain XLA masked-sum                     13.3–13.5 ms   (the round-1/2 default)
    XLA running the same folded math         13.1 ms
    round-2 streaming kernel                 15.0 ms
    resident, unfolded                       13.8 ms
    **this kernel (resident + folded, bm=576)  12.0–12.3 ms — 1.09–1.12× XLA
                                               across runs**

so ``ggnn_impl='pallas'`` is now the TPU default (resolved from ``'auto'``).
Numerics: fold products are exact in real arithmetic; in bf16 the kernel
agrees with the masked-sum path to max |diff| ≈ 0.023 over 4 steps (same
class as the unfolded kernel's 0.016 — bf16 resolution, not drift).

Shape support: the fat matmul outputs are lane-sliced at multiples of ``d``,
which Mosaic only allows when ``d % 128 == 0`` — true for every backbone
this framework ships (2048 / 1024 / 768).  Other widths, and widths whose
weight set plus one minimum block cannot fit the VMEM budget (d ≳ 3100 at
R=6 — see ``kernel_supported``), fall back to the mathematically identical
masked-sum XLA implementation.

**Where the kernel runs — forward-only contexts, by measurement.**  The
wrapper ``ggnn_propagate_pallas`` is a drop-in replacement for
``ops.ggnn.ggnn_propagate`` with a ``jax.custom_vjp``.  Undifferentiated
calls — eval, inference/serving, and the gt noun branch whose loss is
logged but never backpropagated (/root/reference/sr.py:76; 1 of the 3
propagates per train step, hoisted outside the grad closure in train.py) —
plus everything outside training, run the fused kernel.  Differentiated calls run XLA AD on the identical
masked-sum math, because every custom backward LOST to it when measured
(fwd+bwd at the grad branch's shape, B=768):

    XLA AD over masked-sum                          19.4 ms   <- used
    kernel fwd + recompute-based custom VJP         ~31   ms  (+12 ms/step
                                                    at the train-step level
                                                    — why the round-2 kernel
                                                    won its microbenchmark
                                                    yet lost the train step)
    kernel fwd saving per-step h/z/r/c residuals
    + jnp-level gradient GEMMs (no recompute,
    14% fewer bwd FLOPs via the fold)               22.2 ms
    r3: residual fwd kernel (6.88) + hand-written
    backward KERNEL fusing the reverse gate chain
    in-VMEM + stacked param GEMMs (13.98)           19.6 ms   (tie)

The jnp-level residual backward loses despite fewer FLOPs because AD
fuses the gate chain into its GEMM epilogues while a jnp reverse pass
materializes each elementwise intermediate (~4 ms).  The round-3
backward KERNEL (``_folded_kernel_bwd`` below) removes exactly that
materialization and lands in a dead heat with AD — the 36-vs-42 m d^2
FLOP advantage buys back what the compiler's fusion already had.  Four
designs measured; routing stays with AD (tie -> incumbent, zero
numerics churn); ``SRTPU_GGNN_BWD=pallas`` selects the kernel path.
Conclusion, documented rather than hidden: on TPU the fused kernel is a
forward-path win; the backward belongs to the compiler.

Two semantic consequences of this routing:

* Under ``jax.grad``, the fwd rule replaces the primal for EVERY call
  inside the differentiated closure — even ones whose output never reaches
  the loss (aux).  A forward-only branch must therefore live OUTSIDE the
  grad closure to actually run the kernel; the train step hoists the gt
  noun branch out for exactly this reason (train.py).
* The differentiated forward's values are the masked path's bf16 numerics,
  while undifferentiated calls carry the kernel's (max |diff| ≈ 0.023 over
  4 steps) — so a loss computed under ``value_and_grad`` and the same loss
  recomputed forward-only agree only to bf16 rounding, not bit-exactly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from situation_recognition_tpu.ops.ggnn import GGNNParams, ggnn_propagate

# Weights + per-block working set must fit under the Mosaic VMEM budget.
# bm=576 at d=2048 measured: ~50 MB resident weights + <60 MB block buffers
# and temporaries run under a 120 MB limit on v5e.  v4+ cores expose
# ~128 MB of VMEM; v2/v3 cores have 16 MB, where the weights-resident
# design cannot hold d=2048 — _vmem_limit() detects the generation so
# `auto` falls back to the masked path there instead of requesting an
# infeasible vmem_limit_bytes and dying in Mosaic compilation.
_VMEM_LIMIT_V4PLUS = 120 * 1024 * 1024
_VMEM_LIMIT_LEGACY = 16 * 1024 * 1024


_vmem_cached: int | None = None


def _vmem_limit() -> int:
    """Per-core VMEM budget for the resident-weight kernel, by detected TPU
    generation (device_kind like 'TPU v5 lite'); non-TPU backends (tests,
    interpret mode) get the v4+ budget so support logic is the same.

    Memoized ONLY on successful device enumeration: a transient backend
    failure (the tunnel rig's documented claim errors) returns the
    conservative legacy budget for that call and retries next time —
    an lru_cache would freeze the optimistic default forever and approve
    the d=2048 resident kernel on a 16 MB-VMEM core."""
    import re

    global _vmem_cached
    if _vmem_cached is not None:
        return _vmem_cached
    try:
        devs = jax.devices()
    except Exception:
        return _VMEM_LIMIT_LEGACY          # transient: do not cache
    kind = ""
    if devs and devs[0].platform == "tpu":
        kind = getattr(devs[0], "device_kind", "") or ""
    m = re.search(r"v(\d+)", kind)
    _vmem_cached = (_VMEM_LIMIT_LEGACY if m and int(m.group(1)) < 4
                    else _VMEM_LIMIT_V4PLUS)
    return _vmem_cached


_BLOCK_BYTES_PER_ELEM = 28   # in/out double buffers + f32 gate temporaries
# Below this many (B*R) rows the kernel is pointless (a sub-tile of MXU
# work dominated by launch/fetch overhead) and degenerate tiny blocks were
# observed to stall the Mosaic compiler (batch-1 inference: bm=1 blocks hit
# a >15-minute remote compile).  Such shapes take the masked XLA path.
_MIN_ROWS = 128


def fold_gate_weights(params: GGNNParams, bias_mult: float,
                      dtype=jnp.bfloat16):
    """Fold W_p / R*b_p into the gate weights and biases (f32 products).

    Returns (wa (d, 3d), uzr (d, 2d), uh (d, d), ba (1, 3d) f32) with the
    gate order [z | r | c] along the fat axis:

        wa  = [W_p W_z | W_p W_r | W_p W_h]
        uzr = [U_z | U_r]
        ba  = [R*b_p W_g + b_wg + b_ug  for g in (z, r, h)]
    """
    f32 = jnp.float32
    wp = params.w_p.astype(f32)
    bp = params.b_p.astype(f32)
    gates = [(params.w_z, params.b_wz, params.b_uz),
             (params.w_r, params.b_wr, params.b_ur),
             (params.w_h, params.b_wh, params.b_uh)]
    wa = jnp.concatenate([wp @ g[0].astype(f32) for g in gates], axis=1)
    ba = jnp.concatenate(
        [bias_mult * (bp @ g[0].astype(f32))
         + g[1].astype(f32) + g[2].astype(f32) for g in gates])[None, :]
    uzr = jnp.concatenate([params.u_z, params.u_r], axis=1)
    return (wa.astype(dtype), uzr.astype(dtype),
            params.u_h.astype(dtype), ba)


def _block_adjacency(mask_ref, e_ref, bm: int, r: int):
    """Write the block-diagonal imSitu adjacency into e_ref (bf16):
    E[i,j] = same_example(i,j) * m_i * m_j for i != j, E[i,i] = 1 - m_i —
    exactly the reference get_adj_matrix_noself tiles.  With mask = 0 every
    node self-messages (E = I), which is the reference's verb branch."""
    m = mask_ref[:]                                       # (bm, 1) f32
    ii = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bm, bm), 1)
    same = (ii // r == jj // r).astype(jnp.float32)
    diag = (ii == jj).astype(jnp.float32)
    e = same * (m * m.reshape(1, bm)) + diag * (1.0 - 2.0 * m)
    e_ref[:] = e.astype(jnp.bfloat16)


def _folded_kernel(h_ref, mask_ref, wa, uzr, uh, ba, out_ref, e_ref,
                   *, bm: int, d: int, r: int, steps: int):
    """num_steps of W_p-folded GGNN for one (bm, d) block of whole examples.

    All weights are whole VMEM blocks (constant index map → fetched once for
    the entire grid).  Per step: 1 (bm,bm)@(bm,d) adjacency matmul + 3 fat
    matmuls; gates stay f32 on the VPU (Mosaic cannot lower bf16
    transcendentals)."""
    _block_adjacency(mask_ref, e_ref, bm, r)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    out_ref[:] = h_ref[:]
    for _ in range(steps):
        h = out_ref[:]                                    # (bm, d) bf16
        agg = dot(e_ref[:], h).astype(jnp.bfloat16)
        ga = dot(agg, wa[:]) + ba[:]                      # (bm, 3d) f32
        gh = dot(h, uzr[:])                               # (bm, 2d) f32
        z = jax.nn.sigmoid(ga[:, :d] + gh[:, :d])
        rr = jax.nn.sigmoid(ga[:, d:2 * d] + gh[:, d:])
        hf = h.astype(jnp.float32)
        rh = (rr * hf).astype(jnp.bfloat16)
        c = jnp.tanh(ga[:, 2 * d:] + dot(rh, uh[:]))
        out_ref[:] = ((1.0 - z) * hf + z * c).astype(out_ref.dtype)


def _weight_bytes(d: int) -> int:
    """Resident footprint of the folded weight set: 6 d×d bf16 matrices
    (as wa/uzr/uh) + the (1, 3d) f32 bias row."""
    return 6 * d * d * 2 + 3 * d * 4


def _block_footprint(bm: int, d: int) -> int:
    """VMEM bytes one (bm, d) grid block needs beyond the resident weights
    (double-buffered in/out + f32 gate temporaries + the (bm, bm) adjacency).
    Single source of truth for kernel_supported and _pick_bm — they MUST
    agree, or a width could pass the support check yet have no block size
    that fits the budget."""
    return _BLOCK_BYTES_PER_ELEM * bm * d + 2 * bm * bm


def _min_block(r: int) -> int:
    """The smallest legal block: whole examples (r rows each) aligned to the
    16-row bf16 sublane tile."""
    return (r * 16) // math.gcd(r, 16)


def kernel_supported(d: int, r: int = 6) -> bool:
    """True when the fused kernel can run (d, r) on real TPU hardware:
    fat-output lane slices need d % 128 == 0, and the folded weights plus
    at least one minimum-size example-group block must fit the VMEM budget
    (the same footprint model _pick_bm uses, so a supported width always
    has a feasible block size)."""
    return (d % 128 == 0 and
            _weight_bytes(d) + _block_footprint(_min_block(r), d)
            <= _vmem_limit())


def _pick_bm(m: int, r: int, d: int, footprint=None) -> int:
    """Block size: multiple of lcm(r, 16) (whole examples per block + bf16
    sublane alignment), as large as the VMEM budget allows, capped at the
    measured sweet spot 576 (576 ≥ 288 ≈ 1152 on v5e at d=2048; larger
    blocks stop helping once weight traffic is gone).  Among fitting sizes,
    prefer the largest that DIVIDES m — padding is pure wasted FLOPs (the
    verb branch at eval batch 768, r=1, would otherwise pad 768→1152 rows,
    +50%).  When the whole problem is smaller than one tile, the whole
    array is the block.

    ``footprint``: per-block VMEM cost model beyond the resident weights
    (default ``_block_footprint``; the train fwd/bwd kernels pass their
    own — residual stacks shrink the feasible block)."""
    if footprint is None:
        footprint = _block_footprint
    unit = _min_block(r)
    if m <= unit:
        return m
    budget = _vmem_limit() - _weight_bytes(d)
    # exotic role counts can have lcm(r, 16) above the 576 sweet-spot cap;
    # a single lcm group is then the block (kernel_supported already
    # verified its footprint fits — the gate and this picker MUST agree)
    cap = max(unit, (min(576, m) // unit) * unit)
    while cap > unit and footprint(cap, d) > budget:
        cap -= unit
    # among [cap/2, cap] (blocks below half-cap trade MXU efficiency for
    # nothing), minimize the padded row total; descending iteration with a
    # strict < makes ties prefer the larger block
    lo = max(unit, (cap // 2 // unit) * unit)
    best, best_total = cap, ((m + cap - 1) // cap) * cap
    for bm in range(cap - unit, lo - 1, -unit):
        total = ((m + bm - 1) // bm) * bm
        if total < best_total:
            best, best_total = bm, total
    return best


def ggnn_propagate_fused(params: GGNNParams, h, mask_rows, *, r: int,
                         steps: int, bias_mult: float,
                         bm: int, m_padded: int, interpret: bool = False):
    """h (M, D) bf16 rows of whole examples, pre-padded to a bm multiple
    (m_padded % bm == 0); mask (M, 1) f32."""
    _, d = h.shape
    assert m_padded % bm == 0, (m_padded, bm)
    weights = fold_gate_weights(params, bias_mult)
    kernel = functools.partial(_folded_kernel, bm=bm, d=d, r=r, steps=steps)
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for w in weights]
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(h, mask_rows, *weights)


def _propagate_fwd_impl(params: GGNNParams, hidden, mask, num_steps: int,
                        interpret: bool):
    """hidden (B, R, D), mask (B, R) → (B, R, D) via the fused kernel
    (row-flattened, padded to whole blocks of complete examples)."""
    b, r, d = hidden.shape
    dtype = hidden.dtype
    h = hidden.reshape(b * r, d).astype(jnp.bfloat16)
    mask_rows = mask.reshape(b * r, 1).astype(jnp.float32)
    m = b * r
    bm = _pick_bm(m, r, d)
    if m % bm != 0:
        # pad with whole dummy examples (mask 0 — evolve independently,
        # sliced off below) so every block holds complete examples
        pad = bm - m % bm
        h = jnp.pad(h, ((0, pad), (0, 0)))
        mask_rows = jnp.pad(mask_rows, ((0, pad), (0, 0)))
    out = ggnn_propagate_fused(params, h, mask_rows, r=r, steps=num_steps,
                               bias_mult=float(r), bm=bm,
                               m_padded=h.shape[0], interpret=interpret)
    return out[:m].reshape(b, r, d).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ggnn_propagate_pallas(params: GGNNParams, hidden, mask,
                          num_steps: int = 4, interpret: bool = False):
    """Drop-in fused-kernel replacement for ``ggnn_propagate``.

    Undifferentiated calls — eval, inference/serving, and the gt noun
    branch whose loss is logged but never backpropagated — run the fused
    kernel (the measured 1.09–1.12x win).  Differentiated calls run XLA AD over
    the identical masked-sum formulation, which the module docstring's
    measurements show beats both a recompute-based and a residual-saving
    custom backward on this op.

    Contract caveats vs the plain op:

    * the kernel computes **bf16 internally** regardless of ``hidden``'s
      dtype (that IS its MXU fast path) — ``resolve_ggnn_impl('auto')``
      therefore only routes bf16 configs here; forcing ``'pallas'`` from
      an fp32 config opts into bf16-class forward numerics (the
      engagement tests do exactly this on purpose);
    * this is a GATED request, not a hard force: unsupported widths
      (d % 128 != 0, VMEM), tiny row counts (< _MIN_ROWS — e.g. the
      batch-1 ``--test_img`` path, where sub-tile blocks stall the Mosaic
      compiler), fall back to the masked op silently.  Unlike the ViT
      block (an all-or-nothing backbone), the GGNN runs at many shapes
      inside one CLI run, so a loud force would break legitimate
      mixed-shape usage; the structural trace-count tests pin engagement
      for the shapes that matter;
    * ``mask`` is treated as a non-differentiable structural table: under
      ``jax.grad`` its cotangent is None (zeros), where the plain op
      would return a real mask gradient.  No supported configuration
      differentiates the mask; a soft/learned-mask experiment must use
      ``ggnn_propagate``.
    """
    b, r, d = hidden.shape
    if not kernel_supported(d, r) or b * r < _MIN_ROWS:
        return ggnn_propagate(params, hidden, mask,
                              num_steps).astype(hidden.dtype)
    return _propagate_fwd_impl(params, hidden, mask, num_steps, interpret)


def resolve_ggnn_bwd() -> str:
    """Backward routing for differentiated ``ggnn_propagate_pallas``
    calls: 'xla' (AD over masked-sum — the measured round-2 winner) or
    'pallas' (the hand-written backward kernel below).  Env override
    ``SRTPU_GGNN_BWD=xla|pallas`` for A/B measurement; the default
    follows the recorded measurement in PERF.md."""
    import os

    v = os.environ.get("SRTPU_GGNN_BWD", "auto")
    if v in ("xla", "pallas"):
        return v
    return "xla"          # measured default — see PERF.md r3 GGNN table


def _fwd(params, hidden, mask, num_steps, interpret):
    b, r, d = hidden.shape
    if (resolve_ggnn_bwd() == "pallas"
            and train_kernel_supported(d, r, num_steps)
            and b * r >= _MIN_ROWS):
        out, resids = _propagate_fwd_res_impl(params, hidden, mask,
                                              num_steps, interpret)
        return out, (None, (params, mask, resids))
    # Default: XLA AD on the identical masked-sum math — measured fastest
    # (see module docstring).  The output cast makes the vjp's expected
    # cotangent dtype match the primal's, even when mixed param/hidden
    # dtypes promote.
    out, vjp = jax.vjp(
        lambda p, h: ggnn_propagate(p, h, mask, num_steps).astype(h.dtype),
        params, hidden)
    return out, (vjp, None)


def _bwd(num_steps, interpret, res, g):
    vjp, ker = res
    if ker is not None:
        params, mask, resids = ker
        dp, dh = _pallas_bwd(params, mask, resids, g, num_steps, interpret)
        return dp, dh, None
    dp, dh = vjp(g)
    return dp, dh, None


ggnn_propagate_pallas.defvjp(_fwd, _bwd)


# ===================================================================
# Hand-written backward KERNEL (round-3 measurement, VERDICT r2 #3).
#
# The round-2 custom backwards were jnp-level reverse passes; the one
# untried design was a Pallas backward kernel with the gate chain fused
# in-VMEM, reusing the folded weights.  FLOP ledger per step (m rows,
# width d; adjacency terms omitted — both sides pay them):
#
#     folded fwd                 12 m d^2     (this file's forward)
#     folded bwd-data (kernel)   12 m d^2     (drh 2 + dagg 6 + dh_u 4)
#     param grads (XLA, stacked) 12 m d^2     (dWa 6 + dUzr 4 + dUh 2)
#     --------------------------------------
#     folded VJP total           36 m d^2  vs  XLA AD (unfolded) 42 m d^2
#
# so a kernel backward running at the forward kernel's measured MFU would
# land ~0.86x XLA AD's time.  Structure:
#
# * ``_folded_kernel_res`` — the forward with per-step residuals (h, z,
#   r, c as bf16 stacks) written to HBM, so the backward recomputes NO
#   gate matmuls.
# * ``_folded_kernel_bwd`` — one grid pass running all ``steps`` reverse
#   steps per block: the full elementwise gate chain stays in VMEM/f32
#   (the exact materialization cost that sank the jnp-level reverse
#   pass), with three NN matmuls per step against pre-transposed folded
#   weights.  It also writes the per-step gate pre-activation cotangents
#   ``da`` (bm, 3d) to HBM.
# * Parameter gradients run OUTSIDE as three big stacked XLA matmuls
#   over (steps*m) rows — MXU-shaped, one pass — and are pulled back
#   through ``fold_gate_weights`` by ``jax.vjp`` (exact unfold, no
#   hand-derived adjoint).  ``agg`` is recomputed from the h residuals
#   via the masked-sum identity (VPU work, no matmul).
#
# Padded rows carry zero cotangent in, hence zero ``da`` out, and the
# stacked param matmuls slice to the valid m rows — padding contributes
# exactly nothing.  The measured verdict lives in PERF.md; the routing
# default below follows the measurement.


def _transpose_folded(wa, uzr, uh):
    """Pre-transposed folded weights for the backward's NN matmuls
    (computed once outside the kernel; d x d-scale XLA work)."""
    return wa.T, uzr.T, uh.T            # (3d, d), (2d, d), (d, d)


def _folded_kernel_res(h_ref, mask_ref, wa, uzr, uh, ba, out_ref,
                       rh_ref, rz_ref, rr_ref, rc_ref, e_ref,
                       *, bm: int, d: int, r: int, steps: int):
    """Forward identical to ``_folded_kernel`` plus per-step residual
    writes: rh[t] = the step-t INPUT h, rz/rr/rc[t] = the step's gates
    (bf16).  Residual refs are (steps, bm, d) blocks."""
    _block_adjacency(mask_ref, e_ref, bm, r)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    h = h_ref[:]
    for t in range(steps):
        rh_ref[t] = h
        agg = dot(e_ref[:], h).astype(jnp.bfloat16)
        ga = dot(agg, wa[:]) + ba[:]
        gh = dot(h, uzr[:])
        z = jax.nn.sigmoid(ga[:, :d] + gh[:, :d])
        rr = jax.nn.sigmoid(ga[:, d:2 * d] + gh[:, d:])
        hf = h.astype(jnp.float32)
        rhh = (rr * hf).astype(jnp.bfloat16)
        c = jnp.tanh(ga[:, 2 * d:] + dot(rhh, uh[:]))
        rz_ref[t] = z.astype(jnp.bfloat16)
        rr_ref[t] = rr.astype(jnp.bfloat16)
        rc_ref[t] = c.astype(jnp.bfloat16)
        h = ((1.0 - z) * hf + z * c).astype(h.dtype)
    out_ref[:] = h


def _folded_kernel_bwd(g_ref, mask_ref, rh_ref, rz_ref, rr_ref, rc_ref,
                       wa_t, uzr_t, uh_t, dh_ref, da_ref, e_ref,
                       *, bm: int, d: int, r: int, steps: int):
    """All ``steps`` reverse steps for one block, gate chain in f32 VMEM.

    Emits dh (bm, d) — the input-hidden cotangent — and da (steps, bm,
    3d): the [z | r | c] pre-activation cotangents the outside param
    matmuls consume."""
    _block_adjacency(mask_ref, e_ref, bm, r)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    dh = g_ref[:].astype(jnp.float32)
    for t in reversed(range(steps)):
        h = rh_ref[t].astype(jnp.float32)
        z = rz_ref[t].astype(jnp.float32)
        rr = rr_ref[t].astype(jnp.float32)
        c = rc_ref[t].astype(jnp.float32)
        # h' = (1-z) h + z c
        dz = dh * (c - h)
        dc = dh * z
        dprev = dh * (1.0 - z)
        # c = tanh(a_c);  a_c = ga_c + (r*h) @ U_h
        da_c = dc * (1.0 - c * c)
        drh = dot(da_c.astype(jnp.bfloat16), uh_t[:])
        dprev += drh * rr
        dr = drh * h
        # z/r = sigmoid(a_z / a_r)
        da_z = dz * z * (1.0 - z)
        da_r = dr * rr * (1.0 - rr)
        da = jnp.concatenate([da_z, da_r, da_c], axis=1)
        da_bf = da.astype(jnp.bfloat16)
        da_ref[t] = da_bf
        # a_* = agg @ Wa + h @ Uzr (+const):  agg = E h, E symmetric
        dagg = dot(da_bf, wa_t[:]).astype(jnp.bfloat16)
        dprev += dot(e_ref[:], dagg)
        dprev += dot(da_bf[:, :2 * d], uzr_t[:])
        dh = dprev
    dh_ref[:] = dh.astype(dh_ref.dtype)


def _train_block_footprint(bm: int, d: int, steps: int) -> int:
    """Per-block VMEM bytes (beyond resident weights) for the train-path
    kernels — the max of the fwd-res and bwd needs, since both use the
    same block size (the residual layout ties them together):

    fwd-res: in+out (dbuf bf16) + 4 residual stacks (steps, bm, d)
    (dbuf bf16) + f32 gate temporaries + adjacency scratch;
    bwd: g+dh (dbuf bf16) + the 4 stacks in + da stack (steps, bm, 3d)
    out (dbuf bf16) + a deeper f32 elementwise chain."""
    fwd = (8 * bm * d + 16 * steps * bm * d + 28 * bm * d + 2 * bm * bm)
    bwd = (8 * bm * d + 16 * steps * bm * d + 12 * steps * bm * d
           + 40 * bm * d + 2 * bm * bm)
    return max(fwd, bwd)


def train_kernel_supported(d: int, r: int = 6, steps: int = 4) -> bool:
    """True when the residual-saving fwd + backward kernel pair can run:
    same lane constraint as the forward kernel, and the folded weights
    plus one minimum train block fit VMEM (the bwd holds the transposed
    weight set — same bytes)."""
    return (d % 128 == 0 and
            _weight_bytes(d)
            + _train_block_footprint(_min_block(r), d, steps)
            <= _vmem_limit())


def _propagate_fwd_res_impl(params: GGNNParams, hidden, mask,
                            num_steps: int, interpret: bool):
    """Residual-saving forward: returns (out (B,R,D), (rh, rz, rr, rc))
    with each residual stack (steps, m_padded, d) bf16."""
    b, r, d = hidden.shape
    dtype = hidden.dtype
    h = hidden.reshape(b * r, d).astype(jnp.bfloat16)
    mask_rows = mask.reshape(b * r, 1).astype(jnp.float32)
    m = b * r
    fp = functools.partial(_train_block_footprint, steps=num_steps)
    bm = _pick_bm(m, r, d, footprint=lambda bm_, d_: fp(bm_, d_))
    if m % bm != 0:
        pad = bm - m % bm
        h = jnp.pad(h, ((0, pad), (0, 0)))
        mask_rows = jnp.pad(mask_rows, ((0, pad), (0, 0)))
    mp = h.shape[0]
    weights = fold_gate_weights(params, float(r))
    kernel = functools.partial(_folded_kernel_res, bm=bm, d=d, r=r,
                               steps=num_steps)
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for w in weights]
    rows = pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    res = pl.BlockSpec((num_steps, bm, d), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    bf = jnp.bfloat16
    out, rh, rz, rr, rc = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[
            rows,
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=[rows, res, res, res, res],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), bf),
            *(jax.ShapeDtypeStruct((num_steps, mp, d), bf)
              for _ in range(4)),
        ],
        scratch_shapes=[pltpu.VMEM((bm, bm), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(h, mask_rows, *weights)
    return out[:m].reshape(b, r, d).astype(dtype), (rh, rz, rr, rc)


def _pallas_bwd(params: GGNNParams, mask, resids, g, num_steps: int,
                interpret: bool):
    """The backward: the data-gradient kernel + stacked param matmuls.

    Returns (dparams, dhidden)."""
    rh, rz, rr, rc = resids
    b, r, d = g.shape
    m = b * r
    mp = rh.shape[1]
    g2 = g.reshape(m, d).astype(jnp.bfloat16)
    mask_rows = mask.reshape(m, 1).astype(jnp.float32)
    fp = functools.partial(_train_block_footprint, steps=num_steps)
    bm = _pick_bm(m, r, d, footprint=lambda bm_, d_: fp(bm_, d_))
    assert mp % bm == 0, (mp, bm)       # same picker as the forward
    if mp != m:
        # padded rows carry zero cotangent -> zero da, zero dh (exactly:
        # every backward term is multiplicative in the cotangent chain)
        g2 = jnp.pad(g2, ((0, mp - m), (0, 0)))
        mask_rows = jnp.pad(mask_rows, ((0, mp - m), (0, 0)))

    weights = fold_gate_weights(params, float(r))
    wa, uzr, uh, _ba = weights
    wa_t, uzr_t, uh_t = _transpose_folded(wa, uzr, uh)
    kernel = functools.partial(_folded_kernel_bwd, bm=bm, d=d, r=r,
                               steps=num_steps)
    rows = pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    res = pl.BlockSpec((num_steps, bm, d), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    da_spec = pl.BlockSpec((num_steps, bm, 3 * d), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    wt_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for w in (wa_t, uzr_t, uh_t)]
    bf = jnp.bfloat16
    dh_rows, da = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[
            rows,
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            res, res, res, res,
            *wt_specs,
        ],
        out_specs=[rows, da_spec],
        out_shape=[jax.ShapeDtypeStruct((mp, d), bf),
                   jax.ShapeDtypeStruct((num_steps, mp, 3 * d), bf)],
        scratch_shapes=[pltpu.VMEM((bm, bm), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(g2, mask_rows, rh, rz, rr, rc, wa_t, uzr_t, uh_t)

    dh = dh_rows[:m].reshape(b, r, d).astype(g.dtype)

    # ---- parameter gradients: three stacked MXU matmuls over the valid
    # (steps*m) rows, then the exact pull-back through the fold
    f32 = jnp.float32
    da_v = da[:, :m]                                   # (steps, m, 3d)
    h_v = rh[:, :m]                                    # (steps, m, d)
    # agg recomputed via the masked-sum identity (VPU, no matmul):
    # agg_i = m_i ? (sum_j m_j h_j - h_i) : h_i  per example
    hv = h_v.reshape(num_steps, b, r, d).astype(f32)
    mk = mask.astype(f32)[None, :, :, None]
    s = jnp.sum(hv * mk, axis=2, keepdims=True)
    agg = jnp.where(mk > 0, s - hv, hv).astype(jnp.bfloat16)

    K = num_steps * m
    AGG = agg.reshape(K, d)
    DA = da_v.reshape(K, 3 * d)
    H = h_v.reshape(K, d)
    RH = ((rr[:, :m].astype(f32) * h_v.astype(f32))
          .astype(jnp.bfloat16).reshape(K, d))
    dwa = jnp.einsum("kd,ke->de", AGG, DA,
                     preferred_element_type=f32)
    duzr = jnp.einsum("kd,ke->de", H, DA[:, :2 * d],
                      preferred_element_type=f32)
    duh = jnp.einsum("kd,ke->de", RH, DA[:, 2 * d:],
                     preferred_element_type=f32)
    dba = DA.astype(f32).sum(axis=0)[None, :]

    # pull back through an f32 fold so the f32-accumulated einsums above
    # reach the (d, 3d) parameter cotangents at full precision — folding
    # at the kernel's bf16 dtype here would round the accumulators to
    # bf16 before the pull-back for no reason (ADVICE r3 #3; the KERNEL
    # still consumes the bf16 fold, this only affects gradient precision)
    _, fold_vjp = jax.vjp(
        lambda p: fold_gate_weights(p, float(r), dtype=f32), params)
    (dparams,) = fold_vjp((dwa, duzr, duh, dba))
    return dparams, dh
