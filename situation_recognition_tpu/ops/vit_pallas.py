"""Fused Pallas TPU kernels for the ViT encoder block (stretch backbone).

Why these exist — a measured XLA pathology, not a guess.  At the ViT-L/14
parity shape (batch 256, 257 tokens, width 1024, bf16) the per-block trace
shows XLA spending 8.4 ms on the fc2 matmul fusion whose pure-MXU time is
2.8 ms: layout assignment hands the residual stream a token-major
``{2,0,1}`` layout (driven by the attention einsum consumers), which pushes
the matmul emitter (``EmitAllBatchInSublanes``) into 8-lane output tiles
with the 257-token dim in the iteration space.  The same fused
matmul+residual+LN-stat pattern standalone — identical math, default
layouts — runs 3.9 ms.  None of the JAX-level reformulations recover it
(measured: ``optimization_barrier`` after the residuals ±0, explicit
``(B,h,N,dh)`` transposes +1 ms, reshape-to-2D +6 ms of relayouts,
token-count 264 +0.7, bf16 LN stats ±0); the emitter/layout choice is not
reachable from JAX, as already established for the ResNet's 1x1 convs
(PERF.md r4).  Pallas controls its own tiling, so the block escapes the
emitter entirely.

Three kernels per encoder block, all weights VMEM-resident (constant index
maps — fetched once per grid, ~31 MB at width 1024):

* ``_qkv_kernel``      — ln1 + the three Q/K/V projections, row-blocked
                         over the flattened (B*N, D) token stream.
                         Measured 2.28 ms = 92% MFU.
* ``_attn_core_kernel``— per-example scores+softmax+context, one grid step
                         per image, per-head 64-lane slices (Mosaic allows
                         them).  Never materializes the (B, h, N, N)
                         score tensor in HBM — the XLA core round-trips
                         ~540 MB of scores per block.  Measured 6.6 ms vs
                         XLA's ~8 (core fusions + forced relayouts).
* ``_out_mlp_kernel``  — attention out-projection + residual + ln2 + fc1 +
                         GELU + fc2 + residual, row-blocked.  Measured
                         7.0 ms = 89% MFU (the XLA section it replaces
                         traces at ~12 ms).

Mosaic has no ``erf`` primitive, so exact GELU uses the Abramowitz-Stegun
7.1.26 rational approximation (max error 1.5e-7 ≈ 50x below bf16
resolution at the relevant scales); the CLIP variant's QuickGELU is plain
``x*sigmoid(1.702x)``.  LayerNorm statistics are f32 in-kernel, matching
the flax modules' ``dtype=float32`` LayerNorms.

Routing mirrors ``ops/ggnn_pallas.py``: the public ``fused_encoder_block``
carries a ``jax.custom_vjp`` whose primal runs the kernels and whose
fwd/bwd rules run XLA AD over ``_reference_block`` (the same math in
plain jnp).  The ViT backbone is frozen in every reference configuration
(/root/reference/model.py:16,100-101 — the convnets are feature
extractors), so the reference-parity hot paths (train-step backbone
forward, eval, serving) are all undifferentiated and take the kernels.
The additive ``--train_backbone`` fine-tuning path DOES differentiate
the backbone: the stream stack's fwd rule runs the ft stream (see the
"differentiable (ft) stream" section below) — jnp 2-D stream math with
a flash-style Pallas attention core carrying its own backward kernel.

Numerics: the kernels keep softmax and the LN/residual stream in f32
(flax computes bf16 softmax under ``dtype=bfloat16``), so fused vs flax
outputs agree to bf16 resolution, not bit-exactly — same contract as the
GGNN kernel (max |diff| there 0.023; measured here ~1e-2 on unit-scale
block outputs over 4 chained blocks).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from situation_recognition_tpu.ops.ggnn_pallas import _vmem_limit

# Row-block for the qkv / out_mlp kernels.  256 measured best (2.28 /
# 7.02 ms vs 512's 2.5 / 7.8 at the parity shape) and divides the token
# stream exactly whenever the per-chip batch is a multiple of 256 (both
# bench shapes: 256*257 and 768*257 rows).
_BM = 256
# Below this many tokens rows the kernels are launch-overhead dominated
# and tiny Mosaic blocks risk the pathological-compile regime the GGNN
# kernel documents; such shapes take the flax/XLA path.
_MIN_ROWS = 1024


def _weight_bytes(d: int, hid: int) -> int:
    """Resident bf16 weights of the largest kernel (out_mlp: W_o, W_1,
    W_2) plus its f32 bias rows — the binding VMEM term."""
    return (d * d + d * hid + hid * d) * 2 + (3 * d + hid) * 4


def _block_bytes(bm: int, d: int, hid: int) -> int:
    """Per-block working set of out_mlp: in/out/ctx double buffers plus
    the f32 hidden activation and LN temporaries."""
    return 3 * 2 * bm * d * 2 + bm * hid * 4 + 4 * bm * d * 4


def _attn_bytes(n: int, d: int) -> int:
    """Attention-core working set, which scales with the TOKEN count.
    Sized for the BACKWARD kernel (the larger of the two): eight
    double-buffered (n, d) bf16 blocks (q/k/v/o/do in, dq/dk/dv out)
    plus ~4 live per-head f32 (n, n) matrices (scores, exp, dp, ds) and
    scheduling slack.  The forward needs half of each term, so one gate
    covers both.  Without this term large-n shapes (high-res
    patchifications) would pass the gate yet fail Mosaic compilation —
    the gate and the kernels MUST agree, as ops/ggnn_pallas.py's
    kernel_supported/_pick_bm contract states."""
    return 8 * 2 * n * d * 2 + int(4.5 * n * n * 4)


def fused_block_supported(d: int, heads: int, n_tokens: int,
                          batch: int, mlp_ratio: int = 4) -> bool:
    """True when the fused block kernels can run this shape on TPU:
    128-lane-aligned width, 64-aligned head dim (per-head lane slices),
    enough rows to matter, and each kernel's VMEM requirement (resident
    weights + row block for qkv/out_mlp; token-count-scaled blocks +
    score matrix for the attention core) under the device budget (same
    generation detection as the GGNN kernel)."""
    if d % 128 != 0 or heads <= 0 or d % heads != 0:
        return False
    if (d // heads) % 64 != 0:
        return False
    if batch * n_tokens < _MIN_ROWS:
        return False
    hid = d * mlp_ratio
    lim = _vmem_limit()
    return (_weight_bytes(d, hid) + _block_bytes(_BM, d, hid) <= lim
            and _attn_bytes(n_tokens, d) <= lim)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 — Mosaic lacks an erf primitive.  Max
    error 1.5e-7, invisible at bf16 output resolution."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ln_f32(x, g, b, eps):
    """LayerNorm over the last axis in f32 (biased variance, rsqrt) —
    the exact flax ``LayerNorm(dtype=float32)`` computation."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * g + b


def _gelu_exact_or_quick(h, quick_gelu: bool, erf):
    if quick_gelu:
        return h * jax.nn.sigmoid(1.702 * h)
    return 0.5 * h * (1.0 + erf(h * (2.0 ** -0.5)))


# --------------------------------------------------------------- kernels


def _qkv_kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, q_ref, k_ref, v_ref, *, eps: float):
    """ln1 + Q/K/V projections for one (bm, D) row block."""
    x = x_ref[:].astype(jnp.float32)
    y = _ln_f32(x, g_ref[:], b_ref[:], eps).astype(jnp.bfloat16)
    for w_ref, bias_ref, o_ref in ((wq_ref, bq_ref, q_ref),
                                   (wk_ref, bk_ref, k_ref),
                                   (wv_ref, bv_ref, v_ref)):
        o = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (o + bias_ref[:]).astype(o_ref.dtype)


_LOG2E = float(math.log2(math.e))


def _attn_core_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                      scale: float, folded: bool):
    """Scores + f32 softmax + context for ONE example, all heads.

    Per-head 64-lane slices; the (N, N) score matrix lives only in VMEM.
    Measured alternatives at the parity shape all lose: head-pair masked
    128-lane dots 6.10→ same class, CLS-row-on-VPU splits 8.1-9.0 ms
    (misaligned/VPU-heavy), XLA core ~8 with its forced relayouts.

    ``folded=True`` is the cheap-softmax variant: the score scale and
    the log2(e) conversion are pre-multiplied into q ONCE per example
    (an (N, D) op instead of heads×(N, N)), the exponent uses the
    native ``exp2``, and the softmax denominator is divided into the
    (N, dh) context rows AFTER the probability@V dot instead of into
    the (N, N) probability matrix — removing both N×N VPU
    elementwise passes.  Same max-subtracted-softmax math, reordered;
    interpret-mode equality is tested at the same bf16-class bound as
    the baseline (tests/test_vit_pallas.py).
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    dh = d // heads
    if folded:
        q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(jnp.bfloat16)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if folded:
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s - m).astype(jnp.bfloat16)
            den = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            ctx = jnp.dot(e, v[:, sl], preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = (ctx * (1.0 / den)).astype(o_ref.dtype)
        else:
            p = jax.nn.softmax(s * scale, axis=-1).astype(jnp.bfloat16)
            o_ref[0, :, sl] = jnp.dot(p, v[:, sl],
                                      preferred_element_type=jnp.float32
                                      ).astype(o_ref.dtype)


def _out_mlp_kernel(x_ref, ctx_ref, wo_ref, bo_ref, g_ref, b_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                    eps: float, quick_gelu: bool):
    """out-projection + residual + ln2 + fc1 + GELU + fc2 + residual for
    one (bm, D) row block; the residual stream stays f32 in-kernel."""
    o = jnp.dot(ctx_ref[:], wo_ref[:], preferred_element_type=jnp.float32)
    x = x_ref[:].astype(jnp.float32) + o + bo_ref[:]
    y = _ln_f32(x, g_ref[:], b_ref[:], eps).astype(jnp.bfloat16)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu_exact_or_quick(h, quick_gelu, _erf).astype(jnp.bfloat16)
    o2 = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (x + o2 + b2_ref[:]).astype(out_ref.dtype)


def _wspec(a):
    return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                        memory_space=pltpu.VMEM)


def _f32row(a):
    """Biases/LN params enter the kernels as (1, D) f32 rows."""
    return a.reshape(1, -1).astype(jnp.float32)


# ------------------------------------------------------------ fused impl


def _fused_impl(x, wq, bq, wk, bk, wv, bv, wo, bo, g1, bb1, g2, bb2,
                w1, b1, w2, b2, *, heads: int, eps: float,
                quick_gelu: bool, interpret: bool,
                attn_folded: bool = False):
    b_, n_, d_ = x.shape
    m = b_ * n_
    bm = min(m, _BM)
    pad = (-m) % bm
    x2 = x.reshape(m, d_)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]
    vlim = _vmem_limit()
    rowspec = pl.BlockSpec((bm, d_), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    qargs = [_f32row(g1), _f32row(bb1),
             wq.astype(jnp.bfloat16), _f32row(bq),
             wk.astype(jnp.bfloat16), _f32row(bk),
             wv.astype(jnp.bfloat16), _f32row(bv)]
    q2, k2, v2 = pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps),
        grid=(mp // bm,),
        in_specs=[rowspec, *[_wspec(a) for a in qargs]],
        out_specs=[rowspec] * 3,
        out_shape=[jax.ShapeDtypeStruct((mp, d_), x.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=interpret,
    )(x2, *qargs)

    bspec = pl.BlockSpec((1, n_, d_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    scale = 1.0 / math.sqrt(d_ // heads)
    ctx = pl.pallas_call(
        functools.partial(_attn_core_kernel, heads=heads, scale=scale,
                          folded=attn_folded),
        grid=(b_,),
        in_specs=[bspec] * 3,
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((b_, n_, d_), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=interpret,
    )(q2[:m].reshape(b_, n_, d_), k2[:m].reshape(b_, n_, d_),
      v2[:m].reshape(b_, n_, d_))

    ctx2 = ctx.reshape(m, d_)
    if pad:
        ctx2 = jnp.pad(ctx2, ((0, pad), (0, 0)))
    oargs = [wo.astype(jnp.bfloat16), _f32row(bo),
             _f32row(g2), _f32row(bb2),
             w1.astype(jnp.bfloat16), _f32row(b1),
             w2.astype(jnp.bfloat16), _f32row(b2)]
    out = pl.pallas_call(
        functools.partial(_out_mlp_kernel, eps=eps, quick_gelu=quick_gelu),
        grid=(mp // bm,),
        in_specs=[rowspec, rowspec, *[_wspec(a) for a in oargs]],
        out_specs=rowspec,
        out_shape=jax.ShapeDtypeStruct((mp, d_), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=interpret,
    )(x2, ctx2, *oargs)
    return out[:m].reshape(b_, n_, d_)


def _attn_core_stream_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                             scale: float, folded: bool, n_valid: int):
    """Stream-domain attention core: blocks are 2-D ``(n8, d)`` slices of
    the flattened padded token stream (one example per grid step, block
    row offset ``i*n8`` — 8-row aligned by construction, so the BlockSpec
    needs no relayout).  Only the first ``n_valid`` rows are real tokens;
    pad rows are never read as keys/values (they would pollute softmax)
    and are written as zeros (uninitialized VMEM otherwise)."""
    q = q_ref[0:n_valid]
    k = k_ref[0:n_valid]
    v = v_ref[0:n_valid]
    d = q.shape[-1]
    dh = d // heads
    n8 = o_ref.shape[0]
    if folded:
        q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(jnp.bfloat16)
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if folded:
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s - mx).astype(jnp.bfloat16)
            den = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            ctx = jnp.dot(e, v[:, sl], preferred_element_type=jnp.float32)
            o_ref[0:n_valid, sl] = (ctx * (1.0 / den)).astype(o_ref.dtype)
        else:
            p = jax.nn.softmax(s * scale, axis=-1).astype(jnp.bfloat16)
            o_ref[0:n_valid, sl] = jnp.dot(
                p, v[:, sl], preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
        if n_valid < n8:
            o_ref[n_valid:, sl] = jnp.zeros((n8 - n_valid, dh), o_ref.dtype)


def _fused_stack_impl(x, w_flat, *, heads: int, eps: float,
                      quick_gelu: bool, interpret: bool,
                      attn_folded: bool):
    """All encoder blocks in ONE flattened, 8-row-aligned token domain,
    returning the CLS rows (B, D) before the final LayerNorm.

    Why: the per-block kernels hand 2-D ``(B*N, D)`` row streams to the
    qkv/mlp kernels but 3-D ``(B, N, D)`` blocks to the attention core.
    At N=257 the two tilings disagree — (B, 257, D) pads every example to
    264 rows internally, so each ``reshape`` between them is a PHYSICAL
    relayout: 2×1.76 ms per block, ~84 ms/step at the ViT-L/14 parity
    shape (tools/profile_step.py r8; 459 GB/s pure copies).  Padding the
    stream to n8 = ceil(N/8)*8 rows per example ONCE makes the 2-D and
    3-D layouts byte-identical, so every block runs qkv → attention →
    mlp in the same (B*n8, D) array with zero layout traffic; the
    attention kernel slices its ``n_valid`` real rows in VMEM.  The pad
    rows flow through the row-local kernels (finite garbage, re-zeroed
    by every attention core) and are dropped by the final CLS gather.
    """
    b_, n_, d_ = x.shape
    n8 = -(-n_ // 8) * 8
    if n8 != n_:
        # the ONE relayout the stream pays (the per-block path pays two
        # per block); also the source of the pad rows
        x = jnp.pad(x, ((0, 0), (0, n8 - n_), (0, 0)))
    m = b_ * n8
    bm = min(m, _BM)
    pad = (-m) % bm
    x2 = x.reshape(m, d_)                      # layout-free: n8 % 8 == 0
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]
    vlim = _vmem_limit()
    rowspec = pl.BlockSpec((bm, d_), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((n8, d_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    scale = 1.0 / math.sqrt(d_ // heads)

    for blk in range(0, len(w_flat), 16):
        (wq, bq, wk, bk, wv, bv, wo, bo, g1, bb1, g2, bb2,
         w1, b1, w2, b2) = w_flat[blk:blk + 16]
        qargs = [_f32row(g1), _f32row(bb1),
                 wq.astype(jnp.bfloat16), _f32row(bq),
                 wk.astype(jnp.bfloat16), _f32row(bk),
                 wv.astype(jnp.bfloat16), _f32row(bv)]
        q2, k2, v2 = pl.pallas_call(
            functools.partial(_qkv_kernel, eps=eps),
            grid=(mp // bm,),
            in_specs=[rowspec, *[_wspec(a) for a in qargs]],
            out_specs=[rowspec] * 3,
            out_shape=[jax.ShapeDtypeStruct((mp, d_), x.dtype)] * 3,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
            interpret=interpret,
        )(x2, *qargs)

        # the attention out_shape is the FULL (mp, d) row domain even
        # though the (b_,) grid only writes the first b_*n8 rows: a
        # (m, d) output would need a jnp.pad back to mp for out_mlp —
        # a whole-stream copy per block whenever bm does not divide m
        # (the relayout class this stack exists to delete).  The
        # untouched tail rows are end-of-stream padding (uninitialized
        # on TPU — possibly NaN/Inf bit patterns): row-local kernels
        # keep any garbage confined to those same tail rows, attention
        # never reads past row b_*n8, and the CLS gather drops them.
        ctx = pl.pallas_call(
            functools.partial(_attn_core_stream_kernel, heads=heads,
                              scale=scale, folded=attn_folded, n_valid=n_),
            grid=(b_,),
            in_specs=[aspec] * 3,
            out_specs=aspec,
            out_shape=jax.ShapeDtypeStruct((mp, d_), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
            interpret=interpret,
        )(q2, k2, v2)

        oargs = [wo.astype(jnp.bfloat16), _f32row(bo),
                 _f32row(g2), _f32row(bb2),
                 w1.astype(jnp.bfloat16), _f32row(b1),
                 w2.astype(jnp.bfloat16), _f32row(b2)]
        x2 = pl.pallas_call(
            functools.partial(_out_mlp_kernel, eps=eps,
                              quick_gelu=quick_gelu),
            grid=(mp // bm,),
            in_specs=[rowspec, rowspec, *[_wspec(a) for a in oargs]],
            out_specs=rowspec,
            out_shape=jax.ShapeDtypeStruct((mp, d_), x.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
            interpret=interpret,
        )(x2, ctx, *oargs)

    # CLS rows sit at row i*n8 of the stream — a (B, D) strided gather,
    # replacing the per-block unpad AND the all-token final LayerNorm
    # input (LN is row-local, so ln_final(CLS rows) == ln_final(x)[:, 0])
    return x2[:m].reshape(b_, n8, d_)[:, 0, :]


# ------------------------------------------- differentiable (ft) stream
#
# The fine-tuning path (``--train_backbone`` with a ViT backbone).  The
# forward-only kernels above route differentiated calls to XLA AD; for a
# frozen backbone that rule never fires, but under fine-tuning it made
# BOTH directions pay the measured XLA layout pathology (the token-major
# residual-stream layouts the kernels exist to bypass) AND the attention
# backward's HBM round-trips of the (B, h, N, N) probability/gradient
# tensors (~2.7 GB f32 per ViT-L/14 block at batch 256 — per pass).
#
# Design: only the attention core needs a hand-written backward — it is
# the one op whose AD materializes O(N^2) tensors in HBM.  Everything
# else (LN, QKV projections, MLP) is plain jnp on the flattened
# 8-row-aligned ``(B*n8, D)`` 2-D stream, where XLA's AD emits standard
# dgrad/wgrad matmuls with default layouts (the pathology was driven by
# the 3-D attention einsums' consumers; with the core opaque to XLA and
# the stream 2-D there is nothing to impose token-major layouts).  The
# backward kernel is flash-attention style: one grid step per example,
# recompute scores + softmax in VMEM from the saved q/k/v, then
#   dv = p^T @ do         (folded:  e^T @ (do / den))
#   dp = do @ v^T
#   ds = p * (dp - rowsum(do * o)) * scale
#   dq = ds @ k,   dk = ds^T @ q
# — five (n, n) x (n, dh) MXU dots per head, zero HBM score traffic.


def _attn_bwd_stream_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                            dq_ref, dk_ref, dv_ref, *, heads: int,
                            scale: float, n_valid: int):
    """Attention backward for ONE example in the stream domain.

    Blocks are (n8, d) 8-row-aligned slices like the forward core; only
    the first ``n_valid`` rows are real.  Pad rows are never read (they
    would pollute the recomputed softmax / accumulate into dk, dv) and
    their gradient rows are written as zeros (uninitialized VMEM
    otherwise — they feed the jnp QKV-projection wgrads upstream)."""
    q = q_ref[0:n_valid]
    k = k_ref[0:n_valid]
    v = v_ref[0:n_valid]
    o = o_ref[0:n_valid]
    do = do_ref[0:n_valid]
    d = q.shape[-1]
    dh = d // heads
    n8 = dq_ref.shape[0]
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(q[:, sl], k[:, sl],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        inv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        do_h = do[:, sl].astype(jnp.float32)
        # delta_i = sum_d do_id o_id over THIS head's slice (heads
        # partition D, so the per-head softmax rows mix nothing across
        # heads)
        delta = jnp.sum(do_h * o[:, sl].astype(jnp.float32),
                        axis=-1, keepdims=True)
        # dv = p^T @ do with the row softmax denominators folded into
        # the do rows (p = e * inv, inv is per-QUERY-row, i.e. per row
        # of both e and do in this contraction)
        e_b = e.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(e_b, (do_h * inv).astype(jnp.bfloat16),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do[:, sl], v[:, sl],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (e * (dp - delta) * (inv * scale)).astype(jnp.bfloat16)
        dq = jnp.dot(ds, k[:, sl], preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q[:, sl],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0:n_valid, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0:n_valid, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0:n_valid, sl] = dv.astype(dv_ref.dtype)
        if n_valid < n8:
            z = jnp.zeros((n8 - n_valid, dh), dq_ref.dtype)
            dq_ref[n_valid:, sl] = z
            dk_ref[n_valid:, sl] = z
            dv_ref[n_valid:, sl] = z


@functools.lru_cache(maxsize=None)
def _make_diff_attn(heads: int, scale: float, n8: int, n_valid: int,
                    folded: bool, interpret: bool):
    """Differentiable stream-domain attention core: the forward kernel
    with a flash-style Pallas backward, as a ``jax.custom_vjp`` over
    ``(B*n8, D)`` q/k/v streams.  Residuals are the bf16 q/k/v inputs
    plus the context output (for ``rowsum(do * o)``)."""

    def _call(kernel, args, n_out):
        m, d = args[0].shape
        aspec = pl.BlockSpec((n8, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((m, d), args[0].dtype)] * n_out
        return pl.pallas_call(
            kernel,
            grid=(m // n8,),
            in_specs=[aspec] * len(args),
            out_specs=[aspec] * n_out if n_out > 1 else aspec,
            out_shape=out_shape if n_out > 1 else out_shape[0],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit()),
            interpret=interpret,
        )(*args)

    @jax.custom_vjp
    def attn(q, k, v):
        return _call(functools.partial(_attn_core_stream_kernel,
                                       heads=heads, scale=scale,
                                       folded=folded, n_valid=n_valid),
                     (q, k, v), 1)

    def fwd(q, k, v):
        o = attn(q, k, v)
        return o, (q, k, v, o)

    def bwd(res, do):
        q, k, v, o = res
        return tuple(_call(functools.partial(_attn_bwd_stream_kernel,
                                             heads=heads, scale=scale,
                                             n_valid=n_valid),
                           (q, k, v, o, do.astype(q.dtype)), 3))

    attn.defvjp(fwd, bwd)
    return attn


def _ft_block(x2, wq, bq, wk, bk, wv, bv, wo, bo, g1, bb1, g2, bb2,
              w1, b1, w2, b2, *, heads: int, eps: float,
              quick_gelu: bool, attn_fn):
    """One encoder block on the flattened 2-D stream with the
    differentiable Pallas attention core — :func:`_reference_block`'s
    exact math with the (B, N, heads, dh) reshapes replaced by column
    slicing inside the core (heads partition D, so flattening is
    algebraically the identity)."""
    dtype = x2.dtype
    y = _ln_f32(x2.astype(jnp.float32), g1.astype(jnp.float32),
                bb1.astype(jnp.float32), eps).astype(dtype)
    q = y @ wq.astype(dtype) + bq.astype(dtype)
    k = y @ wk.astype(dtype) + bk.astype(dtype)
    v = y @ wv.astype(dtype) + bv.astype(dtype)
    ctx = attn_fn(q, k, v)
    x2 = x2 + ctx @ wo.astype(dtype) + bo.astype(dtype)
    y = _ln_f32(x2.astype(jnp.float32), g2.astype(jnp.float32),
                bb2.astype(jnp.float32), eps).astype(dtype)
    h = y @ w1.astype(dtype) + b1.astype(dtype)
    h = _gelu_exact_or_quick(h, quick_gelu, jax.lax.erf)
    return x2 + h @ w2.astype(dtype) + b2.astype(dtype)


def _ft_cls_stack(x, w_flat, *, heads: int, eps: float, quick_gelu: bool,
                  interpret: bool, attn_folded: bool, remat: bool):
    """The encoder stack on the differentiable ft stream, returning
    pre-ln_final CLS rows — the differentiation target the fused stack's
    custom-VJP fwd rule runs under ``jax.grad``.

    ``remat=True`` checkpoints each block (``jax.checkpoint``): AD then
    saves only the 24 block-input streams (~3.3 GB at the ViT-L/14
    fine-tuning shape) instead of every intermediate, and each block's
    forward — including the attention core kernel — reruns once inside
    the backward.  Pad rows: zero-padded into the stream once, zeroed by
    every attention core (fwd and bwd kernels), row-local everywhere
    else, dropped by the CLS gather — so no pad value ever reaches a
    real row or a weight gradient."""
    b_, n_, d_ = x.shape
    n8 = -(-n_ // 8) * 8
    if n8 != n_:
        x = jnp.pad(x, ((0, 0), (0, n8 - n_), (0, 0)))
    x2 = x.reshape(b_ * n8, d_)
    scale = 1.0 / math.sqrt(d_ // heads)
    attn_fn = _make_diff_attn(heads, scale, n8, n_, attn_folded,
                              interpret)

    def step(x2, w16):
        return _ft_block(x2, *w16, heads=heads, eps=eps,
                         quick_gelu=quick_gelu, attn_fn=attn_fn)

    if remat:
        step = jax.checkpoint(step)
    for blk in range(0, len(w_flat), 16):
        x2 = step(x2, w_flat[blk:blk + 16])
    return x2.reshape(b_, n8, d_)[:, 0, :]


# ------------------------------------------------- reference (jnp) math


def _reference_block(x, wq, bq, wk, bk, wv, bv, wo, bo, g1, bb1, g2, bb2,
                     w1, b1, w2, b2, *, heads: int, eps: float,
                     quick_gelu: bool):
    """The encoder block in plain jnp — the differentiation target for
    the custom VJP and the math the kernels are tested against.  Follows
    the flax module composition (models/vit.py EncoderBlock): f32
    LayerNorms, compute-dtype projections, f32 softmax, exact GELU."""
    dtype = x.dtype
    b_, n_, d_ = x.shape
    dh = d_ // heads
    y = _ln_f32(x.astype(jnp.float32), g1.astype(jnp.float32),
                bb1.astype(jnp.float32), eps).astype(dtype)
    q = (y @ wq.astype(dtype) + bq.astype(dtype)).reshape(b_, n_, heads, dh)
    k = (y @ wk.astype(dtype) + bk.astype(dtype)).reshape(b_, n_, heads, dh)
    v = (y @ wv.astype(dtype) + bv.astype(dtype)).reshape(b_, n_, heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s * (1.0 / math.sqrt(dh)), axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b_, n_, d_)
    x = x + ctx @ wo.astype(dtype) + bo.astype(dtype)
    y = _ln_f32(x.astype(jnp.float32), g2.astype(jnp.float32),
                bb2.astype(jnp.float32), eps).astype(dtype)
    h = y @ w1.astype(dtype) + b1.astype(dtype)
    h = _gelu_exact_or_quick(h, quick_gelu, jax.lax.erf)
    return x + h @ w2.astype(dtype) + b2.astype(dtype)


# ---------------------------------------------------------- public VJP


def _reference_cls_stack(x, w_flat, *, heads: int, eps: float,
                         quick_gelu: bool):
    """The whole encoder stack in plain jnp (per-block
    :func:`_reference_block`), returning pre-ln_final CLS rows — the
    differentiation target and test oracle for the stream stack."""
    for blk in range(0, len(w_flat), 16):
        x = _reference_block(x, *w_flat[blk:blk + 16], heads=heads,
                             eps=eps, quick_gelu=quick_gelu)
    return x[:, 0, :]


@functools.lru_cache(maxsize=None)
def _make_fused_stack(heads: int, eps: float, quick_gelu: bool,
                      interpret: bool, attn_folded: bool, remat: bool):
    @jax.custom_vjp
    def fused(x, *w_flat):
        return _fused_stack_impl(x, w_flat, heads=heads, eps=eps,
                                 quick_gelu=quick_gelu,
                                 interpret=interpret,
                                 attn_folded=attn_folded)

    def fwd(x, *w_flat):
        # Differentiated calls (--train_backbone fine-tuning) run the ft
        # stream: jnp LN/QKV/MLP on the 2-D token stream (XLA AD emits
        # clean dgrad/wgrad matmuls there) + the flash-style Pallas
        # attention core fwd/bwd kernels.  Chip-measured vs XLA AD over
        # the 3-D reference math: see PERF.md "fine-tuning".
        out, vjp = jax.vjp(
            lambda x, *w: _ft_cls_stack(x, w, heads=heads, eps=eps,
                                        quick_gelu=quick_gelu,
                                        interpret=interpret,
                                        attn_folded=attn_folded,
                                        remat=remat),
            x, *w_flat)
        return out, vjp

    def bwd(vjp, ct):
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused


def fused_encoder_cls_stack(x, block_weights, *, heads: int, eps: float,
                            quick_gelu: bool = False,
                            interpret: bool = False,
                            attn_core: str | None = None,
                            remat: bool = False):
    """The FULL encoder stack through the fused kernels in one flattened
    8-row-aligned token domain, returning the pre-ln_final CLS features
    ``(B, D)``.

    ``block_weights``: sequence of per-block 16-tuples in
    :func:`fused_encoder_block` argument order.  Motivation and layout
    invariants in :func:`_fused_stack_impl`; chip numbers in PERF.md
    ("r8: the stream stack").  VJP contract: differentiated calls run
    the ft stream (:func:`_ft_cls_stack` — jnp 2-D stream math + the
    flash-style Pallas attention fwd/bwd kernels); ``remat=True``
    checkpoints each block there (``--remat_backbone``).
    """
    if attn_core is None:
        attn_core = _attn_core_variant()
    flat = tuple(a for blk in block_weights for a in blk)
    if len(flat) % 16:
        raise ValueError("block_weights must be 16-tuples "
                         f"(got {len(flat)} arrays)")
    return _make_fused_stack(heads, float(eps), bool(quick_gelu),
                             bool(interpret), attn_core == "exp2",
                             bool(remat))(x, *flat)


def _attn_core_variant() -> str:
    """Attention-core softmax flavor: ``exp2`` (default — scale/log2e
    folded into q, denominator folded into the context rows) or
    ``softmax`` (baseline, f32 ``jax.nn.softmax`` on the N×N scores).
    Chip-timed via tools/bench_vit_block.py (v5e, B=256/N=257/D=1024):
    exp2 14.68 vs softmax 15.10 ms/block, identical bf16-class numerics
    vs flax — so exp2 is the default; ``SRTPU_ATTN_CORE=softmax``
    restores the baseline core."""
    v = os.environ.get("SRTPU_ATTN_CORE", "exp2")
    if v not in ("softmax", "exp2"):
        raise ValueError(f"SRTPU_ATTN_CORE must be softmax|exp2, got {v!r}")
    return v


@functools.lru_cache(maxsize=None)
def _make_fused_block(heads: int, eps: float, quick_gelu: bool,
                      interpret: bool, attn_folded: bool):
    @jax.custom_vjp
    def fused(x, *w):
        return _fused_impl(x, *w, heads=heads, eps=eps,
                           quick_gelu=quick_gelu, interpret=interpret,
                           attn_folded=attn_folded)

    def fwd(x, *w):
        out, vjp = jax.vjp(
            lambda x, *w: _reference_block(x, *w, heads=heads, eps=eps,
                                           quick_gelu=quick_gelu), x, *w)
        return out, vjp

    def bwd(vjp, ct):
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused


def fused_encoder_block(x, wq, bq, wk, bk, wv, bv, wo, bo, g1, bb1,
                        g2, bb2, w1, b1, w2, b2, *, heads: int,
                        eps: float, quick_gelu: bool = False,
                        interpret: bool = False,
                        attn_core: str | None = None):
    """One ViT encoder block through the fused Pallas kernels.

    ``x`` (B, N, D); projection weights pre-flattened to 2D with
    head-major columns/rows (``kernel.reshape(D, D)`` of the flax
    ``DenseGeneral`` (D, h, dh) tree — column h*dh+j is head h dim j,
    which is exactly the per-head lane slice the core kernel takes).

    Undifferentiated calls run the kernels; under ``jax.grad`` the
    custom-VJP fwd rule routes to :func:`_reference_block` (plain XLA AD)
    — the same forward-only-kernel contract as the GGNN (its module
    docstring documents why; the frozen ViT backbone never
    backpropagates in any reference configuration).
    """
    if attn_core is None:
        attn_core = _attn_core_variant()
    return _make_fused_block(heads, float(eps), bool(quick_gelu),
                             bool(interpret), attn_core == "exp2")(
        x, wq, bq, wk, bk, wv, bv, wo, bo, g1, bb1, g2, bb2,
        w1, b1, w2, b2)
