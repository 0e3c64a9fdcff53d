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
    # high-res patchification: the attention core's token-scaled VMEM
    # (score matrix + (1,n,d) blocks) must gate, not just the weights
    assert not fused_block_supported(1024, 16, 8465, 1)


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
def test_fused_kernels_exp2_attn_core_interpret():
    """The folded exp2 attention core (scale/log2e pre-multiplied into
    q, denominator divided into the context rows) is the same softmax
    up to bf16 rounding order — hold it to the SAME bound as the
    baseline core, vs both the jnp reference and the baseline kernels."""
    p, x = _params_and_x(seed=2)
    want = _reference_block(x, *_args(p), heads=HEADS, eps=1e-6,
                            quick_gelu=False)
    base = fused_encoder_block(x, *_args(p), heads=HEADS, eps=1e-6,
                               quick_gelu=False, interpret=True,
                               attn_core="softmax")
    got = fused_encoder_block(x, *_args(p), heads=HEADS, eps=1e-6,
                              quick_gelu=False, interpret=True,
                              attn_core="exp2")
    scale = np.max(np.abs(np.asarray(want, np.float32)))
    for other in (want, base):
        diff = np.max(np.abs(np.asarray(got, np.float32)
                             - np.asarray(other, np.float32)))
        assert diff <= 0.03 * max(scale, 1.0), (diff, scale)


def test_attn_core_variant_env(monkeypatch):
    from situation_recognition_tpu.ops.vit_pallas import _attn_core_variant
    monkeypatch.delenv("SRTPU_ATTN_CORE", raising=False)
    assert _attn_core_variant() == "exp2"      # chip-timed default (PERF.md)
    monkeypatch.setenv("SRTPU_ATTN_CORE", "softmax")
    assert _attn_core_variant() == "softmax"
    monkeypatch.setenv("SRTPU_ATTN_CORE", "exp2")
    assert _attn_core_variant() == "exp2"
    monkeypatch.setenv("SRTPU_ATTN_CORE", "bogus")
    with pytest.raises(ValueError):
        _attn_core_variant()


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


def test_vit_module_fused_trace_count(monkeypatch):
    """STRUCTURAL: applying a depth-2 ViT on the fused path routes exactly
    2 calls through the kernel primal; under jax.grad, 0 (the custom_vjp
    fwd rule replaces every call with the reference math) — the same
    trace-count contract as the GGNN kernel
    (tests/test_sharding.py::test_pallas_kernel_engages_in_train_step_gt_branch)."""
    import situation_recognition_tpu.ops.vit_pallas as vp
    from situation_recognition_tpu.models.vit import ViT

    block_calls, stack_calls = [], []
    orig_block = vp._fused_impl
    orig_stack = vp._fused_stack_impl

    def counting_block(*a, **k):
        block_calls.append(1)
        return orig_block(*a, **k)

    def counting_stack(*a, **k):
        stack_calls.append(1)
        return orig_stack(*a, **k)

    monkeypatch.setattr(vp, "_fused_impl", counting_block)
    monkeypatch.setattr(vp, "_fused_stack_impl", counting_stack)
    vp._make_fused_stack.cache_clear()  # rebind the patched primal
    # 16x16 images, patch 4 -> 17 tokens; B=64 -> 1088 rows >= _MIN_ROWS
    model = ViT(patch=4, width=D, depth=2, heads=HEADS,
                dtype=jnp.bfloat16, block_impl="pallas", interpret=True)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (64, 16, 16, 3)), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)

    # default path: ONE stream-stack primal covers all blocks
    monkeypatch.setenv("SRTPU_VIT_STREAM", "1")
    block_calls.clear(); stack_calls.clear()
    model.apply(v, x)
    assert (len(stack_calls), len(block_calls)) == (1, 0), (
        f"stream path traced {len(stack_calls)} stack / "
        f"{len(block_calls)} per-block primals; expected (1, 0)")

    stack_calls.clear()
    jax.grad(lambda xx: jnp.sum(model.apply(v, xx).astype(jnp.float32)))(x)
    assert len(stack_calls) == 0, (
        f"{len(stack_calls)} stack primals traced under jax.grad; the "
        "custom_vjp fwd rule must route every differentiated call to the "
        "ft stream (or, per-block, the reference math)")

    # per-block escape hatch: depth primals, no stack
    monkeypatch.setenv("SRTPU_VIT_STREAM", "0")
    block_calls.clear(); stack_calls.clear()
    model.apply(v, x)
    assert (len(stack_calls), len(block_calls)) == (0, 2), (
        f"per-block path traced {len(stack_calls)} stack / "
        f"{len(block_calls)} per-block primals; expected (0, 2)")

    block_calls.clear()
    jax.grad(lambda xx: jnp.sum(model.apply(v, xx).astype(jnp.float32)))(x)
    assert len(block_calls) == 0


@pytest.mark.slow
def test_vit_fused_engages_in_trainer_steps(monkeypatch, encoder):
    """STRUCTURAL: with a fused-path ViT backbone, tracing the jitted
    train step routes exactly `depth` calls through the kernel primal —
    the backbone forward is hoisted OUTSIDE the grad closure
    (train.py Trainer._features docstring), so its blocks keep the fused
    primal.  If the backbone ever slides inside loss_fn, the custom_vjp
    fwd rule silently reroutes every block to the reference math on TPU
    (a pure perf regression no numeric test would catch) and this count
    drops to 0."""
    import situation_recognition_tpu.ops.vit_pallas as vp
    import situation_recognition_tpu.train as train_mod
    from situation_recognition_tpu.models.vit import VIT_WIDTHS, ViT
    from situation_recognition_tpu.parallel.mesh import make_mesh
    from situation_recognition_tpu.train import Trainer, TrainerConfig

    DEPTH = 2

    def vit128(dtype=jnp.bfloat16):
        # patch 32 on the 224 crop -> 50 tokens; B=24 -> 1200 rows
        return ViT(patch=32, width=D, depth=DEPTH, heads=HEADS,
                   dtype=dtype, block_impl="pallas", interpret=True)

    monkeypatch.setitem(train_mod._VITS, "vit_tiny", vit128)
    monkeypatch.setitem(VIT_WIDTHS, "vit_tiny", D)

    calls = []
    orig = vp._fused_stack_impl

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    # the ViT stream stack is the default TPU path (one primal covers
    # every block); count ITS engagement in the jitted steps
    monkeypatch.setenv("SRTPU_VIT_STREAM", "1")
    monkeypatch.setattr(vp, "_fused_stack_impl", counting)
    cfg = TrainerConfig(hidden=D, batch_size=24, backbone="vit_tiny",
                        compute_dtype=jnp.bfloat16, ggnn_impl="masked",
                        seed=7)
    tr = Trainer(encoder, cfg, mesh=make_mesh())
    B = 24
    rng = np.random.default_rng(8)
    batch = {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "flip": np.zeros((B,), bool),
        "verbs": rng.integers(0, encoder.get_num_verbs(), B).astype(np.int32),
        "labels": rng.integers(
            0, encoder.get_num_labels(),
            (B, 3, encoder.max_role_count)).astype(np.int32),
        "names": ["x"] * B,
    }
    arrays, valid, _ = tr._pad_batch(batch)

    calls.clear()
    tr._train_step.lower(tr.head_params, tr.opt_state, tr.backbone_params,
                         tr.backbone_stats, jax.random.PRNGKey(0),
                         arrays["images"], arrays["flip"], arrays["verbs"],
                         arrays["labels"], valid)
    assert len(calls) == 1, (
        f"{len(calls)} stream-stack primals traced in the train step; "
        "expected 1 (backbone hoisted outside the grad closure)")

    calls.clear()
    tr._eval_step.lower(tr.head_params, tr.backbone_params,
                        tr.backbone_stats, arrays["images"],
                        arrays["verbs"], arrays["labels"], valid)
    assert len(calls) == 1, (
        f"{len(calls)} stream-stack primals traced in the eval step; "
        "expected 1")


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


def test_forced_pallas_raises_when_unsupported():
    """block_impl='pallas' is an explicit force — it must fail loudly when
    the kernels can't run (the silent flax fallback is numerically
    invisible; 'auto' is the gated-fallback mode)."""
    import jax

    blk = EncoderBlock(dim=D, heads=HEADS, dtype=jnp.float32,  # not bf16
                       block_impl="pallas", interpret=True)
    x = jnp.zeros((B, N, D), jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)     # init always runs flax: OK
    with pytest.raises(ValueError, match="forced"):
        blk.apply(v, x)


# --------------------------------------------------- stream stack (r8)


@pytest.mark.slow
def test_stream_stack_matches_reference_interpret():
    """The stream stack (all blocks in one flattened 8-row-aligned token
    domain, ops/vit_pallas.py::_fused_stack_impl) must match the jnp
    reference stack's CLS rows at the bf16-class bound — including the
    pad-row machinery (N=129 -> n8=136 exercises 7 pad rows/example
    plus the end-of-stream bm padding)."""
    from situation_recognition_tpu.ops.vit_pallas import (
        _reference_cls_stack, fused_encoder_cls_stack)

    p1, x = _params_and_x(seed=5)
    p2, _ = _params_and_x(seed=6)
    w = [_args(p1), _args(p2)]
    flat = tuple(a for blk in w for a in blk)
    want = _reference_cls_stack(x, flat, heads=HEADS, eps=1e-6,
                                quick_gelu=False)
    for core in ("softmax", "exp2"):
        got = fused_encoder_cls_stack(x, w, heads=HEADS, eps=1e-6,
                                      quick_gelu=False, interpret=True,
                                      attn_core=core)
        assert got.shape == (B, D)
        diff = np.max(np.abs(np.asarray(got, np.float32)
                             - np.asarray(want, np.float32)))
        scale = np.max(np.abs(np.asarray(want, np.float32)))
        assert diff <= 0.03 * max(scale, 1.0), (core, diff, scale)


# ----------------------------------------- ft (fine-tuning) stream (r9)


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def test_diff_attn_grads_match_reference_interpret():
    """The differentiable attention core's flash-style Pallas backward
    (recompute scores in VMEM; dv = p^T do, ds = p(dp - rowsum(do*o)),
    dq = ds k, dk = ds^T q) vs XLA AD over the same per-head softmax
    math, including pad-row zeroing (n_valid=13 < n8=16).  bf16-class
    agreement (the kernel casts e/ds to bf16 for the MXU dots)."""
    import math

    from situation_recognition_tpu.ops.vit_pallas import _make_diff_attn

    b, n8, nv, d, heads = 2, 16, 13, 128, 2
    dh = d // heads
    scale = 1.0 / math.sqrt(dh)
    rng = np.random.default_rng(11)
    q, k, v = (jnp.asarray(rng.standard_normal((b * n8, d)), jnp.bfloat16)
               for _ in range(3))

    def ref(q, k, v):
        q3 = q.reshape(b, n8, d)[:, :nv]
        k3 = k.reshape(b, n8, d)[:, :nv]
        v3 = v.reshape(b, n8, d)[:, :nv]
        outs = []
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = jnp.einsum("bqd,bkd->bqk", q3[..., sl],
                           k3[..., sl]).astype(jnp.float32)
            p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
            outs.append(jnp.einsum("bqk,bkd->bqd", p, v3[..., sl]))
        o = jnp.concatenate(outs, -1)
        return jnp.pad(o, ((0, 0), (0, n8 - nv), (0, 0))).reshape(b * n8, d)

    for folded in (False, True):
        attn = _make_diff_attn(heads, scale, n8, nv, folded, True)
        # a fixed cotangent through a nonlinear loss exercises dp/delta
        loss_k = lambda q, k, v: jnp.sum(  # noqa: E731
            attn(q, k, v).astype(jnp.float32) ** 2)
        loss_r = lambda q, k, v: jnp.sum(  # noqa: E731
            ref(q, k, v).astype(jnp.float32) ** 2)
        ok = np.asarray(attn(q, k, v), np.float32)
        orf = np.asarray(ref(q, k, v), np.float32)
        assert _rel(ok, orf) <= 0.03, (folded, _rel(ok, orf))
        gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for name, a, bb in zip("qkv", gk, gr):
            assert _rel(a, bb) <= 0.05, (folded, name, _rel(a, bb))
            # pad-row gradients must be exact zeros (they feed the jnp
            # QKV wgrads upstream)
            pads = np.asarray(a, np.float32).reshape(b, n8, d)[:, nv:]
            assert np.all(pads == 0), (folded, name)


@pytest.mark.slow
def test_ft_stream_grads_match_reference_interpret():
    """Differentiating the stream stack runs the ft stream (jnp 2-D
    stream math + the Pallas attention fwd/bwd kernels).  Grads wrt x
    and every weight match XLA AD over the jnp reference stack at the
    bf16-class bound — except bk (the key-projection bias), whose true
    gradient is EXACTLY ZERO: a key bias shifts each score row by a
    per-query constant, which softmax is invariant to, so both sides
    compute only cancellation noise and are compared absolutely.
    remat=True (per-block jax.checkpoint) must be bit-identical to
    remat=False."""
    from situation_recognition_tpu.ops.vit_pallas import (
        _reference_cls_stack, fused_encoder_cls_stack)

    p1, x = _params_and_x(seed=7)
    p2, _ = _params_and_x(seed=8)
    w = [_args(p1), _args(p2)]
    flat = tuple(a for blk in w for a in blk)
    names = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "g1", "bb1",
             "g2", "bb2", "w1", "b1", "w2", "b2"]

    def loss_fused(x, flat, remat):
        blocks = [flat[i * 16:(i + 1) * 16] for i in range(len(w))]
        return jnp.sum(fused_encoder_cls_stack(
            x, blocks, heads=HEADS, eps=1e-6, interpret=True, remat=remat
        ).astype(jnp.float32) ** 2)

    def loss_ref(x, flat):
        return jnp.sum(_reference_cls_stack(
            x, flat, heads=HEADS, eps=1e-6, quick_gelu=False
        ).astype(jnp.float32) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, flat, False)
    gx_m, gw_m = jax.grad(loss_fused, argnums=(0, 1))(x, flat, True)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, flat)

    assert _rel(gx_f, gx_r) <= 0.03, _rel(gx_f, gx_r)
    # the overall gradient scale, for the bk absolute bound
    gscale = max(np.abs(np.asarray(g, np.float64)).max() for g in gw_r)
    for i, (a, b) in enumerate(zip(gw_f, gw_r)):
        name = names[i % 16]
        if name == "bk":
            for g in (a, b):
                assert np.abs(np.asarray(g, np.float64)).max() <= (
                    1e-2 * gscale), (i // 16, name)
        else:
            # 0.08: bf16-class over two chained blocks and a squared
            # loss (a structural bug reads ~1.0+, cf. the bk analysis)
            assert _rel(a, b) <= 0.08, (i // 16, name, _rel(a, b))
    # per-block checkpointing recomputes the identical primal: bitwise
    np.testing.assert_array_equal(np.asarray(gx_f, np.float32),
                                  np.asarray(gx_m, np.float32))
    for a, b in zip(gw_f, gw_m):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_ft_stream_engages_under_grad(monkeypatch):
    """STRUCTURAL: differentiating the stream stack traces the ft stream
    (and not the reference stack) — the fine-tuning routing contract."""
    import situation_recognition_tpu.ops.vit_pallas as vp

    p1, x = _params_and_x(seed=12)
    w = [_args(p1)]
    ft_calls, ref_calls = [], []
    orig_ft, orig_ref = vp._ft_cls_stack, vp._reference_cls_stack

    def counting_ft(*a, **k):
        ft_calls.append(1)
        return orig_ft(*a, **k)

    def counting_ref(*a, **k):
        ref_calls.append(1)
        return orig_ref(*a, **k)

    monkeypatch.setattr(vp, "_ft_cls_stack", counting_ft)
    monkeypatch.setattr(vp, "_reference_cls_stack", counting_ref)
    vp._make_fused_stack.cache_clear()

    def loss(x):
        return jnp.sum(vp.fused_encoder_cls_stack(
            x, w, heads=HEADS, eps=1e-6, interpret=True
        ).astype(jnp.float32))

    jax.grad(loss)(x)
    assert (len(ft_calls), len(ref_calls)) == (1, 0), (
        f"ft {len(ft_calls)} / reference {len(ref_calls)} primals traced "
        "under jax.grad; the fwd rule must run the ft stream")
    vp._make_fused_stack.cache_clear()   # drop the patched closures


@pytest.mark.slow
def test_vit_module_stream_path_interpret(monkeypatch):
    """ViT with the stream gate open must produce the flax composition's
    features (bf16-class) — the module-level wiring (weight gathering,
    CLS-rows-then-ln_final reordering) is what this pins, and the
    pallas-call count must be 3 per block (qkv, attention, mlp)."""
    from situation_recognition_tpu.models.vit import ViT

    monkeypatch.setenv("SRTPU_VIT_STREAM", "1")
    rng = np.random.default_rng(3)
    # patch 4 on 16x16 -> 17 tokens (n8=24, 7 pad rows); B=64 -> 1088 rows
    img = jnp.asarray(rng.standard_normal((64, 16, 16, 3)), jnp.bfloat16)
    model = ViT(patch=4, width=D, depth=2, heads=HEADS,
                dtype=jnp.bfloat16, block_impl="pallas", interpret=True)
    vars_ = model.init(jax.random.PRNGKey(0),
                       np.zeros((1, 16, 16, 3), np.float32))
    fused = model.apply(vars_, img)

    flax_model = ViT(patch=4, width=D, depth=2, heads=HEADS,
                     dtype=jnp.bfloat16, block_impl="flax")
    want = flax_model.apply(vars_, img)
    diff = np.max(np.abs(np.asarray(fused, np.float32)
                         - np.asarray(want, np.float32)))
    scale = np.max(np.abs(np.asarray(want, np.float32)))
    assert diff <= 0.05 * max(scale, 1.0), (diff, scale)

    jaxpr = str(jax.make_jaxpr(lambda v, im: model.apply(v, im))(vars_, img))
    assert jaxpr.count("pallas_call") == 6  # 3 kernels x 2 blocks

    # escape hatch: SRTPU_VIT_STREAM=0 restores the per-block path
    # (same kernels, same count — the A/B knob must change the PATH,
    # asserted via the stream impl's distinctive CLS gather shape)
    monkeypatch.setenv("SRTPU_VIT_STREAM", "0")
    per_block = model.apply(vars_, img)
    diff2 = np.max(np.abs(np.asarray(per_block, np.float32)
                          - np.asarray(want, np.float32)))
    assert diff2 <= 0.05 * max(scale, 1.0), diff2


@pytest.mark.slow
def test_stream_stack_quick_gelu_interpret():
    """CLIP-variant stream (QuickGELU, eps=1e-5) matches the reference
    stack — the vit_l14_clip backbone takes the stream path too."""
    from situation_recognition_tpu.ops.vit_pallas import (
        _reference_cls_stack, fused_encoder_cls_stack)

    p1, x = _params_and_x(seed=9)
    w = [_args(p1)]
    flat = w[0]
    want = _reference_cls_stack(x, flat, heads=HEADS, eps=1e-5,
                                quick_gelu=True)
    got = fused_encoder_cls_stack(x, w, heads=HEADS, eps=1e-5,
                                  quick_gelu=True, interpret=True)
    diff = np.max(np.abs(np.asarray(got, np.float32)
                         - np.asarray(want, np.float32)))
    scale = np.max(np.abs(np.asarray(want, np.float32)))
    assert diff <= 0.03 * max(scale, 1.0), (diff, scale)
