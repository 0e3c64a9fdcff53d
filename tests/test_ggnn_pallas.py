"""Fused Pallas GGNN kernel vs the masked-sum XLA implementation
(interpret mode on CPU; the real-TPU comparison runs in bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.ops.ggnn import ggnn_propagate, init_ggnn_params
from situation_recognition_tpu.ops.ggnn_pallas import (
    fold_gate_weights, ggnn_propagate_pallas, kernel_supported)


def _setup(d=256, B=24, R=6, seed=0):
    # B*R must stay >= ggnn_pallas._MIN_ROWS (128) for the kernel path to
    # engage; smaller shapes deliberately route to masked (see module doc)
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
    # R=4 (fixture-sized): blocks are multiples of lcm(R,16)=16 rows, and
    # B*R=160 rows smaller than the 576 cap exercises whole-problem blocking
    params, h, mask = _setup(d=128, B=40, R=4, seed=1)
    want = ggnn_propagate(params, h, mask, num_steps=2)
    got = ggnn_propagate_pallas(params, h, mask, 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)
    assert got.shape == h.shape


def test_pallas_dummy_example_padding_branch():
    """B=25, R=6 → m=150 rows, block unit lcm(6,16)=48 → bm=96 (the
    padded-rows-minimizing choice), pad=42 dummy rows: the shape class that
    actually executes the pad branch in _propagate_fwd_impl (most test
    shapes divide their bm exactly).  Dummy rows have mask 0 and must not
    perturb real examples."""
    from situation_recognition_tpu.ops.ggnn_pallas import _pick_bm

    params, h, mask = _setup(d=128, B=25, R=6, seed=6)
    bm = _pick_bm(25 * 6, 6, 128)
    assert 150 % bm != 0, "shape no longer exercises the padding branch"
    want = ggnn_propagate(params, h, mask, num_steps=3)
    got = ggnn_propagate_pallas(params, h, mask, 3, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)
    # dummy-row independence: the kernel run over a clean 24-example
    # (m=144, divides bm... its own blocking) prefix must agree with the
    # padded 25-example run example-for-example
    got24 = ggnn_propagate_pallas(params, h[:24], mask[:24], 3, True)
    np.testing.assert_allclose(np.asarray(got[:24]), np.asarray(got24),
                               rtol=1e-5, atol=1e-6)


def test_pallas_grad_matches_masked_grad():
    """Differentiated calls run XLA AD over the identical masked-sum math
    (measured fastest — see ops/ggnn_pallas.py), so gradients must match
    the masked path to float tolerance, not a loose bf16 bound."""
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


@pytest.mark.parametrize("steps", [1, 4])
def test_pallas_backward_kernel_matches_ad(monkeypatch, steps):
    """SRTPU_GGNN_BWD=pallas routes differentiated calls through the
    residual-saving forward + hand-written backward kernel
    (ops/ggnn_pallas.py _folded_kernel_res/_folded_kernel_bwd).  The
    kernel stores its residuals in bf16 — gradients agree with XLA AD
    over the masked-sum math to bf16-class tolerance, for both params
    and hidden, through a nonlinear reduction."""
    monkeypatch.setenv("SRTPU_GGNN_BWD", "pallas")
    from situation_recognition_tpu.ops.ggnn_pallas import (
        train_kernel_supported)

    params, h, mask = _setup(d=256, B=24, R=6, seed=3)
    assert train_kernel_supported(256, 6, steps)

    def loss_pallas(p, hh):
        return jnp.sum(jnp.sin(ggnn_propagate_pallas(p, hh, mask,
                                                     steps, True)))

    def loss_masked(p, hh):
        return jnp.sum(jnp.sin(ggnn_propagate(p, hh, mask, steps)))

    gk = jax.grad(loss_pallas, argnums=(0, 1))(params, h)
    gm = jax.grad(loss_masked, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gm)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.max(np.abs(b)) + 1e-9
        assert np.max(np.abs(a - b)) / scale < 2e-2, (
            np.max(np.abs(a - b)) / scale)


def test_pallas_backward_kernel_verb_branch(monkeypatch):
    """The verb branch differentiates single-node graphs (R=1, mask 0 →
    E = I): the backward kernel must agree there too (exercises the
    r=1 min-block/lcm padding path)."""
    monkeypatch.setenv("SRTPU_GGNN_BWD", "pallas")
    params, h, _ = _setup(d=256, B=160, R=1, seed=4)
    mask = jnp.zeros((160, 1), jnp.float32)

    def loss(p, hh):
        return jnp.sum(jnp.sin(ggnn_propagate_pallas(p, hh, mask, 4, True)))

    def loss_ref(p, hh):
        return jnp.sum(jnp.sin(ggnn_propagate(p, hh, mask, 4)))

    gk = jax.grad(loss, argnums=(0, 1))(params, h)
    gm = jax.grad(loss_ref, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gm)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.max(np.abs(b)) + 1e-9
        assert np.max(np.abs(a - b)) / scale < 2e-2


def test_pallas_backward_env_default_is_xla(monkeypatch):
    """Without the env override the routing follows the measured default
    (PERF.md r3) — resolve_ggnn_bwd() must not return 'pallas' unless
    explicitly forced, so production numerics stay pinned."""
    from situation_recognition_tpu.ops import ggnn_pallas as gpmod

    monkeypatch.delenv("SRTPU_GGNN_BWD", raising=False)
    assert gpmod.resolve_ggnn_bwd() in ("xla", "pallas")
    monkeypatch.setenv("SRTPU_GGNN_BWD", "xla")
    assert gpmod.resolve_ggnn_bwd() == "xla"
    monkeypatch.setenv("SRTPU_GGNN_BWD", "pallas")
    assert gpmod.resolve_ggnn_bwd() == "pallas"


@pytest.mark.parametrize("R,masks", [
    (2, "random"), (3, "random"), (5, "random"),
    (6, "zeros"),   # every node self-messages (the verb-branch encoding)
    (6, "ones"),    # fully-connected graphs, no pad roles
])
def test_pallas_matches_masked_role_count_sweep(R, masks):
    """Robustness across role counts (block unit = lcm(R,16) varies: 32,
    48, 80, 96) and mask extremes — the kernel's in-block adjacency must
    reproduce the reference semantics for every graph shape the encoder
    can produce, not just R=6 random masks."""
    d = 128
    B = max(1, -(-128 // R)) + 3          # keep B*R just above _MIN_ROWS
    params = init_ggnn_params(jax.random.PRNGKey(R), d)
    rng = np.random.default_rng(R)
    h = jnp.asarray(rng.standard_normal((B, R, d)) * 0.5, jnp.float32)
    if masks == "zeros":
        mask = jnp.zeros((B, R), jnp.float32)
    elif masks == "ones":
        mask = jnp.ones((B, R), jnp.float32)
    else:
        counts = rng.integers(1, R + 1, B)
        mask = jnp.asarray(np.arange(R)[None, :] < counts[:, None],
                           jnp.float32)
    want = ggnn_propagate(params, h, mask, num_steps=3)
    got = ggnn_propagate_pallas(params, h, mask, 3, True)
    assert B * R >= 128  # above the row gate — kernel path engaged
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)


def test_grad_with_mixed_param_hidden_dtypes():
    """f32 params + bf16 hidden: the masked recompute in the backward
    promotes its primal to f32 while the kernel forward stays bf16; the
    custom VJP must align the cotangent dtype instead of raising."""
    params, h, mask = _setup(d=128, B=4, R=6, seed=9)
    hb = h.astype(jnp.bfloat16)
    g = jax.grad(lambda p, x: jnp.sum(
        ggnn_propagate_pallas(p, x, mask, 2, True) ** 2).astype(jnp.float32),
        argnums=(0, 1))(params, hb)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
    assert g[1].dtype == jnp.bfloat16


def test_fold_gate_weights_algebra():
    """The W_p fold is exact algebra: for any n-input x,
    x @ W_p @ W_g + R*(b_p @ W_g) must equal ((x @ W_p + R*b_p)) @ W_g.
    Checked in f32 against the unfolded two-stage computation."""
    d, r = 128, 6
    params = init_ggnn_params(jax.random.PRNGKey(0), d)
    wa, uzr, uh, ba = fold_gate_weights(params, float(r), jnp.float32)
    assert wa.shape == (d, 3 * d) and uzr.shape == (d, 2 * d)
    assert uh.shape == (d, d) and ba.shape == (1, 3 * d)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((5, d)), jnp.float32)
    n = x @ params.w_p + r * params.b_p
    for i, (w, bw, bu) in enumerate([
            (params.w_z, params.b_wz, params.b_uz),
            (params.w_r, params.b_wr, params.b_ur),
            (params.w_h, params.b_wh, params.b_uh)]):
        want = n @ w + bw + bu
        got = x @ wa[:, i * d:(i + 1) * d] + ba[0, i * d:(i + 1) * d]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(uzr[:, :d]),
                                  np.asarray(params.u_z))
    np.testing.assert_array_equal(np.asarray(uzr[:, d:]),
                                  np.asarray(params.u_r))


def test_unsupported_width_falls_back_to_masked():
    """d not tileable by the kernel (d % 128 != 0) must produce the exact
    masked-sum result — the wrapper routes to ggnn_propagate, bit-for-bit."""
    assert not kernel_supported(192)
    assert kernel_supported(2048) and kernel_supported(1024)
    # guard consistency: a width whose weights pass but whose weights + one
    # minimum block exceed the VMEM budget must be rejected here, NOT die
    # in Mosaic compilation (d=3200 is 128-aligned; 12d^2 = 122.9 MB alone)
    assert not kernel_supported(3200)


def test_remat_request_routes_to_masked_path():
    """GGNN(impl='pallas', remat=True) must honor remat: the pallas custom
    VJP cannot remat (its backward is plain XLA AD), so propagate takes the
    masked path — outputs must equal masked-with-remat bit-for-bit."""
    from situation_recognition_tpu.models.fcggnn import GGNN

    # B=24 (144 rows): above the _MIN_ROWS gate, so a broken remat routing
    # would engage the kernel and break the bit-equality below
    params, h, mask = _setup(d=128, B=24, R=6, seed=8)
    mod_remat = GGNN(hidden=128, num_steps=2, impl="pallas", remat=True)
    v = mod_remat.init(jax.random.PRNGKey(0), h, mask,
                       method=GGNN.propagate)
    out_remat = mod_remat.apply(v, h, mask, method=GGNN.propagate)
    mod_masked = GGNN(hidden=128, num_steps=2, impl="masked")
    out_masked = mod_masked.apply(v, h, mask, method=GGNN.propagate)
    np.testing.assert_array_equal(np.asarray(out_remat),
                                  np.asarray(out_masked))
    # prove the shape engages the kernel when remat is NOT requested —
    # otherwise the bit-equality above would hold vacuously via fallback
    mod_pallas = GGNN(hidden=128, num_steps=2, impl="pallas")
    out_pallas = mod_pallas.apply(v, h, mask, method=GGNN.propagate)
    assert np.any(np.asarray(out_pallas) != np.asarray(out_masked))
    params, h, mask = _setup(d=192, B=4, R=6, seed=5)
    want = ggnn_propagate(params, h, mask, num_steps=2)
    got = ggnn_propagate_pallas(params, h, mask, 2, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pick_bm_agrees_with_support_gate_exotic_role_counts():
    """kernel_supported and _pick_bm MUST agree (their shared docstring
    contract): every supported (d, r) must yield a feasible block — the
    round-2 bug divided by zero whenever lcm(r, 16) exceeded the 576
    sweet-spot cap (any odd r >= 37)."""
    from situation_recognition_tpu.ops.ggnn_pallas import (
        _min_block, kernel_supported, _pick_bm)

    for r in range(1, 48):
        if not kernel_supported(128, r):
            continue
        unit = _min_block(r)
        for m in (unit, unit + r, 17 * r, 629 if r == 37 else 40 * r):
            bm = _pick_bm(m, r, 128)
            assert bm >= 1 and (m <= unit or bm % unit == 0), (r, m, bm)


def test_auto_impl_requires_bf16():
    """'auto' must not route an fp32 run onto the bf16-internal kernel
    (silent forward-precision downgrade); explicit choices pass through."""
    import jax.numpy as jnp

    from situation_recognition_tpu.train import resolve_ggnn_impl

    # CPU test rig: auto is masked either way; the dtype argument must
    # never WIDEN kernel routing
    assert resolve_ggnn_impl("auto", jnp.float32) == "masked"
    assert resolve_ggnn_impl("pallas", jnp.float32) == "pallas"
    assert resolve_ggnn_impl("masked", jnp.bfloat16) == "masked"
