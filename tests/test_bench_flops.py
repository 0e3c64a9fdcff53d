"""bench.py pallas-FLOP accounting: XLA's cost_analysis prices Mosaic
custom calls at 0 FLOPs, so bench supplements MFU with analytic counts
mirroring the kernels' actual matmul structure.  These tests pin the
formulas to hand counts and the counter install/restore mechanics —
without executing any kernel (CPU-safe)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402
import situation_recognition_tpu.ops.ggnn_pallas as gp  # noqa: E402
import situation_recognition_tpu.ops.vit_pallas as vp  # noqa: E402


def test_ggnn_kernel_flops_hand_count():
    # Small shape where the padding math is checkable by hand:
    # b=16, r=6 -> m=96; _pick_bm(96, 6, 256): unit=lcm(6,16)=48,
    # m > unit, cap = (min(576,96)//48)*48 = 96 -> bm in {48, 96},
    # padded totals equal (96) -> ties prefer larger -> bm=96, m_pad=96.
    b, r, d, steps = 16, 6, 256, 4
    bm = gp._pick_bm(b * r, r, d)
    assert bm == 96
    m_pad = 96
    # per step: adjacency (bm,bm)@(bm,d) per block + gate matmuls
    # (d,3d)+(d,2d)+(d,d) over every row = 12*m_pad*d^2
    expect = steps * (2 * m_pad * bm * d + 12 * m_pad * d * d)
    assert bench.ggnn_kernel_flops(b, r, d, steps) == float(expect)


def test_vit_stream_flops_hand_count():
    # b=4, n=257 -> n8=264, m=4*264=1056; the qkv/mlp matmuls run over
    # the stream rows rounded up to the bm=min(m,256)=256 tile ->
    # mp=1280 (ADVICE r2 #2); attention core stays on the n VALID rows
    b, n, d, hid, blocks = 4, 257, 128, 512, 2
    mp = 1280
    per_block = 8 * mp * d * d + 4 * mp * d * hid + 4 * b * n * n * d
    assert bench.vit_stream_flops(b, n, d, hid, blocks) == float(
        blocks * per_block)
    # exact at the flagship bench shape: b=256, n=257 -> m=256*264=67584
    # is already a multiple of 256, so the rounding is a no-op there
    m = 256 * 264
    assert m % 256 == 0
    flag = bench.vit_stream_flops(256, 257, 1024, 4096, 1)
    assert flag == float(8 * m * 1024 * 1024 + 4 * m * 1024 * 4096
                         + 4 * 256 * 257 * 257 * 1024)


def test_vit_block_flops_hand_count():
    # per-block kernel pads the FLAT stream (no n8 rounding):
    # b=4, n=257 -> m=1028, bm=256, mp=ceil(1028/256)*256=1280
    b, n, d, hid = 4, 257, 128, 512
    mp = 1280
    assert bench.vit_block_flops(b, n, d, hid) == float(
        8 * mp * d * d + 4 * mp * d * hid + 4 * b * n * n * d)


def test_vit_ft_attn_flops_remat_doubles_forward():
    b, n, d, blocks = 2, 50, 128, 3
    base = bench.vit_ft_attn_flops(b, n, d, blocks, remat=False)
    remat = bench.vit_ft_attn_flops(b, n, d, blocks, remat=True)
    # no-remat: fwd (4) + bwd (10); remat: 2*fwd (8) + bwd (10)
    assert np.isclose(base, blocks * 14.0 * b * n * n * d)
    assert np.isclose(remat, blocks * 18.0 * b * n * n * d)


def test_counters_accumulate_and_restore(monkeypatch):
    """The wrappers accumulate analytic FLOPs per traced call and
    restore() reinstates the original primals exactly."""
    calls = []

    def stub_ggnn(params, hidden, mask, num_steps, interpret):
        calls.append("g")
        return hidden

    def stub_stack(x, w_flat, **kw):
        calls.append("s")
        return x[:, 0, :]

    def stub_ft(x, w_flat, **kw):
        calls.append("f")
        return x[:, 0, :]

    def stub_block(x, *w, **kw):
        calls.append("b")
        return x

    monkeypatch.setattr(gp, "_propagate_fwd_impl", stub_ggnn)
    monkeypatch.setattr(vp, "_fused_stack_impl", stub_stack)
    monkeypatch.setattr(vp, "_fused_impl", stub_block)
    monkeypatch.setattr(vp, "_ft_cls_stack", stub_ft)

    total, restore = bench.install_pallas_flop_counters()
    try:
        assert total() == 0.0
        h = np.zeros((16, 6, 256), np.float32)
        gp._propagate_fwd_impl(None, h, None, 4, False)
        assert total() == bench.ggnn_kernel_flops(16, 6, 256, 4)

        d, hid = 128, 512
        x = np.zeros((4, 257, d), np.float32)
        w_flat = tuple(np.zeros((d, hid), np.float32) if i == 12
                       else np.zeros((d,), np.float32) for i in range(16))
        vp._fused_stack_impl(x, w_flat, heads=4)
        expect = (bench.ggnn_kernel_flops(16, 6, 256, 4)
                  + bench.vit_stream_flops(4, 257, d, hid, 1))
        assert total() == expect

        vp._ft_cls_stack(x, w_flat, remat=True)
        expect += bench.vit_ft_attn_flops(4, 257, d, 1, remat=True)
        assert total() == expect

        # per-block fallback path is counted too (ADVICE r2 #1)
        vp._fused_impl(x, *w_flat, heads=4)
        expect += bench.vit_block_flops(4, 257, d, hid)
        assert total() == expect
        assert calls == ["g", "s", "f", "b"]
    finally:
        restore()
    assert gp._propagate_fwd_impl is stub_ggnn
    assert vp._fused_stack_impl is stub_stack
    assert vp._fused_impl is stub_block
    assert vp._ft_cls_stack is stub_ft
