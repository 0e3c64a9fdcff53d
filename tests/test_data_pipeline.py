"""Data pipeline tests: transform parity vs a PIL clean-room reference,
loader determinism, and batch structure on synthetic JPEGs."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.data.transforms import (
    IMAGENET_MEAN, IMAGENET_STD, device_transform, eval_transform, host_window)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory, ):
    """Synthetic JPEGs named like the overfitting.json keys, mixed sizes."""
    d = tmp_path_factory.mktemp("imgs")
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "overfitting.json")
    with open(fixture) as f:
        names = list(json.load(f).keys())
    rng = np.random.default_rng(0)
    sizes = [(340, 256), (256, 420), (256, 256), (512, 256), (300, 380)]
    for name, (h, w) in zip(names, sizes):
        # smooth content (upsampled low-res noise): resample-phase differences
        # between crop→resize and resize→crop stay small, as for real photos
        low = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
        arr = np.asarray(
            Image.fromarray(low).resize((w, h), Image.BILINEAR), dtype=np.uint8)
        Image.fromarray(arr).save(d / name, quality=95)
    return str(d)


def pil_dev_transform(img: Image.Image) -> np.ndarray:
    """Clean-room torchvision dev transform: Resize(224) shorter side
    (antialiased bilinear) + CenterCrop(224) + ToTensor + Normalize."""
    w, h = img.size
    if w < h:
        nw, nh = 224, int(round(h * 224 / w))
    else:
        nh, nw = 224, int(round(w * 224 / h))
    img = img.resize((nw, nh), Image.BILINEAR)
    # torchvision CenterCrop rounds the half-offset (int(round(...))) —
    # NOT floor; the two differ for odd size deltas
    left, top = int(round((nw - 224) / 2)), int(round((nh - 224) / 2))
    img = img.crop((left, top, left + 224, top + 224))
    x = np.asarray(img).astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def test_eval_transform_close_to_pil(img_dir):
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "overfitting.json")
    with open(fixture) as f:
        names = list(json.load(f).keys())
    diffs = []
    for name in names:
        img = Image.open(os.path.join(img_dir, name)).convert("RGB")
        want = pil_dev_transform(img)
        window = host_window(np.asarray(img), train=False)
        got = np.asarray(eval_transform(window[None]))[0]
        diffs.append(np.abs(got - want))
    mean_diff = float(np.mean([d.mean() for d in diffs]))
    max_diff = float(np.max([d.max() for d in diffs]))
    # resample-order divergence (crop→resize vs resize→crop) stays small
    assert mean_diff < 0.05, mean_diff
    assert max_diff < 1.0, max_diff


def test_resize_matrix_matches_jax_image_resize():
    """The static separable-resize matrix must reproduce
    jax.image.resize(linear, antialias=True) exactly (same weights)."""
    import jax
    import jax.numpy as jnp

    from situation_recognition_tpu.data.transforms import _resize_matrix

    for src, dst in [(256, 224), (300, 224)]:
        m = _resize_matrix(src, dst)
        want = np.asarray(jax.image.resize(
            jnp.eye(src, dtype=jnp.float32), (src, dst),
            method="linear", antialias=True))
        np.testing.assert_allclose(m, want, rtol=1e-4, atol=1e-5)
        rng = np.random.default_rng(0)
        v = rng.random((4, src), np.float32)
        got = v @ m
        want_v = np.asarray(jax.image.resize(
            jnp.asarray(v), (4, dst), method="linear", antialias=True))
        np.testing.assert_allclose(got, want_v, rtol=1e-4, atol=1e-5)


def test_device_transform_shapes_and_range():
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, (3, 256, 256, 3), dtype=np.uint8)
    out = np.asarray(device_transform(u8, flip=np.array([True, False, True])))
    assert out.shape == (3, 224, 224, 3)
    # normalized range sanity: within (0-mean)/std .. (1-mean)/std
    lo = (0 - IMAGENET_MEAN.max()) / IMAGENET_STD.min() - 0.1
    hi = (1 - IMAGENET_MEAN.min()) / IMAGENET_STD.min() + 0.1
    assert out.min() > lo and out.max() < hi


def test_flip_is_horizontal():
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 255, (1, 256, 256, 3), dtype=np.uint8)
    a = np.asarray(device_transform(u8, flip=np.array([False])))
    b = np.asarray(device_transform(u8, flip=np.array([True])))
    np.testing.assert_allclose(a, b[:, :, ::-1, :], atol=1e-6)


def test_host_window_small_image_upscales():
    rng = np.random.default_rng(3)
    small = rng.integers(0, 255, (100, 150, 3), dtype=np.uint8)
    w = host_window(small, train=False)
    assert w.shape == (256, 256, 3)


def test_dataset_and_loader(img_dir, encoder, overfitting_json):
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    assert len(ds) == 5
    loader = ImsituLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 2+2+1, partial last batch kept
    assert batches[0]["images"].shape == (2, 256, 256, 3)
    assert batches[0]["images"].dtype == np.uint8
    assert batches[2]["images"].shape == (1, 256, 256, 3)
    assert batches[0]["labels"].shape == (2, 3, encoder.max_role_count)
    seen = [n for b in batches for n in b["names"]]
    assert sorted(seen) == sorted(ds.names)


def test_loader_deterministic_per_epoch(img_dir, encoder, overfitting_json):
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    l1 = ImsituLoader(ds, batch_size=2, shuffle=True, seed=7)
    l2 = ImsituLoader(ds, batch_size=2, shuffle=True, seed=7)
    b1, b2 = list(l1), list(l2)
    for x, y in zip(b1, b2):
        assert x["names"] == y["names"]
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["flip"], y["flip"])
    # a different epoch reshuffles and re-crops
    l1.set_epoch(1)
    b3 = list(l1)
    assert any(x["names"] != y["names"] for x, y in zip(b1, b3)) or any(
        not np.array_equal(x["images"], y["images"]) for x, y in zip(b1, b3))


def test_eval_loader_center_deterministic(img_dir, encoder, overfitting_json):
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False)
    loader = ImsituLoader(ds, batch_size=5, shuffle=False)
    a, b = list(loader)[0], list(loader)[0]
    np.testing.assert_array_equal(a["images"], b["images"])
    assert not a["flip"].any()
    assert a["names"] == ds.names


def test_loader_worker_count_invariance(img_dir, encoder, overfitting_json):
    """Batch contents must be identical regardless of worker threading
    (no data races in the fill workers)."""
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    ref = None
    for workers in (1, 2, 5):
        loader = ImsituLoader(ds, batch_size=5, shuffle=True, seed=11,
                              num_workers=workers, decoder="python")
        batches = list(loader)
        if ref is None:
            ref = batches
        else:
            for a, b in zip(ref, batches):
                assert a["names"] == b["names"]
                np.testing.assert_array_equal(a["images"], b["images"])
                np.testing.assert_array_equal(a["flip"], b["flip"])


def test_packed_dataset_identical_batches(img_dir, encoder, overfitting_json,
                                          tmp_path):
    """Packed-store batches must be bit-identical to live-decode batches
    (same seeds → same windows/flips), for train and eval."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "packed"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "pack_dataset.py"),
         img_dir, str(out)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout)["packed"] == 5

    for train in (True, False):
        live = ImsituDataset(img_dir, overfitting_json, encoder, train=train)
        packed = ImsituDataset(img_dir, overfitting_json, encoder,
                               train=train)
        packed.enable_packed(str(out))
        assert packed.packed and not live.packed
        l_loader = ImsituLoader(live, batch_size=3, shuffle=train, seed=4,
                                decoder="python")
        p_loader = ImsituLoader(packed, batch_size=3, shuffle=train, seed=4)
        assert p_loader.decoder == "python"
        for lb, pb in zip(l_loader, p_loader):
            assert lb["names"] == pb["names"]
            np.testing.assert_array_equal(lb["images"], pb["images"])
            np.testing.assert_array_equal(lb["flip"], pb["flip"])
            np.testing.assert_array_equal(lb["verbs"], pb["verbs"])


def test_packed_dataset_missing_image_rejected(img_dir, encoder,
                                               overfitting_json, tmp_path):
    import pytest

    out = tmp_path / "packed_empty"
    out.mkdir()
    (out / "index.json").write_text("{}")
    (out / "images.bin").write_bytes(b"")
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False)
    with pytest.raises(ValueError, match="missing"):
        ds.enable_packed(str(out))


# ---------------------------------------------------------- --preproc exact


def test_host_window_exact_geometry_hand_derived(img_dir):
    """host_window_exact must reproduce torchvision's literal geometry
    (Resize(224): long side int(224*long/short) TRUNCATED, skip when the
    short side already equals 224; CenterCrop: int(round(delta/2)) —
    banker's at .5).  Expected crops below are HAND-DERIVED from those
    formulas, not computed by the code under test."""
    from situation_recognition_tpu.data.transforms import host_window_exact

    rng = np.random.default_rng(5)
    # (h, w) -> (oh, ow, top, left) hand-derived:
    #  256x340: ow = int(224*340/256) = int(297.5) = 297 (truncation, not
    #           298), left = int(round(36.5)) = 36 (banker's), top = 0
    #  300x256: oh = int(224*300/256) = int(262.5) = 262, top = round(19)=19
    #  224x300: short side already 224 -> NO resize; left = round(38) = 38
    #  256x256: resize to 224x224, no crop
    cases = [
        ((256, 340), (224, 297, 0, 36)),
        ((300, 256), (262, 224, 19, 0)),
        ((224, 300), (224, 300, 0, 38)),
        ((256, 256), (224, 224, 0, 0)),
    ]
    for (h, w), (oh, ow, top, left) in cases:
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        got = host_window_exact(img)
        assert got.shape == (224, 224, 3)
        pil = Image.fromarray(img)
        if (h, w) != (oh, ow):
            pil = pil.resize((ow, oh), Image.BILINEAR)
        want = np.asarray(pil)[top:top + 224, left:left + 224]
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"geometry for {(h, w)}")
    # the no-resize case is a bit-identical slice of the ORIGINAL pixels
    img = rng.integers(0, 255, (224, 300, 3), dtype=np.uint8)
    np.testing.assert_array_equal(host_window_exact(img),
                                  img[:, 38:38 + 224])


def test_exact_window_device_resize_is_identity():
    """224→224 triangle-kernel resize matrix is exactly the identity, so
    the jitted step's device resize is a passthrough for exact windows;
    the normalize then matches torch's ToTensor+Normalize to float ulps."""
    import torch

    from situation_recognition_tpu.data.transforms import _resize_matrix

    np.testing.assert_array_equal(_resize_matrix(224, 224), np.eye(224))

    rng = np.random.default_rng(6)
    w = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    got = np.asarray(device_transform(w))
    want = (torch.from_numpy(w).float().div(255)
            - torch.tensor(IMAGENET_MEAN)) / torch.tensor(IMAGENET_STD)
    np.testing.assert_allclose(got, want.numpy(), rtol=0, atol=1e-6)


def test_dataset_exact_mode(img_dir, encoder, overfitting_json):
    from situation_recognition_tpu.data.transforms import host_window_exact

    with pytest.raises(ValueError, match="eval"):
        ImsituDataset(img_dir, overfitting_json, encoder, train=True,
                      preproc="exact")
    with pytest.raises(ValueError, match="preproc"):
        ImsituDataset(img_dir, overfitting_json, encoder, train=False,
                      preproc="nope")

    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False,
                       preproc="exact")
    loader = ImsituLoader(ds, batch_size=5, shuffle=False)
    assert loader.decoder == "python"  # native decoder emits 256² only
    (batch,) = list(loader)
    assert batch["images"].shape == (5, 224, 224, 3)
    for slot, name in enumerate(batch["names"]):
        img = np.asarray(Image.open(os.path.join(img_dir, name))
                         .convert("RGB"))
        np.testing.assert_array_equal(batch["images"][slot],
                                      host_window_exact(img))


def test_crop_sized_fast_path_bit_identical_to_matmul_path():
    """device_transform's 224-input fast path (skip the identity-matrix
    einsums) must be BIT-identical to the matmul formulation it replaces,
    including the folded flip."""
    import jax.numpy as jnp

    from situation_recognition_tpu.data.transforms import _resize_matrix

    rng = np.random.default_rng(7)
    w = rng.integers(0, 255, (4, 224, 224, 3), dtype=np.uint8)
    flip = np.array([True, False, True, False])
    got = np.asarray(device_transform(jnp.asarray(w), jnp.asarray(flip)))

    m = jnp.asarray(_resize_matrix(224, 224))
    x = jnp.asarray(w).astype(jnp.float32)
    y = jnp.einsum("bhwc,hH->bHwc", x, m,
                   preferred_element_type=jnp.float32)
    z = jnp.einsum("bHwc,wW->bHWc", y, m,
                   preferred_element_type=jnp.float32)
    zf = jnp.einsum("bHwc,wW->bHWc", y, m[:, ::-1],
                    preferred_element_type=jnp.float32)
    z = jnp.where(jnp.asarray(flip)[:, None, None, None], zf, z)
    z = (z * (1.0 / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_array_equal(got, np.asarray(z))


def test_latent_api_guards(img_dir, encoder, overfitting_json):
    """Fail-fast guards for API combinations with silent-wrong behavior:
    unseeded train crops (irreproducible), prefetch=0 (queue.Queue treats
    0 as UNBOUNDED — the whole epoch would materialize in host RAM), and
    packed+exact (double-resample breaks reference-exact parity)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 300, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="seeded"):
        host_window(img, train=True, rng=None)

    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False)
    with pytest.raises(ValueError, match="prefetch"):
        ImsituLoader(ds, batch_size=5, shuffle=False, prefetch=0)

    exact_ds = ImsituDataset(img_dir, overfitting_json, encoder,
                             train=False, preproc="exact")
    with pytest.raises(ValueError, match="packed"):
        exact_ds.enable_packed("/nonexistent")
