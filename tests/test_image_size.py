"""Flexible input resolution (``TrainerConfig.image_size`` / ``--image_size``).

The reference is 224-only (``/root/reference/utils/imsitu_encoder.py:21-36``
Resize(224)+Crop(224)); this framework serves any resolution from the same
host 256-windows: the device resize-as-matmul targets ``image_size`` (up- or
down-sampling), ViT pos-embeds are interpolated by the converters, and the
ResNet/GAP path is size-agnostic by construction.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.data.transforms import (
    IMAGENET_MEAN, IMAGENET_STD, device_transform)
from situation_recognition_tpu.train import Trainer, TrainerConfig
from situation_recognition_tpu.utils.torch_convert import (
    interpolate_pos_embed)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from tests.conftest import make_synth_images

    d = tmp_path_factory.mktemp("imgs_size")
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "overfitting.json")
    with open(fixture) as f:
        names = list(json.load(f).keys())
    make_synth_images(d, names)
    return str(d)


# --------------------------------------------------------- device resize


@pytest.mark.parametrize("crop", [112, 336])
def test_device_transform_crop_matches_jax_resize(crop):
    """crop != 224 goes through the same triangle-matrix matmuls; both the
    downsample (112) and the upsample (336, the CLIP @336 grid) must equal
    jax.image.resize('linear', antialias=True) + normalize exactly (f32)."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 256, 256, 3), dtype=np.uint8)
    got = np.asarray(device_transform(jnp.asarray(imgs), None,
                                      dtype=jnp.float32, crop=crop))
    ref = jax.image.resize(jnp.asarray(imgs, jnp.float32),
                           (2, crop, crop, 3), method="linear",
                           antialias=True)
    ref = (np.asarray(ref) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    assert got.shape == (2, crop, crop, 3)
    # the two-matmul form accumulates in a different order than
    # jax.image.resize's gather form; ~1e-5 in normalized units is ~1/500
    # of a uint8 LSB
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


def test_device_transform_flip_consistent_at_other_crop():
    """The folded-flip path (column-reversed resize weights) must equal
    transforming the pre-flipped pixels, at a non-default crop too."""
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (2, 256, 256, 3), dtype=np.uint8)
    flip = np.array([True, False])
    got = np.asarray(device_transform(jnp.asarray(imgs), jnp.asarray(flip),
                                      dtype=jnp.float32, crop=112))
    manual = np.asarray(device_transform(
        jnp.asarray(imgs[:, :, ::-1, :]), None, dtype=jnp.float32,
        crop=112))
    np.testing.assert_allclose(got[0], manual[0], rtol=0, atol=1e-4)
    unflipped = np.asarray(device_transform(jnp.asarray(imgs), None,
                                            dtype=jnp.float32, crop=112))
    np.testing.assert_allclose(got[1], unflipped[1], rtol=0, atol=1e-4)


# ------------------------------------------------- pos-embed interpolation


def test_interpolate_pos_embed_identity_is_bit_exact():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 17, 8)).astype(np.float32)   # 4x4 grid + CLS
    out = interpolate_pos_embed(pos, 17)
    assert out is pos or np.array_equal(out, pos)


def test_interpolate_pos_embed_resizes_grid_keeps_cls():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(1, 17, 8)).astype(np.float32)   # 4x4 grid + CLS
    out = interpolate_pos_embed(pos, 37)                    # -> 6x6 grid
    assert out.shape == (1, 37, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])     # CLS verbatim
    # the grid is the bicubic resize of the source grid
    ref = np.asarray(jax.image.resize(
        jnp.asarray(pos[0, 1:].reshape(4, 4, 8)), (6, 6, 8),
        method="cubic")).reshape(1, 36, 8)
    np.testing.assert_allclose(out[:, 1:], ref, rtol=0, atol=1e-6)


def test_interpolate_pos_embed_rejects_non_square():
    pos = np.zeros((1, 18, 8), np.float32)                 # 17 != g*g+1
    with pytest.raises(ValueError, match="square"):
        interpolate_pos_embed(pos, 37)


def test_convert_vit_at_other_image_size_round_trip():
    """export_vit_state of a flax ViT → convert_vit(image_size=other) must
    produce a tree the module accepts at that size, with pos_embed equal to
    the interpolation of the original and every other leaf unchanged."""
    from flax import serialization

    from situation_recognition_tpu.models.vit import ViT
    from situation_recognition_tpu.utils.torch_convert import convert_vit
    from situation_recognition_tpu.utils.torch_export import export_vit_state

    vit = ViT(patch=32, width=64, depth=2, heads=2)
    params = vit.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)), train=False)["params"]
    params = jax.tree.map(np.asarray, serialization.to_state_dict(params))
    sd = export_vit_state(params)

    got = convert_vit(sd, num_heads=2, image_size=96)       # 2x2 -> 3x3
    want_pos = interpolate_pos_embed(params["pos_embed"], 10)
    np.testing.assert_allclose(got["pos_embed"], want_pos, rtol=0,
                               atol=1e-6)
    # non-pos leaves survive the round trip exactly
    np.testing.assert_array_equal(got["cls_token"], params["cls_token"])
    np.testing.assert_array_equal(got["block0"]["mlp"]["fc1"]["kernel"],
                                  params["block0"]["mlp"]["fc1"]["kernel"])

    # the converted tree drives the module at the new size
    target = ViT(patch=32, width=64, depth=2, heads=2)
    t_params = target.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 96, 96, 3)), train=False)["params"]
    restored = serialization.from_state_dict(t_params, got)
    out = target.apply({"params": restored},
                       jnp.zeros((2, 96, 96, 3), jnp.float32), train=False)
    assert out.shape == (2, 64) and bool(jnp.isfinite(out).all())


# ----------------------------------------------------------- end to end


@pytest.mark.parametrize("backbone,size,hidden",
                         [("mini", 112, 64), ("vit_tiny", 64, 64)])
def test_trainer_trains_and_evals_at_other_resolutions(
        encoder, overfitting_json, img_dir, backbone, size, hidden):
    """One full train epoch + eval through the real stack at a non-224
    input size: finite losses, scorer cards produced, BN/pos-embed shapes
    consistent (the ViT case exercises a non-224 pos-embed grid)."""
    cfg = TrainerConfig(hidden=hidden, batch_size=8, backbone=backbone,
                        compute_dtype=jnp.float32, lr=0.01,
                        image_size=size)
    tr = Trainer(encoder, cfg)
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    loader = ImsituLoader(ds, batch_size=8, shuffle=True, seed=0)
    top1, _, losses = tr.train_epoch(loader, epoch=0)
    assert np.all(np.isfinite(losses))
    assert top1.get_average_results_both()

    dev = ImsituLoader(ImsituDataset(img_dir, overfitting_json, encoder,
                                     train=False), batch_size=8,
                       shuffle=False)
    _, _, val_losses, _ = tr.evaluate(dev)
    assert all(np.isfinite(v) for v in val_losses.values())


def test_trainer_rejects_indivisible_vit_image_size(encoder):
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(encoder, TrainerConfig(
            hidden=64, batch_size=8, backbone="vit_tiny",
            compute_dtype=jnp.float32, image_size=100))


@pytest.mark.slow
def test_serving_artifact_bakes_image_size(encoder, tmp_path):
    """An artifact exported from an image_size=112 trainer must record it
    in meta and serve 256-windows through the 112 input grid."""
    from situation_recognition_tpu.serving import (
        export_inference, load_inference)

    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, image_size=112)
    tr = Trainer(encoder, cfg)
    path = str(tmp_path / "artifact112")
    export_inference(tr, path, batch_size=2)
    fn = load_inference(path)
    assert fn.meta["image_size"] == 112
    imgs = np.zeros((2, 256, 256, 3), np.uint8)
    verb_logits, verb_ids, noun_logits = fn(imgs)
    assert np.asarray(verb_logits).shape == (2, encoder.get_num_verbs())
    assert np.isfinite(np.asarray(noun_logits)).all()
