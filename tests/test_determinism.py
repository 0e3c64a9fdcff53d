"""Seeded end-to-end determinism (SURVEY §5b): two identical runs must
produce bit-identical parameters and losses."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.train import Trainer, TrainerConfig

# Integration tier: every test here shells out / runs full epochs;
# excluded from the fast unit tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from tests.conftest import make_synth_images

    d = tmp_path_factory.mktemp("imgs")
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "overfitting.json")
    with open(fixture) as f:
        names = list(json.load(f).keys())
    make_synth_images(d, names)
    return str(d)


def _run(encoder, img_dir, overfitting_json, decoder):
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, seed=42)
    tr = Trainer(encoder, cfg)
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    loader = ImsituLoader(ds, batch_size=8, shuffle=True, seed=42,
                          decoder=decoder)
    losses = []
    for e in range(2):
        _, _, l = tr.train_epoch(loader, epoch=e)
        losses.append(l)
    return losses, jax.device_get(tr.head_params)


@pytest.mark.parametrize("decoder", ["python", "native"])
def test_two_runs_identical(encoder, img_dir, overfitting_json, decoder):
    if decoder == "native":
        from situation_recognition_tpu.data import native_decoder

        if not native_decoder.available():
            pytest.skip("native decoder not buildable")
    l1, p1 = _run(encoder, img_dir, overfitting_json, decoder)
    l2, p2 = _run(encoder, img_dir, overfitting_json, decoder)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
