"""Gradient accumulation (TrainerConfig.grad_accum / --grad_accum).

On BALANCED microbatches (equal row counts, identical per-annotation
non-ignored counts — here: every row carries the same verb/labels), the
mean-of-microbatch-gradients update is EXACTLY the big-batch update, so a
grad_accum=2 run at microbatch B/2 must track a grad_accum=1 run at batch
B parameter-for-parameter.  Dropout is off and the frozen backbone runs
eval-mode BN so batch composition cannot leak into the comparison through
masks or batch statistics (those divergences are documented, not bugs —
TrainerConfig.grad_accum docstring / DIVERGENCES #17 class).
"""



import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def balanced(overfitting_json, tmp_path_factory):
    """16 images, all annotated with the SAME situation (one verb, one
    label set) — every microbatch split has identical loss denominators."""
    from PIL import Image

    ann0 = overfitting_json
    item = next(iter(ann0.values()))
    ann = {f"img_{i}.jpg": item for i in range(16)}

    d = tmp_path_factory.mktemp("accum_imgs")
    rng = np.random.default_rng(11)
    for name in ann:
        Image.fromarray(rng.integers(0, 255, (256, 256, 3), dtype=np.uint8),
                        "RGB").save(str(d / name))
    # vocab from the full fixture (richer), data from the balanced set
    enc = ImsituEncoder(ann0, verbose=False)
    return enc, ann, str(d)


def _trainer(enc, batch, accum):
    cfg = TrainerConfig(hidden=64, batch_size=batch, backbone="mini",
                        compute_dtype=jnp.float32, seed=0,
                        dropout_rate=0.0, frozen_backbone_bn="eval",
                        grad_accum=accum)
    return Trainer(enc, cfg)


def _loader(enc, ann, img_dir, batch):
    ds = ImsituDataset(img_dir, ann, enc, train=True)
    return ImsituLoader(ds, batch_size=batch, shuffle=False,
                        num_workers=1, decoder="python")


def _flat(params):
    import jax

    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(params)])


def test_accum_matches_big_batch_on_balanced_data(balanced):
    enc, ann, img_dir = balanced
    big = _trainer(enc, 16, 1)
    acc = _trainer(enc, 8, 2)
    np.testing.assert_array_equal(_flat(big.head_params),
                                  _flat(acc.head_params))

    big_loader = _loader(enc, ann, img_dir, 16)
    acc_loader = _loader(enc, ann, img_dir, 8)
    for e in range(3):
        _, _, big_losses = big.train_epoch(big_loader, e)
        _, _, acc_losses = acc.train_epoch(acc_loader, e)
        # balanced rows -> the mean of the two microbatch losses equals
        # the big-batch loss
        np.testing.assert_allclose(acc_losses, big_losses,
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"epoch {e} losses")
        np.testing.assert_allclose(_flat(acc.head_params),
                                   _flat(big.head_params),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"epoch {e} params")


def test_accum_tail_group_still_steps(balanced):
    """2 microbatches with accum=4: the epoch ends mid-group (2 pending)
    and the tail gradients must still produce an optimizer step."""
    enc, ann, img_dir = balanced
    tr = _trainer(enc, 8, 4)
    # 16 images at micro 8 -> 2 microbatches/epoch; accum=4 means the
    # whole FIRST epoch is one partial group of 2
    loader = _loader(enc, ann, img_dir, 8)
    before = _flat(tr.head_params)
    tr.train_epoch(loader, 0)
    after = _flat(tr.head_params)
    assert not np.array_equal(before, after), \
        "tail group dropped: params unchanged after a mid-group epoch end"


def test_accum_is_additive_cli_surface():
    """grad_accum=1 keeps the fused single-call train step (no behavior
    change for every existing configuration)."""
    cfg = TrainerConfig()
    assert cfg.grad_accum == 1
