"""HBM-resident window cache (``--cache_device``): device-side batching.

New capability beyond the reference (which re-ships every batch from host
every epoch, ``/root/reference/sr.py:57-61`` ``.cuda()`` copies): the
whole window array lives in device memory and batches materialize as
on-device gathers.  These tests pin the contract:

* cached batches are BIT-IDENTICAL to the live host path — pixels, flip
  bits (the per-(seed, epoch, example) stream is replayed exactly),
  verbs, labels, order;
* a train epoch through the cache produces the losses of the live path;
* the deterministic-window gate rejects non-square TRAIN sources (the
  cache must never freeze the reference's random-crop augmentation).
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def square_setup(tmp_path_factory, overfitting_json):
    from tests.conftest import make_synth_images

    d = tmp_path_factory.mktemp("sq_imgs")
    names = list(overfitting_json.keys())
    make_synth_images(d, names)  # all 256x256 -> square gate passes
    enc = ImsituEncoder(overfitting_json, verbose=False)
    return str(d), overfitting_json, enc


def _epoch_batches(loader, epoch):
    loader.set_epoch(epoch)
    return list(loader)


@pytest.mark.parametrize("train", [True, False])
def test_cached_batches_bit_identical(square_setup, train):
    img_dir, ann, enc = square_setup
    live_ds = ImsituDataset(img_dir, ann, enc, train=train)
    cache_ds = ImsituDataset(img_dir, ann, enc, train=train)
    cache_ds.enable_window_cache()
    # the cache replays the PYTHON decoder's augmentation stream (same
    # rule as packed storage); the native C++ decoder draws from its own
    live = ImsituLoader(live_ds, batch_size=2, shuffle=train, seed=3,
                        decoder="python")
    cached = ImsituLoader(cache_ds, batch_size=2, shuffle=train, seed=3)
    for epoch in (0, 1):
        for lb, cb in zip(_epoch_batches(live, epoch),
                          _epoch_batches(cached, epoch)):
            assert lb["names"] == cb["names"]
            assert "images" not in cb
            gathered = cache_ds._window_cache[cb["indices"]]
            np.testing.assert_array_equal(lb["images"], gathered)
            np.testing.assert_array_equal(lb["flip"], cb["flip"])
            np.testing.assert_array_equal(lb["verbs"], cb["verbs"])
            np.testing.assert_array_equal(lb["labels"], cb["labels"])


def test_train_epoch_losses_match_live_path(square_setup):
    img_dir, ann, enc = square_setup
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01)

    def losses(ds):
        loader = ImsituLoader(ds, batch_size=8, shuffle=True, seed=0,
                              decoder="python")
        tr = Trainer(enc, cfg)
        _, _, out = tr.train_epoch(loader, epoch=0)
        return out

    live = losses(ImsituDataset(img_dir, ann, enc, train=True))
    ds = ImsituDataset(img_dir, ann, enc, train=True)
    ds.enable_window_cache()
    cached = losses(ds)
    np.testing.assert_allclose(cached, live, rtol=0, atol=0)


def test_evaluate_through_cache(square_setup):
    img_dir, ann, enc = square_setup
    ds = ImsituDataset(img_dir, ann, enc, train=False)
    ds.enable_window_cache()
    loader = ImsituLoader(ds, batch_size=8, shuffle=False)
    tr = Trainer(enc, TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                                    compute_dtype=jnp.float32))
    top1, top5, val_losses, _ = tr.evaluate(loader)
    assert np.isfinite(list(val_losses.values())).all()
    assert len(top1) == len(ds)


def test_hbm_cache_entries_die_with_their_dataset(square_setup):
    """The trainer's HBM cache memo must not pin host/device copies for
    its own lifetime: entries are weak-keyed by dataset (dropping the
    dataset frees both arrays) and re-enabling a dataset's cache
    REPLACES its device copy instead of uploading a second one."""
    import gc

    img_dir, ann, enc = square_setup
    tr = Trainer(enc, TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                                    compute_dtype=jnp.float32))
    ds = ImsituDataset(img_dir, ann, enc, train=False)
    ds.enable_window_cache()
    dev1 = tr._hbm_window_cache(ds)
    assert tr._hbm_window_cache(ds) is dev1          # memoized
    assert len(tr._hbm_caches) == 1

    ds.enable_window_cache()                          # new host array
    dev2 = tr._hbm_window_cache(ds)
    assert dev2 is not dev1
    assert len(tr._hbm_caches) == 1                   # replaced, not added

    del ds, dev1, dev2
    gc.collect()
    assert len(tr._hbm_caches) == 0                   # died with the dataset


def test_square_gate_rejects_nonsquare_train(tmp_path, overfitting_json):
    from tests.conftest import make_synth_images

    names = list(overfitting_json.keys())
    sizes = [(256, 256)] * len(names)
    sizes[2] = (256, 341)  # resized_256-style landscape image
    make_synth_images(tmp_path, names, sizes=sizes)
    enc = ImsituEncoder(overfitting_json, verbose=False)

    train_ds = ImsituDataset(str(tmp_path), overfitting_json, enc, train=True)
    with pytest.raises(ValueError, match="square"):
        train_ds.enable_window_cache()

    # the same shapes are FINE for eval: center windows are deterministic
    eval_ds = ImsituDataset(str(tmp_path), overfitting_json, enc, train=False)
    eval_ds.enable_window_cache()
    assert eval_ds._window_cache.shape[1:] == (256, 256, 3)


def test_hbm_cache_chunked_upload_matches_single_put(encoder, monkeypatch):
    """The chunked window-cache upload (r4: bounded transfers via donated
    dynamic_update_slice — one giant device_put wedged the TPU relay at
    11.8 GB) must produce a device array bit-identical to the direct
    single-put path."""
    import jax
    import numpy as np

    from situation_recognition_tpu.train import Trainer, TrainerConfig

    cfg = TrainerConfig(hidden=32, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32)
    trainer = Trainer(encoder, cfg)

    rng = np.random.default_rng(3)
    host = rng.integers(0, 255, (13, 8, 8, 3), dtype=np.uint8)

    class FakeDS:
        _window_cache = host

    # force the chunked path: 2 rows/chunk (8*8*3 = 192 B rows)
    monkeypatch.setenv("SRTPU_HBM_CHUNK_BYTES", "400")
    ds = FakeDS()
    dev = trainer._hbm_window_cache(ds)
    np.testing.assert_array_equal(np.asarray(dev), host)
    # memoized: same dataset + same host array -> same device array
    assert trainer._hbm_window_cache(ds) is dev


def test_partial_prefix_cache_eval_parity(square_setup):
    """VERDICT r4 #4: a partial-prefix window cache (rows [0, K) in HBM,
    the rest streamed as pixel batches) must produce IDENTICAL eval
    results to the uncached path, with index batches below the prefix
    and pixel batches at/after it."""
    img_dir, ann, enc = square_setup
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32)
    # 5 images, loader batch 2, prefix 2 -> batch 0 gathered, 1-2 pixels
    part = ImsituDataset(img_dir, ann, enc, train=False)
    part.enable_window_cache(max_rows=2)
    assert part.window_cache_rows == 2
    loader = ImsituLoader(part, batch_size=2, shuffle=False)
    kinds = [("indices" in b, "images" in b) for b in loader]
    assert kinds == [(True, False), (False, True), (False, True)]

    live = ImsituDataset(img_dir, ann, enc, train=False)
    tr_a = Trainer(enc, cfg)
    tr_b = Trainer(enc, cfg)
    top1_a, _, losses_a, _ = tr_a.evaluate(
        ImsituLoader(part, batch_size=2, shuffle=False))
    top1_b, _, losses_b, _ = tr_b.evaluate(
        ImsituLoader(live, batch_size=2, shuffle=False, decoder="python"))
    for k in losses_a:
        np.testing.assert_allclose(losses_a[k], losses_b[k], rtol=0, atol=0)
    assert (top1_a.get_average_results_both()
            == top1_b.get_average_results_both())
    assert len(top1_a) == len(part)
