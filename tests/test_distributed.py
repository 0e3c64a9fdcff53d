"""Multi-process data-parallel training (parallel/distributed.py).

Two layers of evidence:

* fast: the sharded loader's local blocks reassemble BIT-IDENTICALLY into
  the unsharded loader's batches (pixels, flips, labels), including the
  wrap-padded final partial batch — single-process, no world needed.
* slow (the no-cluster story): a REAL 2-process world — two subprocesses,
  4 virtual CPU devices each, gloo collectives, one coordinator — runs
  lockstep training through Trainer.train_epoch/evaluate and must produce
  the same per-epoch losses and metrics as the single-process 8-device
  baseline computed in this test process.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def img_dir(encoder, overfitting_json, tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("dist_imgs")
    rng = np.random.default_rng(7)
    for name in overfitting_json:
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(str(d / name))
    return str(d)


def test_sharded_loader_reassembles_global_batches(
        encoder, overfitting_json, img_dir):
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    B = 4  # 5 examples -> one full batch + one wrapped partial (n=1)
    common = dict(batch_size=B, shuffle=True, seed=3, num_workers=1,
                  decoder="python")
    full = list(ImsituLoader(ds, **common))
    shard0 = list(ImsituLoader(ds, **common, shard=(0, 2)))
    shard1 = list(ImsituLoader(ds, **common, shard=(1, 2)))
    assert len(full) == len(shard0) == len(shard1) == 2

    for bi, (g, s0, s1) in enumerate(zip(full, shard0, shard1)):
        n = len(g["verbs"])
        assert s0["global_n"] == n and s1["global_n"] == n
        # reassemble the global batch; the unsharded loader yields the
        # partial batch UNpadded, so compare through the same wrap the
        # single-process trainer applies
        idx = np.arange(B) % n
        for k, gk in (("images", "images"), ("flip", "flip"),
                      ("verbs", "verbs"), ("labels", "labels")):
            want = np.asarray(g[gk])[idx]
            got = np.concatenate([np.asarray(s0[k]), np.asarray(s1[k])])
            np.testing.assert_array_equal(got, want, err_msg=f"batch{bi}:{k}")
        np.testing.assert_array_equal(s0["verbs_global"],
                                      np.asarray(g["verbs"])[idx])
        np.testing.assert_array_equal(s0["labels_global"],
                                      np.asarray(g["labels"])[idx])


def test_shard_validation(encoder, overfitting_json, img_dir):
    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    with pytest.raises(ValueError, match="divisible"):
        ImsituLoader(ds, batch_size=5, shuffle=False, shard=(0, 2))
    with pytest.raises(ValueError, match="rank"):
        ImsituLoader(ds, batch_size=4, shuffle=False, shard=(2, 2))


_WORKER = r"""
import json, os, sys
rank, world, img_dir, ann_path, out_path, coord = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], sys.argv[6])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from situation_recognition_tpu.parallel.distributed import (
    init_distributed, make_distributed_mesh)
init_distributed(coordinator_address=coord, num_processes=world,
                 process_id=rank)
assert jax.process_count() == world
assert jax.default_backend() == "cpu" and len(jax.devices()) == 4 * world

import numpy as np, jax.numpy as jnp
from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.train import Trainer, TrainerConfig
from situation_recognition_tpu.metrics.scorer import mean_of_eight

ann = json.load(open(ann_path))
enc = ImsituEncoder(ann)
shard = (rank, world)
tr_ds = ImsituDataset(img_dir, ann, enc, train=True)
tr_loader = ImsituLoader(tr_ds, batch_size=8, shuffle=True, seed=5,
                         num_workers=1, decoder="python", shard=shard)
ev_ds = ImsituDataset(img_dir, ann, enc, train=False)
ev_loader = ImsituLoader(ev_ds, batch_size=8, shuffle=False, seed=5,
                         num_workers=1, decoder="python", shard=shard)

cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                    compute_dtype=jnp.float32, seed=0)
trainer = Trainer(enc, cfg, mesh=make_distributed_mesh())
result = {"train_losses": [], "train_means": []}
for e in range(2):
    top1, top5, losses = trainer.train_epoch(tr_loader, e)
    result["train_losses"].append([float(x) for x in losses])
    result["train_means"].append(mean_of_eight(
        top1.get_average_results_both(), top5.get_average_results_both()))
t1, t5, val_losses, val_avg = trainer.evaluate(ev_loader,
                                               logging=(rank == 0))
if rank != 0:   # evaluate computes avg_score only under logging=True
    val_avg = mean_of_eight(t1.get_average_results_both(),
                            t5.get_average_results_both())
result["val_losses"] = [val_losses[k] for k in
                        ("verb_loss", "nouns_loss", "gt_loss")]
result["val_avg"] = val_avg
path = out_path if rank == 0 else out_path + ".r%d" % rank
with open(path, "w") as f:
    json.dump(result, f)
"""


@pytest.mark.slow
def test_two_process_world_matches_single_process(
        encoder, overfitting_json, img_dir, tmp_path):
    """The real multi-process path: 2 processes x 4 CPU devices, gloo
    collectives, sharded loaders — per-epoch train losses, train metric
    means, and dev eval must match the single-process 8-device baseline
    (identical global batches by construction)."""
    import jax.numpy as jnp

    from situation_recognition_tpu.metrics.scorer import mean_of_eight
    from situation_recognition_tpu.train import Trainer, TrainerConfig

    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as f:
        json.dump(overfitting_json, f)

    # ---- single-process baseline (this process: 8 virtual CPU devices)
    tr_ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    tr_loader = ImsituLoader(tr_ds, batch_size=8, shuffle=True, seed=5,
                             num_workers=1, decoder="python")
    ev_ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False)
    ev_loader = ImsituLoader(ev_ds, batch_size=8, shuffle=False, seed=5,
                             num_workers=1, decoder="python")
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, seed=0)
    trainer = Trainer(encoder, cfg)
    base = {"train_losses": [], "train_means": []}
    for e in range(2):
        top1, top5, losses = trainer.train_epoch(tr_loader, e)
        base["train_losses"].append([float(x) for x in losses])
        base["train_means"].append(mean_of_eight(
            top1.get_average_results_both(), top5.get_average_results_both()))
    t1, t5, val_losses, _ = trainer.evaluate(ev_loader)
    base["val_losses"] = [val_losses[k] for k in
                          ("verb_loss", "nouns_loss", "gt_loss")]
    # evaluate computes avg_score only under logging=True — derive it
    base["val_avg"] = mean_of_eight(t1.get_average_results_both(),
                                    t5.get_average_results_both())

    # ---- 2-process world
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", REPO))
    out_path = str(tmp_path / "result.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    coord = "127.0.0.1:19891"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(r), "2", img_dir, ann_path,
         out_path, coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for r in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for r, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{o[-4000:]}"
    with open(out_path) as f:
        dist = json.load(f)
    # both ranks computed identical results (replicated outputs + the
    # all-gathered scoring path)
    with open(out_path + ".r1") as f:
        dist_r1 = json.load(f)
    assert dist == dist_r1

    np.testing.assert_allclose(dist["train_losses"], base["train_losses"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dist["train_means"], base["train_means"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dist["val_losses"], base["val_losses"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dist["val_avg"], base["val_avg"],
                               rtol=1e-5, atol=1e-6)


_PREEMPT_WORKER = r"""
import json, os, sys, threading
rank, world, img_dir, ann_path, out_path, coord = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], sys.argv[6])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from situation_recognition_tpu.parallel.distributed import (
    init_distributed, make_distributed_mesh)
init_distributed(coordinator_address=coord, num_processes=world,
                 process_id=rank)

import numpy as np, jax.numpy as jnp
from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.train import Trainer, TrainerConfig, Preempted

ann = json.load(open(ann_path))
enc = ImsituEncoder(ann)
ds = ImsituDataset(img_dir, ann, enc, train=True)
# 25 examples, batch 8 (divisible by the 8-device world) -> 4 global
# batches: the stop must land at a step boundary BEFORE the epoch ends,
# on both ranks
loader = ImsituLoader(ds, batch_size=8, shuffle=True, seed=5,
                      num_workers=1, decoder="python",
                      shard=(rank, world))
cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                    compute_dtype=jnp.float32, seed=0)
trainer = Trainer(enc, cfg, mesh=make_distributed_mesh())

ev = threading.Event()
if rank == 1:
    ev.set()  # "SIGTERM" delivered to rank 1 ONLY
mids = []
result = {"raised": False}
try:
    trainer.train_epoch(
        loader, epoch=0,
        save_callback=(mids.append if rank == 0 else None),
        preempt=ev)
except Preempted as p:
    result = {"raised": True, "batch": p.batch_in_epoch, "saved": p.saved}
result["n_mids"] = len(mids)
with open(out_path + ".r%d" % rank, "w") as f:
    json.dump(result, f)
"""


@pytest.mark.slow
def test_preempt_agreement_across_processes(
        encoder, overfitting_json, img_dir, tmp_path):
    """SIGTERM lands on ONE rank of a 2-process world: `_preempt_agreed`'s
    per-boundary all-gather must stop BOTH ranks at the SAME optimizer-step
    boundary (without it, the un-signalled rank deadlocks in the next
    step's gradient all-reduce).  Rank 0 (with a save_callback) reports
    saved=True and exactly one snapshot; rank 1 reports saved=False."""
    # 5 fixture annotations x 5 name copies = 25 examples -> 4 global
    # batches of 8: enough steps that the stop is genuinely mid-epoch
    big = {f"c{i}_{name}": overfitting_json[name]
           for i in range(5) for name in overfitting_json}
    from PIL import Image
    rng = np.random.default_rng(11)
    big_dir = tmp_path / "imgs"
    big_dir.mkdir()
    for name in big:
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(str(big_dir / name))
    img_dir = str(big_dir)
    ann_path = str(tmp_path / "ann.json")
    with open(ann_path, "w") as f:
        json.dump(big, f)
    script = tmp_path / "worker.py"
    script.write_text(_PREEMPT_WORKER.replace("__REPO__", REPO))
    out_path = str(tmp_path / "result.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    coord = "127.0.0.1:19893"
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(r), "2", img_dir, ann_path,
         out_path, coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for r in range(2)]
    # the timeout IS the deadlock assertion: an unagreed stop hangs rank 0
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for r, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{o[-4000:]}"
    res = []
    for r in range(2):
        with open(out_path + ".r%d" % r) as f:
            res.append(json.load(f))
    assert res[0]["raised"] and res[1]["raised"]
    # same boundary on both ranks — the whole point of the agreement
    assert res[0]["batch"] == res[1]["batch"] == 1
    assert res[0]["saved"] is True and res[0]["n_mids"] == 1
    assert res[1]["saved"] is False and res[1]["n_mids"] == 0
