"""Training / evaluation engine: one pjit-compiled step over an ICI mesh.

TPU-native replacement for the reference's train/eval loops
(``/root/reference/sr.py:15-232``).  Per-step work that the reference does on
the host or redundantly on device — PIL transforms, per-example adjacency
construction, 3 frozen-backbone passes, per-example Python scoring, AMP loss
scaling — becomes: one jitted function that takes uint8 image windows and
does device-side preprocessing, a single backbone pass (frozen; features
stop-gradiented), the stacked GGNN head forward, masked losses, optax
adamax + global-norm-1 clipping (reference Adamax lr 0.002 + clip,
sr.py:472-473,81), and on-device top-k extraction for the vectorized scorer.

Parity details:
* loss = verb_loss + nouns_loss; gt branch is logged but NOT backpropagated
  (sr.py:76 — deliberate reproduction).
* BN runs in batch-stats mode during training with running-stat updates
  (the reference's ``model.train()`` backbone behavior).
* Epoch metrics are means over per-batch scorer cards and per-batch mean
  losses, exactly as the reference accumulates them.
* Final partial batches are padded by wrapping epoch examples, with a
  validity mask excluding pad rows from losses and metrics.  (Divergence,
  documented: the reference computes the last batch's BN batch-stats over
  the true partial batch; we compute over the wrapped full batch.)
* bf16 compute (mixed precision) replaces CUDA AMP; no loss scaling is
  needed on TPU (documented divergence).
"""

from __future__ import annotations

import dataclasses
import os
import weakref
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.data.transforms import device_transform
from situation_recognition_tpu.metrics.scorer import ImsituScorer, mean_of_eight
from situation_recognition_tpu.models.fcggnn import (
    FCGGNNHead, nouns_loss_masked as _masked_nouns_loss,
    verb_loss_masked as _masked_verb_loss)
from situation_recognition_tpu.models.resnet import ResNet
from situation_recognition_tpu.models.vit import (
    VIT_WIDTHS, vit_b16, vit_l14, vit_l14_clip, vit_tiny)
from situation_recognition_tpu.parallel.distributed import fetch as _fetch
from situation_recognition_tpu.parallel.mesh import make_mesh
from situation_recognition_tpu.utils.logging import StepTimer, format_dict


class AsyncSaver:
    """Background checkpoint writer: one in-flight write at a time, each
    new save (or a join) waits for the previous to land.  The state
    handed to ``save`` must be host-side and immutable-by-convention —
    ``Trainer.model_state_dict`` returns fresh ``device_get`` copies and
    the fit loop passes copied history lists, so the training loop never
    mutates what the writer is serializing.  Write durability is the
    same as the sync path (``save_checkpoint``: fsync + atomic rename)."""

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, path: str, state: dict, background: bool = True,
             copy_to: str = None) -> None:
        """``copy_to``: also place the same checkpoint at a second path
        via a FILE COPY after the write lands (keep_best's use) — the
        r5 full-scale run measured the ~0.9 GB msgpack serialize as a
        GIL-heavy multi-second cost that visibly slowed the next epoch's
        step loop on this 1-core host; best-epochs used to pay it twice.

        ``state`` may contain DEVICE arrays (``model_state_snapshot``):
        the background path then moves BOTH expensive halves of a save
        off the training thread — the d2h fetch runs on the writer
        thread (socket-bound, GIL released) and the msgpack serialize
        runs in a FORKED child (COW memory, no GIL at all), so an epoch
        checkpoint costs the step loop nothing.  The synchronous path
        (preemption exits) fetches and writes inline."""
        from situation_recognition_tpu.utils.checkpoint import save_checkpoint

        self.join()

        def write():
            import jax

            host = jax.device_get(state)

            def write_inline():
                save_checkpoint(path, host)
                if copy_to:
                    import shutil

                    tmp = copy_to + ".tmp"
                    shutil.copyfile(path, tmp)
                    os.replace(tmp, copy_to)

            if (os.environ.get("SRTPU_CKPT_FORK", "1") == "1"
                    and hasattr(os, "fork")):
                import time as _t
                import warnings as _w

                with _w.catch_warnings():
                    # fork-in-threaded-process is deliberate and
                    # constrained: the child only runs msgpack + file
                    # IO over COW pages, never jax/the tunnel/locks
                    # other threads hold — and the watchdog below
                    # converts the residual malloc-arena-class hazard
                    # into a kill + in-thread fallback, not a hang
                    _w.simplefilter("ignore")
                    pid = os.fork()
                if pid == 0:
                    try:
                        write_inline()
                        os._exit(0)
                    except BaseException:
                        os._exit(13)
                deadline = _t.monotonic() + float(
                    os.environ.get("SRTPU_CKPT_FORK_TIMEOUT", "600"))
                while True:
                    done, status = os.waitpid(pid, os.WNOHANG)
                    if done:
                        break
                    if _t.monotonic() > deadline:
                        import signal as _sig
                        import sys as _sys

                        os.kill(pid, _sig.SIGKILL)
                        os.waitpid(pid, 0)
                        print("[srtpu] checkpoint writer child timed "
                              "out (fork hazard?) — writing in-thread",
                              file=_sys.stderr)
                        write_inline()
                        return
                    _t.sleep(0.05)
                if status != 0:
                    raise OSError(
                        f"checkpoint writer subprocess failed for {path} "
                        f"(exit status {status >> 8 or status})")
                return
            write_inline()

        if not background:
            write()
            return
        import threading

        def run():
            try:
                write()
            except BaseException as e:           # surfaced on next join
                self._error = e

        # non-daemon: a normal interpreter exit waits for the write
        self._thread = threading.Thread(target=run, name="srtpu-ckpt-writer")
        self._thread.start()

    def join(self) -> None:
        """Wait for the in-flight write; re-raise its failure (a silently
        dropped checkpoint would masquerade as durable progress)."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise e


class Preempted(Exception):
    """Raised out of the train loop on a preemption stop
    (``fit(handle_sigterm=True)``).  ``saved`` records whether THIS
    process wrote a resumable snapshot before raising (rank 0 in
    multi-process worlds; non-zero ranks and stops that land before any
    snapshot raise with ``saved=False``) so the exit message never
    claims a checkpoint that does not exist."""

    def __init__(self, epoch: int, batch_in_epoch: int,
                 saved: bool = False):
        super().__init__(f"preempted at epoch {epoch}, "
                         f"batch {batch_in_epoch}")
        self.epoch = epoch
        self.batch_in_epoch = batch_in_epoch
        self.saved = saved


def _preempt_agreed(preempt) -> bool:
    """Whether to stop at this optimizer-step boundary.

    Single-process: the local flag.  Multi-process DP: the MAX of every
    process's flag, agreed via a tiny all-gather — without agreement,
    ranks whose SIGTERM lands a moment apart stop at different step
    boundaries and the next step's gradient all-reduce deadlocks (the
    late rank waits forever on the stopped one).  Every process calls
    this at every boundary, so the collective is symmetric; its cost is
    one scalar gather per step, negligible next to the per-step top-k
    all-gather the multi-process scorer already does."""
    if preempt is None:
        return False
    flag = preempt.is_set()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return bool(np.asarray(multihost_utils.process_allgather(
            np.asarray(flag))).any())
    return flag


@dataclasses.dataclass
class TrainerConfig:
    hidden: int = 2048
    lr: float = 0.002
    batch_size: int = 6144
    epochs: int = 1000
    num_ggnn_steps: int = 4
    dropout_rate: float = 0.5            # reference hardcodes 0.5 (model.py:105-111)
    backbone: str = "resnet152"          # resnet18/34/50/101/152 | vit_* | mini
    # Model input resolution.  224 is the reference's (imsitu_encoder.py:
    # 21-36 Resize(224)+Crop(224)); other sizes (e.g. 336 for the CLIP
    # ViT-L/14@336 grid) reuse the same host 256-window + device
    # resize-as-matmul path, upsampling when image_size > WINDOW.  ViT
    # backbones need image_size % patch == 0 (validated); ResNets accept
    # any size ≥ 32 (global average pooling).  Converted 224-grid ViT
    # checkpoints are adapted via pos-embed interpolation
    # (utils/torch_convert.py image_size=...).
    image_size: int = 224
    compute_dtype: Any = jnp.bfloat16    # bf16 on TPU; tests use float32
    seed: int = 0
    model_axis: int = 1                  # >1 enables classifier TP
    ggnn_impl: str = "auto"              # auto | masked | pallas
    # "auto" resolves to the fused Pallas kernel on TPU (measured 1.09x the
    # masked-sum XLA path at the flagship shape — see ops/ggnn_pallas.py)
    # and to masked-sum everywhere else (CPU interpret mode is slow).
    ggnn_remat: bool = False             # remat GGNN steps (memory saver)
    # BN mode of the FROZEN backbone during train steps:
    #   "train": batch-stats + running-stat updates — reference parity
    #            (the reference's model.train() puts its frozen convnets in
    #            train-mode BN, sr.py:52 / model.py:17-18).
    #   "eval":  running stats only — measured 39% faster on v5e (train-mode
    #            BN forces two extra bandwidth-bound passes over every
    #            activation: the f32 stat reduction and the re-normalize);
    #            diverges from the reference's learning trajectory.
    # Running-stat divergence under "train" (DIVERGENCES #16): the shared
    # backbone keeps ONE stats tree updated once per step; the reference
    # keeps two (convnet_verbs 1 update/step via predict_verb,
    # convnet_nouns 2/step via both noun branches) — normalize math per
    # batch is identical, only the EMA trajectories (used at eval) differ.
    frozen_backbone_bn: str = "train"    # train (parity) | eval (fast)
    # Gradient accumulation: each optimizer step averages the gradients of
    # ``grad_accum`` consecutive microbatches of ``batch_size`` rows — the
    # way to run the reference's global-batch-6144 recipe when the
    # backbone's forward activations don't fit HBM at the full batch
    # (ViT-L/14 on few chips).  Semantics: the accumulated loss is the
    # MEAN of the microbatch losses — exactly the big-batch loss when the
    # microbatches are balanced (equal valid rows and equal per-annotation
    # non-ignored counts; tested), O(count-skew) different otherwise —
    # and train-mode BN computes per-MICRObatch statistics (the same
    # divergence class as DataParallel's per-replica stats, DIVERGENCES
    # #17; EMA updates run once per microbatch).
    grad_accum: int = 1
    # Backbone fine-tuning (ADDITIVE — the reference CANNOT do this: its
    # backbones are frozen at construction, /root/reference/model.py:17-18,
    # and its optimizer filters on requires_grad, sr.py:472-473, so the
    # resume-path "unfreeze fc" is a no-op on an Identity).  When True the
    # backbone params join the optimizer step: ONE global-norm-1 clip over
    # head+backbone gradients (what torch clip_grad_norm_ over all
    # optimizer params would do) and Adamax on both subtrees.  The gt noun
    # branch stays hoisted outside the grad closure (logged-only loss,
    # sr.py:76), so the fused GGNN kernel still engages there; the fused
    # ViT stream's custom-VJP routes differentiated calls to the ft
    # stream (ops/vit_pallas.py::_ft_cls_stack — jnp 2-D stream math +
    # flash-style Pallas attention fwd/bwd kernels; chip numbers in
    # PERF.md "fine-tuning").  Memory: backward-pass activations scale with
    # the microbatch — combine ``grad_accum`` (smaller microbatches) and
    # ``remat_backbone`` (block-boundary activations only) for flagship
    # widths.
    train_backbone: bool = False
    # Optional decoupled backbone learning rate (default: ``lr``).  Exact:
    # Adamax updates are linear in lr, so post-scaling the backbone
    # subtree's updates by backbone_lr/lr IS Adamax at backbone_lr.
    backbone_lr: Optional[float] = None
    # Rematerialize residual/encoder blocks on the backward pass
    # (models/resnet.py ResNet.remat, models/vit.py ViT.remat).  Only
    # applied when train_backbone is set (a frozen backbone stores no
    # backward activations to begin with).
    remat_backbone: bool = False
    # Learning-rate schedule over OPTIMIZER steps (ADDITIVE — the reference
    # trains at a constant 0.002 forever, sr.py:472).  "constant" is the
    # reference default; "cosine"/"linear" decay lr → min_lr over
    # ``total_steps`` optimizer steps.  ``warmup_steps`` > 0 first ramps
    # linearly lr/warmup → lr (composable with every schedule, the
    # standard fine-tuning recipe with ``train_backbone``).  The schedule
    # is driven by the adamax step counter, so it ticks once per OPTIMIZER
    # step (grad-accum groups count once) and resumes exactly from a
    # checkpoint (the counter rides in opt_state).  With ``backbone_lr``
    # the backbone follows the same schedule shape scaled by
    # backbone_lr/lr (the post-scale is schedule-invariant).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    # decay horizon in optimizer steps; required for cosine/linear
    # (epochs * ceil(len(train)/batch_size/grad_accum) for a full run)
    total_steps: Optional[int] = None
    min_lr: float = 0.0


_RESNETS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
    "mini": (1, 1, 1, 1),
}
# BasicBlock stacks (expansion 1 → feature dim base_width*8, i.e. 512)
_BASIC_RESNETS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
}
_VITS = {"vit_l14": vit_l14, "vit_l14_clip": vit_l14_clip,
         "vit_b16": vit_b16, "vit_tiny": vit_tiny}


def default_hidden(backbone: str) -> int:
    """The head/hidden width a backbone produces (single source of truth
    for the CLI and the bench tools)."""
    if backbone in VIT_WIDTHS:
        return VIT_WIDTHS[backbone]
    if backbone in _BASIC_RESNETS:
        return 512
    return 64 if backbone == "mini" else 2048


def resolve_ggnn_impl(impl: str, compute_dtype=jnp.bfloat16) -> str:
    """'auto' → the fused Pallas kernel on TPU **at bf16**, masked-sum XLA
    everywhere else.  The kernel computes bf16 internally (that IS its MXU
    fast path), so auto must not pick it for an fp32 run — the forward-only
    branches (eval, inference, the logged gt loss) would silently carry
    bf16-class error while the user asked for fp32.  An explicit 'pallas'
    passes through (documented bf16-internal semantics — how the
    engagement tests drive the kernel from fp32 configs); 'masked' passes
    through."""
    if impl == "auto":
        return ("pallas" if jax.default_backend() == "tpu"
                and compute_dtype == jnp.bfloat16 else "masked")
    return impl


def build_backbone(name: str, dtype, hidden: int, remat: bool = False):
    """name → (module, has_batchnorm).  The head hidden size must equal the
    backbone feature width (ResNet: base_width*32; ViT: its width) — the
    reference ties D_hidden_state to its backbone features the same way.
    ``remat``: per-block rematerialization for fine-tuning (param tree
    unchanged — nn.remat preserves module names)."""
    if name in _RESNETS:
        if hidden % 32 != 0:
            raise ValueError("hidden must be a multiple of 32 for ResNets")
        return ResNet(stage_sizes=_RESNETS[name], dtype=dtype,
                      base_width=hidden // 32, remat=remat), True
    if name in _BASIC_RESNETS:
        if hidden % 8 != 0:
            raise ValueError(
                "hidden must be a multiple of 8 for BasicBlock ResNets")
        return ResNet(stage_sizes=_BASIC_RESNETS[name], dtype=dtype,
                      base_width=hidden // 8, basic=True, remat=remat), True
    if name in _VITS:
        if hidden != VIT_WIDTHS[name]:
            raise ValueError(
                f"{name} produces {VIT_WIDTHS[name]}-d features; "
                f"set hidden={VIT_WIDTHS[name]} (got {hidden})")
        module = _VITS[name](dtype=dtype)
        if remat:
            module = module.clone(remat=True)
        return module, False
    raise ValueError(f"unknown backbone {name!r}")


def _scale_subtree(key: str, ratio: float) -> "optax.GradientTransformation":
    """Post-scale the updates of one top-level subtree of the param dict.

    Placed AFTER adamax in the chain this is exactly Adamax at
    ``lr * ratio`` for that subtree (the final update is linear in lr),
    without the masked/multi-transform state machinery — mu/nu keep the
    plain combined-tree structure the checkpoint placement rule expects."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = dict(updates)
        updates[key] = jax.tree.map(lambda u: u * ratio, updates[key])
        return updates, state

    return optax.GradientTransformation(init, update)


def make_lr_fn(config: TrainerConfig):
    """Optimizer-step → learning-rate schedule, or ``None`` for the
    reference-constant path (``lr_schedule='constant'``, no warmup).

    ``None`` keeps ``optax.adamax(lr)`` — the optimizer-state tree stays
    byte-identical to every pre-schedule checkpoint and the golden
    transcripts.  Otherwise the returned callable feeds
    ``optax.adamax(learning_rate=fn)`` (a ``scale_by_schedule`` driven by
    the optimizer-step counter, which rides in opt_state and therefore
    resumes exactly).  Shapes:

    - warmup (any schedule): step c < warmup runs at ``lr*(c+1)/warmup``
      — the FIRST step already moves (lr/warmup, not 0) and step
      ``warmup`` lands exactly at ``lr``.
    - cosine: ``min_lr + (lr-min_lr) * 0.5*(1+cos(pi*t))`` with
      ``t = (c-warmup)/(total_steps-warmup)`` clamped to [0, 1] (steps
      past the horizon hold at ``min_lr``).
    - linear: same ``t``, factor ``1-t``.
    """
    sched, lr = config.lr_schedule, float(config.lr)
    if sched not in ("constant", "cosine", "linear"):
        raise ValueError(
            f"lr_schedule must be constant|cosine|linear, got {sched!r}")
    warm = int(config.warmup_steps)
    if warm < 0:
        raise ValueError(f"warmup_steps must be >= 0, got {warm}")
    lo = float(config.min_lr)
    if lo < 0 or lo > lr:
        raise ValueError(f"min_lr must be in [0, lr={lr}], got {lo}")
    if sched == "constant":
        if config.total_steps is not None:
            raise ValueError(
                "total_steps is the cosine/linear decay horizon; it has "
                "no meaning with lr_schedule='constant'")
        if warm == 0:
            return None
        horizon = 1  # unused
    else:
        if config.total_steps is None:
            raise ValueError(
                f"lr_schedule={sched!r} needs total_steps (the decay "
                "horizon in optimizer steps)")
        horizon = int(config.total_steps) - warm
        if horizon <= 0:
            raise ValueError(
                f"total_steps ({config.total_steps}) must exceed "
                f"warmup_steps ({warm})")

    def fn(count):
        c = jnp.asarray(count, jnp.float32)
        if sched == "constant":
            val = jnp.float32(lr)
        else:
            t = jnp.clip((c - warm) / horizon, 0.0, 1.0)
            frac = (0.5 * (1.0 + jnp.cos(jnp.pi * t)) if sched == "cosine"
                    else 1.0 - t)
            val = lo + (lr - lo) * frac
        if warm:
            val = jnp.where(c < warm, lr * (c + 1.0) / warm, val)
        return val

    return fn


class Trainer:
    """Owns models, optimizer, mesh, and the compiled train/eval steps."""

    def __init__(self, encoder: ImsituEncoder, config: TrainerConfig,
                 mesh=None, backbone_variables: Optional[dict] = None,
                 head_params: Optional[dict] = None):
        self.encoder = encoder
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(model=config.model_axis)
        ndata = self.mesh.shape["data"]
        if config.batch_size % ndata != 0:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible by data axis {ndata}")

        dt = config.compute_dtype
        self._ft = bool(config.train_backbone)
        self.backbone, self._backbone_has_bn = build_backbone(
            config.backbone, dt, config.hidden,
            remat=config.remat_backbone and self._ft)
        patch = getattr(self.backbone, "patch", None)
        if patch is not None and config.image_size % patch != 0:
            # a VALID-padded patch conv would silently floor the grid,
            # leaving pos_embed sized for tokens the converter never saw
            raise ValueError(
                f"image_size {config.image_size} not divisible by "
                f"{config.backbone}'s patch {patch}")
        if config.image_size < 32:
            raise ValueError(
                f"image_size must be >= 32, got {config.image_size}")
        self.head = FCGGNNHead(
            num_verbs=encoder.get_num_verbs(),
            num_roles=encoder.get_num_roles(),
            num_labels=encoder.get_num_labels(),
            max_role_count=encoder.max_role_count,
            hidden=config.hidden,
            num_steps=config.num_ggnn_steps,
            dropout_rate=config.dropout_rate,
            dtype=dt,
            ggnn_impl=resolve_ggnn_impl(config.ggnn_impl, dt),
            ggnn_remat=config.ggnn_remat,
        )
        self.role_ids = jnp.asarray(encoder.role_ids)
        self.role_mask = jnp.asarray(encoder.role_mask)

        key = jax.random.PRNGKey(config.seed)
        bkey, hkey, self._dropout_base = jax.random.split(key, 3)
        img_stub = jnp.zeros(
            (1, config.image_size, config.image_size, 3), jnp.float32)
        if backbone_variables is None:
            backbone_variables = self.backbone.init(bkey, img_stub, train=False)
        self.backbone_params = backbone_variables["params"]
        self.backbone_stats = backbone_variables.get("batch_stats", {})
        if head_params is None:
            feat_stub = jnp.zeros((1, config.hidden), jnp.float32)
            head_params = self.head.init(
                hkey, feat_stub, jnp.zeros((1,), jnp.int32),
                self.role_ids, self.role_mask)["params"]
        self.head_params = head_params

        # reference: Adamax(lr=0.002) over trainable params with
        # clip_grad_norm_(1.0) applied before the step (sr.py:472,81).
        # A schedule (warmup/cosine/linear — additive) swaps the constant
        # lr for a counter-driven one; None keeps the reference-exact
        # optimizer tree (see make_lr_fn)
        self._lr_fn = make_lr_fn(config)
        txs = [optax.clip_by_global_norm(1.0),
               optax.adamax(self._lr_fn if self._lr_fn is not None
                            else config.lr)]
        if self._ft and config.backbone_lr is not None \
                and config.backbone_lr != config.lr:
            if config.lr == 0:
                raise ValueError(
                    "backbone_lr needs lr != 0 (the backbone rate is "
                    "implemented as an exact post-scale of adamax(lr))")
            txs.append(_scale_subtree(
                "backbone", config.backbone_lr / config.lr))
        self.tx = optax.chain(*txs)
        self.step_count = 0

        self._repl = NamedSharding(self.mesh, P())
        self._bsh = NamedSharding(self.mesh, P("data"))
        #: HBM-resident window caches (enable_window_cache datasets) and
        #: the on-device batch gather that replaces per-batch pixel
        #: transfers.  Weak-keyed by dataset with a weak host ref inside,
        #: so neither the multi-GB host array nor its HBM replica outlives
        #: its dataset, and re-enabling a cache replaces (not duplicates)
        #: the device copy.
        self._hbm_caches = weakref.WeakKeyDictionary()
        #: all-rows-valid mask for full batches (_pad_batch fast path)
        self._full_valid = np.ones((self.config.batch_size,), np.float32)
        self._cache_gather = jax.jit(lambda cache, rows: cache[rows],
                                     out_shardings=self._bsh)

        # placement: batch over 'data'; classifier kernels over 'model'
        # (head_param_sharding); everything else replicated.
        from situation_recognition_tpu.parallel.mesh import head_param_sharding

        self._head_sh = head_param_sharding(self.mesh, self.head_params)
        self.head_params = jax.device_put(self.head_params, self._head_sh)
        self.backbone_params = jax.device_put(self.backbone_params, self._repl)
        self.backbone_stats = jax.device_put(self.backbone_stats, self._repl)
        # adamax mu/nu mirror the TRAINABLE tree: head-only when the
        # backbone is frozen (the reference's only mode), head+backbone
        # (backbone replicated) under train_backbone
        self._opt_sh = ({"head": self._head_sh, "backbone": self._repl}
                        if self._ft else self._head_sh)
        self.opt_state = self._place_opt_state(
            jax.jit(self.tx.init)(self._trainable()))
        self._build_steps()

    def _trainable(self) -> Any:
        """The optimizer's param tree: head-only (reference semantics) or
        the combined {'head', 'backbone'} dict under train_backbone."""
        if self._ft:
            return {"head": self.head_params,
                    "backbone": self.backbone_params}
        return self.head_params

    def current_lr(self) -> float:
        """The learning rate the NEXT optimizer step will use: ``lr``
        on the reference-constant path, else the schedule evaluated at
        the optimizer-step counter (from opt_state, so it is exact
        across resumes and grad-accum groups)."""
        if self._lr_fn is None:
            return float(self.config.lr)
        counts = [n.count for n in jax.tree.leaves(
            self.opt_state, is_leaf=lambda n: hasattr(n, "mu"))
            if hasattr(n, "mu")]
        step = int(jax.device_get(counts[0])) if counts else 0
        return float(self._lr_fn(step))

    def _place_opt_state(self, state):
        """Commit an optimizer-state tree to the mesh: adamax mu/nu mirror
        the head-param shardings (they share the param treedef), every
        other leaf replicated.  One placement rule for BOTH the fresh init
        and checkpoint restore — plain ``jit(tx.init)`` leaves its outputs
        on a single device and ``from_state_dict`` leaves host numpy, so
        without this the first resumed train step would compile against a
        different placement than steady state (an extra full ~20-40s
        compile + a donation mismatch)."""
        def place(node):
            if hasattr(node, "mu") and hasattr(node, "nu"):
                return node._replace(
                    count=jax.device_put(jnp.asarray(node.count),
                                         self._repl),
                    mu=jax.device_put(node.mu, self._opt_sh),
                    nu=jax.device_put(node.nu, self._opt_sh))
            # any other node reaching here is a plain array leaf (the
            # is_leaf below only groups adamax states)
            return jax.device_put(jnp.asarray(node), self._repl)

        return jax.tree.map(place, state,
                            is_leaf=lambda n: hasattr(n, "mu"))

    # ------------------------------------------------------------- stepping

    def _features(self, backbone_params, backbone_stats, images, flip,
                  train, stop_grad: bool = True):
        """Device transform + backbone → (feats f32, new BN stats).

        Frozen mode (``stop_grad=True``, the reference's only mode): runs
        OUTSIDE any grad closure in the train step — the backbone is
        frozen (features stop-gradiented) and the BN-stat update needs no
        gradient, so hoisting costs nothing and lets the forward-only head
        branches (gt nouns) keep their fused-kernel primal.
        Fine-tuning (``stop_grad=False``, train_backbone): called INSIDE
        the grad closure so gradients flow into the backbone params."""
        x = device_transform(images, flip if train else None,
                             dtype=self.config.compute_dtype,
                             crop=self.config.image_size)
        # frozen_backbone_bn is strictly a BN-mode knob: non-BN backbones
        # keep their true train flag so any future train-dependent backbone
        # op (dropout, stochastic depth) is unaffected by it
        bb_train = train and (not self._backbone_has_bn
                              or self.config.frozen_backbone_bn != "eval")
        if not self._backbone_has_bn:
            feats = self.backbone.apply(
                {"params": backbone_params}, x, train=bb_train)
            new_stats = backbone_stats
        elif bb_train:
            feats, updates = self.backbone.apply(
                {"params": backbone_params, "batch_stats": backbone_stats},
                x, train=True, mutable=["batch_stats"])
            new_stats = updates["batch_stats"]
        else:
            feats = self.backbone.apply(
                {"params": backbone_params, "batch_stats": backbone_stats},
                x, train=False)
            new_stats = backbone_stats
        feats = feats.astype(jnp.float32)
        if stop_grad:
            feats = jax.lax.stop_gradient(feats)
        return feats, new_stats

    def _forward(self, head_params, backbone_params, backbone_stats,
                 images, flip, verbs, train, dropout_key):
        feats, new_stats = self._features(
            backbone_params, backbone_stats, images, flip, train)
        outs = self.head.apply(
            {"params": head_params}, feats, verbs,
            self.role_ids, self.role_mask, train=train,
            rngs={"dropout": dropout_key} if train else None)
        return outs, new_stats

    def _losses(self, outs, verbs, labels, valid):
        pred_verb, pred_nouns, gt_pred_nouns = outs
        L = self.encoder.get_num_labels()
        vloss = _masked_verb_loss(pred_verb, verbs, valid)
        nloss = _masked_nouns_loss(pred_nouns, labels, L, valid)
        gloss = _masked_nouns_loss(gt_pred_nouns, labels, L, valid)
        return vloss, nloss, gloss

    @staticmethod
    def _topk(outs):
        # iterative argmax+mask instead of lax.top_k: identical indices
        # (lowest-index tie order) but ~19x faster on TPU for k=5 over
        # 504/2001 classes (71.8ms -> 3.8ms per step at B=768, v5e —
        # lax.top_k lowers to a full sort)
        def topk5(x):
            idxs = []
            for _ in range(5):
                i = jnp.argmax(x, axis=-1)
                idxs.append(i)
                x = jnp.where(jax.nn.one_hot(i, x.shape[-1], dtype=bool),
                              -jnp.inf, x)
            return jnp.stack(idxs, axis=-1)

        pred_verb, pred_nouns, gt_pred_nouns = outs
        gt1 = jnp.argmax(gt_pred_nouns, axis=-1)[..., None]
        return topk5(pred_verb), topk5(pred_nouns), gt1

    def _build_steps(self):
        tx = self.tx

        L = self.encoder.get_num_labels()

        def train_step(head_params, opt_state, backbone_params,
                       backbone_stats, dropout_key, images, flip, verbs,
                       labels, valid):
            # frozen backbone + BN-stat update hoisted out of the grad
            # closure (nothing in it needs a gradient)
            feats, new_stats = self._features(
                backbone_params, backbone_stats, images, flip, True)

            def loss_fn(hp):
                pred_verb, pred_nouns = self.head.apply(
                    {"params": hp}, feats, self.role_ids, self.role_mask,
                    train=True, rngs={"dropout": dropout_key},
                    method=self.head.predict_train)
                vloss = _masked_verb_loss(pred_verb, verbs, valid)
                nloss = _masked_nouns_loss(pred_nouns, labels, L, valid)
                # backprop loss = verb + pred-nouns only (sr.py:76)
                return vloss + nloss, (pred_verb, pred_nouns, vloss, nloss)

            grads, (pred_verb, pred_nouns, vloss, nloss) = jax.grad(
                loss_fn, has_aux=True)(head_params)
            # gt noun branch OUTSIDE the grad closure: its loss is logged,
            # never backpropagated (sr.py:76) — structurally no backward,
            # and (being undifferentiated) it runs the fused GGNN kernel
            # instead of the custom_vjp's masked fwd rule
            gt_pred_nouns = self.head.apply(
                {"params": head_params}, feats, verbs,
                self.role_ids, self.role_mask, train=True,
                rngs={"dropout": jax.random.fold_in(dropout_key, 1)},
                method=self.head.predict_nouns)
            gloss = _masked_nouns_loss(gt_pred_nouns, labels, L, valid)
            updates, opt_state = tx.update(grads, opt_state, head_params)
            head_params = optax.apply_updates(head_params, updates)
            outs = (pred_verb, pred_nouns, gt_pred_nouns)
            return (head_params, opt_state, new_stats,
                    (vloss, nloss, gloss), self._topk(outs))

        def eval_step(head_params, backbone_params, backbone_stats,
                      images, verbs, labels, valid):
            outs, _ = self._forward(
                head_params, backbone_params, backbone_stats, images, None,
                verbs, False, None)
            return self._losses(outs, verbs, labels, valid), self._topk(outs)

        def grad_accum_step(head_params, acc, backbone_params,
                            backbone_stats, dropout_key, images, flip,
                            verbs, labels, valid):
            # one microbatch: same math as train_step up to (and NOT
            # including) the optimizer update; gradients accumulate into
            # ``acc`` (donated), the update runs in apply_accum_step
            feats, new_stats = self._features(
                backbone_params, backbone_stats, images, flip, True)

            def loss_fn(hp):
                pred_verb, pred_nouns = self.head.apply(
                    {"params": hp}, feats, self.role_ids, self.role_mask,
                    train=True, rngs={"dropout": dropout_key},
                    method=self.head.predict_train)
                vloss = _masked_verb_loss(pred_verb, verbs, valid)
                nloss = _masked_nouns_loss(pred_nouns, labels, L, valid)
                return vloss + nloss, (pred_verb, pred_nouns, vloss, nloss)

            grads, (pred_verb, pred_nouns, vloss, nloss) = jax.grad(
                loss_fn, has_aux=True)(head_params)
            gt_pred_nouns = self.head.apply(
                {"params": head_params}, feats, verbs,
                self.role_ids, self.role_mask, train=True,
                rngs={"dropout": jax.random.fold_in(dropout_key, 1)},
                method=self.head.predict_nouns)
            gloss = _masked_nouns_loss(gt_pred_nouns, labels, L, valid)
            acc = jax.tree.map(jnp.add, acc, grads)
            outs = (pred_verb, pred_nouns, gt_pred_nouns)
            return (acc, new_stats, (vloss, nloss, gloss),
                    self._topk(outs))

        accum_n = max(1, int(self.config.grad_accum))

        def grad_accum_final_step(head_params, opt_state, acc,
                                  backbone_params, backbone_stats,
                                  dropout_key, images, flip, verbs,
                                  labels, valid):
            # the accum group's LAST microbatch fused with the optimizer
            # apply in ONE program: grads + accumulate + mean + clip +
            # adamax + a ZEROED accumulator for the next group.  The
            # separate apply/zero dispatches used to drain the dispatch
            # pipeline at every group boundary (r5 step trace: ~195 ms
            # steady laps punctuated by a ~1.5 s stall across each
            # boundary — 3 slow dispatches + the count scalar's host
            # round trip); fusing removes all of it.  Math is identical
            # to grad_accum_step + apply_accum_step at count=accum_n.
            feats, new_stats = self._features(
                backbone_params, backbone_stats, images, flip, True)

            def loss_fn(hp):
                pred_verb, pred_nouns = self.head.apply(
                    {"params": hp}, feats, self.role_ids, self.role_mask,
                    train=True, rngs={"dropout": dropout_key},
                    method=self.head.predict_train)
                vloss = _masked_verb_loss(pred_verb, verbs, valid)
                nloss = _masked_nouns_loss(pred_nouns, labels, L, valid)
                return vloss + nloss, (pred_verb, pred_nouns, vloss, nloss)

            grads, (pred_verb, pred_nouns, vloss, nloss) = jax.grad(
                loss_fn, has_aux=True)(head_params)
            gt_pred_nouns = self.head.apply(
                {"params": head_params}, feats, verbs,
                self.role_ids, self.role_mask, train=True,
                rngs={"dropout": jax.random.fold_in(dropout_key, 1)},
                method=self.head.predict_nouns)
            gloss = _masked_nouns_loss(gt_pred_nouns, labels, L, valid)
            total = jax.tree.map(jnp.add, acc, grads)
            mean = jax.tree.map(lambda g: g / jnp.float32(accum_n), total)
            updates, opt_state = tx.update(mean, opt_state, head_params)
            head_params = optax.apply_updates(head_params, updates)
            zero = jax.tree.map(jnp.zeros_like, total)
            outs = (pred_verb, pred_nouns, gt_pred_nouns)
            return (head_params, opt_state, zero, new_stats,
                    (vloss, nloss, gloss), self._topk(outs))

        def grad_accum_final_step_ft(tp, opt_state, acc, backbone_stats,
                                     dropout_key, images, flip, verbs,
                                     labels, valid):
            grads, new_stats, losses, outs = _ft_loss_and_grads(
                tp, backbone_stats, dropout_key, images, flip, verbs,
                labels, valid)
            total = jax.tree.map(jnp.add, acc, grads)
            mean = jax.tree.map(lambda g: g / jnp.float32(accum_n), total)
            updates, opt_state = tx.update(mean, opt_state, tp)
            tp = optax.apply_updates(tp, updates)
            zero = jax.tree.map(jnp.zeros_like, total)
            return (tp, opt_state, zero, new_stats, losses,
                    self._topk(outs))

        def apply_accum_step(head_params, opt_state, acc, count):
            # mean of the microbatch gradients; clip-then-adamax on the
            # mean exactly as the fused train_step does on its one batch.
            # (generic over the trainable tree: head-only or the combined
            # {'head','backbone'} dict under train_backbone)
            mean = jax.tree.map(lambda g: g / count, acc)
            updates, opt_state = tx.update(mean, opt_state, head_params)
            return optax.apply_updates(head_params, updates), opt_state

        def _ft_loss_and_grads(tp, backbone_stats, dropout_key, images,
                               flip, verbs, labels, valid):
            # fine-tuning core (train_backbone): the backbone forward
            # lives INSIDE the grad closure — features are NOT
            # stop-gradiented, so jax.grad reaches the backbone params
            # (and BN gamma/beta; the batch-stat EMA update rides along
            # as aux).  The gt noun branch still runs OUTSIDE on the
            # aux-returned features (its loss is logged, never
            # backpropagated — sr.py:76), so the fused GGNN kernel
            # engages there exactly as in the frozen step.
            def loss_fn(tp):
                feats, new_stats = self._features(
                    tp["backbone"], backbone_stats, images, flip, True,
                    stop_grad=False)
                pred_verb, pred_nouns = self.head.apply(
                    {"params": tp["head"]}, feats, self.role_ids,
                    self.role_mask, train=True,
                    rngs={"dropout": dropout_key},
                    method=self.head.predict_train)
                vloss = _masked_verb_loss(pred_verb, verbs, valid)
                nloss = _masked_nouns_loss(pred_nouns, labels, L, valid)
                return vloss + nloss, (feats, new_stats, pred_verb,
                                       pred_nouns, vloss, nloss)

            grads, (feats, new_stats, pred_verb, pred_nouns, vloss,
                    nloss) = jax.grad(loss_fn, has_aux=True)(tp)
            gt_pred_nouns = self.head.apply(
                {"params": tp["head"]}, jax.lax.stop_gradient(feats),
                verbs, self.role_ids, self.role_mask, train=True,
                rngs={"dropout": jax.random.fold_in(dropout_key, 1)},
                method=self.head.predict_nouns)
            gloss = _masked_nouns_loss(gt_pred_nouns, labels, L, valid)
            outs = (pred_verb, pred_nouns, gt_pred_nouns)
            return grads, new_stats, (vloss, nloss, gloss), outs

        def train_step_ft(tp, opt_state, backbone_stats, dropout_key,
                          images, flip, verbs, labels, valid):
            grads, new_stats, losses, outs = _ft_loss_and_grads(
                tp, backbone_stats, dropout_key, images, flip, verbs,
                labels, valid)
            updates, opt_state = tx.update(grads, opt_state, tp)
            tp = optax.apply_updates(tp, updates)
            return tp, opt_state, new_stats, losses, self._topk(outs)

        def grad_accum_step_ft(tp, acc, backbone_stats, dropout_key,
                               images, flip, verbs, labels, valid):
            grads, new_stats, losses, outs = _ft_loss_and_grads(
                tp, backbone_stats, dropout_key, images, flip, verbs,
                labels, valid)
            acc = jax.tree.map(jnp.add, acc, grads)
            return acc, new_stats, losses, self._topk(outs)

        repl, bsh = self._repl, self._bsh
        # head_params/opt_state shardings are inferred from the arrays
        # (classifier kernels live on the model axis); batch over 'data'
        self._train_step = jax.jit(
            train_step,
            in_shardings=(None, None, repl, repl, repl,
                          bsh, bsh, bsh, bsh, bsh),
            donate_argnums=(0, 1, 3),
        )
        self._grad_accum_step = jax.jit(
            grad_accum_step,
            in_shardings=(None, None, repl, repl, repl,
                          bsh, bsh, bsh, bsh, bsh),
            donate_argnums=(1, 3),
        )
        self._apply_accum_step = jax.jit(
            apply_accum_step, donate_argnums=(0, 1, 2))
        self._zero_grads = jax.jit(
            lambda hp: jax.tree.map(jnp.zeros_like, hp))
        if accum_n > 1:
            self._grad_accum_final = jax.jit(
                grad_accum_final_step,
                in_shardings=(None, None, None, repl, repl, repl,
                              bsh, bsh, bsh, bsh, bsh),
                donate_argnums=(0, 1, 2, 4),
            )
            if self._ft:
                self._grad_accum_final_ft = jax.jit(
                    grad_accum_final_step_ft,
                    in_shardings=(None, None, None, repl, repl,
                                  bsh, bsh, bsh, bsh, bsh),
                    donate_argnums=(0, 1, 2, 3),
                )
        if self._ft:
            self._train_step_ft = jax.jit(
                train_step_ft,
                in_shardings=(None, None, repl, repl,
                              bsh, bsh, bsh, bsh, bsh),
                donate_argnums=(0, 1, 2),
            )
            self._grad_accum_step_ft = jax.jit(
                grad_accum_step_ft,
                in_shardings=(None, None, repl, repl,
                              bsh, bsh, bsh, bsh, bsh),
                donate_argnums=(1, 2),
            )
        self._eval_step = jax.jit(
            eval_step,
            in_shardings=(None, repl, repl, bsh, bsh, bsh, bsh),
        )

        # single-device inference paths (results/analize_subset modes):
        # batch-1 inputs, eval-mode BN, 2 backbone passes like the reference
        def _infer_feats(backbone_params, backbone_stats, images):
            x = device_transform(images, None,
                                 dtype=self.config.compute_dtype,
                                 crop=self.config.image_size)
            variables = {"params": backbone_params}
            if self._backbone_has_bn:
                variables["batch_stats"] = backbone_stats
            return self.backbone.apply(
                variables, x, train=False).astype(jnp.float32)

        def infer_verb(head_params, backbone_params, backbone_stats, images):
            feats = _infer_feats(backbone_params, backbone_stats, images)
            return self.head.apply({"params": head_params}, feats,
                                   method=self.head.predict_verb)

        def infer_nouns(head_params, backbone_params, backbone_stats,
                        images, verb_ids):
            feats = _infer_feats(backbone_params, backbone_stats, images)
            return self.head.apply(
                {"params": head_params}, feats, verb_ids,
                self.role_ids, self.role_mask,
                method=self.head.predict_nouns)

        self._infer_verb = jax.jit(infer_verb)
        self._infer_nouns = jax.jit(infer_nouns)

    def infer_verb(self, images_u8) -> jax.Array:
        """(B, 256, 256, 3) uint8 → verb logits (B, V)."""
        return self._infer_verb(self.head_params, self.backbone_params,
                                self.backbone_stats, jnp.asarray(images_u8))

    def infer_nouns(self, images_u8, verb_ids) -> jax.Array:
        """(B, 256, 256, 3) uint8 + verb ids (B,) → noun logits (B, R, L)."""
        return self._infer_nouns(self.head_params, self.backbone_params,
                                 self.backbone_stats, jnp.asarray(images_u8),
                                 jnp.asarray(verb_ids))

    # ------------------------------------------------------------- batching

    def _pad_batch(self, batch: Dict) -> Tuple[Dict, np.ndarray, int]:
        """Pad to config.batch_size by wrapping; returns (arrays, valid, n)."""
        B = self.config.batch_size
        n = len(batch["verbs"])
        if n > B:
            raise ValueError(
                f"loader batch of {n} exceeds config.batch_size {B}; "
                f"build the loader at the trainer's batch size (the CLI "
                f"rounds both together) — truncating here would silently "
                f"drop examples")
        if n == B:
            # full batch (every step but the epoch's last partial one):
            # pass the loader arrays straight through — the wrap-gather
            # below would memcpy the whole uint8 image batch on the host
            # (~1.2 GB/step at the flagship batch) for an identity index
            out = {"flip": batch["flip"],
                   "verbs": np.asarray(batch["verbs"], np.int32),
                   "labels": np.asarray(batch["labels"], np.int32)}
            for k in ("images", "indices"):
                if k in batch:
                    out[k] = batch[k]
            return out, self._full_valid, n
        idx = np.arange(B) % n
        valid = (np.arange(B) < n).astype(np.float32)
        out = {
            "flip": batch["flip"][idx],
            "verbs": batch["verbs"][idx].astype(np.int32),
            "labels": batch["labels"][idx].astype(np.int32),
        }
        # device-cached batches carry gather row "indices" instead of pixels
        for k in ("images", "indices"):
            if k in batch:
                out[k] = batch[k][idx]
        return out, valid, n

    def _hbm_window_cache(self, dataset) -> jax.Array:
        """Upload a dataset's precomputed window cache to HBM once
        (replicated over the mesh) and memoize the device array.

        Uploads in bounded CHUNKS (256 MB of rows) written into a
        device-resident buffer via donated ``dynamic_update_slice``
        instead of one giant ``device_put``: a single multi-GB transfer
        must be serialized whole by the transport (and wedged this rig's
        TPU relay indefinitely at 11.8 GB — r4 full-scale rehearsal),
        while chunking bounds both the transport message size and the
        host-side serialization memory, with identical device contents.
        Donation keeps peak HBM at cache + one chunk."""
        host = dataset._window_cache
        entry = self._hbm_caches.get(dataset)
        if entry is None or entry[0]() is not host:
            chunk_bytes = int(os.environ.get("SRTPU_HBM_CHUNK_BYTES",
                                             256 << 20))
            chunk_rows = max(1, chunk_bytes // int(
                np.prod(host.shape[1:]) * host.dtype.itemsize))
            if len(host) <= chunk_rows:
                dev = jax.device_put(host, self._repl)
            else:
                alloc = jax.jit(
                    lambda: jnp.zeros(host.shape, host.dtype),
                    out_shardings=self._repl)
                write = jax.jit(
                    lambda buf, chunk, row: jax.lax.dynamic_update_slice(
                        buf, chunk, (row,) + (0,) * (buf.ndim - 1)),
                    out_shardings=self._repl, donate_argnums=(0,))
                dev = alloc()
                for start in range(0, len(host), chunk_rows):
                    piece = jax.device_put(host[start:start + chunk_rows],
                                           self._repl)
                    dev = write(dev, piece, jnp.int32(start))
                    # drain the stream before the next chunk: letting N
                    # async multi-hundred-MB transfers queue up recreates
                    # the oversized-inflight condition chunking exists to
                    # avoid
                    jax.block_until_ready(dev)
            entry = (weakref.ref(host), dev)
            self._hbm_caches[dataset] = entry
        return entry[1]

    def _assemble_sharded(self, batch: Dict):
        """Multi-process DP: this process's local row block → global device
        arrays (``jax.make_array_from_process_local_data``).  The loader
        already wrap-padded at the global index level, so every local
        block is exactly batch_size/world rows; the valid mask is derived
        from the global row count identically on every process."""
        rank, world = batch["shard"]
        if world != jax.process_count() or rank != jax.process_index():
            raise ValueError(
                f"loader shard {batch['shard']} does not match this "
                f"process ({jax.process_index()}/{jax.process_count()}) — "
                f"build the loader with shard=(jax.process_index(), "
                f"jax.process_count())")
        B = self.config.batch_size
        per = B // world
        local = {
            "images": batch["images"],
            "flip": batch["flip"],
            "verbs": np.asarray(batch["verbs"], np.int32),
            "labels": np.asarray(batch["labels"], np.int32),
        }
        dev = {k: jax.make_array_from_process_local_data(
            self._bsh, v, global_shape=(B,) + v.shape[1:])
            for k, v in local.items()}
        n = int(batch["global_n"])
        valid_g = (np.arange(B) < n).astype(np.float32)
        valid = jax.make_array_from_process_local_data(
            self._bsh, valid_g[rank * per:(rank + 1) * per],
            global_shape=(B,))
        return dev, valid, n

    def _device_batches(self, loader):
        """Iterate (device_arrays, device_valid, host_batch, n) with the
        NEXT batches' host→device transfers issued ahead of consumption.

        Single-process: a dedicated UPLOADER THREAD stages batches
        (pad + ``device_put`` + cache gather) into a bounded queue
        (``SRTPU_UPLOAD_DEPTH``, default 2) — ``device_put`` of a
        streamed uint8 image batch serializes the whole transfer on the
        calling thread through this rig's TPU tunnel, so staging from
        the consumer thread would stall the step loop for the full
        transfer time; from the uploader thread it overlaps the
        in-flight steps' compute (the r4 streamed dev eval ran ~25x
        under the device-resident band for exactly this reason).

        Datasets with ``enable_window_cache`` skip the per-batch pixel
        transfer entirely: the window array lives in HBM (uploaded once
        here) and each batch's images materialize as an on-device gather
        of the batch's row indices — the only per-step host→device bytes
        are the (B,) indices/verbs/labels/flip sidecars.

        Sharded loaders (multi-process DP, ``ImsituLoader(shard=...)``)
        yield local row blocks, assembled into global arrays via
        ``_assemble_sharded`` — INLINE on the consumer thread: every
        process must stage batches in the same relative order as its
        collective-bearing steps, and a per-process free-running thread
        gives no such guarantee."""
        cache_dev = None
        ds = getattr(loader, "dataset", None)
        if ds is not None and getattr(ds, "window_cached", False):
            cache_dev = self._hbm_window_cache(ds)

        def stage(batch):
            if "shard" in batch:
                dev_arrays, valid_dev, n = self._assemble_sharded(batch)
                return (dev_arrays, valid_dev, batch, n)
            arrays, valid, n = self._pad_batch(batch)
            dev_arrays = {k: jax.device_put(v, self._bsh)
                          for k, v in arrays.items()}
            # a partial-prefix window cache yields BOTH kinds of batch
            # in one epoch: index batches (gathered from HBM) and pixel
            # batches (rows past the cached prefix, uploaded)
            if cache_dev is not None and "indices" in dev_arrays:
                dev_arrays["images"] = self._cache_gather(
                    cache_dev, dev_arrays.pop("indices"))
            return (dev_arrays, jax.device_put(valid, self._bsh), batch, n)

        if jax.process_count() > 1:
            pending = None
            for batch in loader:
                dev = stage(batch)
                if pending is not None:
                    yield pending
                pending = dev
            if pending is not None:
                yield pending
            return

        import queue as _queue
        import threading

        depth = max(1, int(os.environ.get("SRTPU_UPLOAD_DEPTH", "2")))
        q: _queue.Queue = _queue.Queue(maxsize=depth)
        stop = threading.Event()
        _END = object()

        def work():
            try:
                for batch in loader:
                    item = stage(batch)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except _queue.Full:
                            continue
                    if stop.is_set():
                        return
                q.put(_END)
            except BaseException as e:  # surfaced on the consumer thread
                try:
                    q.put(e, timeout=1.0)
                except _queue.Full:
                    pass

        t = threading.Thread(target=work, name="srtpu-uploader", daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer may abandon mid-epoch (preemption raise): unblock
            # the uploader so its loader iterator can also wind down
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except _queue.Empty:
                    break

    # ------------------------------------------------------------ epoch API

    def train_epoch(self, loader, epoch: int,
                    timer: Optional[StepTimer] = None,
                    mid_state: Optional[dict] = None,
                    save_every: Optional[int] = None,
                    save_callback=None,
                    preempt=None):
        """One epoch; returns (top1, top5, mean losses tuple).

        Step-granularity recovery (capability the reference lacks — its
        recovery unit is a whole epoch, sr.py:145-162): with ``save_every``,
        ``save_callback(mid)`` fires every N batches with a resumable
        accumulator snapshot; pass it back as ``mid_state`` to continue the
        epoch from the next batch.

        ``preempt`` (a ``threading.Event``): preemption-safe shutdown —
        when set (``fit(handle_sigterm=True)`` sets it from SIGTERM), the
        loop fires ``save_callback`` with a resumable snapshot at the next
        optimizer-step boundary and raises ``Preempted``, so an evicted
        run loses zero completed steps instead of up to ``save_every``.
        """
        loader.set_epoch(epoch)
        top1 = ImsituScorer(self.encoder, 1, 3)
        top5 = ImsituScorer(self.encoder, 5, 3)
        sums = np.zeros(3)
        num_batches = 0
        start_batch = 0
        if mid_state is not None:
            from situation_recognition_tpu.utils.checkpoint import history_list

            top1.load_state_dict(mid_state["top1"])
            top5.load_state_dict(mid_state["top5"])
            # history_list accepts both a real list and the {'0': v0, ...}
            # index-dict shape a msgpack round-trip produces — the consumer
            # canonicalizes its own schema (defense in depth; the loader
            # also canonicalizes known fields)
            sums = np.asarray(history_list(mid_state["loss_sums"]),
                              np.float64)
            num_batches = int(mid_state["num_batches"])
            start_batch = int(mid_state["batch_in_epoch"])
            self.step_count = int(mid_state["step_count"])
        loader.start_batch = start_batch
        batch_idx = start_batch
        accum = max(1, int(self.config.grad_accum))
        acc = None
        micros = 0

        def _apply_pending():
            nonlocal acc, micros
            if acc is not None and micros:
                if self._ft:
                    tp, self.opt_state = self._apply_accum_step(
                        self._trainable(), self.opt_state, acc,
                        jnp.float32(micros))
                    self.head_params = tp["head"]
                    self.backbone_params = tp["backbone"]
                else:
                    (self.head_params,
                     self.opt_state) = self._apply_accum_step(
                        self.head_params, self.opt_state, acc,
                        jnp.float32(micros))
            acc = None
            micros = 0

        # Software pipelining: dispatching step k and immediately blocking
        # on ITS losses/top-k serializes the host (scoring + next dispatch
        # + tunnel round-trip) with the device — measured ~100 ms/step of
        # dead device time at full scale (r4 rehearsal: ~1,090 img/s vs
        # the 3,200 device-resident band).  Instead, completed steps'
        # host-side consumption (loss floats, top-k fetch, scoring) is
        # deferred into a small in-flight window: while the host scores
        # step k-d the device runs step k.  Depth 2 keeps one full step
        # of slack on either side; snapshots/preemption flush the window
        # first so every persisted state is consistent (scorer state
        # covers exactly the dispatched steps).
        from collections import deque

        inflight = deque()
        depth = max(0, int(os.environ.get("SRTPU_PIPELINE_DEPTH", "2")))
        trace = os.environ.get("SRTPU_STEP_TRACE") == "1"
        import time as _time

        def _consume_one():
            nonlocal num_batches, sums
            losses_f, topk_f, verbs_h, labels_h, n_c = inflight.popleft()
            t0 = _time.perf_counter() if trace else 0.0
            losses_v = [float(x) for x in losses_f]
            t1 = _time.perf_counter() if trace else 0.0
            pv5, pn5, gt1 = (_fetch(x)[:n_c] for x in topk_f)
            lap = timer.lap(n_c) if timer else 0.0
            if trace and num_batches < 16:
                import sys as _sys

                t2 = _time.perf_counter()
                print(f"[trace] b{num_batches}: loss_block="
                      f"{(t1 - t0) * 1e3:.0f}ms topk_fetch="
                      f"{(t2 - t1) * 1e3:.0f}ms lap={lap * 1e3:.0f}ms",
                      file=_sys.stderr)
            top1.add_point_indices(pv5[:, :1], verbs_h,
                                   pn5[:, :, :1], labels_h, gt1)
            top5.add_point_indices(pv5, verbs_h, pn5, labels_h)
            sums += losses_v
            num_batches += 1

        for arrays, valid, batch, n in self._device_batches(loader):
            td = _time.perf_counter() if trace else 0.0
            key = jax.random.fold_in(self._dropout_base, self.step_count)
            if accum == 1:
                if self._ft:
                    (tp, self.opt_state, self.backbone_stats, losses,
                     topk) = self._train_step_ft(
                        self._trainable(), self.opt_state,
                        self.backbone_stats, key, arrays["images"],
                        arrays["flip"], arrays["verbs"], arrays["labels"],
                        valid)
                    self.head_params = tp["head"]
                    self.backbone_params = tp["backbone"]
                else:
                    (self.head_params, self.opt_state, self.backbone_stats,
                     losses, topk) = self._train_step(
                        self.head_params, self.opt_state,
                        self.backbone_params, self.backbone_stats, key,
                        arrays["images"], arrays["flip"], arrays["verbs"],
                        arrays["labels"], valid)
            else:
                if acc is None:
                    acc = self._zero_grads(self._trainable())
                if micros == accum - 1:
                    # group's last microbatch: ONE fused program does
                    # grads + accumulate + optimizer apply and hands back
                    # a zeroed accumulator — no separate apply/zero
                    # dispatches to drain the pipeline at the boundary
                    if self._ft:
                        (tp, self.opt_state, acc, self.backbone_stats,
                         losses, topk) = self._grad_accum_final_ft(
                            self._trainable(), self.opt_state, acc,
                            self.backbone_stats, key, arrays["images"],
                            arrays["flip"], arrays["verbs"],
                            arrays["labels"], valid)
                        self.head_params = tp["head"]
                        self.backbone_params = tp["backbone"]
                    else:
                        (self.head_params, self.opt_state, acc,
                         self.backbone_stats, losses, topk) = \
                            self._grad_accum_final(
                                self.head_params, self.opt_state, acc,
                                self.backbone_params, self.backbone_stats,
                                key, arrays["images"], arrays["flip"],
                                arrays["verbs"], arrays["labels"], valid)
                    micros = 0
                elif self._ft:
                    (acc, self.backbone_stats, losses, topk) = \
                        self._grad_accum_step_ft(
                            self._trainable(), acc, self.backbone_stats,
                            key, arrays["images"], arrays["flip"],
                            arrays["verbs"], arrays["labels"], valid)
                    micros += 1
                else:
                    (acc, self.backbone_stats, losses, topk) = \
                        self._grad_accum_step(
                            self.head_params, acc, self.backbone_params,
                            self.backbone_stats, key, arrays["images"],
                            arrays["flip"], arrays["verbs"],
                            arrays["labels"], valid)
                    micros += 1
            if trace and batch_idx - start_batch < 16:
                import sys as _sys

                print(f"[trace] b{batch_idx - start_batch}: dispatch="
                      f"{(_time.perf_counter() - td) * 1e3:.0f}ms "
                      f"inflight={len(inflight)}", file=_sys.stderr)
            # _fetch (inside _consume_one): np.asarray single-process;
            # all-gather of the batch-sharded top-k rows in a
            # multi-process world (every process then scores the full
            # global batch identically).  verbs/labels sidecars are
            # captured NOW — the host batch dict must not be retained by
            # the in-flight window beyond what scoring needs.
            verbs_h = batch.get("verbs_global", batch["verbs"])[:n]
            labels_h = batch.get("labels_global", batch["labels"])[:n]
            inflight.append((losses, topk, verbs_h, labels_h, n))
            self.step_count += 1
            batch_idx += 1
            while len(inflight) > depth:
                _consume_one()

            def _mid():
                return {
                    "batch_in_epoch": batch_idx,
                    "step_count": self.step_count,
                    "top1": top1.state_dict(),
                    "top5": top5.state_dict(),
                    "loss_sums": sums.tolist(),
                    "num_batches": num_batches,
                }

            # dispatched count (consumed + in flight) — the pipelined
            # equivalent of the old num_batches at this point in the loop
            dispatched = num_batches + len(inflight)
            want_save = (save_every and save_callback
                         and dispatched % save_every == 0
                         and micros == 0)
            # with grad_accum, snapshots/stops land only on optimizer-step
            # boundaries — a mid-group snapshot would silently drop the
            # accumulated gradients on resume.  The agreement collective
            # runs every boundary (all ranks, symmetric) so multi-process
            # ranks stop at the SAME step.
            want_stop = (preempt is not None and micros == 0
                         and _preempt_agreed(preempt))
            if want_save or want_stop:
                # flush the pipeline first: a persisted snapshot's scorer
                # state must cover exactly batch_in_epoch batches
                while inflight:
                    _consume_one()
                if save_callback:
                    save_callback(_mid())
                if want_stop:
                    raise Preempted(epoch, batch_idx,
                                    saved=save_callback is not None)
        while inflight:
            _consume_one()
        # epoch ended mid-group: step on what accumulated (the tail
        # microbatches must not be silently discarded)
        _apply_pending()
        return top1, top5, tuple(sums / max(num_batches, 1))

    def evaluate(self, loader, logging: bool = False, preempt=None):
        """Reference ``eval`` (sr.py:165-232): returns
        (top1, top5, val_losses dict, avg_score).

        Pipelined like ``train_epoch``: eval steps are dispatched ahead
        of their host-side consumption, so streamed splits overlap the
        batch upload (issued by the uploader thread) with the in-flight
        steps' compute instead of serializing transfer → compute →
        scoring per batch.

        ``preempt`` (a ``threading.Event``): a SIGTERM landing during a
        long eval (the full dev split is minutes of wall at scale) stops
        BETWEEN batches with ``Preempted`` instead of deferring to the
        end of the split — the r4 full-scale drill showed a mid-eval
        SIGTERM otherwise overruns typical preemption grace windows.
        The caller (``_fit_epochs``) persists the completed epoch and
        re-runs the interrupted eval on resume."""
        import time as _time

        top1 = ImsituScorer(self.encoder, 1, 3)
        top5 = ImsituScorer(self.encoder, 5, 3)
        sums = np.zeros(3)
        num_batches = 0
        images = 0
        t0 = _time.perf_counter()
        from collections import deque

        inflight = deque()
        depth = max(0, int(os.environ.get("SRTPU_PIPELINE_DEPTH", "2")))

        def _consume_one():
            nonlocal num_batches, sums, images
            losses_f, topk_f, verbs_h, labels_h, n_c = inflight.popleft()
            pv5, pn5, gt1 = (_fetch(x)[:n_c] for x in topk_f)
            top1.add_point_indices(pv5[:, :1], verbs_h,
                                   pn5[:, :, :1], labels_h, gt1)
            top5.add_point_indices(pv5, verbs_h, pn5, labels_h)
            sums += [float(x) for x in losses_f]
            num_batches += 1
            images += n_c

        for arrays, valid, batch, n in self._device_batches(loader):
            losses, topk = self._eval_step(
                self.head_params, self.backbone_params, self.backbone_stats,
                arrays["images"], arrays["verbs"], arrays["labels"], valid)
            verbs_h = batch.get("verbs_global", batch["verbs"])[:n]
            labels_h = batch.get("labels_global", batch["labels"])[:n]
            inflight.append((losses, topk, verbs_h, labels_h, n))
            while len(inflight) > depth:
                _consume_one()
            if preempt is not None and _preempt_agreed(preempt):
                # between-batch stop: nothing here mutates trainer state,
                # so the caller can checkpoint the completed epoch and
                # redo this eval cleanly after resume
                raise Preempted(-1, num_batches + len(inflight))
        while inflight:
            _consume_one()
        wall = _time.perf_counter() - t0
        if images and wall > 0:
            import sys as _sys

            # observability (stderr — stdout stays reference-format)
            print(f'[srtpu] eval: {images} img in {wall:.1f}s '
                  f'({images / wall:.0f} img/s)', file=_sys.stderr)
        sums /= max(num_batches, 1)
        val_losses = {"verb_loss": sums[0], "nouns_loss": sums[1],
                      "gt_loss": sums[2]}

        avg_score = 0.0
        if logging:
            top1_a = top1.get_average_results_both()
            top5_a = top5.get_average_results_both()
            avg_score = mean_of_eight(top1_a, top5_a)
            print('val losses = [v: {:.2f}, n: {:.2f}, gt: {:.2f}]'
                  .format(val_losses['verb_loss'], val_losses['nouns_loss'],
                          val_losses['gt_loss']))
            gt = {key: top1_a[key] for key in ['gt-value', 'gt-value-all']}
            one_val = {key: top1_a[key] for key in ['verb', 'value', 'value-all']}
            print('{}\n{}\n{}, mean = {:.2f}\n'
                  .format(format_dict(one_val, '{:.2f}', '1-'),
                          format_dict(top5_a, '{:.2f}', '5-'),
                          format_dict(gt, '{:.2f}', ''), avg_score))
        return top1, top5, val_losses, avg_score

    # ------------------------------------------------------------- fit loop

    def fit(self, train_loader, dev_loader, model_saving_name: str,
            folder: str, checkpoint: Optional[dict] = None,
            plot: bool = True, save: bool = True,
            timer: Optional[StepTimer] = None,
            save_every_steps: Optional[int] = None,
            handle_sigterm: bool = False,
            keep_best: bool = False,
            metrics_jsonl: Optional[str] = None,
            async_save: bool = False):
        """Reference ``train`` (sr.py:15-162): epoch loop with identical
        stdout, per-epoch dev eval, curve plot, and overwrite checkpointing.

        ``save_every_steps``: additionally checkpoint every N train steps
        with a resumable mid-epoch snapshot (preemption recovery at step
        granularity — the reference can only lose/redo whole epochs).

        ``handle_sigterm``: preemption-safe shutdown (the CLI sets it).
        SIGTERM — what cluster schedulers and TPU-VM maintenance events
        send before eviction — triggers one resumable mid-epoch snapshot
        at the next optimizer-step boundary, then returns cleanly (exit
        0), so the relaunch loses zero completed steps.  Only the main
        thread can own signal handlers; callers on other threads get the
        flag-checking path with no handler installed.

        ``keep_best``: additionally save the best-val-mean epoch to
        ``<model_saving_name>_best`` (the reference overwrites its single
        checkpoint every epoch and its own comment flags the gap,
        sr.py:144: "always saving but no need if it's not the best
        score").  "Best so far" counts resumed history, so a restarted
        run never demotes an earlier better epoch.

        ``metrics_jsonl``: append one JSON line per epoch (losses, all
        eight metrics ×100 like the prints, val, throughput) — structured
        observability; stdout stays reference-byte-compatible.

        ``async_save``: write checkpoints on a background thread so the
        serialize+fsync overlaps the next epoch's compute (flagship
        checkpoints are ~0.7 GB; on a network filesystem the write is
        seconds per epoch).  At most one write is in flight; every new
        save — including mid-epoch/preemption snapshots — joins the
        previous one first, and fit() joins before returning, so the
        durability contract is unchanged."""
        import os

        # multi-process DP: every process trains (identical replicated
        # updates) but only process 0 touches the filesystem — checkpoint
        # writes and the curve PNG would race on a shared fs.  stdout
        # suppression for non-main ranks is the launcher's concern
        # (tools/train_distributed-style wrappers / cli --distributed).
        if jax.process_count() > 1 and jax.process_index() != 0:
            plot = False
            save = False
            metrics_jsonl = None

        histories = {k: [] for k in [
            "avg_scores", "verb_losses", "nouns_losses",
            "val_avg_scores", "val_verb_losses", "val_nouns_losses"]}
        epoch = 0
        mid_state = None
        if checkpoint is not None:
            epoch = int(checkpoint["epoch"])
            for k in histories:
                histories[k] = list(checkpoint[k])
            # the CLI resume path strips the model-state keys because
            # _load_resume already restored them; a dict that still carries
            # them (direct fit() callers, tests) is loaded here
            if checkpoint.get("head_params") is not None:
                self.load_model_state(checkpoint)
            mid_state = checkpoint.get("mid")

        ckpt_path = os.path.join(folder, model_saving_name)
        saver = AsyncSaver()

        def save_mid(mid):
            # histories are COPIED so the writer thread never serializes
            # lists the next epoch is appending to
            saver.save(ckpt_path, {
                "epoch": self._current_epoch,
                **{k: list(v) for k, v in histories.items()},
                "mid": mid, **self.model_state_snapshot()},
                background=async_save)

        import sys

        profile_dir = os.environ.get("SRTPU_PROFILE_DIR")
        if timer is None:
            timer = StepTimer()

        import signal
        import threading

        preempt = threading.Event()
        prev_handler = None
        if handle_sigterm and threading.current_thread() is threading.main_thread():
            prev_handler = signal.signal(
                signal.SIGTERM, lambda signum, frame: preempt.set())
        try:
            self._fit_epochs(
                train_loader, dev_loader, model_saving_name, folder,
                histories, epoch, mid_state, plot, save, timer,
                save_every_steps, save_mid, profile_dir, preempt,
                keep_best, metrics_jsonl, saver, async_save)
        except Preempted as p:
            # stderr so stdout stays reference-byte-compatible.  Only
            # claim a snapshot when THIS process actually wrote one
            # (train_epoch saved before raising; the finally's join
            # covers an async in-flight write) — non-zero ranks and
            # before-first-snapshot stops must not report a checkpoint
            # that does not exist
            if p.saved:
                print(f'[srtpu] SIGTERM: saved resumable checkpoint at '
                      f'epoch {p.epoch} batch {p.batch_in_epoch}; exiting '
                      f'cleanly (relaunch with --resume_model to continue)',
                      file=sys.stderr)
            else:
                print(f'[srtpu] SIGTERM: exiting cleanly at epoch '
                      f'{p.epoch} (no new snapshot on this process; '
                      f'resume from the last saved checkpoint, if any)',
                      file=sys.stderr)
        finally:
            saver.join()
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _fit_epochs(self, train_loader, dev_loader, model_saving_name,
                    folder, histories, epoch, mid_state, plot, save, timer,
                    save_every_steps, save_mid, profile_dir, preempt,
                    keep_best=False, metrics_jsonl=None, saver=None,
                    async_save=False):
        import json
        import os
        import sys
        import time

        from situation_recognition_tpu.utils.logging import jax_profile_trace

        saver = saver or AsyncSaver()

        def _epoch_ckpt(next_epoch):
            # device-copy snapshot: the d2h fetch + serialize happen on
            # the saver's writer thread / forked child, not here
            return {"epoch": next_epoch,
                    **{k: list(v) for k, v in histories.items()},
                    **self.model_state_snapshot()}

        if (dev_loader is not None and epoch > 0
                and len(histories["val_avg_scores"])
                < len(histories["avg_scores"])):
            # The previous run was preempted MID-dev-eval: its training
            # epoch completed and was checkpointed, but the val record is
            # missing.  Complete it now so histories stay aligned (and
            # keep_best still sees every epoch) before training continues.
            print(f'[srtpu] completing the interrupted dev eval of epoch '
                  f'{epoch - 1} (previous run stopped mid-eval)',
                  file=sys.stderr)
            try:
                _, _, val_losses, val_avg = self.evaluate(
                    dev_loader, logging=True, preempt=preempt)
            except Preempted:
                raise Preempted(epoch - 1, 0, saved=False)
            histories["val_avg_scores"].append(val_avg)
            histories["val_verb_losses"].append(val_losses["verb_loss"])
            histories["val_nouns_losses"].append(val_losses["nouns_loss"])
            if metrics_jsonl:
                with open(metrics_jsonl, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch - 1, "catch_up_eval": True,
                        "val_losses": val_losses, "val_mean": val_avg,
                        "time": time.time()}) + "\n")
            if save:
                best = keep_best and val_avg >= max(
                    histories["val_avg_scores"][:-1], default=-1.0)
                saver.save(os.path.join(folder, model_saving_name),
                           _epoch_ckpt(epoch), background=async_save,
                           copy_to=os.path.join(
                               folder, model_saving_name + "_best")
                           if best else None)

        for e in range(epoch, self.config.epochs):
            if _preempt_agreed(preempt):
                # flagged outside the batch loop (during eval / between
                # epochs).  saved=False: nothing NEW was written here —
                # the end-of-epoch checkpoint (if any epoch completed)
                # is the resume point
                raise Preempted(e, 0)
            # reference format (sr.py prints the configured lr each epoch);
            # with a schedule active the line reports the lr the epoch's
            # first optimizer step will actually use
            epoch_lr = self.current_lr()
            print('Epoch-{}, lr: {:.4f}'.format(e, epoch_lr))
            timer.reset()
            self._current_epoch = e
            with jax_profile_trace(profile_dir if e == epoch else None):
                top1, top5, (vloss, nloss, gloss) = self.train_epoch(
                    train_loader, e, timer=timer, mid_state=mid_state,
                    save_every=save_every_steps,
                    save_callback=save_mid if save else None,
                    preempt=preempt)
            mid_state = None
            if timer.images_per_sec > 0:
                # observability the reference lacks (SURVEY §5a); stderr so
                # stdout stays byte-compatible with the reference transcripts
                print(f'[srtpu] epoch {e}: {timer.images_per_sec:.0f} img/s, '
                      f'{timer.mean_step_time * 1000:.0f} ms/step',
                      file=sys.stderr)

            top1_a = top1.get_average_results_both()
            top5_a = top5.get_average_results_both()
            avg_score = mean_of_eight(top1_a, top5_a)
            histories["avg_scores"].append(avg_score)
            histories["verb_losses"].append(vloss)
            histories["nouns_losses"].append(nloss)

            print('training losses = [v: {:.2f}, n: {:.2f}, gt: {:.2f}]'
                  .format(vloss, nloss, gloss))
            gt = {key: top1_a[key] for key in ['gt-value', 'gt-value-all']}
            one_val = {key: top1_a[key] for key in ['verb', 'value', 'value-all']}
            print('{}\n{}\n{}, mean = {:.2f}\n{}'
                  .format(format_dict(one_val, '{:.2f}', '1-'),
                          format_dict(top5_a, '{:.2f}', '5-'),
                          format_dict(gt, '{:.2f}', ''), avg_score, '-' * 50))

            try:
                _, _, val_losses, val_avg = self.evaluate(
                    dev_loader, logging=True, preempt=preempt)
            except Preempted:
                # SIGTERM mid-dev-eval (r4 drill's uncovered phase): the
                # epoch's TRAINING is complete — persist it synchronously
                # (we are exiting; async would still be joined, sync is
                # simply unambiguous) with the val histories one entry
                # short, then exit cleanly.  Resume detects the short val
                # history and re-runs this eval first (catch-up above).
                if save:
                    saver.save(os.path.join(folder, model_saving_name),
                               _epoch_ckpt(e + 1), background=False)
                raise Preempted(e, 0, saved=save)
            histories["val_avg_scores"].append(val_avg)
            histories["val_verb_losses"].append(val_losses["verb_loss"])
            histories["val_nouns_losses"].append(val_losses["nouns_loss"])

            if metrics_jsonl:
                rec = {
                    "epoch": e, "lr": epoch_lr,
                    "train_losses": {"verb": vloss, "nouns": nloss,
                                     "gt": gloss},
                    "train_top1": {k: v * 100 for k, v in top1_a.items()},
                    "train_top5": {k: v * 100 for k, v in top5_a.items()},
                    "train_mean": avg_score,
                    "val_losses": val_losses,
                    "val_mean": val_avg,
                    "img_per_sec": timer.images_per_sec,
                    "ms_per_step": timer.mean_step_time * 1000,
                    "time": time.time(),
                }
                with open(metrics_jsonl, "a") as f:
                    f.write(json.dumps(rec) + "\n")

            if plot:
                self._plot(histories, os.path.join(
                    folder, model_saving_name + ".png"))

            if save:
                ckpt = _epoch_ckpt(e + 1)
                best = keep_best and val_avg >= max(
                    histories["val_avg_scores"][:-1], default=-1.0)
                # >= so the first epoch always seeds the best file; [:-1]
                # includes any resumed history, so a restart never
                # demotes an earlier better epoch.  The best file is a
                # COPY of the epoch write (one serialize, not two)
                saver.save(os.path.join(folder, model_saving_name), ckpt,
                           background=async_save,
                           copy_to=os.path.join(
                               folder, model_saving_name + "_best")
                           if best else None)

    @staticmethod
    def _plot(histories, path):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(histories["verb_losses"], label='verb losses')
        plt.plot(histories["nouns_losses"], label='nouns losses')
        plt.plot(histories["avg_scores"], label='accuracy mean')
        plt.plot(histories["val_verb_losses"], '-.', label='val verb losses')
        plt.plot(histories["val_nouns_losses"], '-.', label='val nouns losses')
        plt.plot(histories["val_avg_scores"], '-.', label='val accuracy mean')
        plt.grid()
        plt.legend()
        plt.savefig(path)
        plt.clf()

    # ----------------------------------------------------------- state mgmt

    def model_state_dict(self) -> dict:
        # frozen mode never mutates backbone_params after construction /
        # restore, so its ~240 MB host copy is fetched ONCE and reused —
        # per-epoch checkpointing otherwise pays a multi-second d2h
        # transfer per epoch for bytes that cannot have changed (the r5
        # full-scale run measured ~35 s/epoch of checkpoint d2h+serialize
        # against a ~25 s train phase).  Fine-tuning invalidates per call.
        if getattr(self, "_bb_host_src", None) is not self.backbone_params:
            # keyed on the device tree's identity: any reassignment
            # (checkpoint restore, _load_backbone, fine-tune step)
            # invalidates the host copy automatically
            self._bb_host = jax.device_get(self.backbone_params)
            self._bb_host_src = self.backbone_params
        return {
            "head_params": jax.device_get(self.head_params),
            "backbone_params": self._bb_host,
            "backbone_stats": jax.device_get(self.backbone_stats),
            "opt_state": jax.device_get(
                jax.tree.map(np.asarray, self.opt_state)),
            # continues the dropout-key stream across epoch-boundary
            # resumes (the mid-epoch save path already carries it; without
            # this, a resumed run replays epoch 0's dropout masks and
            # diverges from the uninterrupted trajectory)
            "step_count": self.step_count,
        }

    def model_state_snapshot(self) -> dict:
        """Checkpoint contents with the MUTABLE trees as fresh DEVICE
        copies (plus the cached frozen-backbone host tree): safe to hand
        to ``AsyncSaver.save`` for background d2h+serialize while
        training continues — the next step's buffer donation cannot
        touch these private copies.  The d2d copy is ~1 ms for the
        ~0.4 GB of head/opt state; the old host-side
        ``model_state_dict`` path serialized ~15-20 s of d2h through
        this rig's tunnel into the epoch boundary."""
        if getattr(self, "_snap", None) is None:
            # x*1 (exact for every IEEE value incl. -0.0/NaN and for
            # ints) forces materialized output buffers; jit(identity)
            # may alias its input, which donation would then invalidate
            self._snap = jax.jit(
                lambda t: jax.tree.map(lambda x: x * jnp.ones((), x.dtype),
                                       t))
        if getattr(self, "_bb_host_src", None) is not self.backbone_params:
            self._bb_host = jax.device_get(self.backbone_params)
            self._bb_host_src = self.backbone_params
        return {
            "head_params": self._snap(self.head_params),
            "backbone_params": self._bb_host,
            "backbone_stats": self._snap(self.backbone_stats),
            "opt_state": self._snap(self.opt_state),
            "step_count": self.step_count,
        }

    def load_model_state(self, state: dict) -> None:
        """Tolerant name-matched restore (reference ``utils.load_net``
        semantics: absent keys warn '[Missed]' and keep current values)."""
        from flax import serialization

        from situation_recognition_tpu.utils.checkpoint import restore_tolerant

        self.head_params = restore_tolerant(
            jax.device_get(self.head_params), state.get("head_params"),
            "head_params")
        self.backbone_params = restore_tolerant(
            jax.device_get(self.backbone_params),
            state.get("backbone_params"), "backbone_params")
        self.backbone_stats = restore_tolerant(
            jax.device_get(self.backbone_stats),
            state.get("backbone_stats"), "backbone_stats")
        self.head_params = jax.device_put(self.head_params, self._head_sh)
        self.backbone_params = jax.device_put(self.backbone_params, self._repl)
        self.backbone_stats = jax.device_put(self.backbone_stats, self._repl)
        if state.get("step_count") is not None:
            self.step_count = int(state["step_count"])
        if state.get("opt_state") is not None:
            try:
                restored = serialization.from_state_dict(
                    jax.device_get(self.opt_state), state["opt_state"])
            except (ValueError, KeyError, TypeError) as e:
                # structure mismatch: a head-only adamax tree resumed into
                # a train_backbone trainer (or vice versa).  Mirror the
                # reference's tolerant-load stance (utils.load_net prints
                # and continues): keep the params, restart the optimizer.
                print(f"[Mismatch]: optimizer state does not fit this "
                      f"trainer's optimizer tree (train_backbone "
                      f"changed?) — reinitializing it ({e})")
                restored = jax.device_get(
                    jax.jit(self.tx.init)(self._trainable()))
            self.opt_state = self._place_opt_state(restored)
        else:
            self.opt_state = self._place_opt_state(
                jax.jit(self.tx.init)(self._trainable()))
