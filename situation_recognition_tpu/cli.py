"""Command-line interface — flag-compatible with the reference ``sr.py``
(``/root/reference/sr.py:383-539``): same flags, same defaults, same mode
dispatch, same stdout formats.  TPU-specific additions are strictly additive
(``--backbone``, ``--precision``, ``--model_axis``, ``--backbone_ckpt``,
``--seed``, ``--ggnn``).

Reproduced behaviors:
* the encoder is ALWAYS built from ``<dataset_folder>/train.json`` even when
  ``--train_file`` names a different file (sr.py:429-430);
* the encoder is cached in ``<saving_folder>/encoder`` and reloaded with a
  "Loading encoder file" message (sr.py:442-447) — as JSON, not pickle;
* the test loader shuffles (sr.py:462-463, reference quirk);
* resume sets ``model_saving_name`` to the resume name (sr.py:505).

Resume accepts both this framework's msgpack checkpoints and original torch
checkpoints (converted on the fly, incl. the pretrained ``resnet152_sr``).
"""

from __future__ import annotations

import sys
import json
import os
from argparse import ArgumentParser
from os.path import isfile as pisfile, join as pjoin
from pathlib import Path


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description='Situation recognition with GNN.')
    parser.add_argument('--resume_model', type=str, default='',
                        help='The model we resume')

    parser.add_argument('--evaluate_dev', action='store_true',
                        help='Only use the testing mode')
    parser.add_argument('--evaluate_test', action='store_true',
                        help='Only use the testing mode')

    parser.add_argument('--test_img', type=str, default='',
                        help='Only use the results mode with a given img')
    parser.add_argument('--verb', type=str, default='',
                        help='Use a gt verb')
    parser.add_argument('--subset', type=int, default=0,
                        help='Analize a subset of a specified size')

    parser.add_argument('--model_saving_name', type=str, default='sr',
                        help='saving name of the outpul model')
    parser.add_argument('--saving_folder', type=str, default='checkpoints',
                        help='Location of annotations')
    parser.add_argument('--imgset_dir', type=str, default='resized_256',
                        help='Location of original images')
    parser.add_argument('--dataset_folder', type=str, default='imSitu',
                        help='Location of annotations')

    parser.add_argument('--train_file', type=str, default='train.json',
                        help='Train json file')
    parser.add_argument('--dev_file', type=str, default='dev.json',
                        help='Dev json file')
    parser.add_argument('--test_file', type=str, default='test.json',
                        help='test json file')

    parser.add_argument('--batch_size', type=int, default=6144)
    parser.add_argument('--num_workers', type=int, default=10)

    parser.add_argument('--epochs', type=int, default=1000)
    parser.add_argument('--lr', type=float, default=0.002)

    # --- TPU-native additions (not in the reference CLI) ---
    parser.add_argument('--backbone', type=str, default='resnet152',
                        choices=['resnet18', 'resnet34', 'resnet50',
                                 'resnet101', 'resnet152', 'mini',
                                 'vit_l14', 'vit_l14_clip', 'vit_b16',
                                 'vit_tiny'],
                        help='Backbone architecture')
    parser.add_argument('--precision', type=str, default='auto',
                        choices=['auto', 'bf16', 'fp32'],
                        help='Compute dtype (auto: bf16 on TPU, fp32 on CPU)')
    parser.add_argument('--image_size', type=int, default=224,
                        help='Model input resolution (default 224, the '
                             'reference\'s Resize(224)+Crop(224); e.g. 336 '
                             'for the CLIP ViT-L/14@336 grid — the device '
                             'resize serves any size from the same 256 '
                             'host windows, and the converters interpolate '
                             'pretrained ViT pos-embeds to match)')
    parser.add_argument('--model_axis', type=int, default=1,
                        help='Mesh model-axis size (classifier TP)')
    parser.add_argument('--backbone_ckpt', type=str, default='',
                        help='Pretrained backbone weights (.msgpack or torch .pth)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--ggnn', type=str, default='auto',
                        choices=['auto', 'masked', 'pallas'],
                        help='GGNN propagation implementation (auto: fused '
                             'Pallas kernel on TPU at bf16, masked-sum XLA '
                             'elsewhere; pallas: request the kernel — it '
                             'computes bf16 internally and still falls back '
                             'for unsupported widths/tiny row counts)')
    parser.add_argument('--frozen_bn', type=str, default='train',
                        choices=['train', 'eval'],
                        help='BN mode of the frozen backbone during train '
                             'steps: "train" matches the reference '
                             '(batch stats + running-stat updates); "eval" '
                             'uses running stats only — ~39%% faster, '
                             'diverges from the reference trajectory')
    parser.add_argument('--grad_accum', type=int, default=1,
                        help='Gradient accumulation: each optimizer step '
                             'averages the gradients of N microbatches of '
                             'batch_size/N rows — runs the global-batch '
                             'recipe when the backbone forward does not '
                             'fit HBM at the full batch (e.g. ViT-L/14 '
                             'on few chips).  Train-mode BN computes '
                             'per-microbatch stats (DIVERGENCES #17 '
                             'class)')
    parser.add_argument('--train_backbone', action='store_true',
                        help='Fine-tune the backbone (ADDITIVE: the '
                             'reference freezes its backbones at '
                             'construction and filters them out of the '
                             'optimizer).  One global-norm-1 clip over '
                             'head+backbone gradients, Adamax on both.  '
                             'Memory scales with the microbatch: combine '
                             '--grad_accum and --remat_backbone for '
                             'flagship widths')
    parser.add_argument('--backbone_lr', type=float, default=None,
                        help='Decoupled backbone learning rate (default: '
                             '--lr; exact — Adamax updates are linear in '
                             'lr).  Needs --train_backbone')
    parser.add_argument('--remat_backbone', action='store_true',
                        help='Rematerialize residual/encoder blocks on '
                             'the backward pass (backward activation '
                             'memory drops to block boundaries for one '
                             'extra forward).  Needs --train_backbone')
    parser.add_argument('--lr_schedule', default='constant',
                        choices=['constant', 'cosine', 'linear'],
                        help='Learning-rate schedule over optimizer steps '
                             '(ADDITIVE: the reference trains at a '
                             'constant lr forever).  cosine/linear decay '
                             'lr to --min_lr over --total_steps; driven '
                             'by the optimizer-step counter, so it ticks '
                             'once per grad-accum group and resumes '
                             'exactly from checkpoints')
    parser.add_argument('--warmup_steps', type=int, default=0,
                        help='Linear lr warmup over the first N optimizer '
                             'steps (step c runs at lr*(c+1)/N); composes '
                             'with every --lr_schedule — the standard '
                             'fine-tuning recipe with --train_backbone')
    parser.add_argument('--total_steps', type=int, default=None,
                        help='Decay horizon in optimizer steps for '
                             'cosine/linear (epochs * steps-per-epoch / '
                             '--grad_accum for a full run); steps past it '
                             'hold at --min_lr')
    parser.add_argument('--min_lr', type=float, default=0.0,
                        help='Floor of the cosine/linear decay '
                             '(default 0)')
    parser.add_argument('--save_steps', type=int, default=0,
                        help='Also checkpoint every N train steps '
                             '(mid-epoch, preemption-safe resume)')
    parser.add_argument('--async_save', action='store_true',
                        help='Write checkpoints on a background thread '
                             '(the ~0.7 GB flagship serialize+fsync '
                             'overlaps the next epoch; at most one write '
                             'in flight, joined before exit — same '
                             'durability, zero step-time cost)')
    parser.add_argument('--keep_best', action='store_true',
                        help='Additionally keep the best-val-mean epoch '
                             'as <model_saving_name>_best (the reference '
                             'overwrites every epoch and its own comment '
                             'flags this gap, sr.py:144)')
    parser.add_argument('--metrics_jsonl', type=str, default='',
                        help='Append one JSON line of structured metrics '
                             'per epoch (losses, all 8 metrics, val, '
                             'throughput) to this path — machine-readable '
                             'observability next to the reference-format '
                             'stdout')
    parser.add_argument('--cache_device', action='store_true',
                        help='Keep ALL image windows resident in device '
                             'HBM (uploaded once; every batch becomes an '
                             'on-device gather — zero per-step image '
                             'transfer). Fits datasets up to a few GB, '
                             'e.g. the whole imSitu dev split; train '
                             'datasets require square sources (the '
                             'deterministic-window gate)')
    parser.add_argument('--cache_decoded', action='store_true',
                        help='Cache decoded images in host RAM '
                             '(~200KB/image; removes JPEG decode from the '
                             'input path after the first epoch)')
    parser.add_argument('--packed_dir', type=str, default='',
                        help='Pre-decoded packed image store '
                             '(tools/pack_dataset.py); removes JPEG decode '
                             'from the input path entirely')
    parser.add_argument('--platform', type=str, default='auto',
                        choices=['auto', 'cpu'],
                        help='JAX platform: "auto" uses the default backend '
                             '(TPU when present); "cpu" forces the CPU '
                             'backend at the config level — unlike the '
                             'JAX_PLATFORMS env var this also wins on hosts '
                             'whose site configuration pins a device plugin')
    parser.add_argument('--preproc', type=str, default='window',
                        choices=['window', 'exact'],
                        help='Eval/inference preprocessing: "window" '
                             '(default — 256 crop window + device resize) '
                             'or "exact" (reference-exact host PIL '
                             'Resize(224)+CenterCrop(224) for bit-faithful '
                             'metric-parity runs; slower host path). '
                             'Training always uses the window pipeline.')
    parser.add_argument('--distributed', action='store_true',
                        help='Multi-process (multi-host) data parallelism: '
                             'run this SAME command on every host; each '
                             'process loads only its shard of every batch '
                             'and the mesh spans all hosts '
                             '(parallel/distributed.py).  On TPU pods the '
                             'coordinator is auto-detected; elsewhere pass '
                             '--coordinator/--num_processes/--process_id.')
    parser.add_argument('--coordinator', type=str, default='',
                        help='host:port of process 0 (omit on TPU pods)')
    parser.add_argument('--num_processes', type=int, default=0,
                        help='world size (omit on TPU pods)')
    parser.add_argument('--process_id', type=int, default=-1,
                        help='this process rank (omit on TPU pods)')
    return parser


def _load_json(path):
    with open(path, 'r') as f:
        return json.load(f)


#: rough backbone parameter counts (millions) for the HBM reserve estimate
_BACKBONE_PARAMS_M = {
    'resnet18': 11, 'resnet34': 21, 'resnet50': 25, 'resnet101': 44,
    'resnet152': 60, 'mini': 1,
    'vit_l14': 303, 'vit_l14_clip': 303, 'vit_b16': 86, 'vit_tiny': 6,
}


def _working_reserve(backbone: str, hidden: int, micro_batch: int,
                     image_size: int, train_backbone: bool,
                     remat: bool = False) -> int:
    """HBM the train step needs BESIDE any --cache_device window arrays
    (params + optimizer state + peak forward activations + the pipelined
    uint8 gather outputs), scaled from the configuration instead of the
    old flagship constant (ADVICE r4: a 4.5 GB constant sized for
    resnet152@224 b768 under-reserves for ViT-L/336 or --train_backbone
    and over-reserves for small probes).  Anchored to the measured
    flagship point: resnet152@224, microbatch 768, frozen — ~4.5 GB
    total → ~4.9 MB/img of transient forward activations."""
    params_m = _BACKBONE_PARAMS_M.get(backbone, 60)
    # GGNN head: 7 hidden^2 gate/update kernels + embeddings/classifiers
    head_m = (7 * hidden * hidden + hidden * 3300) / 1e6
    # f32 params; head carries adamax mu/nu too; +0.5 GB runtime slack
    fixed = (params_m + 3 * head_m) * 4e6 + 500e6
    act_per_img = 4.9e6 * (image_size / 224.0) ** 2
    if backbone.startswith('vit'):
        act_per_img *= {'vit_tiny': 0.2, 'vit_b16': 0.6}.get(backbone, 1.2)
    if train_backbone:
        # stored backward activations: a full un-rematerialized
        # ResNet-152 backward OOM'd a 16 GB chip at microbatch 384 with
        # only 4.3 GB of caches resident (r5), so the no-remat factor is
        # deliberately harsh; --remat_backbone stores block boundaries
        # only
        act_per_img *= 2.5 if remat else 6.0
        fixed += 3 * params_m * 4e6    # backbone grads + adamax mu/nu
    gathered = 2 * micro_batch * 256 * 256 * 3   # two in-flight batches
    return int(fixed + micro_batch * act_per_img + gathered)


def _load_backbone(trainer, path: str) -> None:
    """Load backbone weights from msgpack or a torch .pth/.pt, sniffing the
    torch state-dict flavor: reference FCGGNN checkpoint, raw torchvision
    ResNet, torchvision ViT, or a CLIP visual tower."""
    from flax import serialization

    from situation_recognition_tpu.utils import torch_convert

    if path.endswith('.msgpack'):
        with open(path, 'rb') as f:
            state = serialization.msgpack_restore(f.read())
        params, stats = state['params'], state.get('batch_stats', {})
    else:
        sd = torch_convert.load_torch_file(path)
        heads = getattr(trainer.backbone, 'heads', 0)
        size = trainer.config.image_size                   # pos-embed grid
        if 'conv_proj.weight' in sd:                       # torchvision ViT
            params, stats = torch_convert.convert_vit(
                sd, heads, image_size=size), {}
        elif any(k.endswith('ln_pre.weight') for k in sd):  # CLIP visual
            params, stats = torch_convert.convert_clip_vit(
                sd, heads, image_size=size), {}
        else:
            prefix = 'convnet_nouns.model.' if any(
                k.startswith('convnet_nouns.') for k in sd) else ''
            params, stats = torch_convert.convert_resnet(sd, prefix=prefix)
    if 'pos_embed' in params:
        import numpy as np
        want = np.shape(trainer.backbone_params['pos_embed'])
        got = np.shape(params['pos_embed'])
        if tuple(want) != tuple(got):
            # from_state_dict replaces leaves without shape checks; a
            # 224-grid cache under a different --image_size would only
            # explode later as a baffling broadcast error inside the step
            raise ValueError(
                f'backbone pos_embed grid {got} does not match '
                f'--image_size {trainer.config.image_size} (expects '
                f'{want}). A cached backbone.msgpack converted at another '
                f'--image_size cannot be reused — delete it (the .pth '
                f'auto-converts per size) or pass the matching size.')
    trainer.backbone_params = serialization.from_state_dict(
        trainer.backbone_params, params)
    if stats:
        trainer.backbone_stats = serialization.from_state_dict(
            trainer.backbone_stats, stats)


def _save_backbone_msgpack(trainer, path: str) -> None:
    """Cache the trainer's (converted) backbone as the msgpack format
    ``_load_backbone`` reads — same layout tools/convert_torch.py writes."""
    import jax
    import numpy as np
    from flax import serialization

    blob = serialization.msgpack_serialize(jax.tree.map(np.asarray, {
        'params': serialization.to_state_dict(trainer.backbone_params),
        'batch_stats': serialization.to_state_dict(trainer.backbone_stats),
    }))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, path)


def _is_torch_checkpoint(path: str) -> bool:
    """Sniff the on-disk format by content: torch.save writes either a zip
    archive ('PK\\x03\\x04') or a legacy pickle stream ('\\x80<proto>');
    our checkpoints are msgpack (map header byte)."""
    with open(path, 'rb') as f:
        magic = f.read(4)
    return magic.startswith(b'PK') or magic[:1] == b'\x80'


def _load_resume(trainer, path: str):
    """Load a resume checkpoint (ours or an original torch one); returns the
    checkpoint dict consumed by fit() (epoch + histories + model state).

    The format is detected by file content, not by trial and error — a
    corrupt msgpack checkpoint raises its real error instead of surfacing
    as a baffling torch unpickling failure."""
    from situation_recognition_tpu.utils import torch_convert
    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    if not _is_torch_checkpoint(path):
        ckpt = load_checkpoint(path)
        trainer.load_model_state(ckpt)
        return ckpt

    # torch checkpoint (e.g. the published resnet152_sr): convert weights,
    # Adamax optimizer state (exp_avg/exp_inf/step → mu/nu/count — the
    # continued trajectory matches torch's, sr.py:34-37,472-473) and carry
    # over epoch + metric histories like the reference resume (sr.py:28-41)
    import numpy as np
    from flax import serialization

    raw = torch_convert.load_torch_pickle(path)
    sd = torch_convert.state_dict_numpy(raw["model_state_dict"])
    bparams, bstats, head = torch_convert.convert_reference_checkpoint(sd)
    opt_state = None
    osd = raw.get("optimizer_state_dict") or {}
    if osd.get("param_groups") and osd.get("state"):
        mu, nu, count = torch_convert.convert_adamax_state(osd, list(sd))
        opt_state = torch_convert.fill_adamax_opt_state(
            serialization.to_state_dict(trainer.opt_state), mu, nu, count)
    else:
        print('[srtpu] torch checkpoint has no optimizer state; '
              'starting with a fresh Adamax state', file=sys.stderr)
    ckpt = {
        "epoch": int(raw.get("epoch", 0)),
        "backbone_params": bparams,
        "backbone_stats": bstats,
        "head_params": head,
        "opt_state": opt_state,
    }
    for k in ("avg_scores", "verb_losses", "nouns_losses",
              "val_avg_scores", "val_verb_losses", "val_nouns_losses"):
        ckpt[k] = [float(x) for x in raw.get(k, [])]
    trainer.load_model_state(ckpt)
    return ckpt


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.cache_device and args.cache_decoded:
        # the dataset enforces the same exclusivity; reject it as a usage
        # error up front instead of a ValueError traceback mid-startup
        parser.error('--cache_device and --cache_decoded are alternatives; '
                     'pick one')
    if args.packed_dir and args.cache_decoded:
        parser.error('--packed_dir already removes decode from the input '
                     'path; --cache_decoded would be silently ignored')
    if args.packed_dir and args.preproc == 'exact':
        # same early-rejection rule (the dataset also refuses): the pack is
        # short-side-normalized, and resampling it again to 224 breaks the
        # reference-exact pixel parity the mode exists for
        parser.error('--preproc exact needs original pixels; --packed_dir '
                     'stores short-side-normalized images (double-resample '
                     'breaks reference-exact parity)')
    if args.preproc == 'exact' and args.image_size != 224:
        # exact mode IS the reference's literal 224 pipeline; any other
        # size has no reference transform to be exact against
        parser.error('--preproc exact is the reference\'s literal '
                     'Resize(224)+CenterCrop(224) pipeline; it cannot '
                     f'combine with --image_size {args.image_size}')
    if args.backbone_lr is not None and not args.train_backbone:
        parser.error('--backbone_lr needs --train_backbone (the frozen '
                     'backbone takes no optimizer steps)')
    if args.remat_backbone and not args.train_backbone:
        parser.error('--remat_backbone needs --train_backbone (a frozen '
                     'backbone stores no backward activations)')
    if args.lr_schedule == 'constant':
        if args.total_steps is not None:
            parser.error('--total_steps is the cosine/linear decay '
                         'horizon; it has no meaning with '
                         '--lr_schedule constant')
        if args.min_lr:
            parser.error('--min_lr is the cosine/linear decay floor; it '
                         'has no meaning with --lr_schedule constant')
    else:
        if args.total_steps is None:
            parser.error(f'--lr_schedule {args.lr_schedule} needs '
                         '--total_steps (the decay horizon in optimizer '
                         'steps)')
        if args.total_steps <= args.warmup_steps:
            parser.error(f'--total_steps ({args.total_steps}) must exceed '
                         f'--warmup_steps ({args.warmup_steps})')
    if args.warmup_steps < 0:
        parser.error('--warmup_steps must be >= 0')
    if args.min_lr < 0 or args.min_lr > args.lr:
        parser.error(f'--min_lr must be in [0, --lr={args.lr}]')

    # seed the stdlib RNG too (--subset samples via random.randrange like
    # the reference, sr.py:294-295; seeding makes the mode reproducible
    # and golden-testable — additive, the reference leaves it unseeded)
    import random
    random.seed(args.seed)

    import jax

    if args.platform == 'cpu':
        # must precede any device use; a config-level update beats both the
        # JAX_PLATFORMS env var and site-installed plugin pins
        jax.config.update('jax_platforms', 'cpu')

    shard = None
    if args.distributed:
        if args.test_img or args.subset > 0:
            parser.error('--distributed applies to the batch-iterated '
                         'modes (train / evaluate_dev / evaluate_test); '
                         'single-image inference runs on one process')
        if args.cache_device:
            parser.error('--distributed does not compose with '
                         '--cache_device (single-process HBM-resident '
                         'batching)')
        from situation_recognition_tpu.parallel.distributed import (
            init_distributed)

        # must precede the first device use below (backend creation binds
        # the process to the world)
        init_distributed(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)
        shard = (jax.process_index(), jax.process_count())
        if shard[0] != 0:
            # one host speaks: the reference-format stdout comes from
            # process 0 only (all processes compute identical metrics);
            # stderr stays live everywhere for crash diagnostics
            sys.stdout = open(os.devnull, 'w')
    import jax.numpy as jnp

    from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
    from situation_recognition_tpu.data.encoder import ImsituEncoder
    from situation_recognition_tpu.inference import analize_subset, results
    from situation_recognition_tpu.train import Trainer, TrainerConfig

    Path(args.saving_folder).mkdir(exist_ok=True)
    checkpoint = None

    # persistent XLA compilation cache: the jitted train/eval/infer steps
    # cost ~20-40 s to compile on TPU; caching makes repeat CLI invocations
    # (evaluate, test_img, subset, resume) start in seconds.  An explicit
    # JAX_COMPILATION_CACHE_DIR env var wins over the default location.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(args.saving_folder) / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)  # cache the ~270 tiny init jits too:
        # each is a ~0.5 s REMOTE compile round-trip on the axon
        # tunnel (~2 min of every bench/CLI start measured r4);
        # sub-second entries are a few KB each and cut that to
        # local cache loads

    # encoder json is always train.json (reference behavior, sr.py:429-430)
    encoder_json = _load_json(pjoin(args.dataset_folder, 'train.json'))
    train_json = (encoder_json if args.train_file == 'train.json'
                  else _load_json(pjoin(args.dataset_folder, args.train_file)))
    dev_json = _load_json(pjoin(args.dataset_folder, args.dev_file))
    test_json = _load_json(pjoin(args.dataset_folder, args.test_file))

    # multi-process runs: only process 0 writes shared-filesystem caches
    # (encoder, backbone.msgpack) — concurrent unguarded writes to the
    # same path corrupt them; other ranks rebuild in memory instead
    is_main = shard is None or shard[0] == 0

    encoder_path = pjoin(args.saving_folder, 'encoder')
    if not pisfile(encoder_path):
        encoder = ImsituEncoder(encoder_json)
        if is_main:
            encoder.save(encoder_path)
    else:
        print("Loading encoder file")
        if _is_torch_checkpoint(encoder_path):
            # a reference-written pickle at the same path (sr.py:444-447):
            # its class isn't importable here, and the vocab is pure
            # derived data — rebuild from train.json (identical contents,
            # insertion-order semantics preserved); leave the user's file
            # untouched
            print('[srtpu] encoder file is a reference torch pickle; '
                  'rebuilding the (identical) vocab from train.json',
                  file=sys.stderr)
            encoder = ImsituEncoder(encoder_json, verbose=False)
        else:
            encoder = ImsituEncoder.load(encoder_path)

    on_tpu = jax.default_backend() == 'tpu'
    if args.precision == 'bf16' or (args.precision == 'auto' and on_tpu):
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32
    n_dev = jax.device_count()
    if on_tpu:
        print('Using', n_dev, 'TPU chips!')

    batch = args.batch_size
    ndata = max(1, n_dev // args.model_axis)
    accum = max(1, args.grad_accum)
    # loaders/steps run at the MICRObatch; the optimizer batch is
    # micro * accum (== --batch_size up to rounding).  In a multi-process
    # world each microbatch must also split evenly across processes
    # (model groups never span processes — make_distributed_mesh rejects
    # that — so world | ndata holds; the lcm is belt-and-braces)
    import math

    world = shard[1] if shard is not None else 1
    quantum = math.lcm(ndata, world) * accum
    if batch % quantum != 0:
        batch = ((batch + quantum - 1) // quantum) * quantum
        print(f'[srtpu] batch_size rounded up to {batch} '
              f'(divisible by data axis {ndata} x grad_accum {accum}'
              + (f' x world {world}' if world > 1 else '') + ')',
              file=sys.stderr)
    batch //= accum

    # Build ONLY the splits the selected mode touches: dataset
    # construction pre-encodes every annotation (seconds over real imSitu's
    # ~125k records), and --cache_device additionally decodes + uploads the
    # whole split to HBM — the TRAIN split's square-source gate would
    # otherwise reject `--cache_device --evaluate_dev` on real imSitu (the
    # flag's primary use case) before the dev loader even exists.
    if args.evaluate_dev:
        need = {'dev'}
    elif args.evaluate_test:
        need = {'test'}
    elif args.test_img:
        need = set()               # per-image path, no dataset iteration
    elif args.subset > 0:
        need = {'dev'}             # analize_subset indexes dev per image
    else:
        need = {'train', 'dev'}    # fit + its per-epoch dev eval

    # batch-iterated splits get the HBM window cache; --subset only
    # indexes per image, so caching would upload a split it never batches
    device_cached = need if not (args.test_img or args.subset > 0) else set()

    # --cache_device HBM budget (r4, sized for the full-scale rehearsal):
    # caching a split is an OPTIMIZATION, not a semantic — when the
    # window array would leave the device less than the working headroom
    # the train step needs (activations at the microbatch, the gathered
    # uint8 batch, params + adamax state), fall back to streamed batches
    # for that split instead of OOMing an hour into a run.  Splits are
    # prepared train-first, so the train split gets first claim on HBM.
    # SRTPU_HBM_BYTES overrides the probed/assumed device capacity.
    _hbm_free = None
    if args.cache_device:
        from situation_recognition_tpu.train import default_hidden as _dh

        _reserve = _working_reserve(
            args.backbone, _dh(args.backbone), batch, args.image_size,
            args.train_backbone, remat=args.remat_backbone)
        if os.environ.get('SRTPU_HBM_BYTES'):
            _hbm_free = int(os.environ['SRTPU_HBM_BYTES'])
        else:
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                _hbm_free = (stats.get('bytes_limit', 0)
                             - stats.get('bytes_in_use', 0))
            except Exception:           # noqa: BLE001 — stats are optional
                _hbm_free = None
            if not _hbm_free or _hbm_free <= 0:
                _hbm_free = 16_000_000_000
        _hbm_free -= _reserve

    def _prepare(dataset, split):
        nonlocal _hbm_free
        if args.packed_dir:
            dataset.enable_packed(args.packed_dir)
        elif args.cache_decoded:
            dataset.enable_decode_cache()
        if args.cache_device and split in device_cached:
            S = dataset.window_size
            row_bytes = S * S * 3
            need_bytes = len(dataset.names) * row_bytes
            if need_bytes <= _hbm_free:
                dataset.enable_window_cache()
                _hbm_free -= need_bytes
            else:
                # partial-prefix cache for EVAL splits (unshuffled, so a
                # cached fraction f removes ~f of the streamed bytes;
                # shuffled train batches would mix cached/uncached rows
                # and defeat it — VERDICT r4 #4).  Require at least one
                # full batch's worth to bother.
                rows = int(_hbm_free // row_bytes)
                if split != 'train' and rows >= batch:
                    dataset.enable_window_cache(max_rows=rows)
                    _hbm_free -= rows * row_bytes
                    print(f'[srtpu] --cache_device: {split} split '
                          f'({need_bytes/1e9:.1f} GB of windows) exceeds '
                          f'the remaining HBM budget — caching the first '
                          f'{rows}/{len(dataset.names)} rows '
                          f'({rows*row_bytes/1e9:.1f} GB) and streaming '
                          f'the rest', file=sys.stderr)
                else:
                    print(f'[srtpu] --cache_device: {split} split '
                          f'({need_bytes/1e9:.1f} GB of windows) exceeds '
                          f'the remaining HBM budget ({_hbm_free/1e9:.1f} '
                          f'GB after working-set reserve) — streaming it '
                          f'instead', file=sys.stderr)
        return dataset

    # loaders use the ROUNDED batch: built at args.batch_size they would
    # deliver a short batch every step, making _pad_batch wrap duplicate
    # rows into every step (wasted compute + skewed train-mode BN stats)
    # instead of only the final partial batch
    train_loader = dev_set = dev_loader = test_loader = None
    if 'train' in need:
        train_set = _prepare(
            ImsituDataset(args.imgset_dir, train_json, encoder, train=True),
            'train')
        train_loader = ImsituLoader(train_set, batch_size=batch,
                                    shuffle=True, seed=args.seed,
                                    num_workers=args.num_workers,
                                    shard=shard)
    if 'dev' in need:
        dev_set = _prepare(
            ImsituDataset(args.imgset_dir, dev_json, encoder, train=False,
                          preproc=args.preproc), 'dev')
        dev_loader = ImsituLoader(dev_set, batch_size=batch,
                                  shuffle=False,
                                  num_workers=args.num_workers,
                                  shard=shard)
    if 'test' in need:
        test_set = _prepare(
            ImsituDataset(args.imgset_dir, test_json, encoder, train=False,
                          preproc=args.preproc), 'test')
        test_loader = ImsituLoader(test_set, batch_size=batch,
                                   shuffle=True, seed=args.seed,
                                   num_workers=args.num_workers,  # ref quirk
                                   shard=shard)

    from situation_recognition_tpu.train import default_hidden
    hidden = default_hidden(args.backbone)
    cfg = TrainerConfig(
        hidden=hidden, lr=args.lr, batch_size=batch, epochs=args.epochs,
        backbone=args.backbone, compute_dtype=dtype, seed=args.seed,
        image_size=args.image_size,
        model_axis=args.model_axis, ggnn_impl=args.ggnn,
        frozen_backbone_bn=args.frozen_bn, grad_accum=accum,
        train_backbone=args.train_backbone,
        backbone_lr=args.backbone_lr,
        remat_backbone=args.remat_backbone,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        total_steps=args.total_steps, min_lr=args.min_lr)
    mesh = None
    if shard is not None:
        from situation_recognition_tpu.parallel.distributed import (
            make_distributed_mesh)

        mesh = make_distributed_mesh(model=args.model_axis)
    trainer = Trainer(encoder, cfg, mesh=mesh)

    if args.backbone_ckpt:
        _load_backbone(trainer, args.backbone_ckpt)
    else:
        # Pretrained-backbone bootstrap (reference behavior: torchvision
        # `pretrained=True`, model.py:16 — always starts from pretrained
        # features).  Zero-egress equivalent: pick up a user-dropped
        # checkpoint at <saving_folder>/backbone.{msgpack,pth,pt} — a raw
        # torchvision resnet152 .pth is auto-converted on first load and
        # cached as backbone.msgpack so later runs skip the conversion.
        # converted caches are per-resolution (the ViT pos-embed grid is
        # baked in at conversion); 224 keeps the historical unsuffixed name
        cache_name = ('backbone.msgpack' if args.image_size == 224
                      else f'backbone_{args.image_size}.msgpack')
        default_bb = next(
            (p for p in ([pjoin(args.saving_folder, cache_name)]
                         + [pjoin(args.saving_folder, 'backbone' + ext)
                            for ext in ('.pth', '.pt')])
             if pisfile(p)), None)
        if default_bb is not None:
            _load_backbone(trainer, default_bb)
            if not default_bb.endswith('.msgpack') and is_main:
                cache = pjoin(args.saving_folder, cache_name)
                _save_backbone_msgpack(trainer, cache)
                print(f'[srtpu] converted {default_bb} -> {cache} '
                      '(picked up automatically next run)', file=sys.stderr)
        elif len(args.resume_model) <= 1:   # same gate as the resume below
            # stderr: stdout stays byte-compatible with reference transcripts
            print('[srtpu] no pretrained backbone found (drop a torchvision '
                  f'.pth at {pjoin(args.saving_folder, "backbone.pth")}, or '
                  'use --backbone_ckpt / tools/convert_torch.py); '
                  'training from random backbone weights', file=sys.stderr)

    if len(args.resume_model) > 1:
        print('Resume training from: {}'.format(args.resume_model))
        checkpoint = _load_resume(
            trainer, pjoin(args.saving_folder, args.resume_model))
        args.model_saving_name = args.resume_model

    if args.evaluate_dev:
        print('=> evaluating model with dev-set...')
        trainer.evaluate(dev_loader, logging=True)
    elif args.evaluate_test:
        print('=> evaluating model with test-set...')
        trainer.evaluate(test_loader, logging=True)
    elif args.test_img:
        verb, verb_prob, labels, labels_prob = results(
            trainer, args.test_img, encoder, args.verb,
            preproc=args.preproc)
        print('&' * 50)
        print('Analizing: ', args.test_img)
        from PIL import Image
        try:
            from IPython.display import display
        except Exception:  # pragma: no cover
            display = print
        pil_im = Image.open(args.test_img, 'r')
        display(pil_im)
        print('&' * 50)

        print('action ({:.2f}%): {}'.format(verb_prob, verb))
        c = 0
        for k, v in labels.items():
            print('{} ({:.2f}%): {}'.format(k, labels_prob[c], v))
            c += 1
    elif args.subset > 0:
        analize_subset(trainer, dev_set, encoder, args.subset)
    else:
        print('Model training started!')
        # _load_resume already restored the model/optimizer state; pass fit
        # only the bookkeeping (epoch, histories, mid) so it is not
        # restored a second time (the reference double-loads, sr.py:486 +
        # :28-41 — dead behavior we do not replicate, DIVERGENCES #8)
        fit_ckpt = None
        if checkpoint is not None:
            fit_ckpt = {k: v for k, v in checkpoint.items()
                        if k not in ('head_params', 'backbone_params',
                                     'backbone_stats', 'opt_state')}
        trainer.fit(train_loader, dev_loader, args.model_saving_name,
                    folder=args.saving_folder, checkpoint=fit_ckpt,
                    save_every_steps=args.save_steps or None,
                    # preemption-safe: SIGTERM (scheduler eviction /
                    # TPU-VM maintenance) → one resumable snapshot at the
                    # next step boundary, then clean exit 0
                    handle_sigterm=True,
                    keep_best=args.keep_best,
                    metrics_jsonl=args.metrics_jsonl or None,
                    async_save=args.async_save)


if __name__ == '__main__':
    main()
