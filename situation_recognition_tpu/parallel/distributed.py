"""Multi-process (multi-host) data-parallel training.

Scales the single-process design (``parallel/mesh.py`` — the TPU-native
replacement for the reference's ``nn.DataParallel``, sr.py:467-470) to
multi-host pods: each host process runs the SAME program over a mesh that
spans every process's devices, loads only ITS shard of every global batch
(``ImsituLoader(shard=(rank, world))``), and assembles global device
arrays with ``jax.make_array_from_process_local_data``.  XLA emits the
cross-host collectives (gradient all-reduce over ICI/DCN) exactly as it
does single-process — no NCCL/MPI analog, no torch.distributed analog;
the program text does not change.

No-cluster story (mirrors the virtual-8-device CPU mesh tests): two local
processes with ``jax_platforms='cpu'`` + ``--xla_force_host_platform_
device_count=N`` and gloo CPU collectives form a real 2-process world —
``tests/test_distributed.py`` runs lockstep training against the
single-process 8-device baseline and asserts loss equality.

Semantics under multi-process DP (all tested single- vs multi-process):
* global batches are BIT-IDENTICAL to single-process runs — the sharded
  loader wraps the final partial batch at the INDEX level before
  slicing its block, and augmentation streams are keyed by
  (seed, epoch, dataset-index), so every row (pixels, crop, flip) equals
  the row a single-process run builds;
* losses/metrics are computed from global arrays inside jit (masked
  means reduce globally); scalar outputs are replicated, so every
  process sees identical losses;
* scoring needs the batch-sharded top-k outputs on the host:
  :func:`fetch` gathers them (``multihost_utils.process_allgather``)
  so every process scores the full batch identically — prints and
  checkpoint writes then happen on process 0 only.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join (or bootstrap) the multi-process world.

    Thin wrapper over ``jax.distributed.initialize``: on TPU pods all
    three arguments come from the environment automatically (pass
    nothing); for the no-cluster CPU world pass all three explicitly.
    No-op if the distributed client already exists (idempotent — the CLI
    and tests can both call it)."""
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return
    # CPU multi-process worlds need gloo collectives; the setting is only
    # consulted by the CPU client, so it is harmless on TPU pods (whose
    # collectives ride ICI/DCN)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_distributed_mesh(model: int = 1,
                          devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh over ALL processes' devices, ordered
    process-major.

    The explicit (process_index, id) sort guarantees every process's
    devices are CONTIGUOUS along the data axis, which is the layout
    ``jax.make_array_from_process_local_data`` and the sharded loader's
    contiguous-block slicing assume.  (``mesh_utils.create_device_mesh``
    also keeps hosts contiguous on real TPU slices, but its layout is a
    topology heuristic, not a contract — training correctness should not
    hang off it.)"""
    if devices is None:
        devices = jax.devices()
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    arr = np.asarray(devices).reshape(n // model, model)
    if model > 1:
        # a model group spanning two processes breaks the contiguous
        # per-process data-block layout the sharded loader assumes (and
        # would route the classifier partial-sum all-reduce over DCN);
        # reject instead of producing shape errors deep inside
        # make_array_from_process_local_data
        for row in arr:
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                raise ValueError(
                    f"model_axis={model} does not divide the per-process "
                    f"device count — a model group would span processes "
                    f"{sorted(procs)}; use a model_axis that divides "
                    f"jax.local_device_count()")
    return Mesh(arr, ("data", "model"))


def fetch(x) -> np.ndarray:
    """Device array → full host numpy value on EVERY process.

    Fully-addressable arrays (single-process) and fully-replicated global
    arrays (loss scalars, params) are a plain ``np.asarray``;
    batch-sharded arrays in a multi-process world are all-gathered
    (``process_allgather(..., tiled=True)`` — concatenate along the
    sharded leading axis, not stack)."""
    if (not isinstance(x, jax.Array) or x.is_fully_addressable
            or x.is_fully_replicated):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
