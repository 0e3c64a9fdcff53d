"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's ``nn.DataParallel``
(``/root/reference/sr.py:467-470``): instead of per-step parameter broadcast +
input scatter + output gather through ``torch.cuda.comm``/NCCL, we lay out a
2-D ``Mesh(('data', 'model'))`` over ICI and let ``jit`` emit XLA collectives:

* batch arrays shard dim 0 over ``data`` (gradient all-reduce over ICI);
* parameters are replicated, except the two wide classifier kernels
  (2048 x 504 and 2048 x 2001) which shard their INPUT (contraction) dim
  over ``model`` when the mesh has a model axis — P('model', None), chosen
  precisely because 2048 divides any practical axis size while 504/2001 do
  not (see ``head_param_sharding``).  Tensor parallelism is optional — the
  model is small enough that pure DP is usually optimal; the axis exists
  to exercise and validate 2-D shardings.

The reference's only strategy is DP (SURVEY §2c); TP here is a strict
superset, and PP/SP/EP are deliberately not built (nothing to pipeline or
sequence-shard in a ≤6-node role graph).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh by default; pass ``model>1`` for a 2-D (data, model)
    mesh.  ``num_devices`` defaults to all visible devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            # silently running on fewer devices would double the per-device
            # batch relative to the caller's sizing math with no error
            raise ValueError(f"requested {num_devices} devices but only "
                             f"{len(devices)} are visible")
        devices = devices[:num_devices]
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    shape = (n // model, model)
    try:
        # topology-aware assignment: on multi-dim TPU slices the flat
        # jax.devices() order can place a model group on non-adjacent
        # chips, sending the classifier partial-sum all-reduce over slower
        # links; mesh_utils picks a physical-neighbor layout
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=list(devices))
    except Exception:  # non-TPU backends / exotic shapes: order is moot
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def head_param_sharding(mesh: Mesh, params) -> dict:
    """Sharding tree for the FCGGNN head params: classifier kernels shard
    their contraction (input) dim over ``model`` — XLA emits the partial-sum
    all-reduce — which avoids any divisibility constraint on the 504/2001
    output dims; everything else replicated."""

    def spec_for(path) -> P:
        keys = [getattr(p, "key", str(p)) for p in path]
        if "verb_classifier" in keys or "nouns_classifier" in keys:
            if keys[-1] == "kernel":
                return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, spec_for(path)), params)
