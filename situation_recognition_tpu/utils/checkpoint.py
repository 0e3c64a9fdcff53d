"""Checkpoint save/load (msgpack, not pickle).

Logical content mirrors the reference checkpoint dict
(``/root/reference/sr.py:145-162``): epoch, the six metric/loss history
lists, model state (backbone params + BN running stats + head params) and
optimizer state.  Written atomically (tmp + rename) every epoch, overwriting,
like the reference.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    # to_state_dict flattens tuples/namedtuples (e.g. optax states) into
    # msgpack-serializable dicts; from_state_dict restores them on load
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy(state)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
