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
        # rename alone is atomic against READERS but not crash-durable:
        # without the fsync a power loss can commit the rename before the
        # data blocks, and since the save OVERWRITES the single checkpoint
        # every epoch, the previous good one would be gone too
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


HISTORY_KEYS = ("avg_scores", "verb_losses", "nouns_losses",
                "val_avg_scores", "val_verb_losses", "val_nouns_losses")


def history_list(x) -> list:
    """flax to_state_dict serializes lists as {'0': v0, '1': v1, ...};
    restore the list (ordered by integer key)."""
    if isinstance(x, dict):
        return [float(x[k]) for k in sorted(x, key=int)]
    return [float(v) for v in x]


def restore_tolerant(target, state, prefix: str = "") -> Any:
    """Name-matched parameter copy (reference ``utils.load_net``,
    utils/utils.py:5-31): leaves present in ``state`` (with matching shape)
    replace the target's; absent keys keep the target value and print
    ``[Missed]: <path> <shape>``; shape mismatches print ``[Mismatch]`` and
    keep the target.  Works on nested dict trees."""
    if not isinstance(target, dict):
        t = np.asarray(target)
        s = np.asarray(state)
        if s.shape != t.shape:
            print(f"[Mismatch]: {prefix} {t.shape} vs {s.shape}")
            return target
        return s.astype(t.dtype) if s.dtype != t.dtype else s
    out = {}
    state = state if isinstance(state, dict) else {}
    for k, v in target.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if k in state:
            out[k] = restore_tolerant(v, state[k], path)
        else:
            shape = getattr(v, "shape", None)
            print(f"[Missed]: {path}", tuple(shape) if shape is not None else "")
            out[k] = v
    return out


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    for k in HISTORY_KEYS:
        if k in state:
            state[k] = history_list(state[k])
    # canonicalize the mid-epoch accumulator subtree: to_state_dict turned
    # its lists into {'0': v0, ...} dicts, and the counters must be ints
    # (train_epoch does np.asarray(loss_sums) and int() on the counters)
    mid = state.get("mid")
    if isinstance(mid, dict):
        if "loss_sums" in mid:
            mid["loss_sums"] = history_list(mid["loss_sums"])
        for k in ("batch_in_epoch", "step_count", "num_batches"):
            if k in mid:
                mid[k] = int(mid[k])
    return state
