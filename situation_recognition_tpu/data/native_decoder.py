"""ctypes bindings for the native batch decoder (data/native/decoder.cpp).

``decode_window_batch`` decodes a list of JPEG paths into a
(B, 256, 256, 3) uint8 window batch with one C call (GIL released for the
whole batch; internal thread pool).  Failed decodes (non-JPEG, corrupt) are
reported per-image so the caller can fall back to the PIL path.

Augmentation determinism: the native path draws crop offsets and flip bits
from a splitmix64 stream keyed by (seed, epoch, index) — deterministic, but
a different stream than the Python loader's numpy PCG64 (documented
divergence; each loader is individually reproducible).
"""

from __future__ import annotations

import os
import ctypes
from typing import Sequence, Tuple

import numpy as np

_lib = None


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from situation_recognition_tpu.data.native.build import ensure_built

    path = ensure_built()
    lib = ctypes.CDLL(path)
    lib.srtpu_decode_window_batch.restype = ctypes.c_int
    lib.srtpu_decode_window_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,                     # n
        ctypes.c_int,                     # train
        ctypes.c_uint64,                  # seed
        ctypes.c_uint64,                  # epoch
        ctypes.POINTER(ctypes.c_int64),   # indices
        ctypes.POINTER(ctypes.c_uint8),   # out
        ctypes.POINTER(ctypes.c_uint8),   # flips
        ctypes.POINTER(ctypes.c_uint8),   # failed
        ctypes.c_int,                     # num_threads
    ]
    _lib = lib
    return lib


def decode_window_batch(
    paths: Sequence[str],
    train: bool,
    seed: int,
    epoch: int,
    indices: Sequence[int],
    num_threads: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (images (B,256,256,3) u8, flips (B,) bool, failed (B,) bool)."""
    lib = _load()
    n = len(paths)
    if len(indices) != n:
        # the C worker reads indices[i] for every path — a short buffer
        # would be an out-of-bounds read (garbage RNG draws or a segfault)
        raise ValueError(
            f"decode_window_batch: {n} paths but {len(indices)} indices")
    images = np.empty((n, 256, 256, 3), dtype=np.uint8)
    flips = np.zeros((n,), dtype=np.uint8)
    failed = np.zeros((n,), dtype=np.uint8)
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.int64))
    # os.fsencode, not str.encode: filenames are not guaranteed UTF-8
    # (os.listdir surrogateescapes them) and one bad name must not abort
    # the whole batch before the C call
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.srtpu_decode_window_batch(
        c_paths, n, int(train), seed & (2**64 - 1), epoch & (2**64 - 1),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        failed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads)
    return images, flips.astype(bool), failed.astype(bool)
