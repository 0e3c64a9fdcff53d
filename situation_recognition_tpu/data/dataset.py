"""imSitu dataset + prefetching host loader.

Replaces the reference's ``torch.utils.data.Dataset``/``DataLoader`` stack
(``/root/reference/utils/imsitu_loader.py``, ``sr.py:450-463``).  Differences
by design:

* Annotations are encoded **once** at construction into dense arrays
  (verbs (N,), labels (N, 3, R)) — the reference re-runs ``encoder.encode``
  per ``__getitem__`` every epoch.
* Workers are threads (PIL decode releases the GIL) feeding a bounded queue;
  batches are whole uint8 arrays ready for a single ``device_put``, not
  per-image tensors gathered by pinned-memory copies.
* Augmentation randomness is deterministic: crop offsets and flip bits come
  from ``np.random.Generator`` seeded with (seed, epoch, index).
* The device-side part of preprocessing (resize/flip/normalize) happens
  inside the jitted step — see ``transforms.device_transform``.

A batch is a dict: ``names`` list[str], ``images`` (B, 256, 256, 3) uint8,
``verbs`` (B,) int32, ``labels`` (B, 3, R) int32, ``flip`` (B,) bool.
The final partial batch is yielded at its true size (padding/masking is the
training loop's concern, keeping metric parity exact).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.data.transforms import (
    CROP, WINDOW, host_window, host_window_exact, normalize_short_side)


def _decode_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


class ImsituDataset:
    """Decoded-on-demand imSitu dataset with pre-encoded annotations."""

    def __init__(self, img_dir: str, annotations: Dict[str, dict],
                 encoder: ImsituEncoder, train: bool,
                 preproc: str = "window"):
        """``preproc``: 'window' (default — 256² host window + device
        resize) or 'exact' (eval only — reference-exact host
        Resize(224)+CenterCrop(224), ``transforms.host_window_exact``;
        the device resize is then an identity passthrough)."""
        if preproc not in ("window", "exact"):
            raise ValueError(f"unknown preproc {preproc!r}")
        if preproc == "exact" and train:
            raise ValueError(
                "preproc='exact' is an eval/inference parity mode; the "
                "train path keeps the device-resident window pipeline "
                "(random crops are stochastic either way)")
        self.img_dir = img_dir
        self.encoder = encoder
        self.train = train
        self.preproc = preproc
        #: host-window side length batches are allocated at
        self.window_size = CROP if preproc == "exact" else WINDOW
        self.names: List[str] = list(annotations.keys())
        n = len(self.names)
        self.verbs = np.zeros((n,), dtype=np.int32)
        self.labels = np.zeros((n, ImsituEncoder.NUM_FRAMES,
                                encoder.max_role_count), dtype=np.int32)
        for i, name in enumerate(self.names):
            v, l = encoder.encode(annotations[name])
            if l.shape[0] != ImsituEncoder.NUM_FRAMES:
                # the imSitu schema has exactly 3 annotator frames; the
                # reference crashes later (in collate) on anything else —
                # fail at construction with the offending image named
                raise ValueError(
                    f"{name!r} has {l.shape[0]} annotation frames, "
                    f"expected {ImsituEncoder.NUM_FRAMES}")
            self.verbs[i] = v
            self.labels[i] = l
        self._decoded_cache: Optional[dict] = None

    def __len__(self) -> int:
        return len(self.names)

    def enable_decode_cache(self) -> None:
        """Cache decoded uint8 images in host RAM (bench / small datasets)."""
        self._decoded_cache = {}

    def enable_packed(self, packed_dir: str) -> None:
        """Serve images from a pre-decoded packed store
        (``tools/pack_dataset.py``: ``images.bin`` flat uint8 memmap +
        ``index.json`` {name: [offset, h, w]}).  Removes JPEG decode from
        the input path entirely — reads are memmap slices at page-cache /
        NVMe speed — while keeping the exact live-path pixel values
        (the pack pre-applies ``normalize_short_side``)."""
        import json

        if self.preproc == "exact":
            # the pack is pre-resized to short-side 256; host_window_exact
            # would then resize AGAIN to 224, chaining two bilinear
            # resamples where the reference resizes the original once —
            # silently breaking the mode's whole purpose (bit-faithful
            # metric parity).  Exact mode must read original pixels.
            raise ValueError(
                "preproc='exact' cannot run from a packed store (already "
                "short-side-normalized; double-resample breaks "
                "reference-exact parity) — use the live image path")

        with open(os.path.join(packed_dir, "index.json")) as f:
            self._packed_index = json.load(f)
        missing = [n for n in self.names if n not in self._packed_index]
        if missing:
            raise ValueError(
                f"packed store {packed_dir} missing {len(missing)} images "
                f"(first: {missing[:3]}); re-run tools/pack_dataset.py")
        self._packed = np.memmap(os.path.join(packed_dir, "images.bin"),
                                 dtype=np.uint8, mode="r")
        end = max((off + h * w * 3
                   for off, h, w in self._packed_index.values()), default=0)
        if end > self._packed.size:
            raise ValueError(
                f"packed store {packed_dir} is truncated/stale: index needs "
                f"{end} bytes, images.bin has {self._packed.size}; re-run "
                f"tools/pack_dataset.py")

    @property
    def packed(self) -> bool:
        return getattr(self, "_packed", None) is not None

    def enable_window_cache(self, max_rows: Optional[int] = None) -> None:
        """Precompute every host window once and mark the dataset for
        DEVICE-resident batching (``--cache_device``): the trainer uploads
        the whole (N, S, S, 3) uint8 window array to HBM once and builds
        each batch as an on-device gather, eliminating the per-batch
        host→device image transfer entirely — zero input-pipeline cost
        for any dataset that fits device memory (the full 25k-image
        imSitu dev split is ~4.9 GB — comfortably HBM-resident on one
        chip; the reference re-ships every batch every epoch).

        Windows must be deterministic so the cache cannot freeze
        augmentation: eval/exact windows are deterministic by definition;
        a TRAIN dataset is accepted only when every image is exactly
        WINDOW² after short-side normalization (the random crop then has
        a single possible offset — true for square sources; the standard
        ``resized_256`` imSitu layout keeps long sides > 256, so real
        imSitu training should keep the host path).  The random horizontal
        flip stays live either way — flip bits are per-(seed, epoch,
        example) host draws applied device-side inside the jitted step.
        """
        if self._decoded_cache is not None:
            raise ValueError("enable_window_cache and enable_decode_cache "
                             "are alternatives; pick one")
        # PARTIAL-PREFIX mode (max_rows — VERDICT r4 #4): only rows
        # [0, max_rows) are cached; the loader serves batches made
        # entirely of cached rows as on-device gathers and falls back to
        # pixel batches for the rest.  For an UNSHUFFLED eval split the
        # row order is the batch order, so a partial cache of fraction f
        # removes ~f of the split's host->device bytes (only the one
        # boundary batch mixes).  Shuffled (train) loaders mix cached
        # and uncached rows in nearly every batch, so partial caching is
        # an eval-split tool — the CLI only applies it to dev/test.
        rows = len(self.names) if max_rows is None \
            else max(0, min(int(max_rows), len(self.names)))
        S = self.window_size
        cache = np.empty((rows, S, S, 3), dtype=np.uint8)
        for i in range(rows):
            if self.train:
                img = normalize_short_side(self.load_image(i))
                if img.shape[:2] != (S, S):
                    raise ValueError(
                        f"device window cache on a TRAIN dataset requires "
                        f"square {S}x{S} sources (deterministic crop); "
                        f"{self.names[i]!r} is {img.shape[:2]} — use "
                        f"--cache_decoded / --packed_dir instead")
                cache[i] = img
            else:
                cache[i] = self.load_window(i, None)
        self._window_cache = cache
        #: rows [0, window_cache_rows) are servable as device gathers
        self.window_cache_rows = rows

    @property
    def window_cached(self) -> bool:
        return getattr(self, "_window_cache", None) is not None

    def load_image(self, idx: int) -> np.ndarray:
        if self.packed:
            off, h, w = self._packed_index[self.names[idx]]
            return self._packed[off:off + h * w * 3].reshape(h, w, 3)
        if self._decoded_cache is not None and idx in self._decoded_cache:
            return self._decoded_cache[idx]
        img = _decode_image(os.path.join(self.img_dir, self.names[idx]))
        if self._decoded_cache is not None:
            self._decoded_cache[idx] = img
        return img

    def load_window(self, idx: int, rng: Optional[np.random.Generator]) -> np.ndarray:
        if self.preproc == "exact":
            return host_window_exact(self.load_image(idx))
        return host_window(self.load_image(idx), self.train, rng)


class ImsituLoader:
    """Seeded, thread-prefetched batch iterator over an ImsituDataset."""

    def __init__(self, dataset: ImsituDataset, batch_size: int,
                 shuffle: bool, seed: int = 0, num_workers: int = 2,
                 prefetch: int = 2, drop_last: bool = False,
                 decoder: str = "auto",
                 shard: Optional[Tuple[int, int]] = None):
        """``decoder``: 'native' (C++ libjpeg batch decode), 'python'
        (PIL per image), or 'auto' (native when buildable, else python).
        The two decoders draw augmentations from different deterministic
        streams (see data/native_decoder.py).

        ``shard=(rank, world)``: multi-process data parallelism — this
        loader materializes only rank's contiguous ``batch_size/world``
        row block of every GLOBAL batch (images decoded per host:
        1/world of the work).  The epoch order, the final partial
        batch's wrap-padding, and the augmentation draws are all
        computed at the GLOBAL level first (streams are keyed by
        (seed, epoch, dataset-index)), so the assembled global batch is
        bit-identical to a single-process run.  Sharded batches carry
        ``global_n`` (true pre-padding row count), ``shard``, and the
        full-batch ``verbs_global``/``labels_global`` sidecars (host
        scoring needs all rows; labels are cheap — only pixels are
        sharded).  See ``parallel/distributed.py``."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        if prefetch < 1:
            # queue.Queue(maxsize=0) means UNBOUNDED — a 'no read-ahead'
            # caller would instead get the whole epoch materialized in
            # host RAM with zero backpressure
            raise ValueError(f"prefetch must be >= 1, got {prefetch}")
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0
        if dataset.packed or dataset.window_cached:
            decoder = "python"  # memmap slices / index-only batches, no decode
        elif dataset.preproc == "exact":
            decoder = "python"  # the C++ decoder emits 256² windows only
        elif decoder == "auto":
            from situation_recognition_tpu.data import native_decoder

            decoder = "native" if native_decoder.available() else "python"
        self.decoder = decoder
        if shard is not None:
            rank, world = shard
            if world < 1 or not (0 <= rank < world):
                raise ValueError(f"bad shard {shard}: need 0 <= rank < world")
            if batch_size % world != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"world size {world}")
        self.shard = shard
        #: one-shot batch offset for mid-epoch resume (reset by __iter__)
        self.start_batch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        return order

    def _make_batch(self, indices: np.ndarray) -> Dict:
        ds = self.dataset
        B = len(indices)
        R = ds.encoder.max_role_count
        if ds.window_cached:
            rows = getattr(ds, "window_cache_rows", len(ds))
            if rows >= len(ds) or int(np.max(indices)) < rows:
                return self._make_batch_indices(indices)
            # partial-prefix cache, batch touches uncached rows: fall
            # through to a pixel batch (correctness over cleverness —
            # unshuffled eval splits hit this only at the boundary)
        # re-checked per batch (not only at construction): enable_packed may
        # legally be called after the loader exists, and the packed path
        # must win over the native JPEG decoder in that order too
        if (self.decoder == "native" and ds._decoded_cache is None
                and not ds.packed):
            return self._make_batch_native(indices)
        S = ds.window_size
        images = np.empty((B, S, S, 3), dtype=np.uint8)
        flip = np.zeros((B,), dtype=bool)
        errors: List[BaseException] = []

        def fill(slot_idx_pairs):
            # one generator per (seed, epoch, example): drives crop then flip
            try:
                for slot, idx in slot_idx_pairs:
                    rng = (np.random.default_rng((self.seed, self.epoch, int(idx)))
                           if ds.train else None)
                    images[slot] = ds.load_window(int(idx), rng)
                    if ds.train:
                        flip[slot] = rng.random() < 0.5
            except BaseException as e:
                errors.append(e)

        pairs = list(enumerate(indices))
        # all-cache-hit (or packed-memmap) batches are pure GIL-bound numpy
        # slicing: worker threads only thrash the GIL there (measured 4x
        # slowdown), so fill single-threaded when no decode work exists
        cache = ds._decoded_cache
        all_cached = ds.packed or (
            cache is not None and all(int(i) in cache for i in indices))
        if self.num_workers > 1 and B > 1 and not all_cached:
            chunks = np.array_split(np.arange(B), self.num_workers)
            threads = [
                threading.Thread(target=fill, args=([pairs[i] for i in c],))
                for c in chunks if len(c)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        else:
            fill(pairs)
        if errors:
            raise errors[0]

        return {
            "names": [ds.names[int(i)] for i in indices],
            "images": images,
            "verbs": ds.verbs[indices],
            "labels": ds.labels[indices],
            "flip": flip,
        }

    def _make_batch_indices(self, indices: np.ndarray) -> Dict:
        """Device-cached batching: no pixels move — the batch carries row
        ``indices`` into the HBM-resident window cache (the trainer
        gathers on device).  Flip bits replay the live python path's
        per-(seed, epoch, example) stream exactly: the (square-gated)
        random crop consumes two draws of ``integers(0, 1)`` before the
        flip draw, so cached and live batches are bit-identical."""
        ds = self.dataset
        B = len(indices)
        flip = np.zeros((B,), dtype=bool)
        if ds.train:
            for slot, idx in enumerate(indices):
                rng = np.random.default_rng(
                    (self.seed, self.epoch, int(idx)))
                rng.integers(0, 1)
                rng.integers(0, 1)
                flip[slot] = rng.random() < 0.5
        return {
            "names": [ds.names[int(i)] for i in indices],
            "indices": np.asarray(indices, dtype=np.int32),
            "verbs": ds.verbs[indices],
            "labels": ds.labels[indices],
            "flip": flip,
        }

    def _make_batch_native(self, indices: np.ndarray) -> Dict:
        """One C call decodes the whole batch; PIL fallback per failure."""
        from situation_recognition_tpu.data import native_decoder

        ds = self.dataset
        paths = [os.path.join(ds.img_dir, ds.names[int(i)]) for i in indices]
        images, flips, failed = native_decoder.decode_window_batch(
            paths, ds.train, self.seed, self.epoch,
            [int(i) for i in indices], num_threads=self.num_workers)
        if not ds.train:
            flips = np.zeros((len(indices),), dtype=bool)
        for slot in np.nonzero(failed)[0]:
            idx = int(indices[slot])
            rng = (np.random.default_rng((self.seed, self.epoch, idx))
                   if ds.train else None)
            images[slot] = ds.load_window(idx, rng)
            if ds.train:
                flips[slot] = rng.random() < 0.5
        return {
            "names": [ds.names[int(i)] for i in indices],
            "images": images,
            "verbs": ds.verbs[indices],
            "labels": ds.labels[indices],
            "flip": flips,
        }

    def __iter__(self) -> Iterator[Dict]:
        order = self._epoch_order()
        n = len(order)
        batch_starts = range(0, n - (n % self.batch_size if self.drop_last else 0),
                             self.batch_size)
        index_batches = [order[s:s + self.batch_size] for s in batch_starts]
        if self.start_batch:
            index_batches = index_batches[self.start_batch:]
            self.start_batch = 0
        if self.shard is not None and self.dataset.window_cached:
            raise ValueError(
                "sharded loading does not compose with the device window "
                "cache (single-process HBM-resident batching); disable one")

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def make(gidx: np.ndarray) -> Dict:
            if self.shard is None:
                return self._make_batch(gidx)
            # multi-process DP: wrap-pad the partial final batch at the
            # GLOBAL index level (same arange % n the single-process
            # trainer pads with — augmentation streams key on the dataset
            # index, so the assembled global batch is bit-identical),
            # then materialize only this rank's contiguous block
            rank, world = self.shard
            true_n = len(gidx)
            if true_n < self.batch_size:
                gidx = gidx[np.arange(self.batch_size) % true_n]
            per = self.batch_size // world
            b = self._make_batch(gidx[rank * per:(rank + 1) * per])
            b["global_n"] = true_n
            b["shard"] = self.shard
            # host-side scoring needs every row's annotations; only the
            # pixels are worth sharding
            b["verbs_global"] = self.dataset.verbs[gidx]
            b["labels_global"] = self.dataset.labels[gidx]
            return b

        def producer():
            try:
                for idxs in index_batches:
                    if stop.is_set():
                        return
                    q.put(make(idxs))
                q.put(None)
            except BaseException as e:  # propagate to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so the producer can observe stop and exit
            while not q.empty():
                q.get_nowait()
