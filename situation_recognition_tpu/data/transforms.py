"""Image preprocessing: host windowing + batched device-resident transforms.

The reference preprocesses per-image on the host with PIL/torchvision
(``/root/reference/utils/imsitu_encoder.py:21-36``):

  train: Resize(224) → RandomCrop(224) → RandomHorizontalFlip → ToTensor →
         Normalize(ImageNet)
  dev:   Resize(224) → CenterCrop(224) → ToTensor → Normalize(ImageNet)

TPU-native split (BASELINE north star: device-resident preprocessing):

1. **Host** (cheap, per-image): decode to uint8 and cut a fixed
   ``256 x 256`` *window*.  For the standard ``resized_256`` imSitu images
   (shorter side 256) this is pure array slicing: a random (train) or center
   (eval) offset along the long axis.  Geometry note: Resize(224) makes the
   shorter side exactly 224, so the reference's 224-crop only slides along
   the long axis; a 256-window before a 256→224 resize selects the same
   field of view (224 * 256/224 = 256), so the crop distribution is
   equivalent and only resample order differs (crop→resize here vs the
   reference's resize→crop).  Honest bounds for that divergence
   (DIVERGENCES #5): bit-free exactness is impossible — the window start
   is an integer in 256-space while the reference's maps to a fraction
   (≤0.5px FOV shift after the torchvision-aligned rounding in
   ``_center_offset``), plus a ≤0.2% long-axis aspect difference.  On
   photograph-like content the result stays within a few uint8 LSB
   (tolerance-tested vs a PIL oracle); adversarial pixel-frequency
   content can diverge further — that is inherent to reordering
   resampling, affects train-time augmented views far less than it
   affects metric-parity eval, and is exact for square inputs.
2. **Device** (batched, inside the jitted step): uint8 → separable bilinear
   antialiased resize 256→224 as two MXU matmuls (the exact
   ``jax.image.resize(..., 'linear', antialias=True)`` weights, extracted
   once into a static (256, 224) matrix) → fused /255 + ImageNet normalize
   on the f32 accumulator → horizontal flip on the small normalized output.

   This formulation replaced a profiled hot spot: ``jax.image.resize`` +
   separate flip lowered to two f32 convolutions over (B, 224, 224+, 3) plus
   a 0.9 GB f32 ``reverse`` pass (~8 ms/step at B=768 on v5e); the matmul
   form keeps intermediates in the compute dtype and flips 4x fewer bytes.

Images smaller than 256 on either side fall back to a PIL-equivalent
shorter-side-to-256 resize on the host before windowing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

WINDOW = 256
CROP = 224


# ------------------------------------------------------------------- host


def normalize_short_side(img: np.ndarray) -> np.ndarray:
    """Resize (PIL bilinear) so the shorter side == WINDOW; identity for
    standard ``resized_256`` images.  Shared by the live loader path and
    ``tools/pack_dataset.py`` so packed storage is bit-identical to the
    on-the-fly path."""
    h, w = img.shape[:2]
    if min(h, w) == WINDOW:
        return img
    from PIL import Image

    scale = WINDOW / min(h, w)
    nh, nw = max(WINDOW, round(h * scale)), max(WINDOW, round(w * scale))
    return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))


def host_window(img: np.ndarray, train: bool, rng: np.random.Generator | None = None) -> np.ndarray:
    """Cut a (WINDOW, WINDOW, 3) uint8 window from a decoded HWC image.

    Random offset along the long axis for train, center for eval.  The
    window must cover the full short side (the reference's Resize(224) keeps
    the whole short axis), so any image whose shorter side != WINDOW is
    first resized (PIL bilinear) to shorter side == WINDOW.  For standard
    ``resized_256`` imSitu images this branch never fires and the window is
    pure slicing.
    """
    img = normalize_short_side(img)
    h, w = img.shape[:2]

    if train:
        if rng is None:
            # every in-repo train caller passes the per-(seed, epoch,
            # index) stream; a silent OS-entropy fallback would make two
            # same-seed runs diverge with no error (the determinism
            # contract in data/dataset.py)
            raise ValueError("host_window(train=True) requires the seeded "
                             "rng — unseeded crops break determinism")
        oy = int(rng.integers(0, h - WINDOW + 1))
        ox = int(rng.integers(0, w - WINDOW + 1))
    else:
        oy = _center_offset(h)
        ox = _center_offset(w)
    return img[oy:oy + WINDOW, ox:ox + WINDOW]


def host_window_exact(img: np.ndarray) -> np.ndarray:
    """Reference-exact EVAL window: shorter-side ``Resize(224)`` then
    ``CenterCrop(224)`` with torchvision's literal geometry
    (``/root/reference/utils/imsitu_encoder.py:31-36``), returning a
    (224, 224, 3) uint8 image.

    This is the ``--preproc exact`` escape hatch that kills DIVERGENCES #5
    for metric-parity runs: the default path's crop-then-resize reordering
    is within a few LSB on photographs but not bit-faithful; here the
    resample order matches the reference exactly, and the device resize
    becomes an identity passthrough (the 224→224 triangle-kernel matrix is
    exactly I, asserted in tests/test_data_pipeline.py).

    Geometry replicated from torchvision (no torchvision dependency):
    ``Resize(int)`` maps the long side with ``int(size * long / short)``
    (truncation) and skips resizing when the short side already equals
    ``size``; ``CenterCrop`` uses ``int(round((dim - crop) / 2))`` —
    Python banker's rounding at the .5 boundary.
    """
    from PIL import Image

    pil = Image.fromarray(img)
    w, h = pil.size
    if not ((w <= h and w == CROP) or (h <= w and h == CROP)):
        if w < h:
            ow, oh = CROP, int(CROP * h / w)
        else:
            oh, ow = CROP, int(CROP * w / h)
        pil = pil.resize((ow, oh), Image.BILINEAR)
        w, h = pil.size
    top = int(round((h - CROP) / 2.0))
    left = int(round((w - CROP) / 2.0))
    return np.asarray(pil)[top:top + CROP, left:left + CROP]


def _center_offset(full: int) -> int:
    """Center-window offset along one axis, aligned to torchvision.

    The reference center-crops AFTER resizing to 224-short-side, with
    ``int(round((dim224 - 224)/2))`` (torchvision CenterCrop); a plain
    ``(full - 256)//2`` at 256-scale lands up to ~1.3px away for widths
    where the two roundings disagree (e.g. 259: floor gives 1, the
    reference's center maps to 2.28).  Compute the reference's offset at
    its own scale and map it back."""
    if full <= WINDOW:
        return 0
    dim224 = round(full * CROP / WINDOW)      # the reference's resized dim
    off224 = int(round((dim224 - CROP) / 2))
    return min(full - WINDOW, round(off224 * full / dim224))


# ----------------------------------------------------------------- device


@functools.lru_cache(maxsize=None)
def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """(src, dst) f32 matrix M with ``resized = v @ M`` for a length-src
    axis — ``jax.image.resize(..., 'linear', antialias=True)`` weights
    (its ``compute_weight_mat`` with a triangle kernel), built in pure
    numpy so it stays a static constant under jit.  Bit-equality with
    jax.image.resize is asserted in tests/test_data_pipeline.py."""
    scale = dst / src
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)
    sample_f = (np.arange(dst, dtype=np.float32) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[None, :]
               - np.arange(src, dtype=np.float32)[:, None]) / kernel_scale
    weights = np.maximum(0.0, 1.0 - x).astype(np.float32)  # triangle kernel
    total = weights.sum(axis=0, keepdims=True)
    weights = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                       weights / np.where(total != 0, total, 1), 0.0)
    keep = (sample_f >= -0.5) & (sample_f <= src - 0.5)
    return np.where(keep[None, :], weights, 0.0).astype(np.float32)


def device_transform(images_u8: jax.Array,
                     flip: jax.Array | None = None,
                     dtype=jnp.float32, crop: int = CROP) -> jax.Array:
    """Batched (B, 256, 256, 3) uint8 → (B, crop, crop, 3) normalized.

    ``flip``: optional (B,) bool — horizontal flip per example (train only).
    ``crop``: the model input size (default 224, the reference's;
    ``TrainerConfig.image_size`` threads other resolutions — e.g. 336 for
    the CLIP ViT-L/14@336 grid — through the same two-matmul resize: the
    triangle-kernel matrix upsamples exactly like
    ``jax.image.resize('linear', antialias=True)``, which for scale ≥ 1
    is plain bilinear).
    Runs inside jit: two separable-resize matmuls (MXU) with f32
    accumulation, normalize fused on the accumulator, flip as a cheap
    reorder of the final (B, crop, crop, 3) tensor.  In bf16 the
    intermediate row-pass rounds once (uint8 values are exact in bf16);
    worst case ~1 uint8 LSB, far inside the documented PIL resample-order
    tolerance.
    """
    h, w = images_u8.shape[1], images_u8.shape[2]
    if h == crop and w == crop:
        # exact-preproc batches arrive pre-resized: the 224→224 triangle
        # matrix is exactly I, so the two einsums below would burn
        # ~100 GFLOP/batch (B=768) multiplying by a dense identity XLA
        # cannot see through.  This branch is bit-identical to the matmul
        # path (asserted in tests/test_data_pipeline.py).
        z = images_u8.astype(jnp.float32)
        if flip is not None:
            z = jnp.where(flip[:, None, None, None], z[:, :, ::-1, :], z)
        z = (z * (1.0 / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        return z.astype(dtype)
    mdtype = dtype if dtype == jnp.bfloat16 else jnp.float32
    mh = jnp.asarray(_resize_matrix(h, crop), dtype=mdtype)
    mw = mh if w == h else jnp.asarray(_resize_matrix(w, crop), dtype=mdtype)
    x = images_u8.astype(mdtype)
    y = jnp.einsum("bhwc,hH->bHwc", x, mh,
                   preferred_element_type=jnp.float32).astype(mdtype)
    z = jnp.einsum("bHwc,wW->bHWc", y, mw,
                   preferred_element_type=jnp.float32)
    if flip is not None:
        # fold the flip into the resize: a flipped image resized = the image
        # resized with column-reversed weights.  Computing both orientations
        # costs one extra (cheap, fully-overlapped) MXU pass and replaces a
        # profiled 2.4 ms strided-reverse pass over the output tensor.
        zf = jnp.einsum("bHwc,wW->bHWc", y, mw[:, ::-1],
                        preferred_element_type=jnp.float32)
        z = jnp.where(flip[:, None, None, None], zf, z)
    z = (z * (1.0 / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    return z.astype(dtype)


def eval_transform(images_u8: jax.Array, dtype=jnp.float32,
                   crop: int = CROP) -> jax.Array:
    return device_transform(images_u8, flip=None, dtype=dtype, crop=crop)
