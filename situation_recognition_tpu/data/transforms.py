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
   equivalent and only resample order differs (documented, tolerance-tested
   divergence at the ~1e-2 pixel level).
2. **Device** (batched, inside the jitted step): uint8 → f32/255 →
   bilinear antialiased resize 256→224 (matches PIL's antialiased bilinear)
   → optional horizontal flip → ImageNet normalize.

Images smaller than 256 on either side fall back to a PIL-equivalent
shorter-side-to-256 resize on the host before windowing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

WINDOW = 256
CROP = 224


# ------------------------------------------------------------------- host


def host_window(img: np.ndarray, train: bool, rng: np.random.Generator | None = None) -> np.ndarray:
    """Cut a (WINDOW, WINDOW, 3) uint8 window from a decoded HWC image.

    Random offset along the long axis for train, center for eval.  The
    window must cover the full short side (the reference's Resize(224) keeps
    the whole short axis), so any image whose shorter side != WINDOW is
    first resized (PIL bilinear) to shorter side == WINDOW.  For standard
    ``resized_256`` imSitu images this branch never fires and the window is
    pure slicing.
    """
    h, w = img.shape[:2]
    if min(h, w) != WINDOW:
        from PIL import Image

        scale = WINDOW / min(h, w)
        nh, nw = max(WINDOW, round(h * scale)), max(WINDOW, round(w * scale))
        img = np.asarray(
            Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        h, w = nh, nw

    if train:
        if rng is None:
            rng = np.random.default_rng()
        oy = int(rng.integers(0, h - WINDOW + 1))
        ox = int(rng.integers(0, w - WINDOW + 1))
    else:
        oy = (h - WINDOW) // 2
        ox = (w - WINDOW) // 2
    return img[oy:oy + WINDOW, ox:ox + WINDOW]


# ----------------------------------------------------------------- device


def device_transform(images_u8: jax.Array,
                     flip: jax.Array | None = None,
                     dtype=jnp.float32) -> jax.Array:
    """Batched (B, 256, 256, 3) uint8 → (B, 224, 224, 3) normalized.

    ``flip``: optional (B,) bool — horizontal flip per example (train only).
    Runs inside jit; all work is VPU element-wise + the resize gather.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    B = x.shape[0]
    x = jax.image.resize(x, (B, CROP, CROP, 3), method="linear", antialias=True)
    if flip is not None:
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def eval_transform(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    return device_transform(images_u8, flip=None, dtype=dtype)
