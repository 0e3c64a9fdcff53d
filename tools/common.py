"""Shared helpers for the bench/pack tools."""

from __future__ import annotations

import numpy as np


def synth_jpeg(rng: np.random.Generator, path: str,
               wh=(256, 256), quality: int = 85) -> None:
    """Write one synthetic JPEG: 16x16 noise upsampled to ``wh`` (PIL
    (width, height) order) — decodes fast, compresses to ~10 KB, and
    exercises the real JPEG path.  One shared recipe so every tool
    measures the same image statistics."""
    from PIL import Image

    low = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    Image.fromarray(low).resize(wh, Image.BILINEAR).save(path,
                                                         quality=quality)
