"""Image IO helpers (ref: image_utils.h:102-143)."""

from __future__ import annotations

import sys

import numpy as np


def save_png(path: str, pixels: np.ndarray) -> bool:
    """pixels: uint8 [H, W, 3] (or [H, W, 4], alpha dropped)."""
    import imageio.v3 as iio
    try:
        iio.imwrite(path, np.asarray(pixels)[..., :3])
    except OSError as e:
        print(f"Failed to write PNG: {path} ({e})", file=sys.stderr)
        return False
    print(f"Saved: {path}")
    return True


def load_image(path: str) -> np.ndarray:
    """Load PNG/JPG as uint8 [H, W, 3]."""
    import imageio.v3 as iio
    img = np.asarray(iio.imread(path))
    if img.dtype != np.uint8:
        img = (np.clip(img.astype(np.float32), 0, 1) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    return img[..., :3]


def flip_vertically(pixels: np.ndarray) -> np.ndarray:
    return np.asarray(pixels)[::-1].copy()
