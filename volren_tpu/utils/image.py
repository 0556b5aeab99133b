"""LDR image IO (PNG via PIL), replacing cppgl's stb-backed save_ldr."""

from __future__ import annotations

import numpy as np


def save_ldr(path: str, img: np.ndarray, flip: bool = True, alpha: bool = False) -> None:
    """Save a float image in [0,1] (H, W, 3|4) as PNG. ``flip`` mirrors the
    GL framebuffer convention (row 0 = bottom)."""
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if not alpha and img.shape[-1] == 4:
        img = img[..., :3]
    if flip:
        img = img[::-1]
    u8 = np.clip(np.nan_to_num(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path)


def load_ldr(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.float32) / 255.0
