"""Transfer-function LUT lookup (port of common.glsl:195-212)."""

from __future__ import annotations

import jax.numpy as jnp

from .gather import vgather
from .scene import TFDevice


def tf_window(tf: TFDevice, d):
    return jnp.clip((d - tf.window_left) / tf.window_width, 0.0, 1.0 - 1e-6)


def tf_lookup(tf: TFDevice, d):
    """Windowed, linearly interpolated LUT fetch. d: (N,) -> (N, 4)."""
    size = tf.lut.shape[0]
    tc = tf_window(tf, d) * size
    idx = jnp.floor(tc).astype(jnp.int32)
    f = (tc - idx)[..., None]
    lo = vgather(tf.lut, idx)
    hi = vgather(tf.lut, jnp.minimum(idx + 1, size - 1))
    return lo * (1.0 - f) + hi * f


def tf_alpha_majorant(tf: TFDevice, d, onehot=False):
    """Windowed, lerped LUT ALPHA only — the per-microstep majorant
    classification fetch (common.glsl:484). With ``onehot`` the pair table
    (S, 2) bf16 round-up rows [a_i, a_{i+1}] is fetched via one MXU one-hot
    matmul; the round-up lerp is >= the exact lerp (alpha is monotone after
    the CDF rewrite), keeping the majorant conservative."""
    size = tf.lut.shape[0]
    tc = tf_window(tf, d) * size
    idx = jnp.floor(tc).astype(jnp.int32)
    f = tc - idx
    if onehot:
        oh = (idx[..., None] == jnp.arange(size, dtype=jnp.int32)).astype(
            jnp.bfloat16
        )
        pair = (oh @ tf.alpha_oh).astype(jnp.float32)  # (..., 2)
        return pair[..., 0] * (1.0 - f) + pair[..., 1] * f
    lo = vgather(tf.lut[:, 3], idx)
    hi = vgather(tf.lut[:, 3], jnp.minimum(idx + 1, size - 1))
    return lo * (1.0 - f) + hi * f
