"""Transfer-function LUT lookup (port of common.glsl:195-212)."""

from __future__ import annotations

import jax.numpy as jnp

from .scene import TFDevice


def tf_window(tf: TFDevice, d):
    return jnp.clip((d - tf.window_left) / tf.window_width, 0.0, 1.0 - 1e-6)


def tf_lookup(tf: TFDevice, d):
    """Windowed, linearly interpolated LUT fetch. d: (N,) -> (N, 4)."""
    size = tf.lut.shape[0]
    tc = tf_window(tf, d) * size
    idx = jnp.floor(tc).astype(jnp.int32)
    f = (tc - idx)[..., None]
    lo = tf.lut.at[idx].get(mode="promise_in_bounds")
    hi = tf.lut.at[jnp.minimum(idx + 1, size - 1)].get(mode="promise_in_bounds")
    return lo * (1.0 - f) + hi * f
