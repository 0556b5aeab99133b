"""Ray/geometry helpers (ports of /root/reference/shader/common.glsl:17-165).

All functions are batched over a leading lane axis N and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

M_PI = 3.14159265358979323846
INV_4PI = 1.0 / (4.0 * M_PI)

# MUST be a host (numpy) constant, never a jax.Array: a jitted program that
# closes over a pre-existing device array permanently degrades this runtime
# session ~500x for ALL subsequent programs (measured; see NOTES.md "device
# constant latch"). Host constants lower to plain HLO literals and are safe.
LUMA_W = np.array([0.212671, 0.715160, 0.072169], dtype=np.float32)


def luma(col):
    return col @ LUMA_W


def sanitize(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def power_heuristic(a, b):
    return a * a / (a * a + b * b)


def normalize(v, axis=-1, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def align(n, v):
    """Rotate tangent-space vector v into the frame around normal n
    (common.glsl:25-33)."""
    cond = jnp.abs(n[..., 0]) > jnp.abs(n[..., 1])
    inv_xz = 1.0 / jnp.sqrt(
        jnp.where(cond, n[..., 0] ** 2 + n[..., 2] ** 2, n[..., 1] ** 2 + n[..., 2] ** 2)
    )
    t = jnp.where(
        cond[..., None],
        jnp.stack([-n[..., 2], jnp.zeros_like(n[..., 0]), n[..., 0]], -1),
        jnp.stack([jnp.zeros_like(n[..., 0]), n[..., 2], -n[..., 1]], -1),
    ) * inv_xz[..., None]
    b = jnp.cross(n, t)
    return normalize(
        v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n
    )


def view_dir(xy, wh, pixel_sample, cam_transform, cam_fov):
    """Jittered pinhole camera ray (common.glsl:76-80).

    xy: (N, 2) int pixel coords (x right, y up), wh: (2,) resolution,
    pixel_sample: (N, 2) in [0,1), cam_transform: (3,3) view->world.
    """
    pixel = (xy.astype(jnp.float32) + pixel_sample - wh.astype(jnp.float32) * 0.5) / (
        wh[1].astype(jnp.float32)
    )
    z = -0.5 / jnp.tan(0.5 * M_PI * cam_fov / 180.0)
    d = jnp.concatenate([pixel, jnp.broadcast_to(z, pixel[..., :1].shape)], axis=-1)
    return normalize(normalize(d) @ cam_transform.T)


def intersect_box(pos, direction, bb_min, bb_max):
    """Slab test (common.glsl:157-165). Returns (hit, near, far)."""
    inv_dir = 1.0 / direction
    lo = (bb_min - pos) * inv_dir
    hi = (bb_max - pos) * inv_dir
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    near = jnp.maximum(0.0, tmin.max(axis=-1))
    far = tmax.min(axis=-1)
    return near <= far, near, far


def transform_point(m, p):
    """(4,4) @ (N,3) point."""
    return p @ m[:3, :3].T + m[:3, 3]


def transform_vector(m, v):
    """(4,4) @ (N,3) direction (w=0, NOT normalized — index-space marching
    relies on the non-unit length, common.glsl:339)."""
    return v @ m[:3, :3].T
