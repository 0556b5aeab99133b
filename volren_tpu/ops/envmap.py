"""Environment lookup / importance sampling / pdf.

Ports /root/reference/shader/common.glsl:93-152: equirect radiance lookup,
the hierarchical warp down the luminance mip pyramid, and the pdf used for
MIS. The pdf convention replicates the reference exactly (luma ratio *
1/4pi, no sin-theta Jacobian in the importance map) so outputs match the
GLSL renderer sample-for-sample.
"""

from __future__ import annotations

import jax.numpy as jnp

from .gather import vgather
from .geometry import M_PI, INV_4PI, luma
from .scene import EnvDevice


def _bilinear(img, u, v):
    """GL-style bilinear: u wraps, v clamps. img is (H, W, C) interleaved,
    rows in v-order — TPU gathers scalarize per ROW (width-independent), so
    one C-wide row gather per tap is the cheapest fetch (EnvDevice.envmap)."""
    h, w = img.shape[0], img.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    flat = img.reshape(h * w, -1)

    def tap(yy, xx):
        return vgather(flat, yy * w + xx)

    top = tap(y0c, x0w) * (1 - fx) + tap(y0c, x1w) * fx
    bot = tap(y1c, x0w) * (1 - fx) + tap(y1c, x1w) * fx
    return top * (1 - fy) + bot * fy


def bilinear_env(env: EnvDevice, u, v):
    """GL-style bilinear fetch of env.envmap returning (N, 4) rows.

    Uses the one-gather quad-row table when the EnvDevice carries it (the
    four taps ride in a single 16-wide row, EnvDevice.quad_rows) and
    reproduces _bilinear bit-for-bit: same f32 texels, same lerp order,
    including the u-wrap / v-clamp edge behaviour."""
    if env.quad_rows is None:
        return _bilinear(env.envmap, u, v)
    h, w = env.envmap.shape[0], env.envmap.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w = jnp.mod(x0, w)
    y0c = jnp.clip(y0, 0, h - 1)
    row = vgather(env.quad_rows, y0c * w + x0w)  # [t00 t01 t10 t11] x 4ch
    t00, t01 = row[..., 0:4], row[..., 4:8]
    # v above the top row: reference clamps BOTH taps to row 0, so the
    # bottom pair must equal the top pair bitwise
    above = (y0 < 0)[..., None]
    t10 = jnp.where(above, t00, row[..., 8:12])
    t11 = jnp.where(above, t01, row[..., 12:16])
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def texture_env(env: EnvDevice, u, v):
    return env.strength * bilinear_env(env, u, v)[..., :3]


def dir_to_uv(inv_transform, direction):
    """World direction -> equirect (u, v) (common.glsl:93-96)."""
    idir = direction @ inv_transform.T
    u = jnp.arctan2(idir[..., 2], idir[..., 0]) / (2.0 * M_PI) + 0.5
    v = 1.0 - jnp.arccos(jnp.clip(idir[..., 1], -1.0, 1.0)) / M_PI
    return u, v


def lookup_environment(env: EnvDevice, direction):
    """Radiance along a world-space direction (common.glsl:93-98)."""
    u, v = dir_to_uv(env.inv_transform, direction)
    return texture_env(env, u, v)


def sample_environment(env: EnvDevice, u2):
    """Hierarchical warp over the importance mips (common.glsl:100-146).

    Returns (Le (N,3), pdf (N,), w_i (N,3)).
    """
    base_mip = len(env.imp_mips) - 1
    n = u2.shape[0]
    px = jnp.zeros((n,), jnp.int32)
    py = jnp.zeros((n,), jnp.int32)
    p = u2

    # mip index m has dimension 2^(base_mip - ... ): imp_mips[m] is the GL
    # mip m (512/2^m per side). Walk from coarse (base_mip-1) to fine (0).
    for mip in range(base_mip - 1, -1, -1):
        level = env.imp_mips[mip]
        dim = level.shape[0]
        flat = level.reshape(-1)
        px = px * 2
        py = py * 2
        idx = py * dim + px

        def tap(i):
            return vgather(flat, i)

        w0 = tap(idx)  # (+0, +0)
        w1 = tap(idx + 1)  # (+1, +0)
        w2 = tap(idx + dim)  # (+0, +1)
        w3 = tap(idx + dim + 1)  # (+1, +1)
        q0 = w0 + w2
        q1 = w1 + w3
        d = q0 / jnp.maximum(1e-8, q0 + q1)
        go_right = p[..., 0] >= d
        new_px_frac = jnp.where(go_right, (p[..., 0] - d) / (1.0 - d), p[..., 0] / d)
        px = px + go_right.astype(jnp.int32)
        e = jnp.where(go_right, w1 / jnp.maximum(q1, 1e-20), w0 / jnp.maximum(q0, 1e-20))
        go_up = p[..., 1] >= e
        new_py_frac = jnp.where(go_up, (p[..., 1] - e) / (1.0 - e), p[..., 1] / e)
        py = py + go_up.astype(jnp.int32)
        p = jnp.stack([new_px_frac, new_py_frac], axis=-1)

    inv_dim = 1.0 / env.imp_mips[0].shape[0]
    uv_x = (px.astype(jnp.float32) + p[..., 0]) * inv_dim
    uv_y = (py.astype(jnp.float32) + p[..., 1]) * inv_dim
    theta = jnp.clip(1.0 - uv_y, 0.0, 1.0) * M_PI
    phi = (jnp.clip(uv_x, 0.0, 1.0) * 2.0 - 1.0) * M_PI
    sin_t = jnp.sin(theta)
    w_local = jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )
    w_i = w_local @ env.transform.T
    le = texture_env(env, uv_x, uv_y)
    avg_w = env.imp_mips[-1].reshape(())
    base = env.imp_mips[0].reshape(-1)
    pdf = vgather(base, py * env.imp_mips[0].shape[1] + px) / avg_w
    return le, pdf * INV_4PI, w_i


def sample_environment_alias(env: EnvDevice, u2):
    """O(1) environment texel sampling via the alias table.

    Draws the exact texel distribution of the hierarchical warp (the
    box-filtered pyramid telescopes to P(texel) = w / (N * avg)) with the
    same uniform in-texel jitter, but in constant work per sample — the
    device-loop-friendly replacement for the 9-level warp. Returns
    (uv_x, uv_y, pdf, w_i, le_texel): le_texel is the selected texel's
    box-filtered radiance carried in the alias row (zero extra gathers —
    used by the TPU fast path, TraceConfig.env_nearest_nee; exact callers
    do a bilinear fetch at (uv_x, uv_y) instead).
    """
    dim = env.imp_mips[0].shape[0]
    n = dim * dim
    scaled = u2[..., 0] * n
    j = jnp.clip(scaled.astype(jnp.int32), 0, n - 1)
    frac_x = scaled - j.astype(jnp.float32)
    # ONE wide row gather. A split probe(2)+result(4) layout was measured
    # SLOWER (1.32 vs 0.77 ms/step at 65k lanes) despite fetching half the
    # elements: the second fetch depends on the first, and the dependent
    # chain costs more than the extra row width (EnvDevice.alias_packed).
    row = vgather(env.alias_packed, j)
    prob = row[..., 0]
    keep = u2[..., 1] < prob
    texel = jnp.where(keep, j, row[..., 1].astype(jnp.int32))
    pdf = jnp.where(keep, row[..., 2], row[..., 3])
    le_texel = jnp.where(keep[..., None], row[..., 4:7], row[..., 7:10])
    # conditional rescale keeps the second uniform usable as in-texel jitter
    frac_y = jnp.where(
        keep,
        u2[..., 1] / jnp.maximum(prob, 1e-12),
        (u2[..., 1] - prob) / jnp.maximum(1.0 - prob, 1e-12),
    )
    px = texel % dim
    py = texel // dim
    inv_dim = 1.0 / dim
    uv_x = (px.astype(jnp.float32) + frac_x) * inv_dim
    uv_y = (py.astype(jnp.float32) + jnp.clip(frac_y, 0.0, 1.0)) * inv_dim
    theta = jnp.clip(1.0 - uv_y, 0.0, 1.0) * M_PI
    phi = (jnp.clip(uv_x, 0.0, 1.0) * 2.0 - 1.0) * M_PI
    sin_t = jnp.sin(theta)
    w_local = jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )
    w_i = w_local @ env.transform.T
    return uv_x, uv_y, pdf, w_i, le_texel


def pdf_environment(env: EnvDevice, direction):
    """MIS pdf of the warp for a given direction (common.glsl:148-152)."""
    avg_w = env.imp_mips[-1].reshape(())
    return luma(lookup_environment(env, direction)) / avg_w * INV_4PI
