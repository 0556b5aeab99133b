"""Brick-grid device lookups + stochastic filters.

Ports /root/reference/shader/common.glsl:217-328 onto flat-array gathers:
nearest/trilinear/stochastic-tricubic density lookups, majorant mip
lookups, and the emission (blackbody-ish) lookup. All lookups clamp their
integer coordinates into the padded brick extent — out-of-range bricks
resolve through their (0, 0) range to zero density, matching the GL
border/clamp behaviour for rays inside the AABB.

Gather budget matters more than arithmetic on TPU (random gathers cost per
OP, not per byte): a voxel decode is exactly TWO gathers (one wide
brick_meta row [slot, min, max] + one atlas byte), and a majorant lookup at
any mip is ONE gather from the packed pyramid.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import rng as _rng
from .gather import vgather as _gather
from .scene import GridDevice


def _brick_index(grid: GridDevice, ipos):
    """Clamped flat brick index + voxel offsets for integer positions."""
    bx, by, bz = grid.n_bricks
    iipos = jnp.floor(ipos).astype(jnp.int32)
    vx = jnp.clip(iipos[..., 0], 0, bx * 8 - 1)
    vy = jnp.clip(iipos[..., 1], 0, by * 8 - 1)
    vz = jnp.clip(iipos[..., 2], 0, bz * 8 - 1)
    bidx = (vz >> 3) * (by * bx) + (vy >> 3) * bx + (vx >> 3)
    voff = (vz & 7) * 64 + (vy & 7) * 8 + (vx & 7)
    return bidx, voff


def lookup_density_brick(grid: GridDevice, ipos):
    """Nearest-neighbour voxel decode (common.glsl:268-275).

    ipos: (N, 3) float32 index-space positions. When the grid carries a
    pre-decoded dense voxel array (GridDevice.dense), the fetch is ONE
    gather with bit-identical values (the decode ran at upload); otherwise
    two dependent gathers (meta row, then atlas byte).
    """
    if grid.dense is not None:
        bx, by, bz = grid.n_bricks
        iipos = jnp.floor(ipos).astype(jnp.int32)
        vx = jnp.clip(iipos[..., 0], 0, bx * 8 - 1)
        vy = jnp.clip(iipos[..., 1], 0, by * 8 - 1)
        vz = jnp.clip(iipos[..., 2], 0, bz * 8 - 1)
        return _gather(grid.dense, (vz * (by * 8) + vy) * (bx * 8) + vx)
    bidx, voff = _brick_index(grid, ipos)
    meta = _gather(grid.brick_meta.reshape(-1, 3), bidx)
    slot = meta[..., 0].astype(jnp.int32)
    unorm = _gather(grid.atlas.reshape(-1), slot * 512 + voff).astype(jnp.float32) * (
        1.0 / 255.0
    )
    return meta[..., 1] + unorm * (meta[..., 2] - meta[..., 1])


def _majorant_index(grid: GridDevice, ipos, mip):
    """Flat index into the packed majorant pyramid for (N,) mips in [0, 3]."""
    iipos = jnp.floor(ipos).astype(jnp.int32)
    dims = grid.mip_dims
    offs = grid.mip_offsets
    idx = jnp.zeros(ipos.shape[:-1], jnp.int32)
    for m in range(4):
        mz, my, mx = dims[m]
        bxm = jnp.clip(iipos[..., 0] >> (3 + m), 0, mx - 1)
        bym = jnp.clip(iipos[..., 1] >> (3 + m), 0, my - 1)
        bzm = jnp.clip(iipos[..., 2] >> (3 + m), 0, mz - 1)
        idx_m = offs[m] + (bzm * my + bym) * mx + bxm
        idx = jnp.where(mip == m, idx_m, idx)
    return idx


def lookup_majorant(grid: GridDevice, ipos, mip, density_scale, onehot=False):
    """Per-region majorant from the packed min/max pyramid
    (common.glsl:278-281). mip: (N,) int32 in [0, 3]; 0 reads the per-brick
    range max. ``onehot`` routes the fetch through the MXU one-hot path
    (bf16 round-up table, conservative — ops.gather.onehot_gather)."""
    idx = _majorant_index(grid, ipos, mip)
    if onehot:
        from .gather import onehot_gather

        return density_scale * onehot_gather(grid.mip_maj_oh, idx)
    return density_scale * _gather(grid.mip_maj, idx)


def lookup_density(grid: GridDevice, ipos, density_scale):
    return density_scale * lookup_density_brick(grid, ipos)


def lookup_density_trilinear(grid: GridDevice, ipos, density_scale):
    """Trilinear decode (common.glsl:289-297).

    With GridDevice.dense_quad present, the 8 corner fetches collapse to
    TWO quad-row gathers (z and z+1 planes) — bit-identical values and
    summation order (gather cost on this runtime is per op, not per byte).
    """
    p = ipos - 0.5
    base = jnp.floor(p)
    f = p - base
    if grid.dense_quad is not None:
        bx, by, bz = grid.n_bricks
        X, Y, Z = bx * 8, by * 8, bz * 8
        ib = base.astype(jnp.int32)
        x0 = jnp.clip(ib[..., 0], 0, X - 1)
        y0 = jnp.clip(ib[..., 1], 0, Y - 1)
        z0 = jnp.clip(ib[..., 2], 0, Z - 1)
        z1 = jnp.clip(ib[..., 2] + 1, 0, Z - 1)
        row0 = _gather(grid.dense_quad, (z0 * Y + y0) * X + x0)
        row1 = _gather(grid.dense_quad, (z1 * Y + y0) * X + x0)
        # under-clamp fix-up: when floor < 0 the +1 tap also clamps to 0,
        # but the prebuilt row holds v(0), v(1) — select the low corner
        ux = ib[..., 0] < 0
        uy = ib[..., 1] < 0

        def corners(row):
            q00, q10, q01, q11 = (row[..., i] for i in range(4))
            q10 = jnp.where(ux, q00, q10)
            q11 = jnp.where(ux, q01, q11)
            q01 = jnp.where(uy, q00, q01)
            q11 = jnp.where(uy, q10, q11)
            return q00, q10, q01, q11

        planes = (corners(row0), corners(row1))
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = (
                        (f[..., 0] if dx else 1.0 - f[..., 0])
                        * (f[..., 1] if dy else 1.0 - f[..., 1])
                        * (f[..., 2] if dz else 1.0 - f[..., 2])
                    )
                    acc = acc + w * planes[dz][dy * 2 + dx]
        return density_scale * acc
    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (f[..., 0] if dx else 1.0 - f[..., 0])
                    * (f[..., 1] if dy else 1.0 - f[..., 1])
                    * (f[..., 2] if dz else 1.0 - f[..., 2])
                )
                offs = jnp.array([dx, dy, dz], jnp.float32)
                acc = acc + w * lookup_density_brick(grid, base + offs)
    return density_scale * acc


def stochastic_trilinear_filter(ipos, seed, active):
    seed, u = _rng.rng_masked(seed, active)
    seed, v = _rng.rng_masked(seed, active)
    seed, w = _rng.rng_masked(seed, active)
    r = jnp.stack([u, v, w], axis=-1)
    return jnp.floor(ipos - 0.5 + r), seed


def stochastic_tricubic_filter(ipos, seed, active):
    """Weighted reservoir sampling of the tricubic B-spline taps
    (common.glsl:221-244, after 'Stochastic Texture Filtering')."""
    iipos = jnp.floor(ipos - 0.5)
    t = (ipos - 0.5) - iipos
    t2 = t * t
    t3 = t * t2
    w = (1.0 / 6.0) * (-t3 + 3.0 * t2 - 3.0 * t + 1.0)
    sum_wt = w
    idx = jnp.zeros_like(ipos)
    taps = [
        (1.0, (1.0 / 6.0) * (3.0 * t3 - 6.0 * t2 + 4.0)),
        (2.0, (1.0 / 6.0) * (-3.0 * t3 + 3.0 * t2 + 3.0 * t + 1.0)),
        (3.0, (1.0 / 6.0) * t3),
    ]
    for tap_idx, w in taps:
        sum_wt = w + sum_wt
        seed, r = _rng.rng_masked(seed, active)
        seed, r2 = _rng.rng_masked(seed, active)
        seed, r3 = _rng.rng_masked(seed, active)
        r3v = jnp.stack([r, r2, r3], axis=-1)
        take = r3v < w / jnp.maximum(1e-3, sum_wt)
        idx = jnp.where(take, tap_idx, idx)
    return iipos + idx - 1.0, seed


def lookup_density_stochastic(grid: GridDevice, ipos, seed, active, density_scale):
    """Stochastic tricubic density (common.glsl:300-304). Returns (d, seed)."""
    tap, seed = stochastic_tricubic_filter(ipos, seed, active)
    return lookup_density(grid, tap, density_scale), seed


def lookup_emission(
    emission_grid: GridDevice,
    density_transform,
    ipos,
    seed,
    active,
    emission_scale,
    emission_norm,
):
    """Blackbody-ish emission from the temperature grid
    (common.glsl:324-328). ipos is in DENSITY index space; re-mapped through
    world into the emission grid's index space. Returns ((N,3), seed)."""
    world = ipos @ density_transform[:3, :3].T + density_transform[:3, 3]
    epos = world @ emission_grid.inv_transform[:3, :3].T + emission_grid.inv_transform[:3, 3]
    tap, seed = stochastic_tricubic_filter(epos, seed, active)
    t = lookup_density_brick(emission_grid, tap) * emission_norm
    t2 = t * t
    e = jnp.stack([t2, t2 * t2, t2 * t2 * t2 * t2], axis=-1)
    return emission_scale * e, seed
