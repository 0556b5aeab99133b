"""Device-side scene structures (pytrees) and host->device upload.

The reference binds ~35 uniforms + 8 textures per trace dispatch
(/root/reference/src/renderer.cpp:78-145). Here the equivalents are two
pytrees: ``SceneDevice`` (bulk arrays uploaded once per commit — brick
grids, envmap, importance pyramid, TF LUT) and ``TraceParams`` (per-dispatch
scalars — camera, scales, bounds). Brick-grid arrays use a flat-slot atlas
(one linear gather index) instead of 3D textures.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class GridDevice(NamedTuple):
    """Brick grid on device. Shapes carry the static brick dims."""

    indirection: jnp.ndarray  # (bz, by, bx) int32 flat atlas slot
    range_minmax: jnp.ndarray  # (bz, by, bx, 2) float32
    mips: tuple  # 3 x (mz, my, mx, 2) float32 min/max pyramid
    atlas: jnp.ndarray  # (n_slots, 512) uint8, voxel order (z, y, x)
    transform: jnp.ndarray  # (4, 4) index -> world (volume xform folded in)
    inv_transform: jnp.ndarray  # (4, 4) world -> index


class EnvDevice(NamedTuple):
    envmap: jnp.ndarray  # (H, W, 3) float32, rows in v-order
    imp_mips: tuple  # (512^2, 256^2, ..., 1^2) float32
    transform: jnp.ndarray  # (3, 3)
    inv_transform: jnp.ndarray  # (3, 3)
    strength: jnp.ndarray  # () float32
    # O(1) texel sampling (Vose alias table over imp_mips[0]); draws the
    # exact same texel distribution as the hierarchical mip warp — the warp's
    # box-filtered pyramid telescopes to P(texel) = w / (N * avg)
    alias_prob: jnp.ndarray  # (D*D,) float32 probability to keep own texel
    alias_idx: jnp.ndarray  # (D*D,) int32 alias texel


class TFDevice(NamedTuple):
    lut: jnp.ndarray  # (S, 4) float32 (CDF-rewritten if needed)
    window_left: jnp.ndarray  # ()
    window_width: jnp.ndarray  # ()


class SceneDevice(NamedTuple):
    density: GridDevice
    emission: Optional[GridDevice]
    env: EnvDevice
    tf: Optional[TFDevice]


class TraceParams(NamedTuple):
    """Per-dispatch scalars (uniforms of renderer.cpp:90-138)."""

    cam_pos: jnp.ndarray  # (3,)
    cam_transform: jnp.ndarray  # (3, 3) view->world rotation
    cam_fov: jnp.ndarray  # () degrees
    bb_min: jnp.ndarray  # (3,) world, clip planes applied
    bb_max: jnp.ndarray  # (3,)
    majorant: jnp.ndarray  # () global majorant * density_scale
    inv_majorant: jnp.ndarray  # ()
    albedo: jnp.ndarray  # (3,)
    phase_g: jnp.ndarray  # ()
    density_scale: jnp.ndarray  # ()
    emission_scale: jnp.ndarray  # ()
    emission_norm: jnp.ndarray  # ()
    bounces: jnp.ndarray  # () int32
    show_environment: jnp.ndarray  # () int32
    seed: jnp.ndarray  # () uint32


class TraceConfig(NamedTuple):
    """Static (compile-time) switches — the GLSL #define variants."""

    use_dda: bool = True
    use_tf: bool = False
    has_emission: bool = False
    max_steps: int = 8192  # safety bound on masked tracking loops
    max_bounces_static: int = 0  # 0 = dynamic (params.bounces)


def upload_grid(brick_grid, volume_transform: np.ndarray) -> GridDevice:
    """BrickGrid (host) -> GridDevice. ``volume_transform`` is the Volume's
    world transform composed on top of the grid transform
    (renderer.cpp:112-113: vol_density_transform = volume.transform *
    grid.transform)."""
    t = np.asarray(volume_transform, np.float64) @ np.asarray(
        brick_grid.transform, np.float64
    )
    inv = np.linalg.inv(t)
    atlas = brick_grid.atlas.reshape(brick_grid.atlas.shape[0], -1)
    return GridDevice(
        indirection=jnp.asarray(brick_grid.indirection.astype(np.int32)),
        range_minmax=jnp.asarray(brick_grid.range),
        mips=tuple(jnp.asarray(m) for m in brick_grid.range_mips),
        atlas=jnp.asarray(atlas),
        transform=jnp.asarray(t.astype(np.float32)),
        inv_transform=jnp.asarray(inv.astype(np.float32)),
    )


def build_alias_table(weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vose's alias method over flat nonnegative weights."""
    w = np.asarray(weights, np.float64).reshape(-1)
    n = w.size
    total = w.sum()
    if total <= 0.0:
        return np.ones(n, np.float32), np.arange(n, dtype=np.int32)
    p = w * (n / total)
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    return prob.astype(np.float32), alias


def upload_environment(env) -> EnvDevice:
    prob, alias = build_alias_table(env.impmap_mips[0])
    return EnvDevice(
        envmap=jnp.asarray(env.envmap),
        imp_mips=tuple(jnp.asarray(m) for m in env.impmap_mips),
        transform=jnp.asarray(np.asarray(env.transform, np.float32)),
        inv_transform=jnp.asarray(
            np.linalg.inv(np.asarray(env.transform, np.float64)).astype(np.float32)
        ),
        strength=jnp.asarray(np.float32(env.strength)),
        alias_prob=jnp.asarray(prob),
        alias_idx=jnp.asarray(alias),
    )


def upload_transferfunc(tf) -> TFDevice:
    return TFDevice(
        lut=jnp.asarray(tf.device_lut()),
        window_left=jnp.asarray(np.float32(tf.window_left)),
        window_width=jnp.asarray(np.float32(tf.window_width)),
    )
