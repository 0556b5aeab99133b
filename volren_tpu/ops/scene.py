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
    """Brick grid on device. Shapes carry the static brick dims.

    Layouts are gather-optimized: random lookups on this TPU runtime cost
    per gather OP far more than per gathered byte, so everything needed at
    one brick is packed into a single wide row.
    """

    # (bz, by, bx, 3) float32: [atlas slot, range min, range max] — one row
    # gather decodes a voxel together with `atlas`
    brick_meta: jnp.ndarray
    # flat concat of the majorant pyramid levels 0..3 (level 0 = per-brick
    # range max), each flattened [z, y, x] — one gather serves any mip
    mip_maj: jnp.ndarray
    # static python metadata derived from shapes (not traced):
    # mip level dims [(z, y, x) x 4] and flat offsets [4]
    atlas: jnp.ndarray  # (n_slots, 512) uint8, voxel order (z, y, x)
    transform: jnp.ndarray  # (4, 4) index -> world (volume xform folded in)
    inv_transform: jnp.ndarray  # (4, 4) world -> index

    @property
    def n_bricks(self):
        bz, by, bx = self.brick_meta.shape[:3]
        return bx, by, bz

    @property
    def mip_dims(self):
        """Static per-level (z, y, x) dims of the majorant pyramid."""
        bz, by, bx = self.brick_meta.shape[:3]
        dims = [(bz, by, bx)]
        for _ in range(3):
            z, y, x = dims[-1]
            dims.append((max(1, -(-z // 2)), max(1, -(-y // 2)), max(1, -(-x // 2))))
        return dims

    @property
    def mip_offsets(self):
        offs = [0]
        for z, y, x in self.mip_dims[:-1]:
            offs.append(offs[-1] + z * y * x)
        return offs


class EnvDevice(NamedTuple):
    envmap: jnp.ndarray  # (H, W, 3) float32, rows in v-order
    imp_mips: tuple  # (512^2, 256^2, ..., 1^2) float32
    transform: jnp.ndarray  # (3, 3)
    inv_transform: jnp.ndarray  # (3, 3)
    strength: jnp.ndarray  # () float32
    # O(1) texel sampling (Vose alias table over imp_mips[0]); draws the
    # exact same texel distribution as the hierarchical mip warp — the warp's
    # box-filtered pyramid telescopes to P(texel) = w / (N * avg).
    # Packed (D*D, 4) float32 rows [keep_prob, alias_idx, own_pdf, alias_pdf]
    # so one gather serves the whole sample (pdf = w/avg * 1/4pi, solid-angle
    # convention of common.glsl:143-145; idx exact in f32 for D<=4096)
    alias_packed: jnp.ndarray


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
    meta = np.concatenate(
        [
            brick_grid.indirection.astype(np.float32)[..., None],
            brick_grid.range,
        ],
        axis=-1,
    )
    # majorant pyramid: level 0 = per-brick max, then the 3 stored mips
    # (pyramid dims follow ceil-halving, matching GridDevice.mip_dims)
    mips = brick_grid.range_mips
    expect = []
    z, y, x = brick_grid.range.shape[:3]
    for _ in range(3):
        z, y, x = max(1, -(-z // 2)), max(1, -(-y // 2)), max(1, -(-x // 2))
        expect.append((z, y, x))
    if len(mips) < 3 or any(m.shape[:3] != e for m, e in zip(mips, expect)):
        from ..voldata.brick import build_range_mips

        mips = build_range_mips(brick_grid.range)
    maj_levels = [brick_grid.range[..., 1]] + [m[..., 1] for m in mips]
    mip_maj = np.concatenate([m.reshape(-1) for m in maj_levels])
    return GridDevice(
        brick_meta=jnp.asarray(meta),
        mip_maj=jnp.asarray(mip_maj.astype(np.float32)),
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
    w = np.asarray(env.impmap_mips[0], np.float32).reshape(-1)
    avg = float(env.impmap_mips[-1].reshape(()))
    inv_4pi = 1.0 / (4.0 * np.pi)
    pdf = w / max(avg, 1e-20) * inv_4pi
    packed = np.stack(
        [prob, alias.astype(np.float32), pdf, pdf[alias]], axis=-1
    ).astype(np.float32)
    return EnvDevice(
        envmap=jnp.asarray(env.envmap),
        imp_mips=tuple(jnp.asarray(m) for m in env.impmap_mips),
        transform=jnp.asarray(np.asarray(env.transform, np.float32)),
        inv_transform=jnp.asarray(
            np.linalg.inv(np.asarray(env.transform, np.float64)).astype(np.float32)
        ),
        strength=jnp.asarray(np.float32(env.strength)),
        alias_packed=jnp.asarray(packed),
    )


def upload_transferfunc(tf) -> TFDevice:
    return TFDevice(
        lut=jnp.asarray(tf.device_lut()),
        window_left=jnp.asarray(np.float32(tf.window_left)),
        window_width=jnp.asarray(np.float32(tf.window_width)),
    )
