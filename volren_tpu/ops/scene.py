"""Device-side scene structures (pytrees) and host->device upload.

The reference binds ~35 uniforms + 8 textures per trace dispatch
(/root/reference/src/renderer.cpp:78-145). Here the equivalents are two
pytrees: ``SceneDevice`` (bulk arrays uploaded once per commit — brick
grids, envmap, importance pyramid, TF LUT) and ``TraceParams`` (per-dispatch
scalars — camera, scales, bounds). Brick-grid arrays use a flat-slot atlas
(one linear gather index) instead of 3D textures.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
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
    # mip_maj repacked (A, 64) bf16 ROUNDED UP (conservative majorants) for
    # the MXU one-hot gather path (ops.gather.onehot_gather) — scalarized
    # gathers cost ~12 ns/elem on TPU, the one-hot matmul ~0.5 ns/elem
    mip_maj_oh: jnp.ndarray = None
    # OPTIONAL pre-decoded flat (Z*Y*X,) f32 voxel grid (absolute density,
    # decode law meta_min + u8/255 * (max-min) applied at upload with the
    # exact f32 ops the device decode uses — values are BIT-IDENTICAL to the
    # brick-path decode). Collapses a density fetch from two dependent
    # gathers (meta row + atlas byte) to ONE gather: measured on the v5e,
    # the resolve-phase gathers were 2.95 of 6.23 ms/step at 256^2, so this
    # is the single largest step cost. Built when the padded voxel extent
    # fits VOLREN_DENSE_MAX_BYTES (default 256 MB of HBM); None otherwise
    # (the brick path remains the big-volume fallback).
    dense: jnp.ndarray = None
    # OPTIONAL (Z*Y*X, 4) f32 quad rows over `dense`: row (z, y, x) holds
    # the 2x2 xy-neighbourhood [v(x,y), v(x1,y), v(x,y1), v(x1,y1)] with
    # x1/y1 clamped to the extent. A trilinear fetch (the TF classification
    # path, common.glsl:289-297) becomes TWO row gathers (z and z+1) instead
    # of EIGHT scalar gathers — gather cost on this runtime is per OP, not
    # per byte. Values and summation order are bit-identical to the 8-tap
    # path. Built when 16 bytes/voxel fits VOLREN_DENSE_MAX_BYTES.
    dense_quad: jnp.ndarray = None

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
    # (H, W, 4) float32 rows [r, g, b, 0], rows in v-order. TPU gathers
    # scalarize PER ROW (~12 ns/row regardless of row width, measured), so
    # one interleaved 4-wide row gather per bilinear tap is 3x cheaper than
    # per-channel planar fetches.
    envmap: jnp.ndarray
    imp_mips: tuple  # (512^2, 256^2, ..., 1^2) float32
    transform: jnp.ndarray  # (3, 3)
    inv_transform: jnp.ndarray  # (3, 3)
    strength: jnp.ndarray  # () float32
    # O(1) texel sampling (Vose alias table over imp_mips[0]); draws the
    # exact same texel distribution as the hierarchical mip warp — the warp's
    # box-filtered pyramid telescopes to P(texel) = w / (N * avg).
    # Packed (D*D, 10) float32 rows [keep_prob, alias_idx, own_pdf,
    # alias_pdf, own_rgb(3), alias_rgb(3)] so ONE row gather serves the
    # whole NEE sample including its radiance (pdf = w/avg * 1/4pi,
    # solid-angle convention of common.glsl:143-145; idx exact in f32 for
    # D<=4096). A split probe+result layout was measured SLOWER — the
    # dependent second gather costs more than the extra row width.
    alias_packed: jnp.ndarray
    # (H*W, 16) f32 quad rows: row (y, x) holds the four bilinear taps
    # [t(y,x), t(y,(x+1)%W), t(y1,x), t(y1,(x+1)%W)] with y1 = clip(y+1),
    # each 4-wide — ONE row gather serves a full GL-style bilinear fetch
    # (vs 4 row gathers; the escape fetch measured 1.59 of 6.23 ms/step).
    # Same f32 texels, so results are bit-identical to the 4-tap path.
    quad_rows: jnp.ndarray = None


class TFDevice(NamedTuple):
    lut: jnp.ndarray  # (S, 4) float32 (CDF-rewritten if needed)
    window_left: jnp.ndarray  # ()
    window_width: jnp.ndarray  # ()
    # (S, 2) bf16 round-up pairs [alpha_i, alpha_{i+1}] — one one-hot matmul
    # serves the lerped alpha lookup on the majorant classification path
    # (conservative: round-up lerp >= exact lerp for monotone alpha)
    alpha_oh: jnp.ndarray = None


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
    # route majorant / TF-alpha lookups through the MXU one-hot gather path
    # (bf16 round-up tables — conservative, so estimators stay unbiased;
    # collision events differ from the f32 path, so output matches in
    # distribution, not bitwise). Default on for TPU backends.
    use_onehot: bool = False
    # NEE radiance from the alias row's box-filtered texel value (zero
    # extra gathers) instead of a 4-row bilinear fetch at the jittered uv.
    # The sampled texel IS the pdf's resolution, so the estimator stays
    # unbiased wrt the importance-map distribution; output differs from the
    # GLSL reference by the in-texel filter only. Default on for TPU.
    env_nearest_nee: bool = False
    # (stage-level lane compaction lived here through round 3; it measured
    # net-negative in every engine — NOTES.md round-3 verdict,
    # probes/results/compact_ab.jsonl — and was stripped. The queue
    # engine's small persistent lane array is the load balancer that pays.)


def upload_grid(
    brick_grid, volume_transform: np.ndarray, pad_slots: bool | int = False
) -> GridDevice:
    """BrickGrid (host) -> GridDevice. ``volume_transform`` is the Volume's
    world transform composed on top of the grid transform
    (renderer.cpp:112-113: vol_density_transform = volume.transform *
    grid.transform).

    pad_slots pads the atlas slot axis so animation frames share one
    compiled program: jit keys programs on every scene leaf's shape, and
    occupancy (= slot count) varies frame-to-frame — without padding every
    frame of a VDB sequence recompiles the whole renderer. Padding slots
    are never referenced (indirection points below the real slot count).
    True = bucket to the next power of two; an int = pad to exactly that
    slot count (commit() passes the pow2 bucket of the max across ALL
    frames so sequences straddling a pow2 boundary still share one shape).
    False for single-frame scenes so their exact-shape programs stay
    cache-stable across sessions."""
    t = np.asarray(volume_transform, np.float64) @ np.asarray(
        brick_grid.transform, np.float64
    )
    inv = np.linalg.inv(t)
    atlas = brick_grid.atlas.reshape(brick_grid.atlas.shape[0], -1)
    if pad_slots:
        n_slots = atlas.shape[0]
        if pad_slots is True:
            bucket = max(16, 1 << max(0, n_slots - 1).bit_length())
        else:
            bucket = max(int(pad_slots), n_slots)
        if bucket > n_slots:
            atlas = np.pad(atlas, ((0, bucket - n_slots), (0, 0)))
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
    from .gather import pack_onehot_table

    atlas_dev = jnp.asarray(atlas)
    meta_dev = jnp.asarray(meta)
    return GridDevice(
        brick_meta=meta_dev,
        mip_maj=jnp.asarray(mip_maj.astype(np.float32)),
        atlas=atlas_dev,
        transform=jnp.asarray(t.astype(np.float32)),
        inv_transform=jnp.asarray(inv.astype(np.float32)),
        mip_maj_oh=pack_onehot_table(mip_maj, round_up=True),
        **_dense_tables(brick_grid, atlas_dev, meta_dev),
    )


def _dense_tables(brick_grid, atlas_dev, meta_dev):
    """dense / dense_quad, decoded ON DEVICE from the already-uploaded u8
    atlas + brick meta (VOLREN_HOST_DECODE=1 reverts to the host build).

    The decoded tables are 4 B + 16 B per voxel while the atlas is 1 B per
    OCCUPIED voxel: shipping only the atlas cuts commit()'s host->device
    volume ~20x, which dominates animation cold-reload through the
    tunneled runtime (probes/results/anim.jsonl measured 12.6 s/frame of
    commit for a 128³ frame at ~3.5 MB/s effective). The decode arithmetic
    (min + u8/255 * (max-min), f32) matches the host numpy build to 1 ULP
    (XLA contracts the mul+add into an FMA — the same contraction the
    in-kernel decode path for >VOLREN_DENSE_MAX_BYTES volumes gets, so the
    device decode is the more self-consistent semantics); asserted in
    tests/test_voldata.py."""
    bz, by, bx = brick_grid.range.shape[:3]
    n_vox = (bz * 8) * (by * 8) * (bx * 8)
    limit = int(os.environ.get("VOLREN_DENSE_MAX_BYTES", str(256 << 20)))
    if n_vox * 4 > limit:
        return {}
    if os.environ.get("VOLREN_HOST_DECODE", "0") == "1":
        return _build_dense_tables(brick_grid)
    want_quad = n_vox * 16 <= limit
    dense, quad = _decode_dense_jit(atlas_dev, meta_dev, bz, by, bx, want_quad)
    out = {"dense": dense}
    if want_quad:
        out["dense_quad"] = quad
    return out


@partial(jax.jit, static_argnames=("bz", "by", "bx", "want_quad"))
def _decode_dense_jit(atlas_u8, meta, bz, by, bx, want_quad):
    """Decode the flat dense voxel table (and optionally the trilinear
    quad rows) from the u8 atlas on device. Indirection slots ride in
    meta[..., 0] as exact small-int f32."""
    slots = meta[..., 0].astype(jnp.int32).reshape(-1)
    rmin = meta[..., 1].reshape(-1)
    rmax = meta[..., 2].reshape(-1)
    unorm = atlas_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    vals = rmin[:, None] + unorm[slots] * (rmax - rmin)[:, None]
    vals = vals.reshape(bz, by, bx, 8, 8, 8)
    dense = vals.transpose(0, 3, 1, 4, 2, 5).reshape(bz * 8, by * 8, bx * 8)
    quad = None
    if want_quad:
        x1 = jnp.minimum(jnp.arange(bx * 8) + 1, bx * 8 - 1)
        y1 = jnp.minimum(jnp.arange(by * 8) + 1, by * 8 - 1)
        quad = jnp.stack(
            [dense, dense[:, :, x1], dense[:, y1], dense[:, y1][:, :, x1]],
            axis=-1,
        ).reshape(-1, 4)
    return dense.reshape(-1), quad


def _build_dense_tables(brick_grid):
    """Pre-decode the whole brick grid to a flat (Z*Y*X,) f32 voxel array
    (see GridDevice.dense) plus the (Z*Y*X, 4) trilinear quad rows
    (GridDevice.dense_quad). Replicates the device decode bit-for-bit:
    d = min + (u8 * f32(1/255)) * (max - min), all in f32."""
    bz, by, bx = brick_grid.range.shape[:3]
    n_vox = (bz * 8) * (by * 8) * (bx * 8)
    limit = int(os.environ.get("VOLREN_DENSE_MAX_BYTES", str(256 << 20)))
    if n_vox * 4 > limit:
        return {}
    slots = brick_grid.indirection.astype(np.int64).reshape(bz, by, bx)
    rmin = brick_grid.range[..., 0].astype(np.float32)
    rmax = brick_grid.range[..., 1].astype(np.float32)
    atlas = brick_grid.atlas.reshape(brick_grid.atlas.shape[0], 8, 8, 8)
    unorm = atlas.astype(np.float32) * np.float32(1.0 / 255.0)
    # (bz, by, bx, 8, 8, 8) local voxels (z, y, x minor order)
    vals = rmin[..., None, None, None] + unorm[slots] * (rmax - rmin)[..., None, None, None]
    dense = np.ascontiguousarray(
        vals.transpose(0, 3, 1, 4, 2, 5).reshape(bz * 8, by * 8, bx * 8)
    )
    out = {"dense": jnp.asarray(dense.reshape(-1))}
    if n_vox * 16 <= limit:
        x1 = np.minimum(np.arange(bx * 8) + 1, bx * 8 - 1)
        y1 = np.minimum(np.arange(by * 8) + 1, by * 8 - 1)
        quad = np.stack(
            [dense, dense[:, :, x1], dense[:, y1], dense[:, y1][:, :, x1]],
            axis=-1,
        )
        out["dense_quad"] = jnp.asarray(quad.reshape(n_vox, 4))
    return out


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
    # rows also carry the own/alias texels' box-filtered radiance (the
    # importance-map resolution view of the envmap) so the NEE fetch needs
    # no additional env gathers (TraceConfig.env_nearest_nee)
    dim = int(np.asarray(env.impmap_mips[0]).shape[0])
    eh, ew = np.asarray(env.envmap).shape[:2]
    # average envmap texels under each importance texel (box filter)
    fy, fx = eh // dim or 1, ew // dim or 1
    emap = np.asarray(env.envmap, np.float32)
    ph = dim * fy - eh
    pw = dim * fx - ew
    if ph or pw:  # envmap smaller than the importance map: edge-pad
        emap = np.pad(emap, ((0, max(0, ph)), (0, max(0, pw)), (0, 0)), mode="edge")
    texel_rgb = (
        emap[: dim * fy, : dim * fx]
        .reshape(dim, fy, dim, fx, 3)
        .mean(axis=(1, 3))
        .reshape(dim * dim, 3)
    )
    packed = np.concatenate(
        [
            np.stack([prob, alias.astype(np.float32), pdf, pdf[alias]], axis=-1),
            texel_rgb,
            texel_rgb[alias],
        ],
        axis=-1,
    ).astype(np.float32)
    envmap4 = np.concatenate(
        [
            np.asarray(env.envmap, np.float32),
            np.zeros((*np.asarray(env.envmap).shape[:2], 1), np.float32),
        ],
        axis=-1,
    )
    return EnvDevice(
        envmap=jnp.asarray(envmap4),
        imp_mips=tuple(jnp.asarray(m) for m in env.impmap_mips),
        transform=jnp.asarray(np.asarray(env.transform, np.float32)),
        inv_transform=jnp.asarray(
            np.linalg.inv(np.asarray(env.transform, np.float64)).astype(np.float32)
        ),
        strength=jnp.asarray(np.float32(env.strength)),
        alias_packed=jnp.asarray(packed),
        quad_rows=jnp.asarray(_build_quad_rows(envmap4)),
    )


def _build_quad_rows(envmap4: np.ndarray) -> np.ndarray:
    """(H, W, 4) -> (H*W, 16) quad rows for one-gather bilinear fetches
    (see EnvDevice.quad_rows): u wraps, v clamps, matching envmap._bilinear."""
    h, w = envmap4.shape[:2]
    x1 = (np.arange(w) + 1) % w
    y1 = np.clip(np.arange(h) + 1, 0, h - 1)
    return np.concatenate(
        [
            envmap4,
            envmap4[:, x1],
            envmap4[y1],
            envmap4[y1][:, x1],
        ],
        axis=-1,
    ).reshape(h * w, 16).astype(np.float32)


def upload_transferfunc(tf) -> TFDevice:
    from .gather import bf16_round_up

    lut = np.asarray(tf.device_lut(), np.float32)
    alpha = bf16_round_up(lut[:, 3])
    alpha_next = np.concatenate([alpha[1:], alpha[-1:]])
    return TFDevice(
        lut=jnp.asarray(lut),
        window_left=jnp.asarray(np.float32(tf.window_left)),
        window_width=jnp.asarray(np.float32(tf.window_width)),
        alpha_oh=jnp.asarray(
            np.stack([alpha, alpha_next], axis=-1), dtype=jnp.bfloat16
        ),
    )
