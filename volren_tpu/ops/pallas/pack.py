"""Kernel-side scene packing for the Pallas megakernel engine.

The Mosaic gather toolkit (probes/results/pallas3/4.jsonl) fetches from
(R, 128) tables: within-128-lane `dynamic_gather` shuffles plus a
mask-reduce row scan (kernel.py). Every scene table is therefore packed
into (rows, 128) form here, ONCE per commit, on device (jnp ops — no
host round-trip):

  atlas_p   (S, 128) i32   512 u8 voxels per brick slot, 4-packed LE
  meta_*    (Bp, 128)      brick indirection slot / range-min / range-max
  mip_maj   (Mp, 128) f32  flat majorant pyramid (levels 0..3)
  env_*     (Ep, 128) f32  flat equirect envmap channels (v-order rows)

Scalar (per-dispatch) parameters ride in two rows built per trace call by
`build_params_rows`: pf (1, 128) f32 and pi (1, 16) i32 — see the PF_* /
PI_* index constants.

The NEE environment sample rides in a POOL (build_env_pool): M
importance-distributed samples drawn OUTSIDE the kernel through the exact
alias-table sampler (ops.envmap.sample_environment_alias); in-kernel a
lane draws one uniform and picks a pool row. The pool is i.i.d. from the
same texel distribution, so the estimator is unbiased — reuse across
lanes only correlates samples (standard sample-reuse; noise at the
measured pool size is far below path-tracing noise). This replaces a
262144-row alias-table gather that cannot fit VMEM next to the atlas.

Reference behaviours matched: brick/majorant layout common.glsl:217-328,
alias NEE distribution common.glsl:100-152 (via the alias-table
equivalence, scene.build_alias_table).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# pf (1, 128) f32 slot map
PF_CAM_POS = 0        # 3
PF_CAM_XFORM = 3      # 9 row-major (3,3)
PF_ZCAM = 12          # -0.5 / tan(fov/2)
PF_BB_MIN = 13        # 3
PF_BB_MAX = 16        # 3
PF_MAJORANT = 19
PF_INV_MAJORANT = 20
PF_ALBEDO = 21        # 3
PF_PHASE_G = 24
PF_DENSITY_SCALE = 25
PF_INV_XFORM = 26     # 16 row-major (4,4) world->index
PF_ENV_INV = 42       # 9 row-major (3,3)
PF_ENV_XFORM = 51     # 9 row-major (3,3)
PF_ENV_STRENGTH = 60
PF_IMP_AVG = 61
PF_SHOW_ENV = 62      # 0.0 / 1.0
PF_TF_LEFT = 63       # TF density window (transferfunc.cpp:79-93)
PF_TF_WIDTH = 64
PF_EMI_SCALE = 65     # emission_scale (common.glsl:324-328)
PF_EMI_NORM = 66      # 1 / emission majorant
PF_EMI_X = 67         # 16 row-major (4,4): density-index -> emission-index
PF_MIP_LO = 83        # 4 per-level u8-mip dequant offsets (build_mip_u8)
PF_MIP_SCALE = 87     # 4 per-level u8-mip dequant scales

# pi (1, 16) i32 slot map
PI_WIDTH = 0
PI_HEIGHT = 1
PI_SPP_BASE = 2
PI_BOUNCES = 3
PI_SEED = 4           # uint32 bitcast
PI_PIX0 = 5           # flat-pixel offset of strip 0 (tile origin)


class PackedMeta(NamedTuple):
    """Static (hashable) shape metadata — jit cache key material."""

    n_bricks: tuple          # (bx, by, bz)
    mip_dims: tuple          # ((z, y, x) x 4)
    mip_offsets: tuple       # (4,)
    n_slots: int             # atlas rows S
    meta_rows: int           # Bp
    mip_rows: int            # Mp
    env_h: int
    env_w: int
    env_rows: int            # Ep
    pool_rows: int           # Pp
    tf_rows: int = 0         # TF LUT channel rows (0 = no TF kernel)
    tf_size: int = 0         # TF LUT bins
    emi_n_bricks: tuple = (0, 0, 0)   # emission grid (bx, by, bz)
    emi_meta_rows: int = 0
    emi_n_slots: int = 0     # emission atlas rows (0 = no emission)


class PackedScene(NamedTuple):
    atlas_p: jnp.ndarray     # (S, 128) int32
    meta_slot: jnp.ndarray   # (Bp, 128) int32
    meta_lo: jnp.ndarray     # (Bp, 128) float32
    meta_hi: jnp.ndarray     # (Bp, 128) float32
    mip_maj: jnp.ndarray     # (Mp, 128) float32
    env_r: jnp.ndarray       # (Ep, 128) float32
    env_g: jnp.ndarray
    env_b: jnp.ndarray
    env_rgbe: jnp.ndarray    # (Ep, 128) int32 shared-exponent pack
    # TF LUT channels, (tf_rows, 128) f32 ((1,128) zero dummies when the
    # scene has no TF — pytree shape must be commit-stable)
    tf_r: jnp.ndarray
    tf_g: jnp.ndarray
    tf_b: jnp.ndarray
    tf_a: jnp.ndarray
    # emission brick grid ((1,128) dummies when absent)
    emi_atlas_p: jnp.ndarray  # (Se, 128) int32
    emi_slot: jnp.ndarray     # (Bep, 128) int32
    emi_lo: jnp.ndarray
    emi_hi: jnp.ndarray
    meta: PackedMeta


def rgbe_encode(rgb):
    """(N, 3) f32 -> (N,) i32 shared-exponent pack: 8-bit mantissas +
    8-bit exponent of the max channel (the Radiance-HDR idea — the
    reference's .hdr assets carry exactly this precision natively).
    Decode contract (kernel._rgbe_decode): c = mi * 2^(e_stored - 135).
    Worst-case relative error 1/256 on the max channel; used ONLY for
    the Pallas engine's escape fetch, where it cuts the dominant
    (env_rows, 128) table scan from three tables to one."""
    rgb = jnp.maximum(rgb, 0.0)
    m = jnp.max(rgb, axis=-1)
    e = jnp.floor(jnp.log2(jnp.maximum(m, 1e-37))).astype(jnp.int32)
    e = jnp.clip(e, -119, 119)
    scale = jnp.exp2(7.0 - e.astype(jnp.float32))
    mi = jnp.minimum(jnp.round(rgb * scale[:, None]), 255.0).astype(
        jnp.int32)
    word = mi[:, 0] | (mi[:, 1] << 8) | (mi[:, 2] << 16) | ((e + 128) << 24)
    return jnp.where(m >= 2.0 ** -119, word, 0)


def rgbe_decode_np(word):
    """numpy reference decode for tests (matches kernel._rgbe_decode)."""
    word = np.asarray(word).astype(np.int64) & 0xFFFFFFFF
    e = ((word >> 24) & 255).astype(np.int64)
    scale = np.exp2((e - 135).astype(np.float64)).astype(np.float32)
    return np.stack([
        (word & 255).astype(np.float32) * scale,
        ((word >> 8) & 255).astype(np.float32) * scale,
        ((word >> 16) & 255).astype(np.float32) * scale,
    ], axis=-1)


def _pad_rows(flat, fill=0):
    # min 8 rows: Mosaic's dynamic_gather rejects operands shorter than
    # one native (8,128) tile — a 256-bin TF LUT (2 rows) or a tiny
    # volume's meta table crashes lowering with "Shape mismatch in
    # input, indices and output" (round-4 anim probe, dicom_tf stage).
    # Pad rows are zeros and are never indexed (row ids < true count).
    n = flat.shape[0]
    rows = max(8, -(-n // 128))
    pad = rows * 128 - n
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), fill, flat.dtype)])
    return flat.reshape(rows, 128)


VMEM_ATLAS_SLOTS = 12288       # 6 MB packed: all-VMEM kernel's atlas gate
HBM_RESIDENT_BYTES = 8 << 20   # non-atlas tables must fit VMEM in hbm mode


def kernel_plan(scene, cfg):
    """How the Pallas kernel can run this scene:

    * ``"vmem"`` — every table VMEM-resident (atlases <= 12288 slots);
      the round-3/4 kernel.
    * ``"hbm"``  — the density atlas stays in HBM and resolve serves
      fetch demanded brick rows by per-round DMA (kernel._dma_atlas
      machinery, round-5); everything else (brick meta, majorant mips,
      env, NEE pool, TF LUT, emission tables) must still fit VMEM.
      This removes the reference's only scale limit analogue: GPU
      memory (/root/reference/README.md:6-8, renderer.cpp:159-225).
    * ``None`` — not runnable by the kernel (fallback engines apply).
    """
    d_rows = int(scene.density.atlas.shape[0])
    e_rows = 0
    if cfg.has_emission and scene.emission is not None:
        e_rows = int(scene.emission.atlas.shape[0])
    tf_bins = 0
    if cfg.use_tf:
        if scene.tf is None:
            return None
        tf_bins = int(scene.tf.lut.shape[0])
        if tf_bins > 2048:
            return None
    if d_rows + e_rows <= VMEM_ATLAS_SLOTS:
        return "vmem"
    # hbm mode: density atlas unlimited; everything else VMEM-resident
    def brick_rows(g):
        bx, by, bz = g.n_bricks
        return -(-bx * by * bz // 128)
    g = scene.density
    resident = brick_rows(g) * 512 * 3               # slot/lo/hi
    mip_n = sum(int(z * y * x) for z, y, x in g.mip_dims)
    resident += -(-mip_n // 128) * 512               # f32 mips (worst case)
    e = scene.env.envmap
    resident += -(-int(e.shape[0] * e.shape[1]) // 128) * 512  # rgbe
    resident += POOL_N * 4 * 7                       # NEE pool
    resident += -(-tf_bins // 128) * 512 * 4
    if e_rows:
        if e_rows > VMEM_ATLAS_SLOTS:
            return None                  # emission atlas still VMEM-only
        ge = scene.emission
        resident += e_rows * 512 + brick_rows(ge) * 512 * 3
    if resident <= HBM_RESIDENT_BYTES:
        return "hbm"
    return None


def supports_scene(scene, cfg) -> bool:
    """True when the Pallas kernel can run the scene in ANY mode (see
    kernel_plan)."""
    return kernel_plan(scene, cfg) is not None


def _morton3(x, y, z):
    """30-bit 3D Morton code (10 bits/axis covers 1024^3 bricks =
    8192^3 voxels, far past any in-memory grid)."""
    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _pack_brick_tables(g):
    """(atlas_p, slot, lo, hi) (rows,128) tables for one brick grid.

    Atlas slots are permuted into MORTON order of their owning brick
    (VOLREN_PALLAS_MORTON=0 keeps allocation order): spatially-near
    bricks land in the same scan block, so the block-skipped resolve
    fetch — the kernel's #1 cost slice (probes/results/pallas16.jsonl)
    — touches fewer blocks per serve, and HBM-mode row DMAs cluster.
    Pure relabeling: images are bitwise identical (same decoded
    values through a permuted slot table)."""
    a = g.atlas.astype(jnp.int32).reshape(-1, 128, 4)
    atlas_p = (a[..., 0] | (a[..., 1] << 8) | (a[..., 2] << 16)
               | (a[..., 3] << 24))
    m = g.brick_meta.reshape(-1, 3)
    slot = m[:, 0].astype(jnp.int32)
    s0 = int(atlas_p.shape[0])
    if s0 > 1 and os.environ.get("VOLREN_PALLAS_MORTON", "1") == "1":
        bx, by, bz = (int(v) for v in g.n_bricks)
        nb = bx * by * bz
        bidx = jnp.arange(nb, dtype=jnp.int32)
        key_b = _morton3(bidx % bx, (bidx // bx) % by, bidx // (bx * by))
        occ = m[:nb, 2] > m[:nb, 1]      # constant bricks own no slot
        big = jnp.int32(0x7FFFFFFF)
        owner = jnp.full((s0,), big, jnp.int32).at[
            jnp.where(occ, jnp.clip(slot[:nb], 0, s0 - 1), 0)
        ].min(jnp.where(occ, key_b, big))
        perm = jnp.argsort(owner)        # old slot ids in Morton order
        inv = jnp.zeros((s0,), jnp.int32).at[perm].set(
            jnp.arange(s0, dtype=jnp.int32))
        atlas_p = atlas_p[perm]
        slot = inv[jnp.clip(slot, 0, s0 - 1)]
    if atlas_p.shape[0] < 8:     # same Mosaic >= (8,128) tile rule
        atlas_p = jnp.concatenate(
            [atlas_p, jnp.zeros((8 - atlas_p.shape[0], 128),
                                jnp.int32)])
    return (atlas_p, _pad_rows(slot),
            _pad_rows(m[:, 1]), _pad_rows(m[:, 2]))


def pack_scene(scene, use_tf=None, use_emission=None) -> PackedScene:
    """Pack the scene for the kernel. ``use_tf`` / ``use_emission``
    default to presence on the scene; pass False to build the leaner
    no-TF/no-emission kernel for a scene that has them."""
    g = scene.density
    bx, by, bz = g.n_bricks
    # --- atlas: (S, 512) u8 -> (S, 128) i32 little-endian; brick meta
    # flat z-major (matches grid._brick_index:
    # bidx = (vz>>3)*(by*bx) + (vy>>3)*bx + (vx>>3))
    atlas_p, meta_slot, meta_lo, meta_hi = _pack_brick_tables(g)
    mip_maj = _pad_rows(g.mip_maj)
    # --- envmap channels, flat v-order rows (matches envmap._bilinear)
    e = scene.env.envmap
    eh, ew = int(e.shape[0]), int(e.shape[1])
    flat = e.reshape(eh * ew, -1)
    env_r = _pad_rows(flat[:, 0])
    env_g = _pad_rows(flat[:, 1])
    env_b = _pad_rows(flat[:, 2])
    env_rgbe = _pad_rows(rgbe_encode(flat[:, :3]))
    # --- TF LUT channels (common.glsl:195-212 windowed lerp runs
    # in-kernel; the LUT is CDF-rewritten on the host, transferfunc.py)
    if use_tf is None:
        use_tf = scene.tf is not None
    dummy_f = jnp.zeros((1, 128), jnp.float32)
    dummy_i = jnp.zeros((1, 128), jnp.int32)
    if use_tf:
        lut = scene.tf.lut
        tf_size = int(lut.shape[0])
        tf_r = _pad_rows(lut[:, 0])
        tf_g = _pad_rows(lut[:, 1])
        tf_b = _pad_rows(lut[:, 2])
        tf_a = _pad_rows(lut[:, 3])
        tf_rows = int(tf_r.shape[0])
    else:
        tf_size = tf_rows = 0
        tf_r = tf_g = tf_b = tf_a = dummy_f
    # --- emission brick grid (common.glsl:324-328)
    if use_emission is None:
        use_emission = scene.emission is not None
    if use_emission and scene.emission is not None:
        ge = scene.emission
        ebx, eby, ebz = ge.n_bricks
        emi_atlas_p, emi_slot, emi_lo, emi_hi = _pack_brick_tables(ge)
        emi_n_slots = int(emi_atlas_p.shape[0])
        emi_meta_rows = int(emi_slot.shape[0])
    else:
        ebx = eby = ebz = 0
        emi_atlas_p, emi_slot = dummy_i, dummy_i
        emi_lo = emi_hi = dummy_f
        emi_n_slots = emi_meta_rows = 0
    meta = PackedMeta(
        n_bricks=(bx, by, bz),
        mip_dims=tuple(tuple(d) for d in g.mip_dims),
        mip_offsets=tuple(g.mip_offsets),
        n_slots=int(atlas_p.shape[0]),
        meta_rows=int(meta_slot.shape[0]),
        mip_rows=int(mip_maj.shape[0]),
        env_h=eh,
        env_w=ew,
        env_rows=int(env_r.shape[0]),
        pool_rows=POOL_N // 128,
        tf_rows=tf_rows,
        tf_size=tf_size,
        emi_n_bricks=(ebx, eby, ebz),
        emi_meta_rows=emi_meta_rows,
        emi_n_slots=emi_n_slots,
    )
    return PackedScene(atlas_p, meta_slot, meta_lo, meta_hi, mip_maj,
                       env_r, env_g, env_b, env_rgbe,
                       tf_r, tf_g, tf_b, tf_a,
                       emi_atlas_p, emi_slot, emi_lo, emi_hi, meta)


def _mip_level_slices(meta):
    """Per-level (offset, count) of the flat majorant pyramid."""
    out = []
    for m in range(4):
        z, y, x = meta.mip_dims[m]
        out.append((int(meta.mip_offsets[m]), int(z * y * x)))
    return tuple(out)


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("levels",))
def _build_mip_u8_jit(mip_flat, levels):
    lo4, sc4, segs = [], [], []
    for off, n in levels:
        seg = mip_flat[off:off + n]
        lo = jnp.min(seg)
        hi = jnp.max(seg)
        # scale slightly INFLATED so q=255 decodes to >= hi despite fp
        # rounding; lo + q*sc >= v for every v (quantize-UP contract)
        sc = (hi - lo) * (1.0 / 254.99)
        q = jnp.where(sc > 0.0,
                      jnp.ceil((seg - lo) / jnp.maximum(sc, 1e-37)),
                      0.0)
        q = jnp.clip(q, 0.0, 255.0)
        # fp-safety bump: decode must dominate the true value
        q = jnp.clip(jnp.where(lo + q * sc < seg, q + 1.0, q), 0.0, 255.0)
        lo4.append(lo)
        sc4.append(sc)
        segs.append(q.astype(jnp.int32))
    flat_q = jnp.concatenate(segs)
    n = flat_q.shape[0]
    pad = -(-n // 4) * 4 - n
    if pad:
        flat_q = jnp.concatenate([flat_q, jnp.zeros((pad,), jnp.int32)])
    b = flat_q.reshape(-1, 4)
    words = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24))
    return _pad_rows(words), jnp.stack(lo4), jnp.stack(sc4)


def build_mip_u8(mip_tab, meta):
    """Quantize the (rows, 128) f32 majorant table (already fully baked:
    density_scale and any TF alpha transform applied) to per-level u8,
    ROUNDING UP — decode (lo_l + q*sc_l) >= true value for every entry,
    so every null-collision estimator stays unbiased (the majorant
    contract of common.glsl:399-501; a looser majorant only adds null
    collisions). 4x fewer table rows than f32 => 4x cheaper march scans
    (the fetch-bound kernel's per-step cost tracks rows touched).

    Returns (words (rows/4ish, 128) i32, lo (4,) f32, scale (4,) f32)."""
    levels = _mip_level_slices(meta)
    n_total = levels[-1][0] + levels[-1][1]
    return _build_mip_u8_jit(mip_tab.reshape(-1)[:n_total], levels)


# env NEE sample pool size (rows = POOL_N/128). 16384 default; smaller
# pools cut the full-lane pool-scan cost linearly at the price of more
# sample reuse correlation (still unbiased — i.i.d. draws from the
# exact alias distribution; noise at 8k samples remains far below
# path-tracing noise for <= 4096 spp frames)
POOL_N = int(os.environ.get("VOLREN_POOL_N", "16384"))


def build_env_pool(scene, seed: int, spp_base: int):
    """M = POOL_N alias-table env samples as seven (128, 128) f32 tables:
    w_i xyz, pdf, le rgb. Deterministic in (seed, spp_base) so a render is
    reproducible; drawn through the exact sampler the XLA engines use."""
    from ..envmap import sample_environment_alias

    rng = np.random.default_rng((int(seed) * 2654435761 + spp_base) % 2**63)
    u2 = jnp.asarray(rng.random((POOL_N, 2), np.float32))
    uv_x, uv_y, pdf, w_i, le_texel = sample_environment_alias(scene.env, u2)
    le = scene.env.strength * le_texel
    rows = POOL_N // 128
    return {
        "wx": w_i[:, 0].reshape(rows, 128),
        "wy": w_i[:, 1].reshape(rows, 128),
        "wz": w_i[:, 2].reshape(rows, 128),
        "pdf": pdf.reshape(rows, 128),
        "ler": le[:, 0].reshape(rows, 128),
        "leg": le[:, 1].reshape(rows, 128),
        "leb": le[:, 2].reshape(rows, 128),
        # radiance channels RGBE-packed into ONE i32 table: the NEE
        # serve scans 5 tables instead of 7 (the pool fetch was +7.8
        # us/step in the round-4 attribution). Same 1/256 precision the
        # reference's .hdr assets carry on disk (kernel pool_rgbe flag)
        "lergbe": rgbe_encode(le).reshape(rows, 128),
    }


def build_params_rows(scene, params, width, full_height, spp_base, pix0=0,
                      mip_dq=None):
    """(pf (1,128) f32, pi (1,16) i32) for one trace dispatch.
    ``mip_dq`` = (lo (4,), scale (4,)) u8-mip dequant rows from
    build_mip_u8 when the trace uses the quantized majorant table."""
    f32 = jnp.float32
    pf = jnp.zeros((128,), f32)

    def put(off, val):
        nonlocal pf
        val = jnp.asarray(val, f32).reshape(-1)
        return pf.at[off:off + val.shape[0]].set(val)

    pf = put(PF_CAM_POS, params.cam_pos)
    pf = put(PF_CAM_XFORM, params.cam_transform.reshape(-1))
    from ..geometry import M_PI

    z_cam = -0.5 / jnp.tan(0.5 * M_PI * params.cam_fov / 180.0)
    pf = put(PF_ZCAM, z_cam)
    pf = put(PF_BB_MIN, params.bb_min)
    pf = put(PF_BB_MAX, params.bb_max)
    pf = put(PF_MAJORANT, params.majorant)
    pf = put(PF_INV_MAJORANT, params.inv_majorant)
    pf = put(PF_ALBEDO, params.albedo)
    pf = put(PF_PHASE_G, params.phase_g)
    pf = put(PF_DENSITY_SCALE, params.density_scale)
    pf = put(PF_INV_XFORM, scene.density.inv_transform.reshape(-1))
    pf = put(PF_ENV_INV, scene.env.inv_transform.reshape(-1))
    pf = put(PF_ENV_XFORM, scene.env.transform.reshape(-1))
    pf = put(PF_ENV_STRENGTH, scene.env.strength)
    pf = put(PF_IMP_AVG, scene.env.imp_mips[-1].reshape(()))
    pf = put(PF_SHOW_ENV, params.show_environment.astype(f32))
    if scene.tf is not None:
        pf = put(PF_TF_LEFT, scene.tf.window_left)
        pf = put(PF_TF_WIDTH, scene.tf.window_width)
    if scene.emission is not None:
        pf = put(PF_EMI_SCALE, params.emission_scale)
        pf = put(PF_EMI_NORM, params.emission_norm)
        # one combined (4,4): density-index -> world -> emission-index
        # (lookup_emission's two hops, ops/grid.py:193-213, pre-composed)
        emi_x = scene.emission.inv_transform @ scene.density.transform
        pf = put(PF_EMI_X, emi_x.reshape(-1))
    if mip_dq is not None:
        pf = put(PF_MIP_LO, mip_dq[0])
        pf = put(PF_MIP_SCALE, mip_dq[1])

    pi = jnp.zeros((16,), jnp.int32)
    pi = pi.at[PI_WIDTH].set(jnp.asarray(width, jnp.int32))
    pi = pi.at[PI_HEIGHT].set(jnp.asarray(full_height, jnp.int32))
    pi = pi.at[PI_SPP_BASE].set(jnp.asarray(spp_base, jnp.int32))
    pi = pi.at[PI_BOUNCES].set(params.bounces.astype(jnp.int32))
    pi = pi.at[PI_SEED].set(
        jax_bitcast_u32_i32(params.seed))
    pi = pi.at[PI_PIX0].set(jnp.asarray(pix0, jnp.int32))
    return pf.reshape(1, 128), pi.reshape(1, 16)


def jax_bitcast_u32_i32(x):
    import jax

    return jax.lax.bitcast_convert_type(
        jnp.asarray(x, jnp.uint32), jnp.int32)
