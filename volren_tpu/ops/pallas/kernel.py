"""The Pallas megakernel: a whole wavefront-render drain as ONE TPU op.

Architecture (probes: probes/results/pallas*.jsonl, model:
docs/ROOFLINE.md):

* The frame is cut into STRIPS of 1024 consecutive flat pixels; the
  pallas grid walks strips sequentially. Lane state is SoA over (8, 128)
  blocks — one full vreg per field — lane = pixel (fixed assignment), all
  ``spp`` samples of a pixel run back-to-back on its lane (the chunked
  -engine csize=spp semantics, so images match the XLA engines up to fp
  -contraction divergence).
* Each strip runs regen -> march(k_march, resolves every test_every) ->
  nee -> finish steps inside ONE in-kernel while_loop until every lane
  drains. In-kernel iterations cost ~us (vs ~2.2 ms/iteration for the
  XLA while_loop through this runtime — the round-3 wall).
* Random table fetches use a MASK-REDUCE gather from (rows, 128) tables:
      G[n, j] = T[n, c[j]]          (axis1 tpu.dynamic_gather — exact)
      out[j]  = sum_n (n == r[j]) * G[n, j]
  per 128-lane sublane row, scanning the table in 128-row blocks with a
  data-dependent lax.cond skip per block (a strip's active fetches
  cluster in a few bricks, so the scan cost tracks REAL work — the
  SIMT-proportionality the reference gets from divergent warps,
  shader/pathtracer_brick.glsl:3).
* The NEE environment sample comes from a pre-drawn alias-sample pool
  (pack.build_env_pool — unbiased sample reuse); the escape fetch is a
  STOCHASTIC bilinear tap (one-tap jittered nearest whose expectation is
  exactly the reference's bilinear filter, same trick as the volume's
  stochastic filters, common.glsl:221-244).

Semantics mirrored from ops/megakernel.py phase bodies (themselves cited
to /root/reference/shader/common.glsl:333-501 and pathtracer_brick.glsl);
per-(pixel, sample) TEA seeding makes every sample's stream independent,
so the kernel's extra escape-jitter draws only perturb the sample that
consumes them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import (
    PF_ALBEDO, PF_BB_MAX, PF_BB_MIN, PF_CAM_POS, PF_CAM_XFORM,
    PF_DENSITY_SCALE, PF_EMI_NORM, PF_EMI_SCALE, PF_EMI_X, PF_ENV_INV,
    PF_ENV_STRENGTH, PF_ENV_XFORM, PF_IMP_AVG, PF_INV_MAJORANT,
    PF_INV_XFORM, PF_MAJORANT, PF_MIP_LO, PF_MIP_SCALE, PF_PHASE_G,
    PF_SHOW_ENV, PF_TF_LEFT, PF_TF_WIDTH, PF_ZCAM, PI_BOUNCES,
    PI_HEIGHT, PI_PIX0, PI_SEED, PI_SPP_BASE, PI_WIDTH, POOL_N,
    PackedScene,
)

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32

M_PI = 3.14159265358979323846
INV_4PI = 1.0 / (4.0 * M_PI)
LANES = (8, 128)

MODE_INACTIVE, MODE_REGEN, MODE_EXTEND, MODE_SHADOW = 0, 1, 2, 3
EV_NONE, EV_EXT_HIT, EV_EXT_EXIT, EV_SH_HIT, EV_SH_EXIT = 0, 1, 2, 3, 4
EV_SCATTER, EV_TEST = 5, 6

# state field order (the while-loop carry). 3-vectors are 3 fields.
STATE_KEYS = (
    "mode", "event", "seed",
    "pox", "poy", "poz", "pdx", "pdy", "pdz",
    "thx", "thy", "thz", "Lx", "Ly", "Lz", "pnx", "pny", "pnz",
    "n_paths", "last_f_p", "free",
    "t", "far", "tau", "mip",
    "ix0", "iy0", "iz0", "idx", "idy", "idz", "rix", "riy", "riz",
    "spp_done",
)
# px/py are loop-invariant (closure constants); the accumulators live in
# the output refs (fewer while-loop carries: the in-kernel carry tax
# measured ~0.15 us/array/iteration, probes/results/pallas4.jsonl X3)


# ---------------------------------------------------------------------------
# rng (ops/rng.py semantics, bit-exact — probes pallas2 Q5)
# ---------------------------------------------------------------------------

def _tea(v0, v1, rounds=32):
    # unrolled (Python loop, straight-line code): a Mosaic scf.for pays
    # per-iteration loop overhead on a 12-op body; the s0 schedule is a
    # compile-time constant when unrolled. Bit-exact with ops/rng.tea.
    s0 = u32(0)
    for _ in range(rounds):
        s0 = s0 + u32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + u32(0xA341316C)) ^ (v1 + s0)
                   ^ ((v1 >> 5) + u32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + u32(0xAD90777D)) ^ (v0 + s0)
                   ^ ((v0 >> 5) + u32(0x7E95761E)))
    return v0


def _bitcast(x, dt):
    return jax.lax.bitcast_convert_type(x, dt)


def _rng(seed, active):
    new = seed * u32(1664525) + u32(1013904223)
    # Mosaic has no u32->f32 cast; the masked value fits i32, so bitcast
    uni = _bitcast(new & u32(0x00FFFFFF), i32).astype(f32) \
        * f32(1.0 / float(0x01000000))
    return jnp.where(active, new, seed), uni


# ---------------------------------------------------------------------------
# vec3 helpers on tuples of (8,128)
# ---------------------------------------------------------------------------

def _w3(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm3(v, eps=1e-20):
    inv = 1.0 / jnp.maximum(jnp.sqrt(_dot3(v, v)), eps)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _mat3_vec(m, v):
    """(v @ m.T): out_i = sum_j v_j * m[i, j]; m = 9 scalars row-major."""
    return (v[0] * m[0] + v[1] * m[1] + v[2] * m[2],
            v[0] * m[3] + v[1] * m[4] + v[2] * m[5],
            v[0] * m[6] + v[1] * m[7] + v[2] * m[8])


def _luma(c):
    return (c[0] * f32(0.212671) + c[1] * f32(0.715160)
            + c[2] * f32(0.072169))


def _sanitize(x):
    # isfinite without the isfinite primitive: x - x is 0 iff x is finite
    return jnp.where((x - x) == 0.0, x, 0.0)


def _atan_core(t):
    """atan on |t| <= tan(pi/8)+eps (musl atanf minimax, ~1e-8)."""
    z = t * t
    s = z * (f32(0.33333328366) - z * (f32(0.19999158382)
             - z * (f32(0.14253635705) - z * (f32(0.10648017377)
                    - z * f32(0.061687607318)))))
    return t - t * s


def _atan2(y, x):
    """Mosaic has no atan2 primitive; range-reduced minimax (~1e-7 rad,
    well under an envmap texel at 1024 wide)."""
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    hi = jnp.maximum(ay, ax)
    lo = jnp.minimum(ay, ax)
    t = lo / jnp.maximum(hi, f32(1e-37))
    big = t > f32(0.4142135623730951)
    tr = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    a = _atan_core(tr) + jnp.where(big, f32(M_PI / 4.0), f32(0.0))
    a = jnp.where(ay > ax, f32(M_PI / 2.0) - a, a)
    a = jnp.where(x < 0.0, f32(M_PI) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(x):
    xc = jnp.clip(x, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum((1.0 - xc) * (1.0 + xc), 0.0)), xc)


def _round_half_even(x):
    """round-to-nearest-even as i32 (Mosaic round support unverified;
    must match jnp.round for mip values k*0.25)."""
    r = jnp.floor(x + 0.5)
    ri = r.astype(i32)
    tie = (r - x) == 0.5
    odd = (ri & 1) == 1
    return jnp.where(tie & odd, ri - 1, ri)


def _align(n, v):
    """ops/geometry.align (common.glsl:25-33) in SoA form."""
    cond = jnp.abs(n[0]) > jnp.abs(n[1])
    inv_xz = 1.0 / jnp.sqrt(jnp.where(cond, n[0] * n[0] + n[2] * n[2],
                                      n[1] * n[1] + n[2] * n[2]))
    zero = jnp.zeros_like(n[0])
    t = (jnp.where(cond, -n[2], zero) * inv_xz,
         jnp.where(cond, zero, n[2]) * inv_xz,
         jnp.where(cond, n[0], -n[1]) * inv_xz)
    b = (n[1] * t[2] - n[2] * t[1],
         n[2] * t[0] - n[0] * t[2],
         n[0] * t[1] - n[1] * t[0])
    out = (v[0] * t[0] + v[1] * b[0] + v[2] * n[0],
           v[0] * t[1] + v[1] * b[1] + v[2] * n[1],
           v[0] * t[2] + v[1] * b[2] + v[2] * n[2])
    return _norm3(out)


def _hg_phase(cos_t, g):
    denom = 1.0 + g * g + 2.0 * g * cos_t
    return f32(INV_4PI) * (1.0 - g * g) / (
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)))


def _sample_hg(direction, g, u0, u1):
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u0)
    small = jnp.abs(g) < 1e-4
    cos_aniso = (1.0 + g * g - sqr * sqr) / (
        2.0 * jnp.where(small, 1.0, g))
    cos_t = jnp.where(small, 1.0 - 2.0 * u0, cos_aniso)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = f32(2.0 * M_PI) * u1
    local = (sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)
    return _align(direction, local)


def _intersect_box(org, direction, bb_min, bb_max):
    hit = None
    near = None
    far = None
    tmins, tmaxs = [], []
    for k in range(3):
        inv = 1.0 / direction[k]
        lo = (bb_min[k] - org[k]) * inv
        hi = (bb_max[k] - org[k]) * inv
        tmins.append(jnp.minimum(lo, hi))
        tmaxs.append(jnp.maximum(lo, hi))
    near = jnp.maximum(0.0, jnp.maximum(tmins[0],
                                        jnp.maximum(tmins[1], tmins[2])))
    far = jnp.minimum(tmaxs[0], jnp.minimum(tmaxs[1], tmaxs[2]))
    hit = near <= far
    return hit, near, far


def _xform_point(m16, p):
    """(4,4) @ point; m16 = 16 scalars row-major."""
    return (p[0] * m16[0] + p[1] * m16[1] + p[2] * m16[2] + m16[3],
            p[0] * m16[4] + p[1] * m16[5] + p[2] * m16[6] + m16[7],
            p[0] * m16[8] + p[1] * m16[9] + p[2] * m16[10] + m16[11])


def _xform_vec(m16, v):
    return (v[0] * m16[0] + v[1] * m16[1] + v[2] * m16[2],
            v[0] * m16[4] + v[1] * m16[5] + v[2] * m16[6],
            v[0] * m16[8] + v[1] * m16[9] + v[2] * m16[10])


# ---------------------------------------------------------------------------
# mask-reduce gather
# ---------------------------------------------------------------------------
#
# Two interchangeable, bit-identical fetch engines:
#
# * dynamic_gather form (the round-3 original): per sublane row, one
#   axis1 tpu.dynamic_gather shuffles the whole table block by that
#   row's column indices (~1 cycle/row), then a masked row-reduce picks
#   each lane's row. Cost ~1.25 cycles x rows x sublanes per table.
# * one-hot MXU form (mxu_gather=True): T[r_l, c_l] = colsum_m
#   (OHr^T @ T)[l, m] * OHc[l, m] — two matmuls, the one-hot builds are
#   2 VPU compares; full-32-bit i32 payloads (packed atlas / RGBE
#   words) ride as two 16-bit f32 halves recombined after the reduce.
#   MEASURED NEGATIVE RESULT (probes/results/pallas13.jsonl): on real
#   TPU this form is ~2.7x SLOWER than the dynamic_gather scan at the
#   champion config (69.7 vs 26.2 us/step @1024^2) — Mosaic does not
#   lower these one-hot matmuls anywhere near the systolic-array rate
#   the cost model assumed — AND Mosaic's DEFAULT f32 dot precision is
#   bf16, which truncates the 16-bit halves (mean 2.599 vs 3.631; the
#   CPU interpreter, true f32, is bit-exact). Kept flag-gated with
#   Precision.HIGHEST forced (correct everywhere, slower) as the
#   documented dead end; the dynamic_gather scan is the fetch engine.
#
# Tagged tables (mxu mode): a plain f32 array fetches directly;
# ("i24", farr) is an integer table < 2^24 pre-cast to f32 (result cast
# back); ("i32", lo, hi) is a full i32 table pre-split into exact 16-bit
# f32 halves.


def _tab_dtype(t):
    if isinstance(t, tuple):
        return f32 if t[0] == "f32" else i32
    return t.dtype


def _tab_split(t):
    """Materialized table -> tagged mxu form (split ONCE at kernel
    start; per-fetch splitting would cost what the matmul saves)."""
    if t.dtype == f32:
        return t
    return ("i32", (t & 0xFFFF).astype(f32),
            ((t >> 16) & 0xFFFF).astype(f32))


def _tab_cast_i24(t):
    """Small-integer i32 table (< 2^24: slot ids) -> tagged f32 form."""
    return ("i24", t.astype(f32)) if t.dtype != f32 else t


def _onehot_fetch_row(tabs, r1, c1, b0, bn):
    """MXU one-hot fetch: out_k[0,j] = tabs[k][r1[0,j], c1[0,j]] for
    rows in [b0, b0+bn) (rows outside the block contribute 0 — the
    block-skip contract). r1/c1 are (1,128); exact (one nonzero per
    one-hot row/col)."""
    iota_n = jax.lax.broadcasted_iota(i32, (bn, 128), 0) + b0
    ohr = jnp.where(iota_n == jnp.broadcast_to(r1, (bn, 128)),
                    f32(1.0), f32(0.0))
    iota_m = jax.lax.broadcasted_iota(i32, (128, 128), 1)
    ohc = jnp.where(iota_m == jnp.broadcast_to(c1.T, (128, 128)),
                    f32(1.0), f32(0.0))
    ones_m = jnp.ones((128, 1), f32)
    outs = []
    for t in tabs:
        tag = None
        parts = (t,)
        if isinstance(t, tuple):
            tag, parts = t[0], t[1:]
        vals = []
        for p in parts:
            pblk = p if bn == p.shape[0] else \
                jax.lax.slice_in_dim(p, b0, b0 + bn, axis=0)
            # Precision.HIGHEST (fp32 contract): Mosaic's DEFAULT
            # f32 dot is bf16-truncating (module comment; pallas13/14)
            G = jax.lax.dot_general(ohr, pblk, (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=f32)
            v = jax.lax.dot_general(G * ohc, ones_m,
                                    (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=f32)
            vals.append(v.T)            # (1,128)
        if tag == "i32":
            outs.append((vals[1].astype(i32) << 16) | vals[0].astype(i32))
        elif tag == "i24":
            outs.append(vals[0].astype(i32))
        else:
            outs.append(vals[0])
    return outs


def _scan_gather_block(tabs, r, c, b0, bn):
    """One (bn,128) row-block pass of the full-lane gather: out_k[i,j] =
    tabs[k][r[i,j], c[i,j]] if r[i,j] in [b0, b0+bn) else 0."""
    # engine dispatch keys on tabs[0]; mixed tagged/untagged lists would
    # silently take the scan path and fail at trace time on the tuples
    assert all(isinstance(t, tuple) for t in tabs) \
        or not any(isinstance(t, tuple) for t in tabs), \
        "tables must be uniformly tagged (mxu) or untagged (scan)"
    if tabs and isinstance(tabs[0], tuple):
        # tagged tables: the one-hot MXU engine, one pass per sublane row
        rows_out = [[] for _ in tabs]
        for i in range(r.shape[0]):
            vs = _onehot_fetch_row(tabs, r[i:i + 1, :], c[i:i + 1, :],
                                   b0, bn)
            for k, v in enumerate(vs):
                rows_out[k].append(v)
        return [jnp.concatenate(rs, axis=0) for rs in rows_out]
    iota_n = jax.lax.broadcasted_iota(i32, (bn, 128), 0) + b0
    ones = jnp.ones((1, bn), f32)
    out_rows = [[] for _ in tabs]
    for i in range(r.shape[0]):
        c_b = jnp.broadcast_to(c[i:i + 1, :], (bn, 128))
        r_b = jnp.broadcast_to(r[i:i + 1, :], (bn, 128))
        hit = iota_n == r_b
        for k, t in enumerate(tabs):
            tblk = t if bn == t.shape[0] else \
                jax.lax.slice_in_dim(t, b0, b0 + bn, axis=0)
            G = jnp.take_along_axis(tblk, c_b, axis=1)
            if t.dtype == f32:
                # row-sum on the MXU: exactly one nonzero per column
                # (the hit row) so the f32 matmul is exact
                masked = jnp.where(hit, G, 0.0)
                # Precision.HIGHEST = Mosaic contract_precision<fp32>
                # (exact; the DEFAULT path contracts at bf16 and
                # truncates the value operand — pallas14. Mosaic
                # supports only DEFAULT|HIGHEST)
                v = jax.lax.dot_general(
                    ones, masked, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32)
            else:
                # i32 payloads (the packed atlas words) exceed f32's
                # exact integer range — keep the native-dtype sum
                v = jnp.sum(jnp.where(hit, G, jnp.zeros((), t.dtype)),
                            axis=0, keepdims=True)
            out_rows[k].append(v)
    return [jnp.concatenate(rs, axis=0) for rs in out_rows]


def _scan_gather(tabs, r, c, rows, block=0):
    """out_k[i,j] = tabs[k][r[i,j], c[i,j]] for an (8,128) lane block.

    tabs: list of (rows, 128) VALUES (materialize refs ONCE at kernel
    start — `ref[:]` — before calling; re-slicing refs per use re-loads
    them from VMEM and was measured 10-100x slower, probes pallas5). Per
    sublane row: one axis1 tpu.dynamic_gather shuffles every table row by
    that row's column indices, then a masked row-sum picks each lane's
    row — exact, and ~vector-speed (a (896,128) gather of 1024 lanes
    measures below timing noise, results/pallas5.jsonl). r MUST be in
    [0, rows), c in [0, 128).

    block > 0 splits tall tables into lax.cond-skipped row blocks (one
    shared demand predicate across all 8 sublane rows): blocks no lane's
    row index lands in cost nothing — bit-exact (a skipped block would
    have summed exactly 0)."""
    if not block or rows <= block:
        return _scan_gather_block(tabs, r, c, 0, rows)
    outs = tuple(jnp.zeros(r.shape, _tab_dtype(t)) for t in tabs)
    for b0 in range(0, rows, block):
        bn = min(block, rows - b0)

        def do(o, b0=b0, bn=bn):
            vs = _scan_gather_block(tabs, r, c, b0, bn)
            return tuple(a + v for a, v in zip(o, vs))

        pred = jnp.any((r >= b0) & (r < b0 + bn))
        outs = lax.cond(pred, do, lambda o: tuple(o), outs)
    return list(outs)


def _prefix_ranks(mask):
    """Exclusive flat-lane-order rank of each True lane in an (8,128)
    mask, via log-shift prefix sums within rows (pltpu.roll) + static
    row-offset accumulation. Returns (rank (8,128) i32, counts (8,128)
    broadcast of the running inclusive totals' last row)."""
    x = jnp.where(mask, 1, 0).astype(i32)
    lane_iota = jax.lax.broadcasted_iota(i32, mask.shape, 1)
    s = x
    for d in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(s, d, 1)
        s = s + jnp.where(lane_iota >= d, sh, 0)
    row_tot = s[:, 127:128]                       # (nsub,1) inclusive
    offs_rows = []
    acc = jnp.zeros((1, 1), i32)
    for irow in range(mask.shape[0]):
        offs_rows.append(jnp.broadcast_to(acc, (1, 128)))
        acc = acc + row_tot[irow:irow + 1, :]
    offs = jnp.concatenate(offs_rows, axis=0)     # (8,128) exclusive
    rank = offs + s - x
    return rank, acc[0, 0]


def _compact_rows(vals, rankc, served):
    """Compact (8,128) lane values into (1,128) rank-slot rows: slot k
    gets the value of the lane with rankc == k (and ``served``); empty
    slots get 0. The K selection mask is built once per sublane row and
    shared across all fields."""
    iota_k = jax.lax.broadcasted_iota(i32, (128, 128), 0)
    outs = [jnp.zeros((1, 128), v.dtype) for v in vals]
    for irow in range(rankc.shape[0]):
        K = (iota_k == jnp.broadcast_to(rankc[irow:irow + 1, :],
                                        (128, 128))) \
            & jnp.broadcast_to(served[irow:irow + 1, :], (128, 128))
        for q, v in enumerate(vals):
            outs[q] = outs[q] + jnp.sum(
                jnp.where(K, jnp.broadcast_to(v[irow:irow + 1, :],
                                              (128, 128)),
                          jnp.zeros((), v.dtype)),
                axis=1, keepdims=True).T
    return outs


def _scan_rows_block(tabs, r_c, c_c, b0, bn):
    """One (bn, 128)-block pass of the compacted-row fetch: out_k[0,j] =
    tabs[k][r_c[0,j], c_c[0,j]] if r_c[0,j] in [b0, b0+bn) else 0."""
    assert all(isinstance(t, tuple) for t in tabs) \
        or not any(isinstance(t, tuple) for t in tabs), \
        "tables must be uniformly tagged (mxu) or untagged (scan)"
    if tabs and isinstance(tabs[0], tuple):
        return _onehot_fetch_row(tabs, r_c, c_c, b0, bn)
    iota_n = jax.lax.broadcasted_iota(i32, (bn, 128), 0) + b0
    cb = jnp.broadcast_to(c_c, (bn, 128))
    rb = jnp.broadcast_to(r_c, (bn, 128))
    hit = iota_n == rb
    ones = jnp.ones((1, bn), f32)
    outs = []
    for t in tabs:
        tblk = t if bn == t.shape[0] else \
            jax.lax.slice_in_dim(t, b0, b0 + bn, axis=0)
        G = jnp.take_along_axis(tblk, cb, axis=1)
        if t.dtype == f32:
            # row-sum on the MXU: at most one hit row per column — exact
            masked = jnp.where(hit, G, 0.0)
            # Precision.HIGHEST: fp32 contract (pallas14; Mosaic has no HIGH)
            v = jax.lax.dot_general(ones, masked, (((1,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=f32)
        else:
            v = jnp.sum(jnp.where(hit, G, jnp.zeros((), t.dtype)),
                        axis=0, keepdims=True)
        outs.append(v)
    return outs


def _scan_rows(tabs, r_c, c_c, rows, block=0):
    """Fetch tabs[k][r_c[0,j], c_c[0,j]] -> (1,128) per table: axis1
    dynamic_gather + a masked row reduce (MXU for f32 — exactly one hit
    row per column, so the matmul is exact; native sum for integer
    payloads that exceed f32's exact range).

    block > 0 splits the scan into row blocks, each behind a
    data-dependent lax.cond: blocks no compacted index lands in are
    SKIPPED, so the scan cost tracks the spread of the 128 fetches
    instead of the table height (escape/resolve fetches cluster — rays
    of one super-block hit nearby bricks / env rows). Bit-exact: a
    skipped block contributes exactly the 0 it would have summed."""
    if not block or rows <= block:
        return _scan_rows_block(tabs, r_c, c_c, 0, rows)
    outs = tuple(jnp.zeros((1, 128), _tab_dtype(t)) for t in tabs)
    for b0 in range(0, rows, block):
        bn = min(block, rows - b0)

        def do(o, b0=b0, bn=bn):
            vs = _scan_rows_block(tabs, r_c, c_c, b0, bn)
            return tuple(a + v for a, v in zip(o, vs))

        pred = jnp.any((r_c >= b0) & (r_c < b0 + bn))
        outs = lax.cond(pred, do, lambda o: tuple(o), outs)
    return list(outs)


def _route_back(rows_vals, rankc):
    """Distribute (1,128) rank-slot rows back to lanes: lane (i,j) reads
    slot rankc[i,j] (one (8,128) shuffle per table; (1,128)
    dynamic_gather operands fail Mosaic's tiling)."""
    outs = []
    for o0 in rows_vals:
        o8 = jnp.broadcast_to(o0, rankc.shape)
        outs.append(jnp.take_along_axis(o8, rankc, axis=1))
    return outs


def _compact_gather(tabs, flat_idx, rows, mask, rank=None, served=None,
                    block=0):
    """Fetch tabs[k][flat_idx >> 7, flat_idx & 127] for up to 128
    ``mask`` lanes with ONE table scan instead of 8 (the per-sublane
    passes of _scan_gather are the dominant fetch cost; active fetches
    are sparse — mean EV_TEST rate 0.85%/lane-step, NOTES.md). Returns
    (outs, served): lanes with rank >= 128 are NOT fetched this call —
    callers defer them (pure scheduling, bit-exact; the parked lane
    retries next resolve)."""
    if rank is None:
        rank, _total = _prefix_ranks(mask)
        served = mask & (rank < 128)
    rankc = jnp.where(served, rank, 127)
    (idx_c,) = _compact_rows([flat_idx], rankc, served)
    outs0 = _scan_rows(tabs, idx_c >> 7, idx_c & 127, rows, block=block)
    return _route_back(outs0, rankc), served


def _pack_carry(s, keys):
    """Pack the state dict into THREE wide carries (f32/i32/u32 stacks).

    RETIRED as the default: the loose-carry tax (~0.15 us/array/iter,
    pallas4 X3) is real, but packing the ~46-field state through
    per-iteration concatenates blew the Mosaic compile up past 70
    MINUTES for the queue kernel (vs ~16 min loose) — an unusable trade
    on a runtime whose cold compiles already dominate bench budgets.
    Kept for reference/experiments."""
    f_keys = [k for k in keys if s[k].dtype == f32]
    i_keys = [k for k in keys if s[k].dtype == i32]
    u_keys = [k for k in keys if s[k].dtype == u32]
    assert len(f_keys) + len(i_keys) + len(u_keys) == len(keys), \
        [(k, s[k].dtype) for k in keys]
    F = jnp.concatenate([s[k] for k in f_keys], axis=0)
    I = jnp.concatenate([s[k] for k in i_keys], axis=0)
    U = jnp.concatenate([s[k] for k in u_keys], axis=0)
    return (F, I, U), (tuple(f_keys), tuple(i_keys), tuple(u_keys))


def _unpack_carry(packed, layout):
    (F, I, U) = packed
    out = {}
    for arr, ks in zip((F, I, U), layout):
        for n, k in enumerate(ks):
            out[k] = arr[8 * n:8 * n + 8, :]
    return out


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _rgbe_decode(w):
    """Decode pack.rgbe_encode words on (8,128) i32 lanes: pure int ops +
    an exponent bit-trick (scale = 2^(e-135) built by placing e-8 in the
    f32 exponent field — exact, no transcendentals; Mosaic has no exp2).
    w == 0 decodes to (-0.0, -0.0, -0.0) == 0."""
    e = (w >> 24) & 255
    scale = _bitcast((e - 8) << 23, f32)
    return ((w & 255).astype(f32) * scale,
            ((w >> 8) & 255).astype(f32) * scale,
            ((w >> 16) & 255).astype(f32) * scale)


def _make_kernel(meta, width, spp, k_march, test_every, unroll,
                 max_iters, escape_every, compact, queue_items=0,
                 env_rgbe=False, probe_dup=(), escape_rounds=4,
                 resolve_rounds=2, resolve_full=False, escape_full=False,
                 nee_full=False, sublanes=8, tile_w=0, scan_blocks=8,
                 meta_block=0, nee_every=1, mxu_gather=False,
                 mip_u8=False, hbm_atlas=False, mip_block=-1,
                 pool_rgbe=False, resolve_bound=True):
    """queue_items > 0 switches to WORK-QUEUE mode: the grid instance
    owns a super-block of `queue_items` pixels; sublanes*128 persistent lanes
    dequeue pixels from a carried cursor (claims ranked by
    _prefix_ranks, <=128 per while-iteration) and flush finished
    per-pixel sums into the output block through an MXU outer-product
    scatter (A += OH_rowT @ (v * OH_col) — exact: every output cell
    receives at most one one-hot contribution). This rebuilds the XLA
    device_queue engine's load balancing (ops/worklist.py, itself the
    persistent-threads analogue of the reference's SIMT scheduling)
    inside the kernel, where the measured drain-tail inflation of the
    fixed strip engine is 4-6x (probes/results/pallas6.jsonl)."""
    bx, by, bz = meta.n_bricks
    mip_dims = meta.mip_dims          # ((z,y,x) x 4), level 0 = bricks
    mip_offsets = meta.mip_offsets
    EH, EW = meta.env_h, meta.env_w
    W = width
    # escape serve capacity per escape step: steady-state demand is the
    # sample completion rate (~1024/7 steps ~ 146/step at the measured
    # inflation). Rounds >= 2 are lax.cond-gated on demand, so extra
    # capacity costs only when bursts use it (sky super-blocks demand
    # ~500/step, NOTES.md) — 4 rounds cover the measured burst.
    ESCAPE_ROUNDS = escape_rounds
    RESOLVE_ROUNDS = resolve_rounds           # same scheme for EV_TEST bursts
    NEE_ROUNDS = 2                            # and for EV_EXT_HIT

    use_tf = meta.tf_rows > 0
    has_emi = meta.emi_n_slots > 0
    # range-bound classify: exact only when d feeds nothing but the
    # u_cls*maj < d compare (no TF, no emission). bound_cls gates the
    # full-lane serve path; bound_cmp gates the compacted/hbm path
    # (classify-then-serve: meta-only rounds first, atlas/DMA rounds
    # only for the ambiguous subset — the capacity law's denominator
    # then counts only ambiguous resolves).
    # resolve_bound: 0 = off (default — bitwise-exact everywhere but
    # measured a loss at every production shape; renderer.py knob
    # comment + probes/results/rbound{,2}.jsonl), 1 = compact path
    # only, 2 = also the full-lane path
    bound_cls = (int(resolve_bound) >= 2 and not use_tf and not has_emi
                 and (not compact or resolve_full))
    bound_cmp = (int(resolve_bound) >= 1 and not use_tf and not has_emi
                 and compact and not resolve_full)
    if (use_tf or has_emi) and not compact:
        raise NotImplementedError(
            "TF/emission kernels require compact=True")
    if resolve_full and (use_tf or has_emi):
        raise NotImplementedError(
            "resolve_full covers the no-TF/no-emission kernel (the "
            "TF trilinear / emission fetches still serve compacted)")
    if nee_full and use_tf:
        # the NEE TF tint's trilinear fetch serves COMPACTED (capacity
        # 128*NEE_ROUNDS ranks); an uncapped full-lane NEE would tint
        # overflow lanes with a wrong density. TF scenes take the
        # compact NEE path (correctness, not a preference).
        nee_full = False
    if hbm_atlas and (not compact or resolve_full or mxu_gather):
        # the HBM atlas serves ONLY through the compacted DMA row-gather
        # (a full-lane serve would need sublanes*128 DMAs per step)
        raise NotImplementedError(
            "hbm_atlas requires compact=True, resolve_full=False and "
            "the dynamic_gather fetch engine")

    def kernel(*refs):
        # widen the live lane block beyond the native (8,128) f32 tile:
        # serving scans are O(table_rows x sublanes) and march is
        # per-lane vector work (both per-lane-constant), but the
        # per-while-iteration FIXED costs (carry bookkeeping, dequeue,
        # cond scans) amortize over sublanes — measured ladder in
        # probes/results/pallas9f.jsonl
        LANES = (sublanes, 128)  # noqa: shadows the module default
        refs = list(refs)

        def take(n):
            out, refs[:n] = refs[:n], []
            return out

        (pf_ref, pi_ref, atlas_ref, mslot_ref, mlo_ref, mhi_ref,
         mip_ref) = take(7)
        pool_refs = take(5 if pool_rgbe else 7)
        env_refs = take(1 if env_rgbe else 3)
        tf_refs = take(4) if use_tf else []
        emi_refs = take(4) if has_emi else []
        or_ref, og_ref, ob_ref, oa_ref, oit_ref = take(5)
        if hbm_atlas:
            # DMA row-gather scratch (see _render_strips_jit): landing
            # buffer, index staging row, SMEM index row, two DMA sems
            (dma_land, dma_stage, dma_smem, dma_sem_i,
             dma_sem_r) = take(5)
        assert not refs
        # ---- scalars
        def pf(k, n=1):
            if n == 1:
                return pf_ref[0, k]
            return tuple(pf_ref[0, k + d] for d in range(n))

        cam_pos = pf(PF_CAM_POS, 3)
        cam_m = pf(PF_CAM_XFORM, 9)
        z_cam = pf(PF_ZCAM)
        bb_min = pf(PF_BB_MIN, 3)
        bb_max = pf(PF_BB_MAX, 3)
        majorant = pf(PF_MAJORANT)
        inv_majorant = pf(PF_INV_MAJORANT)
        tf_left = pf(PF_TF_LEFT)
        tf_width = pf(PF_TF_WIDTH)
        emi_scale = pf(PF_EMI_SCALE)
        emi_norm = pf(PF_EMI_NORM)
        emi_x = pf(PF_EMI_X, 16)
        albedo = pf(PF_ALBEDO, 3)
        phase_g = pf(PF_PHASE_G)
        density_scale = pf(PF_DENSITY_SCALE)
        inv_x = pf(PF_INV_XFORM, 16)
        env_inv = pf(PF_ENV_INV, 9)
        env_strength = pf(PF_ENV_STRENGTH)
        imp_avg = pf(PF_IMP_AVG)
        show_env = pf(PF_SHOW_ENV) > 0.0

        H = pi_ref[0, PI_HEIGHT]
        spp_base = pi_ref[0, PI_SPP_BASE]
        bounces = pi_ref[0, PI_BOUNCES]
        seed0_i = pi_ref[0, PI_SEED]  # bitcast to u32 after broadcast
        pix0 = pi_ref[0, PI_PIX0]

        strip = pl.program_id(0)
        lane = (jax.lax.broadcasted_iota(i32, LANES, 0) * 128
                + jax.lax.broadcasted_iota(i32, LANES, 1))
        if queue_items:
            sb_base = pix0 + strip * queue_items  # flat-pixel base
            px = py = None  # carried in state (lane->pixel is dynamic)
            if tile_w:
                # RECTANGULAR super-blocks: the instance owns a
                # tile_w x (queue_items/tile_w) pixel tile instead of a
                # W x (queue_items/W) band. Pure scheduling (each pixel's
                # sample streams are unchanged) but the live rays' spatial
                # footprint shrinks ~4x, so the demand-clustered block
                # skips in the atlas/env scans hit far fewer blocks
                # (pallas9g). Requires pix0 % queue_items == 0 and
                # tile_w a power of two dividing W.
                tpr = W // tile_w
                tile_h = queue_items // tile_w
                g_tile = sb_base // queue_items
                tx0 = (g_tile % tpr) * tile_w
                ty0 = (g_tile // tpr) * tile_h
                tw_mask = tile_w - 1
                tw_shift = int(tile_w).bit_length() - 1
        else:
            pix = pix0 + strip * (sublanes * 128) + lane
            px = pix % W
            py = pix // W

        # ---- tables, materialized ONCE as values (re-slicing refs
        # per use re-loads them from VMEM: 10-100x slower, pallas5).
        # mxu_gather tags every table for the one-hot MXU fetch engine:
        # full-32-bit payloads (packed atlas words, RGBE) split into
        # exact 16-bit f32 halves ONCE here; small-int tables (slot ids
        # < 2^24) ride as exact f32 casts.
        if mxu_gather:
            def m_f(v):
                return ("f32", v)

            def m_small(v):
                return _tab_cast_i24(v)

            m_full = _tab_split
        else:
            m_f = m_small = m_full = lambda v: v
        # hbm_atlas: the atlas ref stays an HBM (ANY-space) ref — NEVER
        # materialized; resolve serves DMA demanded 512 B brick rows
        atlas_t = None if hbm_atlas else m_full(atlas_ref[:])
        mslot_t = m_small(mslot_ref[:])
        mlo_t = m_f(mlo_ref[:])
        mhi_t = m_f(mhi_ref[:])
        if mip_u8:
            if mxu_gather:
                raise NotImplementedError("mip_u8 + mxu_gather")
            mip_t = mip_ref[:]          # (rows,128) i32, 4 u8 per word
        else:
            mip_t = m_f(mip_ref[:])
        pool_t = [(m_f(ref[:]) if ref.dtype == f32 else m_full(ref[:]))
                  for ref in pool_refs]
        env_t = [(m_full if ref.dtype != f32 else m_f)(ref[:])
                 for ref in env_refs]
        tf_t = [m_f(ref[:]) for ref in tf_refs]   # r, g, b, a channels
        emi_t = ([m_full(emi_refs[0][:]), m_small(emi_refs[1][:]),
                  m_f(emi_refs[2][:]), m_f(emi_refs[3][:])]
                 if emi_refs else [])              # atlas, slot, lo, hi

        def fetch_meta(bidx):
            # meta_block > 0: demand-gated row blocks for the brick-meta
            # scan too (the resolve fetch is the #1 per-step cost —
            # pallas10 attribution: +17 us/step per duplicate fetch)
            s, lo, hi = _scan_gather(
                [mslot_t, mlo_t, mhi_t], bidx >> 7, bidx & 127,
                meta.meta_rows, block=meta_block)
            return s, lo, hi

        def fetch_mip(idx, mip_i=None):
            if mip_u8:
                # u8-quantized majorant pyramid (pack.build_mip_u8):
                # 4x fewer rows than f32, per-level affine dequant with
                # quantize-UP encoding (decode >= true majorant — the
                # null-collision contract holds, common.glsl:399-501).
                # density_scale / TF transform are baked at pack time.
                word = idx >> 2
                rows = int(mip_t.shape[0])
                (v32,) = _scan_gather([mip_t], word >> 7, word & 127,
                                      rows, block=mip_blk)
                q = ((v32 >> ((idx & 3) * 8)) & 255).astype(f32)
                lo = jnp.zeros(LANES, f32)
                sc = jnp.zeros(LANES, f32)
                for m in range(4):
                    sel = mip_i == m
                    lo = jnp.where(sel, pf(PF_MIP_LO + m), lo)
                    sc = jnp.where(sel, pf(PF_MIP_SCALE + m), sc)
                return lo + q * sc
            (v,) = _scan_gather([mip_t], idx >> 7, idx & 127,
                                meta.mip_rows, block=mip_blk)
            return v

        def fetch_atlas(slot, voff):
            g32 = _scan_gather([atlas_t], slot, voff >> 2,
                               meta.n_slots, block=atlas_block)[0]
            shift = (voff & 3) * 8
            return ((g32 >> shift) & 255).astype(f32) * f32(1.0 / 255.0)

        def fetch_env(eidx):
            outs = _scan_gather(env_t, eidx >> 7, eidx & 127,
                                meta.env_rows, block=env_block)
            if env_rgbe:
                return _rgbe_decode(outs[0])
            return outs

        def fetch_pool(pidx):
            return _scan_gather(pool_t, pidx >> 7, pidx & 127,
                                meta.pool_rows)

        def cfetch(tabs, rows, idx, rank, served, block=0):
            return _compact_gather(tabs, idx, rows, None, rank=rank,
                                   served=served, block=block)[0]

        def dma_atlas_rows(slot_c):
            """HBM-atlas fetch engine: land brick row slot_c[0,i] of the
            HBM atlas in dma_land[i] via one 512 B DMA per compacted
            rank (the TPU answer to texelFetch on an arbitrary-size
            atlas texture, renderer.cpp:159-225 / common.glsl:268-275).
            Scalarization: the (1,128) index row DMAs VMEM->SMEM once,
            then each scalar read feeds a dynamic-slice HBM->VMEM row
            copy; all 128 copies share one sem and ONE whole-buffer
            wait drains them (latency overlaps across rows). Cost
            measured ~3.4-4 us per round on the v5e REGARDLESS of table
            height — vs ~17 us for the in-VMEM atlas scan
            (probes/results/dmagather4.jsonl; always-128 static issue
            beats a demand-bounded loop: empty ranks carry slot 0 and
            their landed rows are masked downstream)."""
            dma_stage[:] = slot_c
            cp = pltpu.make_async_copy(dma_stage, dma_smem, dma_sem_i)
            cp.start()
            cp.wait()

            def issue(i, c):
                row = dma_smem[0, i]
                pltpu.make_async_copy(
                    atlas_ref.at[pl.ds(row, 1), :],
                    dma_land.at[pl.ds(i, 1), :], dma_sem_r).start()
                return c

            lax.fori_loop(0, 128, issue, 0)
            # one wait for all 128 rows: the sem counts bytes and the
            # whole-buffer descriptor's size equals the issued total
            pltpu.make_async_copy(
                atlas_ref.at[pl.ds(0, 128), :], dma_land,
                dma_sem_r).wait()
            return dma_land[:]

        def hbm_atlas_fetch(slot_c, word_c):
            """out[0,j] = atlas[slot_c[0,j], word_c[0,j]] per compacted
            rank (empty ranks: slot 0 garbage, caller-masked)."""
            landv = dma_atlas_rows(slot_c)
            lane = jax.lax.broadcasted_iota(i32, (1, 128), 1)
            (g32_c,) = _scan_rows_block([landv], lane, word_c, 0, 128)
            return g32_c

        # block-skip sizes (static): scans over tall tables run in
        # lax.cond-skipped row blocks (scan_blocks of them — conds are
        # cheap but bloat Mosaic compile). Short tables scan in one pass.
        def _blk(rows):
            if rows <= 1024 // scan_blocks * 8:
                return 0
            nth = -(-rows // scan_blocks)
            return -(-nth // 8) * 8     # ceil(rows/scan_blocks), 8-aligned

        env_block = _blk(meta.env_rows)
        atlas_block = _blk(meta.n_slots)
        # the mip scan is FULL-LANE (every marching lane, k_march x per
        # step) — block-skip earlier than the compacted-scan threshold
        # so big-volume pyramids don't cost rows x sublanes every substep
        def _blk_full(rows):
            # r5sweep: block-skip LOSES on mid-size tables (74-row f32
            # smoke mips: 5.82 vs 6.82 spp/s) — the cond predicates cost
            # more than the skipped rows. Only tall pyramids benefit.
            if rows <= 128:
                return 0
            per = -(-rows // scan_blocks)
            return -(-per // 8) * 8

        if mip_block < 0:
            mip_blk = _blk_full(
                int((mip_t if not isinstance(mip_t, tuple)
                     else mip_t[1]).shape[0]))
        else:
            mip_blk = mip_block


        # ---- density machinery (ops/grid.py ports)
        def brick_index_dims(tap, nbx, nby, nbz):
            vx = jnp.clip(tap[0].astype(i32), 0, nbx * 8 - 1)
            vy = jnp.clip(tap[1].astype(i32), 0, nby * 8 - 1)
            vz = jnp.clip(tap[2].astype(i32), 0, nbz * 8 - 1)
            bidx = (vz >> 3) * (nby * nbx) + (vy >> 3) * nbx + (vx >> 3)
            voff = (vz & 7) * 64 + (vy & 7) * 8 + (vx & 7)
            return bidx, voff

        def brick_index(tap):
            return brick_index_dims(tap, bx, by, bz)

        def lookup_density_brick(tap):
            bidx, voff = brick_index(tap)
            slot, lo, hi = fetch_meta(bidx)
            slot = jnp.clip(slot, 0, meta.n_slots - 1)
            unorm = fetch_atlas(slot, voff)
            return lo + unorm * (hi - lo)

        def majorant_at(curr, mip_i):
            ix = jnp.floor(curr[0]).astype(i32)
            iy = jnp.floor(curr[1]).astype(i32)
            iz = jnp.floor(curr[2]).astype(i32)
            idx = jnp.zeros(LANES, i32)
            for m in range(4):
                mz, my, mx = mip_dims[m]
                bxm = jnp.clip(ix >> (3 + m), 0, mx - 1)
                bym = jnp.clip(iy >> (3 + m), 0, my - 1)
                bzm = jnp.clip(iz >> (3 + m), 0, mz - 1)
                idx_m = mip_offsets[m] + (bzm * my + bym) * mx + bxm
                idx = jnp.where(mip_i == m, idx_m, idx)
            if use_tf or mip_u8:
                # the TF majorant transform (majorant * tf_alpha(maj *
                # inv_majorant), common.glsl:484) depends only on the mip
                # CELL VALUE, so it is pre-baked into the table per trace
                # call (renderer._render_pallas) — zero per-step cost.
                # mip_u8 tables bake density_scale the same way.
                return fetch_mip(idx, mip_i)
            return density_scale * fetch_mip(idx, mip_i)

        def stochastic_tricubic(pos, seed, active):
            """ops/grid.stochastic_tricubic_filter, SoA."""
            iip = tuple(jnp.floor(p - 0.5) for p in pos)
            t = tuple((p - 0.5) - ip for p, ip in zip(pos, iip))
            w = tuple((1.0 / 6.0) * (-tt * tt * tt + 3.0 * tt * tt
                                     - 3.0 * tt + 1.0) for tt in t)
            sum_wt = w
            idxf = tuple(jnp.zeros(LANES, f32) for _ in range(3))
            taps = [
                (1.0, tuple((1.0 / 6.0) * (3 * tt**3 - 6 * tt * tt + 4.0)
                            for tt in t)),
                (2.0, tuple((1.0 / 6.0) * (-3 * tt**3 + 3 * tt * tt
                                           + 3 * tt + 1.0) for tt in t)),
                (3.0, tuple((1.0 / 6.0) * tt**3 for tt in t)),
            ]
            for tap_idx, wv in taps:
                sum_wt = tuple(a + b for a, b in zip(wv, sum_wt))
                seed, r1 = _rng(seed, active)
                seed, r2 = _rng(seed, active)
                seed, r3 = _rng(seed, active)
                rs = (r1, r2, r3)
                idxf = tuple(
                    jnp.where(rs[k] < wv[k] / jnp.maximum(1e-3, sum_wt[k]),
                              f32(tap_idx), idxf[k])
                    for k in range(3))
            tap = tuple(iip[k] + idxf[k] - 1.0 for k in range(3))
            return tap, seed

        def tf_channels(d_norm, chans):
            """Windowed lerped LUT fetch on full lanes
            (ops/transfer.tf_lookup, common.glsl:195-212). d_norm =
            density * inv_majorant; chans = subset of tf_t."""
            tc = jnp.clip((d_norm - tf_left) / tf_width, 0.0,
                          1.0 - 1e-6) * f32(meta.tf_size)
            idx = jnp.floor(tc).astype(i32)
            fr = tc - idx.astype(f32)
            idx1 = jnp.minimum(idx + 1, meta.tf_size - 1)
            los = _scan_gather(chans, idx >> 7, idx & 127, meta.tf_rows)
            his = _scan_gather(chans, idx1 >> 7, idx1 & 127, meta.tf_rows)
            return [lo * (1.0 - fr) + hi * fr for lo, hi in zip(los, his)]

        def trilinear_compact(pos, rank, act, tot):
            """Exact trilinear density at ``pos`` for <= 128*ROUNDS
            ``act`` lanes (the TF classification fetch,
            common.glsl:289-297 / ops/grid.lookup_density_trilinear):
            compact (base, frac) once per round, then a lax.fori_loop
            over the 8 corners accumulates w*decode entirely in
            compacted (1,128) space — one route-back per round. Corner
            order (dx fastest) matches the XLA engine's summation."""
            p = tuple(c - 0.5 for c in pos)
            base = tuple(jnp.floor(c) for c in p)
            frac = tuple(c - b for c, b in zip(p, base))

            def serve(rnd, d):
                m_r = act & (rank >= 128 * rnd) & (rank < 128 * (rnd + 1))
                rankc = jnp.where(m_r, rank - 128 * rnd, 127)
                comp = _compact_rows(
                    [base[0], base[1], base[2],
                     frac[0], frac[1], frac[2]], rankc, m_r)
                b_c, f_c = comp[:3], comp[3:]

                def corner(i, acc):
                    dx = i & 1
                    dy = (i >> 1) & 1
                    dz = i >> 2
                    w = (jnp.where(dx == 1, f_c[0], 1.0 - f_c[0])
                         * jnp.where(dy == 1, f_c[1], 1.0 - f_c[1])
                         * jnp.where(dz == 1, f_c[2], 1.0 - f_c[2]))
                    tap_c = (b_c[0] + dx.astype(f32),
                             b_c[1] + dy.astype(f32),
                             b_c[2] + dz.astype(f32))
                    bidx_c, voff_c = brick_index(tap_c)
                    slot_c, lo_c, hi_c = _scan_rows(
                        [mslot_t, mlo_t, mhi_t], bidx_c >> 7,
                        bidx_c & 127, meta.meta_rows,
                        block=meta_block)
                    slot_c = jnp.clip(slot_c, 0, meta.n_slots - 1)
                    if hbm_atlas:
                        g32_c = hbm_atlas_fetch(slot_c, voff_c >> 2)
                    else:
                        (g32_c,) = _scan_rows(
                            [atlas_t], slot_c, voff_c >> 2, meta.n_slots,
                            block=atlas_block)
                    shift_c = (voff_c & 3) * 8
                    unorm_c = ((g32_c >> shift_c) & 255).astype(f32) \
                        * f32(1.0 / 255.0)
                    return acc + w * (lo_c + unorm_c * (hi_c - lo_c))

                acc_c = lax.fori_loop(0, 8, corner,
                                      jnp.zeros((1, 128), f32))
                (d_r,) = _route_back([acc_c], rankc)
                return jnp.where(m_r, d_r, d)

            d = jnp.zeros(LANES, f32)
            for rnd in range(RESOLVE_ROUNDS):
                if rnd == 0:
                    d = serve(0, d)
                else:
                    d = lax.cond(tot > 128 * rnd, partial(serve, rnd),
                                 lambda x: x, d)
            return density_scale * d

        def emission_at(pos, seed, rank, act_e, tot):
            """Emission grid fetch at density-index ``pos`` for act_e
            lanes (ops/grid.lookup_emission): remap through the
            pre-composed density-index -> emission-index transform,
            stochastic-tricubic tap, one compacted brick fetch. Returns
            (t_raw * emi_norm, seed)."""
            epos = _xform_point(emi_x, pos)
            etap, seed = stochastic_tricubic(epos, seed, act_e)
            ebx, eby, ebz = meta.emi_n_bricks
            ebidx, evoff = brick_index_dims(etap, ebx, eby, ebz)
            ekey = ebidx * 512 + evoff

            def serve(rnd, v):
                m_r = act_e & (rank >= 128 * rnd) \
                    & (rank < 128 * (rnd + 1))
                rankc = jnp.where(m_r, rank - 128 * rnd, 127)
                (key_c,) = _compact_rows([ekey], rankc, m_r)
                eb_c = key_c >> 9
                ev_c = key_c & 511
                slot_c, lo_c, hi_c = _scan_rows(
                    [emi_t[1], emi_t[2], emi_t[3]], eb_c >> 7,
                    eb_c & 127, meta.emi_meta_rows)
                slot_c = jnp.clip(slot_c, 0, meta.emi_n_slots - 1)
                (g32_c,) = _scan_rows([emi_t[0]], slot_c, ev_c >> 2,
                                      meta.emi_n_slots,
                                      block=_blk(meta.emi_n_slots))
                shift_c = (ev_c & 3) * 8
                unorm_c = ((g32_c >> shift_c) & 255).astype(f32) \
                    * f32(1.0 / 255.0)
                (v_r,) = _route_back([lo_c + unorm_c * (hi_c - lo_c)],
                                     rankc)
                return jnp.where(m_r, v_r, v)

            v = jnp.zeros(LANES, f32)
            for rnd in range(RESOLVE_ROUNDS):
                if rnd == 0:
                    v = serve(0, v)
                else:
                    v = lax.cond(tot > 128 * rnd, partial(serve, rnd),
                                 lambda x: x, v)
            return v * emi_norm, seed

        # ---- ray setup (megakernel._setup_ray)
        def setup_ray(s, org, direction, mask):
            hit_box, near, far_new = _intersect_box(org, direction,
                                                    bb_min, bb_max)
            ip = _xform_point(inv_x, org)
            idd = _xform_vec(inv_x, direction)
            seed, u_tau = _rng(s["seed"], mask & hit_box)
            s["seed"] = seed
            s["t"] = jnp.where(mask, near + 1e-6, s["t"])
            s["far"] = jnp.where(mask, jnp.where(hit_box, far_new, 0.0),
                                 s["far"])
            s["tau"] = jnp.where(mask, -jnp.log(1.0 - u_tau), s["tau"])
            s["mip"] = jnp.where(mask, f32(3.0), s["mip"])
            for k, n in enumerate(("ix0", "iy0", "iz0")):
                s[n] = jnp.where(mask, ip[k], s[n])
            for k, n in enumerate(("idx", "idy", "idz")):
                s[n] = jnp.where(mask, idd[k], s[n])
            for k, n in enumerate(("rix", "riy", "riz")):
                s[n] = jnp.where(mask, 1.0 / idd[k], s[n])
            if "setup" in probe_dup:
                ezf = (s["event"] >> 30).astype(f32)  # 0; CSE-defeat
                org2 = (org[0] + ezf, org[1], org[2])
                _h2, n2, f2 = _intersect_box(org2, direction,
                                             bb_min, bb_max)
                ip2 = _xform_point(inv_x, org2)
                idd2 = _xform_vec(inv_x, (direction[0] + ezf,
                                          direction[1], direction[2]))
                recip = 1.0 / jnp.where(idd2[0] == 0.0, f32(1.0),
                                        idd2[0])
                s["far"] = s["far"] + f32(1e-30) * (
                    f2 + n2 + ip2[0] + idd2[0] + recip)
            return s

        # ---- phases (megakernel.py bodies, SoA)
        def phase_regen(s):
            pxv = s["px"] if queue_items else px
            pyv = s["py"] if queue_items else py
            lane_u = (_bitcast(pyv, u32) * u32(W)
                      + _bitcast(pxv, u32))
            regen = s["mode"] == MODE_REGEN
            can = regen & (s["spp_done"] < spp)
            s["mode"] = jnp.where(regen & ~can, MODE_INACTIVE,
                                  jnp.where(can, MODE_EXTEND, s["mode"]))
            sample_idx = _bitcast(spp_base + s["spp_done"] + 1, u32)
            seed0 = _bitcast(jnp.broadcast_to(seed0_i, LANES), u32)
            fresh = _tea(seed0 * lane_u, sample_idx)
            s["seed"] = jnp.where(can, fresh, s["seed"])
            seed, u1 = _rng(s["seed"], can)
            seed, u2 = _rng(seed, can)
            s["seed"] = seed
            wf = f32(W)
            hf = H.astype(f32)
            pix_x = (pxv.astype(f32) + u1 - wf * 0.5) / hf
            pix_y = (pyv.astype(f32) + u2 - hf * 0.5) / hf
            if "tea" in probe_dup:
                # ez is 0 at runtime (event <= 6) but not provably so —
                # defeats Mosaic's CSE of the duplicate (cost attribution)
                ez = s["event"] >> 30
                fresh2 = _tea(seed0 * lane_u + _bitcast(ez, u32),
                              sample_idx)
                pix_x = pix_x + f32(1e-30) * _bitcast(
                    fresh2 & u32(0x00FFFFFF), i32).astype(f32)
            cam_local = (pix_x, pix_y,
                         jnp.full(LANES, 1.0, f32) * z_cam)
            nd = _norm3(_mat3_vec(cam_m, _norm3(cam_local)))
            org = _w3(can, (jnp.full(LANES, 1.0, f32) * cam_pos[0],
                            jnp.full(LANES, 1.0, f32) * cam_pos[1],
                            jnp.full(LANES, 1.0, f32) * cam_pos[2]),
                      (s["pox"], s["poy"], s["poz"]))
            s["pox"], s["poy"], s["poz"] = org
            pd = _w3(can, nd, (s["pdx"], s["pdy"], s["pdz"]))
            s["pdx"], s["pdy"], s["pdz"] = pd
            one = jnp.ones(LANES, f32)
            zero = jnp.zeros(LANES, f32)
            for n, v in (("thx", one), ("thy", one), ("thz", one),
                         ("Lx", zero), ("Ly", zero), ("Lz", zero),
                         ("pnx", zero), ("pny", zero), ("pnz", zero)):
                s[n] = jnp.where(can, v, s[n])
            s["n_paths"] = jnp.where(can, 0, s["n_paths"])
            s["last_f_p"] = jnp.where(can, 0.0, s["last_f_p"])
            s["free"] = jnp.where(can, 1, s["free"])
            s["event"] = jnp.where(can, EV_NONE, s["event"])
            return setup_ray(s, org, pd, can)

        def resolve_tests(s):
            mode, event = s["mode"], s["event"]
            test = event == EV_TEST
            is_extend = mode == MODE_EXTEND

            def do(s):
                s = dict(s)
                if compact and not resolve_full:
                    rank, tot_test = _prefix_ranks(test)
                    # serve up to 128*ROUNDS this call; rounds >= 2 run
                    # behind a lax.cond on actual demand (bursts only —
                    # p90 demand ~2.3%/lane, NOTES.md), true overflow
                    # defers to the next resolve (pure scheduling, exact)
                    act = test & (rank < 128 * RESOLVE_ROUNDS)
                else:
                    # resolve_full: serve EVERY tester through the
                    # 8-sublane full-lane scan — in saturated queue mode
                    # the per-128 compaction tax exceeds the scan cost
                    # (the same crossover that retired XLA-stage
                    # compaction, NOTES.md round-3)
                    rank, act = None, test
                maj = jnp.where(act, s["tau"], 0.0)
                pos = (s["ix0"] + s["t"] * s["idx"],
                       s["iy0"] + s["t"] * s["idy"],
                       s["iz0"] + s["t"] * s["idz"])
                if use_tf:
                    # TF classification: EXACT trilinear density through
                    # the LUT alpha (pathtracer_brick_tf.glsl:10-11,
                    # common.glsl:484-494; no stochastic-filter draws —
                    # mirrors megakernel._density_at's TF branch)
                    seed = s["seed"]
                    d_raw = trilinear_compact(pos, rank, act, tot_test)
                    (a_tf,) = tf_channels(d_raw * inv_majorant,
                                          [tf_t[3]])
                    d = majorant * a_tf
                elif compact and not resolve_full:
                    # FUSED fetch: one compaction of the flat
                    # (brick, voxel) key, both table scans in compacted
                    # space (the meta scan's slot feeds the atlas scan
                    # directly — no intermediate route-back), one
                    # route-back of the decoded density. Bitwise equal to
                    # the two-cfetch form (same arithmetic on the same
                    # values, shuffled through rank slots).
                    # bidx*512+voff needs bidx < 2^22 (4.2M bricks) —
                    # far above the atlas-slot VMEM gate.
                    tap, seed = stochastic_tricubic(pos, s["seed"], act)
                    bidx, voff = brick_index(tap)
                    key = bidx * 512 + voff

                    if bound_cmp:
                        # CLASSIFY-THEN-SERVE: phase A rounds resolve
                        # ranked lanes from the meta bounds alone
                        # (u_cls*maj vs the brick's exact f32 decode
                        # range — see the bound_cls comment below for
                        # the monotonicity argument); only ambiguous
                        # lanes re-rank into phase B's atlas rounds, so
                        # hbm DMA rounds (and the capacity law's
                        # denominator) count only ambiguous resolves.
                        # BITWISE identical to the unbound path: phase
                        # B's capacity equals phase A's and need is a
                        # subset of act, so every classified-ambiguous
                        # lane is always served this call — no extra
                        # parking, same decisions, same draws.
                        seed, u_cls = _rng(seed, act)
                        thr = u_cls * jnp.maximum(maj, 0.0)
                        umax = f32(255.0) * f32(1.0 / 255.0)

                        def classify(rnd, c):
                            cls, sv, lv, hv = c
                            m_r = act & (rank >= 128 * rnd) \
                                & (rank < 128 * (rnd + 1))
                            rankc = jnp.where(m_r, rank - 128 * rnd, 127)
                            key_c, thr_c = _compact_rows(
                                [key, thr], rankc, m_r)
                            bidx_c = key_c >> 9
                            slot_c, lo_c, hi_c = _scan_rows(
                                [mslot_t, mlo_t, mhi_t], bidx_c >> 7,
                                bidx_c & 127, meta.meta_rows,
                                block=meta_block)
                            slot_c = jnp.clip(slot_c, 0,
                                              meta.n_slots - 1)
                            e0 = density_scale * lo_c
                            e1 = density_scale * (lo_c
                                                  + umax * (hi_c - lo_c))
                            blo = jnp.minimum(e0, e1)
                            bhi = jnp.maximum(e0, e1)
                            code_c = jnp.where(
                                thr_c < blo, 1,
                                jnp.where(thr_c >= bhi, 2, 3))
                            code_r, s_r, l_r, h_r = _route_back(
                                [code_c, slot_c, lo_c, hi_c], rankc)
                            return (jnp.where(m_r, code_r, cls),
                                    jnp.where(m_r, s_r, sv),
                                    jnp.where(m_r, l_r, lv),
                                    jnp.where(m_r, h_r, hv))

                        zi = jnp.zeros(LANES, i32)
                        zf = jnp.zeros(LANES, f32)
                        c = (zi, zi, zf, zf)
                        for rnd in range(RESOLVE_ROUNDS):
                            if rnd == 0:
                                c = classify(0, c)
                            else:
                                c = lax.cond(tot_test > 128 * rnd,
                                             partial(classify, rnd),
                                             lambda x: tuple(x), c)
                        cls_v, slot_v, lo_v, hi_v = c
                        needm = cls_v == 3
                        rank2, tot_need = _prefix_ranks(needm)
                        act2 = needm & (rank2 < 128 * RESOLVE_ROUNDS)

                        def fserve(rnd, u):
                            m_r = act2 & (rank2 >= 128 * rnd) \
                                & (rank2 < 128 * (rnd + 1))
                            rankc = jnp.where(m_r, rank2 - 128 * rnd,
                                              127)
                            slot_c, voff_c = _compact_rows(
                                [slot_v, voff], rankc, m_r)
                            if hbm_atlas:
                                g32_c = hbm_atlas_fetch(slot_c,
                                                        voff_c >> 2)
                            else:
                                (g32_c,) = _scan_rows(
                                    [atlas_t], slot_c, voff_c >> 2,
                                    meta.n_slots, block=atlas_block)
                            shift_c = (voff_c & 3) * 8
                            unorm_c = ((g32_c >> shift_c) & 255) \
                                .astype(f32) * f32(1.0 / 255.0)
                            (u_r,) = _route_back([unorm_c], rankc)
                            return jnp.where(m_r, u_r, u)

                        unorm_v = zf
                        for rnd in range(RESOLVE_ROUNDS):
                            # every round demand-gated — incl. round 0:
                            # a zero-ambiguity step pays no atlas/DMA
                            unorm_v = lax.cond(
                                tot_need > 128 * rnd,
                                partial(fserve, rnd),
                                lambda x: x, unorm_v)
                        # same decode op order as the unbound path:
                        # lo + unorm*(hi-lo), then * density_scale
                        d = density_scale * (lo_v
                                             + unorm_v * (hi_v - lo_v))
                        real_pre = act & ((cls_v == 1)
                                          | (act2 & (thr < d)))
                        served_act = act & ((cls_v == 1) | (cls_v == 2)
                                            | act2)
                    else:
                        def serve_resolve(rnd, d):
                            m_r = act & (rank >= 128 * rnd) \
                                & (rank < 128 * (rnd + 1))
                            rankc = jnp.where(m_r, rank - 128 * rnd, 127)
                            (key_c,) = _compact_rows([key], rankc, m_r)
                            bidx_c = key_c >> 9
                            voff_c = key_c & 511
                            slot_c, lo_c, hi_c = _scan_rows(
                                [mslot_t, mlo_t, mhi_t], bidx_c >> 7,
                                bidx_c & 127, meta.meta_rows,
                                block=meta_block)
                            slot_c = jnp.clip(slot_c, 0, meta.n_slots - 1)
                            if hbm_atlas:
                                g32_c = hbm_atlas_fetch(slot_c, voff_c >> 2)
                            else:
                                (g32_c,) = _scan_rows(
                                    [atlas_t], slot_c, voff_c >> 2,
                                    meta.n_slots, block=atlas_block)
                            shift_c = (voff_c & 3) * 8
                            unorm_c = ((g32_c >> shift_c) & 255) \
                                .astype(f32) * f32(1.0 / 255.0)
                            d_c = lo_c + unorm_c * (hi_c - lo_c)
                            (d_r,) = _route_back([d_c], rankc)
                            return jnp.where(m_r, d_r, d)

                        d = jnp.zeros(LANES, f32)
                        for rnd in range(RESOLVE_ROUNDS):
                            if rnd == 0:
                                d = serve_resolve(0, d)
                            else:
                                d = lax.cond(tot_test > 128 * rnd,
                                             partial(serve_resolve, rnd),
                                             lambda x: x, d)
                        d = density_scale * d
                elif bound_cls:
                    # RANGE-BOUND SHORT-CIRCUIT (full-lane path): the
                    # classification u_cls*maj < d only ever consumes d
                    # (no TF, no emission), and the brick meta bounds d
                    # EXACTLY in f32 (d = ds*(lo + unorm*(hi-lo)) with
                    # unorm in [0, UMAX]; every op in that chain is
                    # monotone, so the endpoint evaluations bound every
                    # decode). Lanes whose threshold falls outside
                    # [blo, bhi) classify from the 32-row meta scan
                    # alone and never touch the atlas scan — the #1
                    # per-step cost slice (pallas16). Bitwise-identical:
                    # u_cls is drawn at the same per-lane stream
                    # position (nothing draws between the tricubic taps
                    # and the classify draw on this path), and skipped
                    # lanes' decisions equal what the fetch would give.
                    tap, seed = stochastic_tricubic(pos, s["seed"], act)
                    tap = _w3(act, tap, (jnp.zeros(LANES, f32),) * 3)
                    bidx_b, voff_b = brick_index(tap)
                    slot_b, lo_b, hi_b = fetch_meta(bidx_b)
                    slot_b = jnp.clip(slot_b, 0, meta.n_slots - 1)
                    seed, u_cls = _rng(seed, act)
                    thr = u_cls * jnp.maximum(maj, 0.0)
                    umax = f32(255.0) * f32(1.0 / 255.0)
                    e0 = density_scale * lo_b
                    e1 = density_scale * (lo_b + umax * (hi_b - lo_b))
                    blo = jnp.minimum(e0, e1)
                    bhi = jnp.maximum(e0, e1)
                    need = act & (thr >= blo) & (thr < bhi)

                    def fetch_do(z):
                        slot_n = jnp.where(need, slot_b, 0)
                        voff_n = jnp.where(need, voff_b, 0)
                        g32 = _scan_gather(
                            [atlas_t], slot_n, voff_n >> 2,
                            meta.n_slots, block=atlas_block)[0]
                        shift = (voff_n & 3) * 8
                        return ((g32 >> shift) & 255).astype(f32) \
                            * f32(1.0 / 255.0)

                    unorm_b = lax.cond(jnp.any(need), fetch_do,
                                       lambda z: z,
                                       jnp.zeros(LANES, f32))
                    d = density_scale * (lo_b + unorm_b * (hi_b - lo_b))
                    real_pre = act & ((thr < blo) | (need & (thr < d)))
                else:
                    tap, seed = stochastic_tricubic(pos, s["seed"], act)
                    # idle lanes' stale positions would touch random
                    # atlas blocks and defeat the block-skip — pin them
                    tap = _w3(act, tap, (jnp.zeros(LANES, f32),) * 3)
                    d = density_scale * lookup_density_brick(tap)
                    if "rfull" in probe_dup:
                        # duplicate the full-lane resolve fetch (scan cost
                        # attribution for the resolve_full path)
                        ez = s["event"] >> 30   # 0, not provably (CSE)
                        tap2 = (tap[0] + ez.astype(f32), tap[1], tap[2])
                        d = d + f32(1e-30) * lookup_density_brick(tap2)
                    if "rtric" in probe_dup:
                        ezf = (s["event"] >> 30).astype(f32)
                        tap3, _ = stochastic_tricubic(
                            (pos[0] + ezf, pos[1], pos[2]), s["seed"],
                            act)
                        d = d + f32(1e-30) * tap3[0]
                # --- emission (common.glsl:324-328, mirror of
                # megakernel._resolve_tests's _add_emission call: draws
                # AFTER the density fetch, BEFORE classification)
                if has_emi:
                    act_e = act & is_extend
                    t_e, seed = emission_at(pos, seed, rank, act_e,
                                            tot_test)
                    t2 = t_e * t_e
                    e3 = (t2, t2 * t2, (t2 * t2) * (t2 * t2))
                    wgt_e = d * inv_majorant
                    for Ln, ak, ek in (("Lx", albedo[0], e3[0]),
                                       ("Ly", albedo[1], e3[1]),
                                       ("Lz", albedo[2], e3[2])):
                        th = s["th" + Ln[1].lower()]
                        contrib = th * (1.0 - ak) * (emi_scale * ek) \
                            * wgt_e
                        s[Ln] = s[Ln] + jnp.where(act_e, contrib, 0.0)
                # --- probe instrumentation (cost attribution by duplicate
                # work folded in at 1e-30; probes/probe_pallas8.py).
                # ez is 0 at runtime (event <= 6) but not provably so —
                # it defeats Mosaic's CSE of the duplicates.
                ez = s["event"] >> 30
                ezf = ez.astype(f32)
                if "tricubic" in probe_dup and not use_tf:
                    tap2, _ = stochastic_tricubic(
                        (pos[0] + ezf, pos[1], pos[2]), s["seed"], act)
                    d = d + f32(1e-30) * tap2[0]
                if "rank" in probe_dup and compact and not resolve_full:
                    rank2, _ = _prefix_ranks(test ^ (ez > 0))
                    d = d + f32(1e-30) * rank2.astype(f32)
                if "resolve" in probe_dup and compact and not use_tf \
                        and not resolve_full:
                    # duplicate one round-0 serve (the common case)
                    rankc = jnp.where(act & (rank < 128), rank, 127)
                    (key2_c,) = _compact_rows([key + ez], rankc,
                                              act & (rank < 128))
                    slot2_c, lo2_c, hi2_c = _scan_rows(
                        [mslot_t, mlo_t, mhi_t], key2_c >> 16,
                        (key2_c >> 9) & 127, meta.meta_rows)
                    slot2_c = jnp.clip(slot2_c, 0, meta.n_slots - 1)
                    (g32b_c,) = _scan_rows([atlas_t], slot2_c,
                                           (key2_c >> 2) & 127,
                                           meta.n_slots,
                                           block=atlas_block)
                    (d2,) = _route_back(
                        [lo2_c + hi2_c + (g32b_c & 255).astype(f32)],
                        rankc)
                    d = d + f32(1e-30) * d2
                if bound_cls:
                    real = real_pre      # u_cls drawn pre-fetch above
                    redraw = act & ~real
                elif bound_cmp:
                    # served_act == act (phase B always covers need);
                    # kept separate for clarity of the scheme
                    real = real_pre
                    redraw = served_act & ~real
                else:
                    seed, u_cls = _rng(seed, act)
                    real = act & (u_cls * jnp.maximum(maj, 0.0) < d)
                    redraw = act & ~real
                seed, u_tau = _rng(seed, redraw)
                s["tau"] = jnp.where(redraw, -jnp.log(1.0 - u_tau),
                                     s["tau"])
                s["mip"] = jnp.where(redraw,
                                     jnp.maximum(0.0, s["mip"] - 2.0),
                                     s["mip"])
                s["event"] = jnp.where(
                    real & is_extend, EV_EXT_HIT,
                    jnp.where(real & ~is_extend, EV_SH_HIT,
                              jnp.where(redraw, EV_NONE, s["event"])))
                s["seed"] = seed
                return s

            return lax.cond(jnp.any(test), do, lambda s: dict(s), s)

        def phase_march(s):
            for j in range(k_march):
                march = (((s["mode"] == MODE_EXTEND)
                          | (s["mode"] == MODE_SHADOW))
                         & (s["event"] == EV_NONE))
                is_extend = s["mode"] == MODE_EXTEND
                curr = (s["ix0"] + s["t"] * s["idx"],
                        s["iy0"] + s["t"] * s["idy"],
                        s["iz0"] + s["t"] * s["idz"])
                mip_i = _round_half_even(s["mip"])
                maj = majorant_at(curr, mip_i)
                if "mip" in probe_dup:
                    ez = s["event"] >> 30   # 0, but not provably (CSE)
                    maj = maj + f32(1e-30) * majorant_at(
                        (curr[0] + ez.astype(f32), curr[1], curr[2]),
                        mip_i + ez)
                dim = (8 << mip_i).astype(f32)
                # 1/dim built in the exponent field: dim = 2^(3+mip), so
                # x * inv_dim == x / dim EXACTLY (power-of-two scaling is
                # exact in f32) — trades 3 multi-cycle VPU divides per
                # substep for multiplies
                inv_dim = _bitcast((124 - mip_i) << 23, f32)
                ri = (s["rix"], s["riy"], s["riz"])
                dts = []
                for k in range(3):
                    offs = jnp.where(ri[k] >= 0.0, dim + 0.5, f32(-0.5))
                    dts.append((jnp.floor(curr[k] * inv_dim) * dim + offs
                                - curr[k]) * ri[k])
                dt = jnp.minimum(dts[0], jnp.minimum(dts[1], dts[2]))
                if "march" in probe_dup:
                    ezf = (s["event"] >> 30).astype(f32)  # 0; CSE-defeat
                    dts2 = []
                    for k in range(3):
                        offs2 = jnp.where(ri[k] >= ezf, dim + 0.5,
                                          f32(-0.5))
                        dts2.append((jnp.floor((curr[k] + ezf) * inv_dim)
                                     * dim + offs2 - curr[k]) * ri[k])
                    dt2 = jnp.minimum(dts2[0],
                                      jnp.minimum(dts2[1], dts2[2]))
                    dt = dt + f32(1e-30) * dt2
                t_adv = s["t"] + dt
                tau_adv = s["tau"] - maj * dt
                mip_up = jnp.minimum(s["mip"] + 0.25, 3.0)
                collide = march & (tau_adv <= 0.0)
                s["t"] = jnp.where(
                    march,
                    jnp.where(collide,
                              t_adv + tau_adv / jnp.maximum(maj, 1e-20),
                              t_adv),
                    s["t"])
                exited = march & (s["t"] >= s["far"])
                test = collide & ~exited
                s["tau"] = jnp.where(march & ~collide, tau_adv, s["tau"])
                s["mip"] = jnp.where(march & ~collide, mip_up, s["mip"])
                s["tau"] = jnp.where(test, maj, s["tau"])
                s["mip"] = jnp.where(test, mip_up, s["mip"])
                s["event"] = jnp.where(
                    test, EV_TEST,
                    jnp.where(exited,
                              jnp.where(is_extend, EV_EXT_EXIT, EV_SH_EXIT),
                              s["event"]))
                if (j + 1) % test_every == 0 or j == k_march - 1:
                    s = resolve_tests(s)
            return s

        def phase_nee(s):
            ext_hit = s["event"] == EV_EXT_HIT

            def do(s):
                s = dict(s)
                if compact and not nee_full:
                    rank, tot_hit = _prefix_ranks(ext_hit)
                    # NEE serve capacity: rounds >= 2 behind a demand
                    # cond (dense scenes saturate 128 hits/step; the
                    # same capacity law that bound the resolves —
                    # pallas9b); true overflow waits a step
                    act = ext_hit & (rank < 128 * NEE_ROUNDS)
                else:
                    # nee_full: the pool is only 128 rows — the full
                    # 8-sublane scan is cheap and uncapped
                    rank, act = None, ext_hit
                    tot_hit = None
                if use_tf:
                    # TF tint: throughput *= albedo * tf(d).rgb at the
                    # collision (common.glsl:490-494; trilinear density,
                    # no draws — mirrors megakernel.phase_nee_body)
                    pos_hit = (s["ix0"] + s["t"] * s["idx"],
                               s["iy0"] + s["t"] * s["idy"],
                               s["iz0"] + s["t"] * s["idz"])
                    d_raw = trilinear_compact(pos_hit, rank, act,
                                              tot_hit)
                    rgb = tf_channels(d_raw * inv_majorant, tf_t[:3])
                    mult = (albedo[0] * rgb[0], albedo[1] * rgb[1],
                            albedo[2] * rgb[2])
                else:
                    mult = albedo
                seed, u0 = _rng(s["seed"], act)
                seed, _u1 = _rng(seed, act)
                s["seed"] = seed
                pidx = jnp.clip((u0 * POOL_N).astype(i32), 0, POOL_N - 1)
                if compact and not nee_full:
                    def serve_nee(rnd, outs):
                        m_r = act & (rank >= 128 * rnd) \
                            & (rank < 128 * (rnd + 1))
                        vals = cfetch(pool_t, meta.pool_rows, pidx,
                                      rank - 128 * rnd, m_r)
                        return tuple(jnp.where(m_r, v, o)
                                     for v, o in zip(vals, outs))

                    outs = tuple(jnp.zeros(LANES, _tab_dtype(t))
                                 for t in pool_t)
                    for rnd in range(NEE_ROUNDS):
                        if rnd == 0:
                            outs = serve_nee(0, outs)
                        else:
                            outs = lax.cond(tot_hit > 128 * rnd,
                                            partial(serve_nee, rnd),
                                            lambda o: tuple(o), outs)
                    if pool_rgbe:
                        wx, wy, wz, pdf_nee, lw = outs
                        ler, leg, leb = _rgbe_decode(lw)
                    else:
                        wx, wy, wz, pdf_nee, ler, leg, leb = outs
                else:
                    pouts = fetch_pool(pidx)
                    if pool_rgbe:
                        wx, wy, wz, pdf_nee, lw = pouts
                        ler, leg, leb = _rgbe_decode(lw)
                    else:
                        wx, wy, wz, pdf_nee, ler, leg, leb = pouts
                    if "nfull" in probe_dup:
                        ez = s["event"] >> 30   # 0; CSE-defeat
                        dupf = fetch_pool(pidx + ez)
                        wx = wx + f32(1e-30) * dupf[0].astype(f32)
                if "nee" in probe_dup and compact:
                    ez = s["event"] >> 30   # 0, but not provably (CSE)
                    dup = cfetch(pool_t, meta.pool_rows, pidx + ez,
                                 rank, act)
                    wx = wx + f32(1e-30) * dup[0]
                w_i = (wx, wy, wz)
                le = (ler, leg, leb)
                thr = (s["thx"] * mult[0], s["thy"] * mult[1],
                       s["thz"] * mult[2])
                thr = _w3(act, thr, (s["thx"], s["thy"], s["thz"]))
                s["thx"], s["thy"], s["thz"] = thr
                org = (s["pox"] + s["t"] * s["pdx"],
                       s["poy"] + s["t"] * s["pdy"],
                       s["poz"] + s["t"] * s["pdz"])
                org = _w3(act, org, (s["pox"], s["poy"], s["poz"]))
                s["pox"], s["poy"], s["poz"] = org
                s["n_paths"] = s["n_paths"] + jnp.where(act, 1, 0)
                pd = (s["pdx"], s["pdy"], s["pdz"])
                f_p = _hg_phase(-(pd[0] * w_i[0] + pd[1] * w_i[1]
                                  + pd[2] * w_i[2]), phase_g)
                mis = jnp.where(
                    show_env,
                    (pdf_nee * pdf_nee)
                    / jnp.maximum(pdf_nee * pdf_nee + f_p * f_p, 1e-32),
                    1.0)
                has_nee = act & (pdf_nee > 0.0)
                wgt = mis * f_p / jnp.maximum(pdf_nee, 1e-20)
                pend = (thr[0] * wgt * le[0], thr[1] * wgt * le[1],
                        thr[2] * wgt * le[2])
                pend = _w3(has_nee, pend, (s["pnx"], s["pny"], s["pnz"]))
                s["pnx"], s["pny"], s["pnz"] = pend
                s["mode"] = jnp.where(has_nee, MODE_SHADOW, s["mode"])
                s["event"] = jnp.where(
                    act, jnp.where(has_nee, EV_NONE, EV_SCATTER),
                    s["event"])
                return setup_ray(s, org, _w3(has_nee, w_i, pd), has_nee)

            return lax.cond(jnp.any(ext_hit), do, lambda s: dict(s), s)

        def phase_finish(s, do_escape=True):
            event = s["event"]
            sh_hit = event == EV_SH_HIT
            seed, _u_rr_sh = _rng(s["seed"], sh_hit)
            sh_vis = event == EV_SH_EXIT
            L = (s["Lx"] + jnp.where(sh_vis, s["pnx"], 0.0),
                 s["Ly"] + jnp.where(sh_vis, s["pny"], 0.0),
                 s["Lz"] + jnp.where(sh_vis, s["pnz"], 0.0))
            thr = (s["thx"], s["thy"], s["thz"])
            pd = (s["pdx"], s["pdy"], s["pdz"])

            # escape: STOCHASTIC bilinear environment tap (E = reference
            # bilinear; jitter draws only touch the escaping sample).
            # do_escape=False parks EV_EXT_EXIT lanes for a later step
            # (the megakernel's alternating-escape scheduling: parked
            # lanes draw nothing, output unchanged, tails a bit longer)
            if do_escape:
                esc0 = event == EV_EXT_EXIT

                # the WHOLE escape serve (uv math + env fetch + MIS add)
                # runs behind one lax.cond on demand — in a step with
                # zero escaping lanes the body computes exactly nothing
                # (rng draws esc-masked, adds esc-gated), so the skip is
                # bitwise identical
                def esc_do(c):
                    seed, L = c[0], (c[1], c[2], c[3])
                    if compact and escape_full:
                        # serve EVERY escape through the 8-sublane scan
                        # (block-skipped env rows; escapes cluster by
                        # sky region) — at saturation the per-128
                        # compaction tax loses (pallas9d)
                        esc = esc0
                    elif compact:
                        # escapes BURST (sky regions: most lanes escape
                        # at once — EV_EXT_EXIT p-max 0.93, NOTES.md);
                        # serve ESCAPE_ROUNDS x 128 per step so the cap
                        # doesn't park whole sky super-blocks; rounds
                        # >= 2 again behind a demand cond
                        rank0, tot_esc = _prefix_ranks(esc0)
                        esc = esc0 & (rank0 < 128 * ESCAPE_ROUNDS)
                    else:
                        esc = esc0
                    idir = _mat3_vec(env_inv, pd)
                    uu = _atan2(idir[2], idir[0]) \
                        * f32(1.0 / (2.0 * M_PI)) + 0.5
                    vv = 1.0 - _acos(idir[1]) * f32(1.0 / M_PI)
                    x = uu * EW - 0.5
                    y = vv * EH - 0.5
                    if "uv" in probe_dup:
                        ezf = (s["event"] >> 30).astype(f32)  # CSE-defeat
                        idir2 = _mat3_vec(env_inv,
                                          (pd[0] + ezf, pd[1], pd[2]))
                        uu2 = _atan2(idir2[2], idir2[0])
                        vv2 = _acos(idir2[1])
                        x = x + f32(1e-30) * (uu2 + vv2)
                    seed, rx = _rng(seed, esc)
                    seed, ry = _rng(seed, esc)
                    xt = jnp.floor(x + rx).astype(i32)
                    yt = jnp.floor(y + ry).astype(i32)
                    xw = jnp.where(xt < 0, xt + EW, xt)
                    xw = jnp.where(xw >= EW, xw - EW, xw)
                    yc = jnp.clip(yt, 0, EH - 1)
                    eidx = yc * EW + xw
                    if escape_full:
                        # pin idle lanes to row 0 (block-skip hygiene)
                        eidx = jnp.where(esc, eidx, 0)
                    if compact and not escape_full:
                        def serve_escape(rnd, ergb):
                            er, eg, eb = ergb
                            m_r = esc & (rank0 >= 128 * rnd) \
                                & (rank0 < 128 * (rnd + 1))
                            r_r = rank0 - 128 * rnd
                            if env_rgbe:
                                (w8,) = cfetch(env_t, meta.env_rows,
                                               eidx, r_r, m_r,
                                               block=env_block)
                                fr, fg, fb = _rgbe_decode(w8)
                            else:
                                fr, fg, fb = cfetch(env_t, meta.env_rows,
                                                    eidx, r_r, m_r,
                                                    block=env_block)
                            return (jnp.where(m_r, fr, er),
                                    jnp.where(m_r, fg, eg),
                                    jnp.where(m_r, fb, eb))

                        zero3 = jnp.zeros(LANES, f32)
                        ergb = (zero3, zero3, zero3)
                        for rnd in range(ESCAPE_ROUNDS):
                            if rnd == 0:
                                ergb = serve_escape(0, ergb)
                            else:
                                ergb = lax.cond(tot_esc > 128 * rnd,
                                                partial(serve_escape,
                                                        rnd),
                                                lambda x: tuple(x), ergb)
                        er, eg, eb = ergb
                    else:
                        er, eg, eb = fetch_env(eidx)
                        if "efull" in probe_dup:
                            # duplicate the full-lane env fetch (scan
                            # cost attribution, escape_full path)
                            ez = s["event"] >> 30   # 0; CSE-defeat
                            o2 = fetch_env(eidx + ez)
                            er = er + f32(1e-30) * (o2[0] + o2[1]
                                                    + o2[2])
                    if "escape" in probe_dup and compact \
                            and not escape_full:
                        # duplicate one round-0 serve (the common case)
                        ez = s["event"] >> 30   # 0, not provably (CSE)
                        m_r = esc & (rank0 < 128)
                        outs2 = cfetch(env_t, meta.env_rows, eidx + ez,
                                       rank0, m_r, block=env_block)
                        if env_rgbe:
                            fr2, fg2, fb2 = _rgbe_decode(outs2[0])
                        else:
                            fr2, fg2, fb2 = outs2
                        er = er + f32(1e-30) * jnp.where(
                            m_r, fr2 + fg2 + fb2, 0.0)
                    le_env = (env_strength * er, env_strength * eg,
                              env_strength * eb)
                    pdf_esc = _luma(le_env) / imp_avg * f32(INV_4PI)
                    a2 = s["last_f_p"] * s["last_f_p"]
                    mis_esc = jnp.where(
                        s["n_paths"] > 0,
                        a2 / jnp.maximum(a2 + pdf_esc * pdf_esc, 1e-32),
                        1.0)
                    add = esc & (s["free"] != 0) & show_env
                    L2 = tuple(
                        Lk + jnp.where(add, tk * mis_esc * lek, 0.0)
                        for Lk, tk, lek in zip(L, thr, le_env))
                    # esc rides as i32 (a bool vector as an scf.if result
                    # is outside the op set every other cond here uses)
                    return (seed, L2[0], L2[1], L2[2], esc.astype(i32))

                def esc_skip(c):
                    return (c[0], c[1], c[2], c[3],
                            jnp.zeros(LANES, i32))

                seed, L0, L1, L2_, esc_i = lax.cond(
                    jnp.any(esc0), esc_do, esc_skip,
                    (seed, L[0], L[1], L[2]))
                L = (L0, L1, L2_)
                esc = esc_i != 0
            else:
                esc = jnp.zeros(LANES, jnp.bool_)

            scatter = sh_hit | sh_vis | (event == EV_SCATTER)
            capped = scatter & (s["n_paths"] >= bounces)
            alive = scatter & ~capped
            rr_val = _luma(thr)
            rr = alive & (rr_val < 0.1)
            seed, u_rr = _rng(seed, rr)
            killed = rr & (u_rr < 1.0 - rr_val)
            boost = 1.0 / jnp.maximum(rr_val, 1e-20)
            thr = _w3(rr & ~killed,
                      (thr[0] * boost, thr[1] * boost, thr[2] * boost),
                      thr)
            alive = alive & ~killed
            s["free"] = jnp.where(capped | killed, 0, s["free"])

            seed, s0 = _rng(seed, alive)
            seed, s1 = _rng(seed, alive)
            sc = _sample_hg(pd, phase_g, s0, s1)
            f_p_sc = _hg_phase(-(pd[0] * sc[0] + pd[1] * sc[1]
                                 + pd[2] * sc[2]), phase_g)
            s["last_f_p"] = jnp.where(alive, f_p_sc, s["last_f_p"])
            pd = _w3(alive, sc, pd)
            s["pdx"], s["pdy"], s["pdz"] = pd

            end = esc | capped | killed
            alpha = jnp.clip(s["n_paths"].astype(f32), 0.0, 1.0)
            if "finisharith" in probe_dup:
                ezf = (event >> 30).astype(f32)       # 0; CSE-defeat
                sc2 = _sample_hg((pd[0] + ezf, pd[1], pd[2]), phase_g,
                                 s0, s1)
                f_p2 = _hg_phase(-(pd[0] * sc2[0] + pd[1] * sc2[1]
                                   + pd[2] * sc2[2]), phase_g)
                alpha = alpha + f32(1e-30) * f_p2
            sr, sg, sb = (_sanitize(L[0]), _sanitize(L[1]),
                          _sanitize(L[2]))
            sa = _sanitize(alpha)
            endf = jnp.where(end, f32(1.0), f32(0.0))
            if queue_items:
                s["accR"] = s["accR"] + endf * sr
                s["accG"] = s["accG"] + endf * sg
                s["accB"] = s["accB"] + endf * sb
                s["accA"] = s["accA"] + endf * sa
            else:
                or_ref[:] = or_ref[:] + endf * sr
                og_ref[:] = og_ref[:] + endf * sg
                ob_ref[:] = ob_ref[:] + endf * sb
                oa_ref[:] = oa_ref[:] + endf * sa
            s["spp_done"] = s["spp_done"] + jnp.where(end, 1, 0)
            zero = jnp.zeros(LANES, f32)
            s["Lx"], s["Ly"], s["Lz"] = _w3(end, (zero, zero, zero), L)
            s["mode"] = jnp.where(end, MODE_REGEN,
                                  jnp.where(alive, MODE_EXTEND, s["mode"]))
            processed = scatter | esc
            s["event"] = jnp.where(processed, EV_NONE, s["event"])
            s["seed"] = seed
            s["thx"], s["thy"], s["thz"] = thr
            return setup_ray(s, (s["pox"], s["poy"], s["poz"]), pd, alive)

        # ---- init state
        zero = jnp.zeros(LANES, f32)
        zeroi = jnp.zeros(LANES, i32)
        ozero = jnp.zeros(or_ref.shape, f32)
        or_ref[:] = ozero
        og_ref[:] = ozero
        ob_ref[:] = ozero
        oa_ref[:] = ozero
        oit_ref[:] = jnp.zeros((8, 128), f32)
        s = {
            "mode": jnp.full(LANES, MODE_REGEN, i32),
            "event": zeroi,
            "seed": jnp.zeros(LANES, u32),
            "pox": zero, "poy": zero, "poz": zero,
            "pdx": zero, "pdy": zero, "pdz": zero + 1.0,
            "thx": zero, "thy": zero, "thz": zero,
            "Lx": zero, "Ly": zero, "Lz": zero,
            "pnx": zero, "pny": zero, "pnz": zero,
            "n_paths": zeroi, "last_f_p": zero,
            "free": zeroi,
            "t": zero, "far": zero, "tau": zero, "mip": zero,
            "ix0": zero, "iy0": zero, "iz0": zero,
            "idx": zero, "idy": zero, "idz": zero + 1.0,
            "rix": zero, "riy": zero, "riz": zero + 1.0,
            "spp_done": zeroi,
        }

        keys = STATE_KEYS
        if queue_items:
            # queue-mode extras: dynamic lane->pixel map, current item,
            # carried per-item rgba accumulator
            s.update(px=zeroi, py=zeroi,
                     item=jnp.full(LANES, -1, i32),
                     accR=zero, accG=zero, accB=zero, accA=zero)
            # every lane starts "finished" so the first dequeue claims
            s["mode"] = jnp.full(LANES, MODE_INACTIVE, i32)
            s["spp_done"] = jnp.full(LANES, spp, i32)
            keys = STATE_KEYS + ("px", "py", "item",
                                 "accR", "accG", "accB", "accA")
            if "carry8" in probe_dup:
                for q in range(8):
                    s[f"dum{q}"] = zero
                keys = keys + tuple(f"dum{q}" for q in range(8))
            n_items = queue_items

            def scatter_flush(s, mask, rank):
                """Add <=128 finished items' rgba sums into the output
                block: compact (item, rgba) to row slots, then one MXU
                outer-product per channel — exact (one-hot rows; at most
                one contribution per output cell; empty slots carry
                v=0)."""
                served = mask & (rank < 128)
                rankc = jnp.where(served, rank, 127)
                comp = _compact_rows(
                    [s["item"].astype(f32), s["accR"], s["accG"],
                     s["accB"], s["accA"]], rankc, served)
                it_c = comp[0].astype(i32)         # (1,128), 0 if empty
                rowi = (it_c >> 7).T               # (128,1)
                coli = (it_c & 127).T
                sb_rows = queue_items // 128
                iota_r = jax.lax.broadcasted_iota(i32, (128, sb_rows), 1)
                ohr = (iota_r == jnp.broadcast_to(rowi, (128, sb_rows))
                       ).astype(f32)
                iota_c2 = jax.lax.broadcasted_iota(i32, (128, 128), 1)
                ohc = (iota_c2 == jnp.broadcast_to(coli, (128, 128))
                       ).astype(f32)
                for ref, v_c in zip((or_ref, og_ref, ob_ref, oa_ref),
                                    comp[1:]):
                    vc = ohc * jnp.broadcast_to(v_c.T, (128, 128))
                    # Precision.HIGHEST (fp32 contract): the DEFAULT
                    # bf16 pass truncated the rgba sums (~0.3%) — the
                    # strip-vs-queue bitwise gap of pallas14.jsonl
                    add = jax.lax.dot_general(
                        ohr, vc, (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=f32)
                    ref[:] = ref[:] + add
                return served

            def dequeue(s, cursor):
                s = dict(s)
                ready = (((s["mode"] == MODE_REGEN)
                          | (s["mode"] == MODE_INACTIVE))
                         & (s["spp_done"] >= spp))
                # idle lanes (no item) only rank while the queue still has
                # items — otherwise they hog ranks 0..k forever and lanes
                # holding unflushed items never reach rank < 128
                # (deadlock + lost flushes; /tmp queue mini-harness)
                has_work = cursor[0, 0] < n_items
                need = ready & ((s["item"] >= 0) | has_work)
                rank, _ = _prefix_ranks(need)
                if "dqrank" in probe_dup:
                    ez = s["event"] >> 30   # 0; CSE-defeat
                    rank2, _ = _prefix_ranks(need ^ (ez > 0))
                    rank = rank + (rank2 >> 20)   # rank2 < 1024 -> 0
                serve = need & (rank < 128)
                flush = serve & (s["item"] >= 0)
                served = scatter_flush(s, flush, rank)
                del served
                if "flush" in probe_dup:
                    s2 = dict(s)
                    for nm in ("accR", "accG", "accB", "accA"):
                        s2[nm] = s[nm] * f32(1e-30)
                    scatter_flush(s2, flush, rank)
                new_item = cursor[0, 0] + rank
                have = serve & (new_item < n_items)
                s["item"] = jnp.where(have, new_item,
                                      jnp.where(serve, -1, s["item"]))
                if tile_w:
                    it = jnp.where(have, new_item, 0)
                    s["px"] = jnp.where(have, tx0 + (it & tw_mask),
                                        s["px"])
                    s["py"] = jnp.where(have, ty0 + (it >> tw_shift),
                                        s["py"])
                else:
                    pixf = sb_base + jnp.where(have, new_item, 0)
                    s["px"] = jnp.where(have, pixf % W, s["px"])
                    s["py"] = jnp.where(have, pixf // W, s["py"])
                s["spp_done"] = jnp.where(have, 0, s["spp_done"])
                zf = jnp.where(have, 0.0, 1.0)
                for nm in ("accR", "accG", "accB", "accA"):
                    s[nm] = s[nm] * zf
                s["mode"] = jnp.where(
                    have, MODE_REGEN,
                    jnp.where(need, MODE_INACTIVE, s["mode"]))
                cursor = cursor + jnp.sum(jnp.where(have, 1, 0)).astype(
                    i32).reshape(1, 1)
                return s, cursor

        def step(s, do_escape=True, do_nee=True):
            s = phase_regen(s)
            s = phase_march(s)
            if do_nee:
                s = phase_nee(s)
            s = phase_finish(s, do_escape=do_escape)
            return s

        if queue_items:
            def cond(c):
                it, cursor = c[0], c[1]
                mode = c[2 + keys.index("mode")]
                item = c[2 + keys.index("item")]
                live = (jnp.any(mode != MODE_INACTIVE)
                        | (cursor[0, 0] < n_items)
                        | jnp.any(item >= 0))
                return live & (it[0, 0] < max_iters)

            def body(c):
                it, cursor = c[0], c[1]
                s = dict(zip(keys, c[2:]))
                s, cursor = dequeue(s, cursor)
                for i in range(unroll):
                    do_esc = ((i + 1) % escape_every == 0) \
                        or i == unroll - 1
                    do_nee = ((i + 1) % nee_every == 0) \
                        or i == unroll - 1
                    s = step(s, do_escape=do_esc, do_nee=do_nee)
                if "carry8" in probe_dup:
                    for q in range(8):
                        s[f"dum{q}"] = s[f"dum{q}"] + 1.0
                return (it + unroll, cursor) + tuple(s[k] for k in keys)

            init = (jnp.zeros((1, 1), i32), jnp.zeros((1, 1), i32)) \
                + tuple(s[k] for k in keys)
            out = lax.while_loop(cond, body, init)
            oit = jnp.broadcast_to(out[0][0, 0].astype(f32), (8, 128))
            if "carry8" in probe_dup:
                for q in range(8):
                    oit = oit + f32(1e-30) \
                        * out[2 + keys.index(f"dum{q}")][:8, :]
            oit_ref[:] = oit
        else:
            def cond(c):
                it = c[0]
                mode = c[1 + keys.index("mode")]
                return jnp.any(mode != MODE_INACTIVE) \
                    & (it[0, 0] < max_iters)

            def body(c):
                it = c[0]
                s = dict(zip(keys, c[1:]))
                for i in range(unroll):
                    # env fetch on every escape_every-th slot (and always
                    # on the last so a drain can't stall parked escapes)
                    do_esc = ((i + 1) % escape_every == 0) \
                        or i == unroll - 1
                    do_nee = ((i + 1) % nee_every == 0) \
                        or i == unroll - 1
                    s = step(s, do_escape=do_esc, do_nee=do_nee)
                return (it + unroll,) + tuple(s[k] for k in keys)

            init = (jnp.zeros((1, 1), i32),) + tuple(s[k] for k in keys)
            out = lax.while_loop(cond, body, init)
            # per-strip while-iteration count (diagnostics: drain-tail
            # inflation = iters*lanes / (pixels*spp*steps_per_sample))
            oit_ref[:] = jnp.broadcast_to(out[0][0, 0].astype(f32),
                                          (8, 128))

    return kernel


@partial(
    jax.jit,
    static_argnames=("meta", "width", "n_strips", "spp", "k_march",
                     "test_every", "unroll", "escape_every", "compact",
                     "queue_items", "interpret", "env_rgbe", "probe_dup",
                     "escape_rounds", "resolve_rounds", "resolve_full",
                     "escape_full", "nee_full", "sublanes", "tile_w",
                     "scan_blocks", "meta_block", "nee_every",
                     "mxu_gather", "mip_u8", "hbm_atlas", "mip_block",
                     "pool_rgbe", "resolve_bound"),
)
def _render_strips_jit(tabs, pool, pf, pi, meta, width, n_strips,
                       spp, k_march, test_every, unroll, escape_every,
                       compact, queue_items, interpret, env_rgbe=False,
                       probe_dup=(), escape_rounds=4, resolve_rounds=2,
                       resolve_full=False, escape_full=False,
                       nee_full=False, sublanes=8, tile_w=0,
                       scan_blocks=8, meta_block=0, nee_every=1,
                       mxu_gather=False, mip_u8=False, hbm_atlas=False,
                       mip_block=-1, pool_rgbe=False, resolve_bound=0,
                       perm=None):
    max_iters = (2048 + 512 * spp) * 8
    if queue_items:
        max_iters = max_iters * (queue_items // 1024 + 1)
    kernel = _make_kernel(meta, width, spp, k_march, test_every, unroll,
                          max_iters, escape_every, compact, queue_items,
                          env_rgbe=env_rgbe, probe_dup=probe_dup,
                          escape_rounds=escape_rounds,
                          resolve_rounds=resolve_rounds,
                          resolve_full=resolve_full,
                          escape_full=escape_full, nee_full=nee_full,
                          sublanes=sublanes, tile_w=tile_w,
                          scan_blocks=scan_blocks,
                          meta_block=meta_block, nee_every=nee_every,
                          mxu_gather=mxu_gather, mip_u8=mip_u8,
                          hbm_atlas=hbm_atlas, mip_block=mip_block,
                          pool_rgbe=pool_rgbe,
                          resolve_bound=resolve_bound)

    img_rows = (queue_items // 128) if queue_items else sublanes
    out_shape = [jax.ShapeDtypeStruct((n_strips * img_rows, 128), f32)
                 for _ in range(4)]
    out_shape.append(jax.ShapeDtypeStruct((n_strips * 8, 128), f32))
    out_specs = [pl.BlockSpec((img_rows, 128), lambda k: (k, 0),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    out_specs.append(pl.BlockSpec((8, 128), lambda k: (k, 0),
                                  memory_space=pltpu.VMEM))

    def tab_spec(arr):
        # constant index map: the pipeline fetches each table ONCE and
        # reuses it across grid steps instead of re-DMAing ~9 MB per strip
        return pl.BlockSpec(arr.shape, lambda k: (0, 0),
                            memory_space=pltpu.VMEM)

    table_order = ("atlas_p", "meta_slot", "meta_lo", "meta_hi", "mip_maj")
    pool_order = (("wx", "wy", "wz", "pdf", "lergbe") if pool_rgbe
                  else ("wx", "wy", "wz", "pdf", "ler", "leg", "leb"))
    env_keys = ("env_rgbe",) if env_rgbe else ("env_r", "env_g", "env_b")
    if meta.tf_rows:
        env_keys = env_keys + ("tf_r", "tf_g", "tf_b", "tf_a")
    if meta.emi_n_slots:
        env_keys = env_keys + ("emi_atlas_p", "emi_slot", "emi_lo",
                               "emi_hi")
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [tab_spec(tabs[k]) for k in table_order]
        + [tab_spec(pool[k]) for k in pool_order]
        + [tab_spec(tabs[k]) for k in env_keys]
    )

    kwargs = {}
    if hbm_atlas:
        # the atlas never enters VMEM whole: it stays an ANY-space
        # (HBM) ref; resolve serves DMA demanded rows (kernel
        # dma_atlas_rows) into the landing scratch
        in_specs[2] = pl.BlockSpec(memory_space=pl.ANY)
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((128, 128), i32),    # dma_land
            pltpu.VMEM((1, 128), i32),      # dma_stage
            pltpu.SMEM((1, 128), i32),      # dma_smem
            pltpu.SemaphoreType.DMA(()),    # dma_sem_i
            pltpu.SemaphoreType.DMA(()),    # dma_sem_r
        ]
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kwargs,
    )(pf, pi, tabs["atlas_p"], tabs["meta_slot"], tabs["meta_lo"],
      tabs["meta_hi"], tabs["mip_maj"],
      *(pool[k] for k in pool_order),
      *(tabs[k] for k in env_keys))
    r, g, b, a, iters = outs
    n_pix = n_strips * img_rows * 128
    img = jnp.stack(
        [r.reshape(n_pix), g.reshape(n_pix), b.reshape(n_pix),
         a.reshape(n_pix)], axis=-1)
    if perm is not None:
        # tile mode: output position g*qi+i holds tile g's i-th pixel;
        # perm maps flat pixel index -> output position
        img = jnp.take(img, perm, axis=0)
    return img, iters[::8, 0]  # one iteration count per grid instance


_PERM_CACHE = {}


def _tile_perm(n_pad, width, qi, tile_w):
    """flat pixel index -> tile-mode output position (device i32,
    cached per shape)."""
    key = (n_pad, width, qi, tile_w)
    if key not in _PERM_CACHE:
        import numpy as _np

        th = qi // tile_w
        tpr = width // tile_w
        p = _np.arange(n_pad, dtype=_np.int64)
        px = p % width
        py = p // width
        g = (py // th) * tpr + (px // tile_w)
        i = (py % th) * tile_w + (px % tile_w)
        _PERM_CACHE[key] = jnp.asarray((g * qi + i).astype(_np.int32))
    return _PERM_CACHE[key]


def render_strips(packed: PackedScene, pool, pf, pi, n_pix, width, spp,
                  k_march=8, test_every=4, unroll=2, escape_every=2,
                  compact=True, queue_items=None, interpret=None,
                  return_iters=False, env_rgbe=True, probe_dup=(),
                  mip_override=None, escape_rounds=4, resolve_rounds=2,
                  resolve_full=False, escape_full=False, nee_full=False,
                  sublanes=8, tile_w=0, scan_blocks=8, meta_block=0,
                  nee_every=1, mxu_gather=False, mip_u8=False,
                  hbm_atlas=False, mip_block=-1, pool_rgbe=False,
                  resolve_bound=0):
    """Render ``n_pix`` flat pixels (n_pix % 1024 == 0) of a
    ``width``-wide frame at ``spp`` samples each; returns the (n_pix, 4)
    per-pixel SUM of per-sample (L, alpha). Samples are the
    chunked-engine csize=spp streams (module doc).

    ``mip_override`` replaces the majorant mip table — the TF path
    passes the per-trace pre-baked TF-transformed table here
    (renderer._render_pallas)."""
    lane_block = int(sublanes) * 128
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if queue_items is None:
        queue_items = 0
    else:
        queue_items = min(int(queue_items), n_pix)
        if n_pix % queue_items or queue_items % 1024:
            raise ValueError("n_pix must divide into queue super-blocks "
                             "(queue_items % 1024 == 0)")
    if not queue_items and n_pix % lane_block:
        # strip mode maps lanes to pixels statically; queue mode only
        # needs the super-block tiling (lanes beyond the item count
        # just stay inactive)
        raise ValueError(
            f"pallas strip mode needs n_pix % {lane_block} == 0")
    tile_w = int(tile_w)
    perm = None
    if tile_w:
        th = queue_items // tile_w if queue_items else 0
        if (not queue_items or width % tile_w
                or tile_w & (tile_w - 1)
                or queue_items % tile_w
                or n_pix % (width * th)):
            raise ValueError(
                "tile_w needs queue mode, a power-of-two tile_w "
                "dividing width, and whole tile rows "
                f"(n_pix={n_pix}, width={width}, qi={queue_items}, "
                f"tile_w={tile_w})")
        perm = _tile_perm(n_pix, width, queue_items, tile_w)
    grid_n = (n_pix // queue_items) if queue_items else \
        (n_pix // lane_block)
    tabs = {k: v for k, v in packed._asdict().items() if k != "meta"}
    if mip_override is not None:
        tabs["mip_maj"] = mip_override
    elif packed.meta.tf_rows:
        raise ValueError(
            "TF scenes need the pre-baked TF majorant table "
            "(mip_override; see renderer._render_pallas)")
    if mip_u8 and tabs["mip_maj"].dtype != jnp.int32:
        raise ValueError(
            "mip_u8 needs the u8-packed majorant table as mip_override "
            "(pack.build_mip_u8 words + the PF_MIP_LO/SCALE pf rows)")
    img, iters = _render_strips_jit(
        tabs, pool, pf, pi, packed.meta, int(width), grid_n,
        int(spp), int(k_march), int(test_every), int(unroll),
        int(escape_every), bool(compact), int(queue_items),
        bool(interpret), env_rgbe=bool(env_rgbe),
        probe_dup=tuple(probe_dup), escape_rounds=int(escape_rounds),
        resolve_rounds=int(resolve_rounds),
        resolve_full=bool(resolve_full), escape_full=bool(escape_full),
        nee_full=bool(nee_full), sublanes=int(sublanes),
        tile_w=tile_w, scan_blocks=int(scan_blocks),
        meta_block=int(meta_block), nee_every=int(nee_every),
        mxu_gather=bool(mxu_gather), mip_u8=bool(mip_u8),
        hbm_atlas=bool(hbm_atlas), mip_block=int(mip_block),
        pool_rgbe=bool(pool_rgbe), resolve_bound=int(resolve_bound),
        perm=perm)
    if return_iters:
        return img, iters
    return img
