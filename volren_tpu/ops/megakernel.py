"""Wavefront megakernel: the TPU-native performance path.

The reference runs one GL compute thread per pixel per spp with deeply
divergent nested loops (pathtracer_brick.glsl -> trace_path ->
sample_volumeDDA / transmittanceDDA). A literal port (nested masked
while_loops, see ops/tracer.py — kept as the readable oracle) serializes
every inner loop to its worst lane at full vector width.

This module flattens the whole renderer into a per-lane state machine with
sample regeneration:

  lane = pixel. modes: INACTIVE, REGEN, EXTEND (path-ray DDA march),
  SHADOW (NEE shadow-ray DDA march). Events mark collisions/exits pending
  resolution.

A render step is FOUR SEPARATE jitted phase programs dispatched from the
host:

  phase_regen  — start the pixel's next sample (reference seeding
                 tea(seed * pixel, sample), camera ray, fresh march state)
  phase_march  — K DDA micro-steps with inline null-collision tests
                 (one program, K statically unrolled)
  phase_nee    — resolve path-ray collisions: throughput, O(1) alias-table
                 environment sample (same texel distribution as the
                 9-level mip warp), pending contribution, shadow-ray setup
  phase_finish — shadow completion, escape radiance with MIS, bounce
                 cap + Russian roulette, HG scatter, sample accumulation

Why phases instead of one fused step: measured on the tunneled v5e
runtime, each phase runs in ~0.1-0.2 ms and keeps the session healthy,
while the same work fused into ONE program executes ~40x slower AND
latches the whole process into a degraded ~5 ms/dispatch mode (the trigger
correlates with large fused programs mixing many gathers with wide state;
see PROGRESS notes). Host-side dispatch costs ~0.1 ms/call, so the split
is strictly cheaper. Device-side while_loop variants additionally lower
gathers to a scalarized path, which is why the loop lives on the host.

Estimator semantics are identical to ops/tracking.py (the GLSL port),
including the reference's transmittanceDDA binary-visibility behaviour and
emission weighting; only the RNG *consumption pattern* differs (alias
sampling draws the same texel distribution as the hierarchical warp from
the same two uniforms), so images agree in distribution, not bitwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import rng as _rng
from .envmap import bilinear_env, dir_to_uv, sample_environment_alias
from .geometry import (
    M_PI,
    INV_4PI,
    intersect_box,
    luma,
    normalize,
    sanitize,
    transform_point,
    transform_vector,
)
from .grid import lookup_majorant
from .phase import phase_henyey_greenstein, sample_phase_henyey_greenstein
from .tracking import MIP_START, MIP_SPEED_DOWN, MIP_SPEED_UP, _density_at, _add_emission

MODE_INACTIVE = 0
MODE_REGEN = 1
MODE_EXTEND = 2
MODE_SHADOW = 3

# pending events, resolved by phase_nee / phase_finish
EV_NONE = 0
EV_EXT_HIT = 1  # real collision on the path ray
EV_EXT_EXIT = 2  # path ray left the volume
EV_SH_HIT = 3  # shadow ray occluded
EV_SH_EXIT = 4  # shadow ray visible
EV_SCATTER = 5  # NEE skipped (pdf <= 0); go straight to scatter
EV_TEST = 6  # tau crossed: parked for the batched density-test resolve

DEFAULT_K_MARCH = 8


def _w3(mask, a, b):
    return jnp.where(mask[..., None], a, b)


# envmap fetch helpers live in ops.envmap (single definition of the
# parity-critical math)
_dir_to_uv = dir_to_uv


def _setup_ray(s, inv_transform, bb_min, bb_max, org, direction, mask):
    """(Re)initialize march state for ``mask`` lanes: world-space slab test,
    index-space ray, fresh optical depth (sample_volumeDDA entry,
    common.glsl:460-468). Draws one uniform for tau on mask & hit lanes."""
    hit_box, near, far_new = intersect_box(org, direction, bb_min, bb_max)
    ipos0_new = transform_point(inv_transform, org)
    idir_new = transform_vector(inv_transform, direction)
    seed, u_tau = _rng.rng_masked(s["seed"], mask & hit_box)
    s["seed"] = seed
    s["t"] = jnp.where(mask, near + 1e-6, s["t"])
    s["far"] = jnp.where(mask, jnp.where(hit_box, far_new, 0.0), s["far"])
    s["tau"] = jnp.where(mask, -jnp.log(1.0 - u_tau), s["tau"])
    s["mip"] = jnp.where(mask, MIP_START, s["mip"])
    s["ipos0"] = _w3(mask, ipos0_new, s["ipos0"])
    s["idir"] = _w3(mask, idir_new, s["idir"])
    s["ri"] = _w3(mask, 1.0 / idir_new, s["ri"])
    return s


def init_state(width: int, height: int, row0: int = 0, reps: int = 1, col0: int = 0):
    """Fresh lane state for a width x height tile at (col0, row0) of the
    full frame (px/py are ABSOLUTE pixel coordinates — per-lane sample
    streams depend only on them, which is what makes any tiling of a frame
    produce the same samples).

    ``reps`` > 1 replicates the pixel grid (lane order: rep-major) for
    spp-sharded rendering — each replica traces a disjoint sample range.

    Pixel coordinates are precomputed here (eagerly) and carried in the
    state ON PURPOSE: computing them in a phase body constant-folds into
    large array literals, and big embedded literals degrade this runtime.
    Call this OUTSIDE jit and pass the state in as an argument.
    """
    n = width * height * reps
    f32, i32 = jnp.float32, jnp.int32
    zeros = jnp.zeros((n,), f32)
    zeros3 = jnp.zeros((n, 3), f32)
    lane_local = jnp.arange(n, dtype=jnp.int32)
    px = lane_local % width + col0
    py = (lane_local // width) % height + row0
    return {
        "px": px,
        "py": py,
        "mode": jnp.full((n,), MODE_REGEN, i32),
        "event": jnp.zeros((n,), i32),
        "seed": jnp.zeros((n,), jnp.uint32),
        "p_org": zeros3,
        "p_dir": zeros3.at[:, 2].set(1.0),
        "throughput": zeros3,
        "L": zeros3,
        "pending": zeros3,
        "n_paths": jnp.zeros((n,), i32),
        "last_f_p": zeros,
        "free": jnp.zeros((n,), bool),
        "t": zeros,
        "far": zeros,
        "tau": zeros,
        "mip": zeros,
        "ipos0": zeros3,
        "idir": zeros3,
        "ri": zeros3,
        "accum": jnp.zeros((n, 4), f32),
        "spp_done": jnp.zeros((n,), i32),
    }


# ----------------------------------------------------------------------------
# phase bodies (pure; the @jax.jit wrappers follow)
# ----------------------------------------------------------------------------


def phase_regen_body(s, scene, params, cfg, width, spp, spp_base, full_height):
    """Start the next sample on REGEN lanes (pathtracer_brick.glsl:23-33):
    per-(pixel, sample) TEA seed, jittered camera ray, fresh path + march
    state. Exhausted lanes go INACTIVE.

    ``width``/``full_height`` are the FULL frame dimensions (the tile shape
    lives in the state arrays). They may be python ints or traced scalars —
    passing them dynamically lets one compiled tile program serve every
    frame resolution (first-call program cost on the tunneled runtime is
    88-580 s PER SHAPE, see NOTES.md)."""
    f32 = jnp.float32
    n = s["mode"].shape[0]
    px, py = s["px"], s["py"]
    wu = jnp.asarray(width, jnp.uint32)
    wf = jnp.asarray(width, f32)
    hf = jnp.asarray(full_height, f32)
    lane = py.astype(jnp.uint32) * wu + px.astype(jnp.uint32)

    regen = s["mode"] == MODE_REGEN
    can = regen & (s["spp_done"] < spp)
    s = dict(s)
    s["mode"] = jnp.where(
        regen & ~can, MODE_INACTIVE, jnp.where(can, MODE_EXTEND, s["mode"])
    )
    sample_idx = (spp_base + s["spp_done"] + 1).astype(jnp.uint32)
    fresh_seed = _rng.tea(params.seed * lane, sample_idx, 32)
    s["seed"] = jnp.where(can, fresh_seed, s["seed"])
    seed, u2j = _rng.rng2_masked(s["seed"], can)
    s["seed"] = seed
    z_cam = -0.5 / jnp.tan(0.5 * M_PI * params.cam_fov / 180.0)
    pix = jnp.stack(
        [
            (px.astype(f32) + u2j[..., 0] - wf * 0.5) / hf,
            (py.astype(f32) + u2j[..., 1] - hf * 0.5) / hf,
        ],
        axis=-1,
    )
    cam_local = jnp.concatenate([pix, jnp.broadcast_to(z_cam, pix[..., :1].shape)], -1)
    new_dir = normalize(normalize(cam_local) @ params.cam_transform.T)
    s["p_org"] = _w3(can, jnp.broadcast_to(params.cam_pos, (n, 3)), s["p_org"])
    s["p_dir"] = _w3(can, new_dir, s["p_dir"])
    s["throughput"] = _w3(can, jnp.ones((n, 3), f32), s["throughput"])
    s["L"] = _w3(can, jnp.zeros((n, 3), f32), s["L"])
    s["pending"] = _w3(can, jnp.zeros((n, 3), f32), s["pending"])
    s["n_paths"] = jnp.where(can, 0, s["n_paths"])
    s["last_f_p"] = jnp.where(can, 0.0, s["last_f_p"])
    s["free"] = jnp.where(can, True, s["free"])
    s["event"] = jnp.where(can, EV_NONE, s["event"])
    return _setup_ray(
        s, scene.density.inv_transform, params.bb_min, params.bb_max,
        s["p_org"], s["p_dir"], can,
    )


def phase_march_body(s, scene, params, cfg, k_march, test_every=None):
    """K DDA micro-steps (sample_volumeDDA / transmittanceDDA march,
    common.glsl:469-480) with batched density-test resolves every
    ``test_every`` micro-steps.

    Each micro-step is majorant fetch + boundary step only (MXU one-hot
    majorants when cfg.use_onehot); a tau crossing parks the lane with
    EV_TEST and its stepped-back t. A test resolve runs the expensive
    fetches (stochastic-filter atlas decode, emission) for all parked
    lanes at once; null collisions resume marching at the next micro-step.
    ``test_every`` trades resolve frequency against lane idling (a parked
    lane waits <= test_every-1 micro-steps) — per-lane draw order is
    IDENTICAL for every setting, so all configurations produce the same
    image bit-for-bit on the f32 path."""
    f32, i32 = jnp.float32, jnp.int32
    grid = scene.density
    if test_every is None:
        test_every = k_march
    s = dict(s)
    for j in range(k_march):
        mode, event = s["mode"], s["event"]
        t, far, tau, mip = s["t"], s["far"], s["tau"], s["mip"]
        ipos0, idir, ri = s["ipos0"], s["idir"], s["ri"]

        march = ((mode == MODE_EXTEND) | (mode == MODE_SHADOW)) & (event == EV_NONE)
        is_extend = mode == MODE_EXTEND

        curr = ipos0 + t[..., None] * idir
        mip_i = jnp.round(mip).astype(i32)
        maj = lookup_majorant(
            grid, curr, mip_i, params.density_scale, onehot=cfg.use_onehot
        )
        if cfg.use_tf:
            from .transfer import tf_alpha_majorant

            maj = params.majorant * tf_alpha_majorant(
                scene.tf, maj * params.inv_majorant, onehot=cfg.use_onehot
            )
        dim = (8 << mip_i).astype(f32)[..., None]
        offs = jnp.where(ri >= 0.0, dim + 0.5, -0.5)
        dt = ((jnp.floor(curr / dim) * dim + offs - curr) * ri).min(axis=-1)
        t_adv = t + dt
        tau_adv = tau - maj * dt
        mip_up = jnp.minimum(mip + MIP_SPEED_UP, 3.0)

        collide = march & (tau_adv <= 0.0)
        t = jnp.where(
            march,
            jnp.where(collide, t_adv + tau_adv / jnp.maximum(maj, 1e-20), t_adv),
            t,
        )
        exited = march & (t >= far)
        test = collide & ~exited

        tau = jnp.where(march & ~collide, tau_adv, tau)
        mip = jnp.where(march & ~collide, mip_up, mip)
        # park crossing lanes for the batched resolve; carry the majorant
        # at the crossing in `tau` (dead there until the redraw)
        tau = jnp.where(test, maj, tau)
        mip = jnp.where(test, mip_up, mip)
        event = jnp.where(
            test,
            EV_TEST,
            jnp.where(exited, jnp.where(is_extend, EV_EXT_EXIT, EV_SH_EXIT), event),
        )
        s.update(event=event, t=t, tau=tau, mip=mip)

        if (j + 1) % test_every == 0 or j == k_march - 1:
            s = _resolve_tests(s, scene, params, cfg)
    return s


def _resolve_tests(s, scene, params, cfg):
    """Batched density-test resolve for all EV_TEST lanes (the expensive
    fetches: stochastic-filter atlas decode + emission).

    Stage-level lane compaction used to run here (service only the top-k
    event lanes); it measured NET NEGATIVE in every regime — fixed-lane
    engines (NOTES.md round-3 table) AND the device_queue engine
    (probes/results/compact_ab.jsonl: 69 -> 22 spp/s at divisor 8) — so
    the plumbing was stripped. The queue engine's small persistent lane
    array is the load-balancing mechanism that pays; see git history
    (ops/compact.py) for the compacted form and NOTES.md for the
    measurements."""
    mode, event, seed = s["mode"], s["event"], s["seed"]
    t, tau, mip = s["t"], s["tau"], s["mip"]
    is_extend = mode == MODE_EXTEND
    test = event == EV_TEST
    maj = jnp.where(test, tau, 0.0)  # parked majorant
    pos_col = s["ipos0"] + t[..., None] * s["idir"]

    d, _rgba, seed = _density_at(scene, params, cfg, pos_col, seed, test)
    le, seed = _add_emission(
        scene,
        params,
        cfg,
        pos_col,
        d * params.inv_majorant,
        s["throughput"],
        s["L"],
        seed,
        test & is_extend,
    )
    seed, u_cls = _rng.rng_masked(seed, test)
    real = test & (u_cls * jnp.maximum(maj, 0.0) < d)

    # null collisions: redraw tau, drop mips, resume marching next step
    redraw = test & ~real
    seed, u_tau = _rng.rng_masked(seed, redraw)
    tau = jnp.where(redraw, -jnp.log(1.0 - u_tau), tau)
    mip = jnp.where(redraw, jnp.maximum(0.0, mip - MIP_SPEED_DOWN), mip)
    event = jnp.where(
        real & is_extend,
        EV_EXT_HIT,
        jnp.where(real & ~is_extend, EV_SH_HIT, jnp.where(redraw, EV_NONE, event)),
    )
    s = dict(s)
    s.update(event=event, seed=seed, tau=tau, mip=mip, L=le)
    return s


def phase_nee_body(s, scene, params, cfg):
    """Resolve EV_EXT_HIT: multiply throughput by (TF-tinted) albedo,
    advance the path origin, sample the environment through the alias
    table, stage the NEE contribution, and set up the shadow-ray march
    (trace_path NEE, common.glsl:614-626)."""
    f32, i32 = jnp.float32, jnp.int32
    s = dict(s)
    n = s["mode"].shape[0]
    event, seed = s["event"], s["seed"]
    throughput, p_org, p_dir, t = s["throughput"], s["p_org"], s["p_dir"], s["t"]

    ext_hit = event == EV_EXT_HIT

    if cfg.use_tf:
        from .grid import lookup_density_trilinear
        from .transfer import tf_lookup

        pos_hit = s["ipos0"] + t[..., None] * s["idir"]
        d_raw = lookup_density_trilinear(scene.density, pos_hit, params.density_scale)
        rgba = tf_lookup(scene.tf, d_raw * params.inv_majorant)
        mult = params.albedo * rgba[..., :3]
    else:
        mult = jnp.broadcast_to(params.albedo, (n, 3))
    seed, u2n = _rng.rng2_masked(seed, ext_hit)
    uv_x, uv_y, pdf_nee, w_i, le_texel = sample_environment_alias(scene.env, u2n)
    if cfg.env_nearest_nee:
        # radiance rides in the alias row (zero extra gathers; see
        # TraceConfig.env_nearest_nee for the filtering tradeoff)
        le = scene.env.strength * le_texel
    else:
        le = scene.env.strength * bilinear_env(scene.env, uv_x, uv_y)[..., :3]

    throughput = _w3(ext_hit, throughput * mult, throughput)
    p_org = _w3(ext_hit, p_org + t[..., None] * p_dir, p_org)
    s["n_paths"] = s["n_paths"] + ext_hit.astype(i32)

    f_p = phase_henyey_greenstein(jnp.sum(-p_dir * w_i, axis=-1), params.phase_g)
    mis = jnp.where(
        params.show_environment > 0,
        (pdf_nee * pdf_nee) / jnp.maximum(pdf_nee * pdf_nee + f_p * f_p, 1e-32),
        1.0,
    )
    has_nee = ext_hit & (pdf_nee > 0.0)
    pending_new = throughput * (mis * f_p / jnp.maximum(pdf_nee, 1e-20))[..., None] * le
    s["pending"] = _w3(has_nee, pending_new, s["pending"])
    s["throughput"] = throughput
    s["p_org"] = p_org
    s["seed"] = seed
    s["mode"] = jnp.where(has_nee, MODE_SHADOW, s["mode"])
    s["event"] = jnp.where(
        ext_hit, jnp.where(has_nee, EV_NONE, EV_SCATTER), s["event"]
    )
    return _setup_ray(
        s, scene.density.inv_transform, params.bb_min, params.bb_max,
        s["p_org"], _w3(has_nee, w_i, s["p_dir"]), has_nee,
    )


def phase_finish_body(s, scene, params, cfg, do_escape=True):
    """Resolve shadow results, escapes and scatters: visible shadow rays
    commit the pending NEE contribution; escaped path rays add the
    environment with the MIS power heuristic (common.glsl:645-649); then
    bounce cap + Russian roulette + HG scatter (common.glsl:629-641), and
    finished samples accumulate into the running sum.

    ``do_escape=False`` parks EV_EXT_EXIT lanes for a later step — the
    escape's 4-row bilinear environment fetch is the phase's dominant cost,
    so the chunked engine runs it on alternating steps (escape lanes draw
    nothing while parked: bit-identical output, slightly longer tails)."""
    f32, i32 = jnp.float32, jnp.int32
    s = dict(s)
    n = s["mode"].shape[0]
    event, seed = s["event"], s["seed"]
    throughput, p_dir = s["throughput"], s["p_dir"]
    n_paths, free = s["n_paths"], s["free"]
    le = s["L"]

    sh_hit = event == EV_SH_HIT  # occluded (binary visibility, see module doc)
    # reference consumes one RR draw when zeroing Tr (common.glsl:445-449)
    seed, _u_rr_sh = _rng.rng_masked(seed, sh_hit)
    sh_vis = event == EV_SH_EXIT
    le = le + _w3(sh_vis, s["pending"], jnp.zeros((n, 3), f32))

    # escape: environment radiance with MIS
    if do_escape:
        esc = event == EV_EXT_EXIT
        uv_x, uv_y = _dir_to_uv(scene.env.inv_transform, p_dir)
        le_env = scene.env.strength * bilinear_env(scene.env, uv_x, uv_y)[..., :3]
        avg_w = scene.env.imp_mips[-1].reshape(())
        pdf_esc = luma(le_env) / avg_w * INV_4PI
        a2 = s["last_f_p"] * s["last_f_p"]
        mis_esc = jnp.where(n_paths > 0, a2 / jnp.maximum(a2 + pdf_esc * pdf_esc, 1e-32), 1.0)
        add_env = esc & free & (params.show_environment > 0)
        le = le + _w3(add_env, throughput * mis_esc[..., None] * le_env, jnp.zeros((n, 3), f32))
    else:
        esc = jnp.zeros((n,), bool)

    # scatter
    scatter = sh_hit | sh_vis | (event == EV_SCATTER)
    capped = scatter & (n_paths >= params.bounces)
    alive = scatter & ~capped
    rr_val = luma(throughput)
    rr = alive & (rr_val < 0.1)
    seed, u_rr = _rng.rng_masked(seed, rr)
    killed = rr & (u_rr < 1.0 - rr_val)
    throughput = _w3(rr & ~killed, throughput / jnp.maximum(rr_val, 1e-20)[..., None], throughput)
    alive = alive & ~killed
    free = jnp.where(capped | killed, False, free)

    seed, u2s = _rng.rng2_masked(seed, alive)
    sc_dir = sample_phase_henyey_greenstein(p_dir, params.phase_g, u2s)
    f_p_sc = phase_henyey_greenstein(jnp.sum(-p_dir * sc_dir, axis=-1), params.phase_g)
    s["last_f_p"] = jnp.where(alive, f_p_sc, s["last_f_p"])
    p_dir = _w3(alive, sc_dir, p_dir)

    # sample end -> accumulate + REGEN
    end = esc | capped | killed
    alpha = jnp.clip(n_paths.astype(f32), 0.0, 1.0)
    sample_rgba = sanitize(jnp.concatenate([le, alpha[..., None]], axis=-1))
    s["accum"] = s["accum"] + jnp.where(end[..., None], sample_rgba, 0.0)
    s["spp_done"] = s["spp_done"] + end.astype(i32)
    s["L"] = _w3(end, jnp.zeros((n, 3), f32), le)
    s["mode"] = jnp.where(end, MODE_REGEN, jnp.where(alive, MODE_EXTEND, s["mode"]))
    processed = scatter | esc
    s["event"] = jnp.where(processed, EV_NONE, s["event"])
    s["seed"] = seed
    s["throughput"] = throughput
    s["p_dir"] = p_dir
    s["free"] = free
    return _setup_ray(
        s, scene.density.inv_transform, params.bb_min, params.bb_max,
        s["p_org"], p_dir, alive,
    )


def step_body(s, scene, params, cfg, width, spp, spp_base, full_height, k_march,
              do_escape=True, test_every=None, do_nee=True):
    """One full wavefront step = regen -> K march -> nee -> finish. Shared
    by the host-phase driver and the single-jit tile variant so both
    produce bit-identical samples. See phase_finish_body for do_escape and
    phase_march_body for test_every.

    ``do_nee=False`` parks EV_EXT_HIT lanes for a later step — the NEE
    alias-row gather is the phase's dominant cost, so the chunked engine
    runs it on alternating steps (parked lanes draw nothing while waiting:
    bit-identical output, slightly longer tails)."""
    s = phase_regen_body(s, scene, params, cfg, width, spp, spp_base, full_height)
    s = phase_march_body(s, scene, params, cfg, k_march, test_every=test_every)
    if do_nee:
        s = phase_nee_body(s, scene, params, cfg)
    s = phase_finish_body(s, scene, params, cfg, do_escape=do_escape)
    return s


# ----------------------------------------------------------------------------
# jitted phase programs (kept as SEPARATE programs on purpose, see module doc)
#
# Each program takes and RETURNS only the state entries its phase can
# modify; everything else rides along read-only. Without buffer donation
# (which the axon runtime rejects) XLA copies every passthrough output, so
# returning untouched arrays would double the per-step HBM traffic.
# ----------------------------------------------------------------------------

_RW = {
    "regen": (
        "mode", "event", "seed", "p_org", "p_dir", "throughput", "L",
        "pending", "n_paths", "last_f_p", "free", "t", "far", "tau", "mip",
        "ipos0", "idir", "ri",
    ),
    "march": ("event", "seed", "t", "tau", "mip", "L"),
    "nee": (
        "mode", "event", "seed", "p_org", "throughput", "n_paths", "pending",
        "t", "far", "tau", "mip", "ipos0", "idir", "ri",
    ),
    "finish": (
        "mode", "event", "seed", "p_dir", "throughput", "L", "last_f_p",
        "free", "accum", "spp_done", "t", "far", "tau", "mip", "ipos0",
        "idir", "ri",
    ),
}


@partial(jax.jit, static_argnames=("cfg",))
def _phase_regen_sub(rw, ro, scene, params, cfg, width, spp, spp_base, full_height):
    out = phase_regen_body({**ro, **rw}, scene, params, cfg, width, spp, spp_base, full_height)
    return {k: out[k] for k in _RW["regen"]}


@partial(jax.jit, static_argnames=("cfg", "k_march", "test_every"))
def _phase_march_sub(rw, ro, scene, params, cfg, k_march, test_every=None):
    out = phase_march_body({**ro, **rw}, scene, params, cfg, k_march, test_every=test_every)
    return {k: out[k] for k in _RW["march"]}


@partial(jax.jit, static_argnames=("cfg",))
def _phase_nee_sub(rw, ro, scene, params, cfg):
    out = phase_nee_body({**ro, **rw}, scene, params, cfg)
    return {k: out[k] for k in _RW["nee"]}


@partial(jax.jit, static_argnames=("cfg",))
def _phase_finish_sub(rw, ro, scene, params, cfg):
    out = phase_finish_body({**ro, **rw}, scene, params, cfg)
    return {k: out[k] for k in _RW["finish"]}


@partial(jax.jit, static_argnames=("cfg",))
def _phase_finish_act_sub(rw, ro, scene, params, cfg):
    """phase_finish + activity count as a widened VECTOR output of the same
    program — a separate scalar-reduction program (_any_active) executes
    ~30x slower through this runtime and its scalar output hits the same
    slow path (see _megastep_jit)."""
    out = phase_finish_body({**ro, **rw}, scene, params, cfg)
    n_active = jnp.broadcast_to(
        (out["mode"] != MODE_INACTIVE).sum(dtype=jnp.int32), (8,)
    )
    return {k: out[k] for k in _RW["finish"]}, n_active


def _split(state, name):
    rw = {k: state[k] for k in _RW[name]}
    ro = {k: v for k, v in state.items() if k not in _RW[name]}
    return rw, ro


def phase_regen(state, scene, params, cfg, width, spp, spp_base, full_height):
    rw, ro = _split(state, "regen")
    out = dict(state)
    out.update(_phase_regen_sub(rw, ro, scene, params, cfg, width, spp, spp_base, full_height))
    return out


def phase_march(state, scene, params, cfg, k_march, test_every=None):
    rw, ro = _split(state, "march")
    out = dict(state)
    out.update(_phase_march_sub(rw, ro, scene, params, cfg, k_march, test_every))
    return out


def phase_nee(state, scene, params, cfg):
    rw, ro = _split(state, "nee")
    out = dict(state)
    out.update(_phase_nee_sub(rw, ro, scene, params, cfg))
    return out


def phase_finish(state, scene, params, cfg):
    rw, ro = _split(state, "finish")
    out = dict(state)
    out.update(_phase_finish_sub(rw, ro, scene, params, cfg))
    return out


def phase_finish_act(state, scene, params, cfg):
    """phase_finish that also reports the post-step active-lane count (as
    an 8-wide vector; see _phase_finish_act_sub)."""
    rw, ro = _split(state, "finish")
    out = dict(state)
    upd, n_active = _phase_finish_act_sub(rw, ro, scene, params, cfg)
    out.update(upd)
    return out, n_active


@jax.jit
def _any_active(mode):
    return (mode != MODE_INACTIVE).any()


def render_wavefront_host(
    scene,
    params,
    cfg,
    width,
    height,
    spp,
    spp_base,
    row0=0,
    full_height=None,
    k_march=None,
    check_every=16,
    n_groups=1,
    test_every=None,
):
    """Host-stepped wavefront render (the fast path). Returns the
    (height, width, 4) SUM of spp per-sample (L, alpha) values.

    check_every amortizes the activity readback: through the tunneled
    runtime a device->host sync costs ~50-100 ms, far more than a whole
    wavefront step (~0.3 ms at 65k lanes) — overshooting drained states by
    up to check_every-1 steps is much cheaper than syncing often."""
    on_tpu = jax.default_backend() == "tpu"
    full_height = height if full_height is None else full_height
    if k_march is None:
        k_march = DEFAULT_K_MARCH if on_tpu else 4
    if test_every is None:
        test_every = DEFAULT_TEST_EVERY
    spp = jnp.asarray(spp, jnp.int32)
    spp_base = jnp.asarray(spp_base, jnp.int32)

    # generous safety bound: a sample needs on the order of
    # bounces x (DDA steps per segment) / k_march steps; runaway lanes
    # (fp pathologies) must not hang production renders
    max_steps = safety_steps(int(spp), params.bounces)
    state = init_state(width, height, row0)
    steps = 0
    import numpy as _np

    while True:
        for i in range(check_every):
            state = phase_regen(state, scene, params, cfg, width, spp, spp_base, full_height)
            state = phase_march(state, scene, params, cfg, k_march, test_every)
            state = phase_nee(state, scene, params, cfg)
            if i == check_every - 1:
                state, n_active = phase_finish_act(state, scene, params, cfg)
            else:
                state = phase_finish(state, scene, params, cfg)
        steps += check_every
        if int(_np.asarray(n_active)[0]) == 0:
            break
        if steps > max_steps:
            import numpy as _np

            stuck = int(_np.asarray(state["mode"] != MODE_INACTIVE).sum())
            done = _np.asarray(state["spp_done"])
            raise RuntimeError(
                f"wavefront render did not converge after {steps} steps: "
                f"{stuck} lanes active, spp_done min/median "
                f"{done.min()}/{int(_np.median(done))} of {int(spp)}"
            )
    return state["accum"].reshape(height, width, 4)


# ----------------------------------------------------------------------------
# fully-device engine (the DEFAULT fast path): one jitted program runs the
# whole wavefront loop. The lane state MUST be built eagerly (init_state)
# and passed in as an argument — building it inside jit constant-folds the
# pixel-coordinate iota math into multi-hundred-KB HLO literals, and this
# runtime degrades ~500x (session-wide!) on programs carrying big literals
# or closed-over device arrays (see NOTES.md "device constant latch").
# ----------------------------------------------------------------------------


def pack_state(s):
    """Pack the lane-state dict into two wide carries: (n, Kf) f32 and
    (n, Ki) i32 (seed bitcast, bool widened).

    The tunneled runtime pays ~0.1 ms PER OUTPUT BUFFER per while-loop
    step regardless of shape (probes/results/floor.jsonl: 32 arrays of
    (n,1) cost 30x one (n,32) array at equal bytes), so carrying ~22
    state leaves costs more than the actual compute. Packing at the
    while-loop boundary collapses the carry to 2 buffers; the phase
    bodies stay dict-based (slices of the packed arrays fuse into their
    consumers). Exact: f32 concat/slice, u32<->i32 bitcast, and bool
    widening are all value-preserving, so sample streams are unchanged."""
    fcols, icols = [], []
    for k in sorted(s):
        v = s[k]
        arr = v[:, None] if v.ndim == 1 else v
        if v.dtype == jnp.float32:
            fcols.append(arr)
        elif v.dtype == jnp.uint32:
            icols.append(lax.bitcast_convert_type(arr, jnp.int32))
        elif v.dtype == jnp.bool_:
            icols.append(arr.astype(jnp.int32))
        else:
            icols.append(arr.astype(jnp.int32))
    return jnp.concatenate(fcols, -1), jnp.concatenate(icols, -1)


def unpack_state(F, I, template):
    """Inverse of pack_state; ``template`` supplies names/shapes/dtypes
    (its VALUES are unused — pass the eager init state)."""
    s = {}
    fo = io = 0
    for k in sorted(template):
        v = template[k]
        w = 1 if v.ndim == 1 else v.shape[1]
        if v.dtype == jnp.float32:
            col = F[:, fo : fo + w]
            fo += w
        else:
            raw = I[:, io : io + w]
            io += w
            if v.dtype == jnp.uint32:
                col = lax.bitcast_convert_type(raw, jnp.uint32)
            elif v.dtype == jnp.bool_:
                col = raw != 0
            else:
                col = raw.astype(v.dtype)
        s[k] = col[:, 0] if v.ndim == 1 else col
    return s


def _tile_loop(state, scene, params, cfg, width, spp, spp_base, full_height, k_march):
    """while_loop over step groups: regen -> K march microsteps -> nee ->
    finish. Per-lane sample streams are independent of k_march (lanes with
    a pending event sit out remaining microsteps), so all engines produce
    bit-identical samples. Returns (final state, iteration count)."""

    # safety bound: runaway lanes (fp pathologies) must not hang renders;
    # a sample needs on the order of bounces x DDA-steps / k_march groups
    max_iters = (jnp.int32(4096) + jnp.int32(512) * jnp.asarray(spp, jnp.int32)) * (
        jnp.maximum(params.bounces, 32) // 32 + 1
    )

    def cond(c):
        s, it = c
        return ((s["mode"] != MODE_INACTIVE).any()) & (it < max_iters)

    def body(c):
        s, it = c
        s = step_body(s, scene, params, cfg, width, spp, spp_base, full_height, k_march)
        return s, it + 1

    return lax.while_loop(cond, body, (state, jnp.int32(0)))


@partial(jax.jit, static_argnames=("cfg", "width", "full_height", "k_march"))
def _render_tile_jit(state, scene, params, cfg, width, spp, spp_base, full_height, k_march):
    state, it = _tile_loop(state, scene, params, cfg, width, spp, spp_base, full_height, k_march)
    return state["accum"], it


def _default_k_march():
    return DEFAULT_K_MARCH if jax.default_backend() == "tpu" else 4


def render_wavefront_tile(
    scene, params, cfg, width, height, spp, spp_base, row0, full_height,
    state=None, k_march=1,
):
    """Render a tile inside one computation. When traced inside another jit
    (e.g. tests), the state is built at trace time — fine for tiny tiles
    only; production callers pass an eagerly-built ``state``.
    Returns ((height, width, 4) sample SUM, iteration count)."""
    if state is None:
        state = init_state(width, height, row0)
    state, it = _tile_loop(state, scene, params, cfg, width, spp, spp_base, full_height, k_march)
    return state["accum"].reshape(height, width, 4), it


# ----------------------------------------------------------------------------
# chunked-unrolled engine (the TPU fast path).
#
# On TPU, XLA scalarizes gathers inside ANY device loop (lax.scan /
# while_loop) to ~10 ns/element; the same gathers in straight-line code
# (isolated with optimization_barrier, see ops.gather) lower to fully
# vectorized kernels that are effectively free at wavefront scale. So the
# production engine is a host loop over jitted MEGASTEPS: each megastep is
# ``unroll`` wavefront steps unrolled into one straight-line program. The
# per-dispatch overhead amortizes over the unroll factor; the activity
# check (a scalar readback) runs every ``check_every`` megasteps.
# ----------------------------------------------------------------------------


DEFAULT_TEST_EVERY = 2


def safety_steps(spp, bounces):
    """Host-side runaway bound for the step-until-drained loops. A sample
    needs on the order of bounces x (DDA steps per segment) / k_march
    wavefront steps; dense volumes (density_scale >> 1) at high bounce
    caps legitimately exceed the old spp-only bound (4096 + 512*spp blew
    up at 128 bounces / 100x density: probes/probe_parity, round 3). The
    bound exists ONLY to stop fp-pathology hangs — generous is correct.
    ``bounces`` may be a device scalar (pulled once per render call)."""
    import numpy as _np

    b = int(_np.asarray(bounces))
    return (4096 + 512 * int(spp)) * max(1, -(-b // 32))


@partial(jax.jit, static_argnames=("cfg", "k_march", "unroll", "test_every"))
def _megastep_jit(state, scene, params, cfg, width, spp, spp_base, full_height,
                  k_march, unroll, test_every=DEFAULT_TEST_EVERY):
    for i in range(unroll):
        # escape resolution (quad-row bilinear env fetch) and NEE (alias-row
        # gather) on alternating steps only — odd phase so the megastep's
        # LAST step always drains parked escape/ext-hit lanes
        alt = (i % 2 == 1) or unroll == 1
        state = step_body(state, scene, params, cfg, width, spp, spp_base,
                          full_height, k_march, do_escape=alt,
                          test_every=test_every, do_nee=alt)
    # activity as a widened VECTOR output of the same program: a separate
    # scalar-reduction program (the old _any_active) executes ~30x slower
    # through this runtime, and scalar program outputs hit the same slow
    # path (measured: 3.3 s/call vs ~0 inline)
    n_active = jnp.broadcast_to(
        (state["mode"] != MODE_INACTIVE).sum(dtype=jnp.int32), (8,)
    )
    return state, n_active


def _default_unroll():
    # TPU: amortize dispatch overhead over a long straight-line program.
    # CPU (tests): small unroll keeps compile time negligible.
    return 32 if jax.default_backend() == "tpu" else 4


def render_wavefront_chunked(
    scene,
    params,
    cfg,
    width,
    height,
    spp,
    spp_base,
    row0=0,
    full_height=None,
    k_march=None,
    unroll=None,
    check_every=2,
    state=None,
    test_every=DEFAULT_TEST_EVERY,
    col0=0,
    full_width=None,
):
    """Host loop over unrolled megastep programs (see block comment above).
    Sample streams are identical to the other engines (per-lane logic does
    not depend on unroll/k_march grouping). Returns the (height, width, 4)
    SUM of spp per-sample (L, alpha) values for the tile at (col0, row0)
    of the full_width x full_height frame.

    Frame dimensions are DYNAMIC program inputs: one compiled megastep
    serves every resolution that shares the tile shape (first-call program
    cost through the tunneled runtime is 88-580 s per shape)."""
    full_height = height if full_height is None else full_height
    full_width = width if full_width is None else full_width
    if k_march is None:
        k_march = _default_k_march()
    if unroll is None:
        unroll = _default_unroll()
    spp = jnp.asarray(spp, jnp.int32)
    spp_base = jnp.asarray(spp_base, jnp.int32)
    fw = jnp.asarray(full_width, jnp.int32)
    fh = jnp.asarray(full_height, jnp.int32)
    max_steps = safety_steps(int(spp), params.bounces)
    if state is None:
        state = init_state(width, height, row0, col0=col0)
    steps = 0
    import numpy as _np

    while True:
        for _ in range(check_every):
            state, n_active = _megastep_jit(
                state, scene, params, cfg, fw, spp, spp_base,
                fh, k_march, unroll, test_every,
            )
        steps += check_every * unroll
        stuck = int(_np.asarray(n_active)[0])  # forces sync once per group
        if stuck == 0:
            break
        if steps > max_steps:
            raise RuntimeError(
                f"wavefront render did not converge after {steps} steps "
                f"({stuck} lanes active)"
            )
    return state["accum"].reshape(height, width, 4)


def render_wavefront_tiled(
    scene,
    params,
    cfg,
    width,
    height,
    spp,
    spp_base,
    tile_rows=256,
    tile_cols=None,
    **kwargs,
):
    """Tile-block driver over render_wavefront_chunked.

    Large frames run as (height/tile_rows) x (width/tile_cols) blocks
    through the SAME compiled megastep program — one compile per TILE
    shape, shared across every frame resolution (frame dims are dynamic
    inputs) — and each block stops as soon as ITS lanes drain: background
    regions (sky escapes in a bounce or two) no longer march in lockstep
    with the densest tile. Per-lane sample streams depend only on the
    absolute pixel (col0 + x, row0 + y), so the assembled image is
    bit-identical to the untiled render."""
    if tile_cols is None:
        tile_cols = tile_rows
    if (
        height % tile_rows != 0
        or width % tile_cols != 0
        or (height == tile_rows and width == tile_cols)
    ):
        return render_wavefront_chunked(
            scene, params, cfg, width, height, spp, spp_base, **kwargs
        )
    rows = [
        jnp.concatenate(
            [
                render_wavefront_chunked(
                    scene,
                    params,
                    cfg,
                    tile_cols,
                    tile_rows,
                    spp,
                    spp_base,
                    row0=r0,
                    col0=c0,
                    full_height=height,
                    full_width=width,
                    **kwargs,
                )
                for c0 in range(0, width, tile_cols)
            ],
            axis=1,
        )
        for r0 in range(0, height, tile_rows)
    ]
    return jnp.concatenate(rows, axis=0)


def render_wavefront(scene, params, cfg, width, height, spp, spp_base, k_march=None):
    """Single-jit full-frame render: SUM of spp samples, (H, W, 4)."""
    acc, _it = render_wavefront_stats(
        scene, params, cfg, width, height, spp, spp_base, k_march
    )
    return acc


def render_wavefront_stats(scene, params, cfg, width, height, spp, spp_base, k_march=None):
    """render_wavefront + device-loop iteration count (perf diagnosis)."""
    if k_march is None:
        k_march = _default_k_march()
    state = init_state(width, height)
    acc, it = _render_tile_jit(
        state, scene, params, cfg, width,
        jnp.asarray(spp, jnp.int32), jnp.asarray(spp_base, jnp.int32),
        height, k_march,
    )
    return acc.reshape(height, width, 4), it
