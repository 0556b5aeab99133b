"""Null-collision and DDA volume tracking estimators.

Ports of /root/reference/shader/common.glsl:333-501 as masked, batched
lax.while_loops: every lane (ray) carries its own progress; RNG draws are
gated per-lane so each lane consumes exactly the sequence the divergent GLSL
control flow would. The DDA pair marches the 8^3-brick min/max mip pyramid
(Ray Tracing Gems 2 ch. 43 style) with the reference's mip schedule
(MIP_START 3, +0.25 speed-up, -2 speed-down).

All estimator quirks of the reference are replicated deliberately (parity
with the GLSL renderer is the correctness target):
 - transmittanceDDA's ratio adjustment `1 - vol_majorant/majorant` is <= 0
   whenever a real collision is sampled, so it acts as a binary (delta
   tracking) visibility estimator (common.glsl:443),
 - sample_volumeDDA weights emission with the *global* inverse majorant
   while collision tests occur at the *local* majorant rate
   (common.glsl:489).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import rng as _rng
from .geometry import intersect_box, transform_point, transform_vector
from .grid import (
    lookup_density_stochastic,
    lookup_density_trilinear,
    lookup_emission,
    lookup_majorant,
)
from .transfer import tf_lookup

MIP_START = 3.0
MIP_SPEED_UP = 0.25
MIP_SPEED_DOWN = 2.0


def _to_index_space(grid, org, direction):
    ipos = transform_point(grid.inv_transform, org)
    idir = transform_vector(grid.inv_transform, direction)  # non-normalized!
    return ipos, idir


def _density_at(scene, params, cfg, pos, seed, active):
    """Collision-test density (+ TF rgba when enabled). Returns
    (d, rgba_or_None, seed)."""
    if cfg.use_tf:
        d_raw = lookup_density_trilinear(scene.density, pos, params.density_scale)
        rgba = tf_lookup(scene.tf, d_raw * params.inv_majorant)
        return params.majorant * rgba[..., 3], rgba, seed
    d, seed = lookup_density_stochastic(
        scene.density, pos, seed, active, params.density_scale
    )
    return d, None, seed


def _add_emission(scene, params, cfg, pos, weight, throughput, le, seed, active):
    """Le += throughput * (1 - albedo) * emission * weight (masked)."""
    if not cfg.has_emission:
        return le, seed
    e, seed = lookup_emission(
        scene.emission,
        scene.density.transform,
        pos,
        seed,
        active,
        params.emission_scale,
        params.emission_norm,
    )
    contrib = throughput * (1.0 - params.albedo) * e * weight[..., None]
    return le + jnp.where(active[..., None], contrib, 0.0), seed


# ----------------------------------------------------------------------------
# global-majorant null-collision estimators (common.glsl:333-394)
# ----------------------------------------------------------------------------


def transmittance(scene, params, cfg, org, direction, seed, active):
    """Ratio tracking with the global majorant. Returns (Tr, seed)."""
    hit_box, near, far = intersect_box(org, direction, params.bb_min, params.bb_max)
    ipos, idir = _to_index_space(scene.density, org, direction)
    run0 = active & hit_box

    seed, u = _rng.rng_masked(seed, run0)
    t0 = near - jnp.log(1.0 - u) * params.inv_majorant
    tr0 = jnp.ones_like(t0)

    def cond(c):
        return c[0].any() & (c[5] < cfg.max_steps)

    def body(c):
        running, t, tr, seed, _, i = c
        inside = t < far
        running = running & inside
        pos = ipos + t[..., None] * idir
        d, _rgba, seed = _density_at(scene, params, cfg, pos, seed, running)
        tr_new = tr * (1.0 - d * params.inv_majorant)
        tr = jnp.where(running, tr_new, tr)
        # russian roulette below 0.1: prob = 1 - Tr; survivors divide by
        # 1 - prob = Tr, i.e. continue with Tr = 1 (common.glsl:351-356)
        rr = running & (tr < 0.1)
        seed, u_rr = _rng.rng_masked(seed, rr)
        killed = rr & (u_rr < (1.0 - tr))
        tr = jnp.where(killed, 0.0, jnp.where(rr, 1.0, tr))
        running = running & ~killed
        seed, u_adv = _rng.rng_masked(seed, running)
        t = jnp.where(running, t - jnp.log(1.0 - u_adv) * params.inv_majorant, t)
        return running, t, tr, seed, killed, i + 1

    init = (run0, t0, tr0, seed, jnp.zeros_like(run0), jnp.int32(0))
    _, _, tr, seed, _, _ = lax.while_loop(cond, body, init)
    return jnp.where(active, tr, 1.0), seed


def sample_volume(scene, params, cfg, org, direction, throughput, le, seed, active):
    """Delta tracking with the global majorant. Returns
    (hit, t, throughput, le, seed)."""
    hit_box, near, far = intersect_box(org, direction, params.bb_min, params.bb_max)
    ipos, idir = _to_index_space(scene.density, org, direction)
    run0 = active & hit_box

    seed, u = _rng.rng_masked(seed, run0)
    t0 = near - jnp.log(1.0 - u) * params.inv_majorant

    def cond(c):
        return c[0].any() & (c[-1] < cfg.max_steps)

    def body(c):
        running, t, throughput, le, hit, seed, i = c
        inside = t < far
        running = running & inside
        pos = ipos + t[..., None] * idir
        d, rgba, seed = _density_at(scene, params, cfg, pos, seed, running)
        p_real = d * params.inv_majorant
        le, seed = _add_emission(
            scene, params, cfg, pos, p_real, throughput, le, seed, running
        )
        seed, u_cls = _rng.rng_masked(seed, running)
        hit_now = running & (u_cls < p_real)
        mult = params.albedo * (rgba[..., :3] if cfg.use_tf else 1.0)
        throughput = jnp.where(hit_now[..., None], throughput * mult, throughput)
        hit = hit | hit_now
        running = running & ~hit_now
        seed, u_adv = _rng.rng_masked(seed, running)
        t = jnp.where(running, t - jnp.log(1.0 - u_adv) * params.inv_majorant, t)
        return running, t, throughput, le, hit, seed, i + 1

    init = (
        run0,
        t0,
        throughput,
        le,
        jnp.zeros_like(run0),
        seed,
        jnp.int32(0),
    )
    _, t, throughput, le, hit, seed, _ = lax.while_loop(cond, body, init)
    return hit, t, throughput, le, seed


# ----------------------------------------------------------------------------
# DDA-based estimators over the min/max brick mip pyramid (common.glsl:399-501)
# ----------------------------------------------------------------------------


def step_dda(pos, inv_dir, mip):
    """Distance to the next (8 << mip)-aligned cell boundary
    (common.glsl:404-409). mip: (N,) int32."""
    dim = (8 << mip).astype(jnp.float32)[..., None]
    offs = jnp.where(inv_dir >= 0.0, dim + 0.5, -0.5)
    tmax = (jnp.floor(pos / dim) * dim + offs - pos) * inv_dir
    return tmax.min(axis=-1)


def _local_majorant(scene, params, cfg, pos, mip_round):
    maj = lookup_majorant(scene.density, pos, mip_round, params.density_scale)
    if cfg.use_tf:
        return params.majorant * tf_lookup(scene.tf, maj * params.inv_majorant)[..., 3]
    return maj


def _dda_loop(scene, params, cfg, org, direction, seed, active, collide_fn, extra_init):
    """Shared DDA march. ``collide_fn`` consumes a sampled collision point
    and updates the estimator-specific state."""
    hit_box, near, far = intersect_box(org, direction, params.bb_min, params.bb_max)
    ipos, idir = _to_index_space(scene.density, org, direction)
    ri = 1.0 / idir
    run0 = active & hit_box

    seed, u0 = _rng.rng_masked(seed, run0)
    t0 = near + 1e-6
    tau0 = -jnp.log(1.0 - u0)
    mip0 = jnp.full_like(t0, MIP_START)

    def cond(c):
        return c[0].any() & (c[-1] < cfg.max_steps)

    def body(c):
        running, t, tau, mip, seed, extra, i = c
        curr = ipos + t[..., None] * idir
        mip_round = jnp.round(mip).astype(jnp.int32)
        maj = _local_majorant(scene, params, cfg, curr, mip_round)
        dt = step_dda(curr, ri, mip_round)
        t_adv = t + dt
        tau_adv = tau - maj * dt
        mip_up = jnp.minimum(mip + MIP_SPEED_UP, 3.0)

        collide = running & (tau_adv <= 0.0)
        t_col = t_adv + tau_adv / jnp.maximum(maj, 1e-20)
        t = jnp.where(collide, t_col, jnp.where(running, t_adv, t))
        exited = collide & (t >= far)
        do_test = collide & ~exited

        pos = ipos + t[..., None] * idir
        d, rgba, seed = _density_at(scene, params, cfg, pos, seed, do_test)
        seed, u_cls = _rng.rng_masked(seed, do_test)
        real = do_test & (u_cls * maj < d)

        extra, seed, terminate = collide_fn(
            extra, seed, pos, d, rgba, maj, real, do_test
        )

        # no-hit collisions: redraw tau, drop mips
        redraw = do_test & ~terminate
        seed, u_tau = _rng.rng_masked(seed, redraw)
        tau = jnp.where(redraw, -jnp.log(1.0 - u_tau), jnp.where(running, tau_adv, tau))
        mip = jnp.where(
            redraw,
            jnp.maximum(0.0, mip_up - MIP_SPEED_DOWN),
            jnp.where(running, mip_up, mip),
        )
        running = running & ~exited & ~terminate & (t < far)
        return running, t, tau, mip, seed, extra, i + 1

    init = (run0, t0, tau0, mip0, seed, extra_init, jnp.int32(0))
    _, t, _, _, seed, extra, _ = lax.while_loop(cond, body, init)
    return t, seed, extra, run0


def transmittance_dda(scene, params, cfg, org, direction, seed, active):
    """DDA transmittance (common.glsl:412-455). Returns (Tr, seed)."""
    n = org.shape[0]
    tr0 = jnp.ones((n,), jnp.float32)

    def collide(tr, seed, pos, d, rgba, maj, real, do_test):
        # ratio of global to local majorant — <= 0 in practice, i.e. a real
        # collision zeroes Tr (see module docstring)
        tr_new = tr * jnp.maximum(0.0, 1.0 - params.majorant / jnp.maximum(maj, 1e-20))
        tr = jnp.where(real, tr_new, tr)
        rr = real & (tr < 0.1)
        seed, u_rr = _rng.rng_masked(seed, rr)
        killed = rr & (u_rr < 1.0 - tr)
        # survivors: tr /= (1 - prob) = tr / tr = 1
        tr = jnp.where(killed, 0.0, jnp.where(rr, 1.0, tr))
        return tr, seed, killed

    _, seed, tr, _run0 = _dda_loop(
        scene, params, cfg, org, direction, seed, active, collide, tr0
    )
    return jnp.where(active, tr, 1.0), seed


def sample_volume_dda(scene, params, cfg, org, direction, throughput, le, seed, active):
    """DDA volume sampling (common.glsl:458-501). Returns
    (hit, t, throughput, le, seed)."""
    n = org.shape[0]
    hit0 = jnp.zeros((n,), bool)

    def collide(extra, seed, pos, d, rgba, maj, real, do_test):
        throughput, le, hit = extra
        le, seed = _add_emission(
            scene,
            params,
            cfg,
            pos,
            d * params.inv_majorant,
            throughput,
            le,
            seed,
            do_test,
        )
        mult = params.albedo * (rgba[..., :3] if cfg.use_tf else 1.0)
        throughput = jnp.where(real[..., None], throughput * mult, throughput)
        hit = hit | real
        return (throughput, le, hit), seed, real

    t, seed, (throughput, le, hit), _run0 = _dda_loop(
        scene, params, cfg, org, direction, seed, active, collide, (throughput, le, hit0)
    )
    return hit, t, throughput, le, seed
