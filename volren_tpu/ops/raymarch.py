"""Ray-marching estimators + direct volume rendering.

Ports of /root/reference/shader/common.glsl:506-591: fixed-step (64)
jittered ray marching alternatives to the null-collision estimators, and
the emission-absorption ``direct_volume_rendering`` used for classic
TF-colored DVR. Batched over lanes like ops/tracking.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from . import rng as _rng
from .envmap import lookup_environment
from .geometry import intersect_box, transform_point, transform_vector
from .grid import lookup_density_stochastic, lookup_density_trilinear
from .transfer import tf_lookup

RAYMARCH_STEPS = 64  # common.glsl:506


def transmittance_raymarch(scene, params, cfg, org, direction, seed, active):
    """exp(-sum tau) over 64 jittered steps (common.glsl:508-527)."""
    hit_box, near, far = intersect_box(org, direction, params.bb_min, params.bb_max)
    ipos = transform_point(scene.density.inv_transform, org)
    idir = transform_vector(scene.density.inv_transform, direction)
    run = active & hit_box
    dt = (far - near) / RAYMARCH_STEPS
    seed, u0 = _rng.rng_masked(seed, run)
    t0 = near + u0 * dt

    def body(i, carry):
        tau, seed = carry
        t = jnp.minimum(t0 + i * dt, far)
        pos = ipos + t[..., None] * idir
        if cfg.use_tf:
            d, seed = lookup_density_stochastic(
                scene.density, pos, seed, run, params.density_scale
            )
            a = tf_lookup(scene.tf, d * params.inv_majorant)[..., 3]
            tau = tau + jnp.where(run, a * params.majorant * dt, 0.0)
        else:
            d, seed = lookup_density_stochastic(
                scene.density, pos, seed, run, params.density_scale
            )
            tau = tau + jnp.where(run, d * dt, 0.0)
        return tau, seed

    tau, seed = lax.fori_loop(0, RAYMARCH_STEPS, body, (jnp.zeros_like(t0), seed))
    return jnp.where(run, jnp.exp(-tau), 1.0), seed


def direct_volume_rendering(scene, params, cfg, org, direction, seed, active):
    """Emission-absorption DVR through the transfer function
    (common.glsl:571-591). Returns ((N, 3) radiance, seed)."""
    hit_box, near, far = intersect_box(org, direction, params.bb_min, params.bb_max)
    ipos = transform_point(scene.density.inv_transform, org)
    idir = transform_vector(scene.density.inv_transform, direction)
    run = active & hit_box
    dt = (far - near) / RAYMARCH_STEPS
    seed, u0 = _rng.rng_masked(seed, run)
    t0 = near + u0 * dt

    def body(i, carry):
        radiance, tr = carry
        t = jnp.minimum(t0 + i * dt, far)
        pos = ipos + t[..., None] * idir
        d = lookup_density_trilinear(scene.density, pos, params.density_scale)
        rgba = tf_lookup(scene.tf, d * params.inv_majorant)
        dtau = rgba[..., 3] * params.majorant * dt
        add = rgba[..., :3] * (dtau * tr)[..., None]
        radiance = radiance + jnp.where(run[..., None], add, 0.0)
        tr = jnp.where(run, tr * jnp.exp(-dtau), tr)
        return radiance, tr

    zero3 = jnp.zeros(org.shape, jnp.float32)
    radiance, tr = lax.fori_loop(
        0, RAYMARCH_STEPS, body, (zero3, jnp.ones(org.shape[:-1], jnp.float32))
    )
    # GLSL returns env directly on a miss and L + env * Tr otherwise; a miss
    # has radiance 0 and tr 1, so one expression covers both
    if scene.env is not None:
        env = lookup_environment(scene.env, direction)
        radiance = radiance + jnp.where(active[..., None], env * tr[..., None], 0.0)
    return radiance, seed
