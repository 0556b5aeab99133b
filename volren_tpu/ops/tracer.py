"""Volumetric path tracer: trace_path + progressive accumulation.

Port of /root/reference/shader/common.glsl:596-652 and the trace entry
kernels (pathtracer_brick(_tf).glsl): NEE with MIS against the
importance-sampled environment, HG phase scattering, Russian roulette, and
the progressive running mean into an rgba32f framebuffer.

TPU-first structure: all pixels are a flat lane axis; the bounce loop is a
masked lax.while_loop whose body runs the (also masked) tracking loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import rng as _rng
from .envmap import lookup_environment, pdf_environment, sample_environment
from .geometry import luma, power_heuristic, sanitize, view_dir
from .phase import phase_henyey_greenstein, sample_phase_henyey_greenstein
from .tracking import (
    sample_volume,
    sample_volume_dda,
    transmittance,
    transmittance_dda,
)


def trace_path(scene, params, cfg, org, direction, seed):
    """Trace one path per lane. Returns (L (N,3), alpha (N,), seed)."""
    n = org.shape[0]
    f32 = jnp.float32

    sample_fn = sample_volume_dda if cfg.use_dda else sample_volume
    trans_fn = transmittance_dda if cfg.use_dda else transmittance

    def cond(c):
        return c["active"].any()

    def body(c):
        active = c["active"]
        org, direction = c["org"], c["dir"]
        throughput, le = c["throughput"], c["L"]
        seed = c["seed"]

        hit, t, throughput, le, seed = sample_fn(
            scene, params, cfg, org, direction, throughput, le, seed, active
        )
        # lanes whose ray left the volume become free paths and stop bouncing
        free_now = active & ~hit
        active = active & hit
        org = jnp.where(active[..., None], org + t[..., None] * direction, org)

        # --- next-event estimation (common.glsl:614-626) ---
        seed, u2 = _rng.rng2_masked(seed, active)
        le_env, pdf_env, w_i = sample_environment(scene.env, u2)
        nee = active & (pdf_env > 0.0)
        f_p = phase_henyey_greenstein(
            jnp.sum(-direction * w_i, axis=-1), params.phase_g
        )
        mis_weight = jnp.where(
            params.show_environment > 0, power_heuristic(pdf_env, f_p), 1.0
        )
        tr, seed = trans_fn(scene, params, cfg, org, w_i, seed, nee)
        contrib = (
            throughput
            * (mis_weight * f_p * tr / jnp.maximum(pdf_env, 1e-20))[..., None]
            * le_env
        )
        le = le + jnp.where(nee[..., None], contrib, 0.0)

        # --- termination: bounce cap + russian roulette (common.glsl:629-636)
        n_paths = c["n_paths"] + active.astype(jnp.int32)
        capped = active & (n_paths >= params.bounces)
        active = active & ~capped
        rr_val = luma(throughput)
        rr = active & (rr_val < 0.1)
        seed, u_rr = _rng.rng_masked(seed, rr)
        killed = rr & (u_rr < 1.0 - rr_val)
        active = active & ~killed
        throughput = jnp.where(
            (rr & ~killed)[..., None],
            throughput / jnp.maximum(rr_val, 1e-20)[..., None],
            throughput,
        )

        # --- scatter (common.glsl:639-641) ---
        seed, u2s = _rng.rng2_masked(seed, active)
        scatter_dir = sample_phase_henyey_greenstein(direction, params.phase_g, u2s)
        f_p_scatter = phase_henyey_greenstein(
            jnp.sum(-direction * scatter_dir, axis=-1), params.phase_g
        )
        direction = jnp.where(active[..., None], scatter_dir, direction)
        last_f_p = jnp.where(active, f_p_scatter, c["last_f_p"])

        return {
            "active": active,
            "org": org,
            "dir": direction,
            "throughput": throughput,
            "L": le,
            "seed": seed,
            "n_paths": n_paths,
            "last_f_p": last_f_p,
            "free_path": c["free_path"] & ~(capped | killed),
        }

    state = {
        "active": jnp.ones((n,), bool),
        "org": org,
        "dir": direction,
        "throughput": jnp.ones((n, 3), f32),
        "L": jnp.zeros((n, 3), f32),
        "seed": seed,
        "n_paths": jnp.zeros((n,), jnp.int32),
        "last_f_p": jnp.zeros((n,), f32),
        "free_path": jnp.ones((n,), bool),
    }
    state = lax.while_loop(cond, body, state)

    # free path -> environment contribution (common.glsl:645-649)
    le, throughput = state["L"], state["throughput"]
    n_paths, direction = state["n_paths"], state["dir"]
    show = params.show_environment > 0
    free = state["free_path"] & show
    env_le = lookup_environment(scene.env, direction)
    mis = jnp.where(
        n_paths > 0,
        power_heuristic(state["last_f_p"], pdf_environment(scene.env, direction)),
        1.0,
    )
    le = le + jnp.where(free[..., None], throughput * mis[..., None] * env_le, 0.0)

    alpha = jnp.clip(n_paths.astype(f32), 0.0, 1.0)
    return le, alpha, state["seed"]


def trace_sample(scene, params, cfg, xy, wh, current_sample):
    """One progressive sample for a batch of pixels
    (pathtracer_brick.glsl:23-37). xy: (N, 2) int32; returns (N, 4) rgba."""
    pixel_idx = (xy[..., 1] * wh[0] + xy[..., 0]).astype(jnp.uint32)
    seed = _rng.tea(params.seed * pixel_idx, jnp.uint32(current_sample), 32)
    seed, u2 = _rng.rng2(seed)
    direction = view_dir(xy, wh, u2, params.cam_transform, params.cam_fov)
    org = jnp.broadcast_to(params.cam_pos, direction.shape)
    le, alpha, _ = trace_path(scene, params, cfg, org, direction, seed)
    return jnp.concatenate([le, alpha[..., None]], axis=-1)


@partial(jax.jit, static_argnames=("cfg", "width", "height"))
def trace_pass(scene, params, cfg, framebuffer, current_sample, width, height):
    """One full-frame progressive pass: framebuffer (H, W, 4) running mean
    update fb + (sanitize(L) - fb) / current_sample."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    wh = jnp.array([width, height], jnp.int32)
    rgba = trace_sample(scene, params, cfg, xy, wh, current_sample)
    rgba = sanitize(rgba).reshape(height, width, 4)
    w = 1.0 / current_sample.astype(jnp.float32)
    return framebuffer + (rgba - framebuffer) * w
