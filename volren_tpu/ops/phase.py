"""Phase functions (ports of /root/reference/shader/common.glsl:170-190)."""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import M_PI, INV_4PI, align


def phase_isotropic():
    return INV_4PI


def phase_henyey_greenstein(cos_t, g):
    denom = 1.0 + g * g + 2.0 * g * cos_t
    return INV_4PI * (1.0 - g * g) / (denom * jnp.sqrt(jnp.maximum(denom, 1e-12)))


def sample_phase_isotropic(u2):
    cos_t = 1.0 - 2.0 * u2[..., 0]
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * M_PI * u2[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def sample_phase_henyey_greenstein(direction, g, u2):
    """Sample a scattered direction around ``direction`` (common.glsl:184-190)."""
    g = jnp.asarray(g)
    sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    cos_t_aniso = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * jnp.where(jnp.abs(g) < 1e-4, 1.0, g))
    cos_t = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u2[..., 0], cos_t_aniso)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * M_PI * u2[..., 1]
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return align(direction, local)
