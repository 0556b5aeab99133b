"""Hable (Uncharted 2) filmic tonemap (port of
/root/reference/shader/tonemap.glsl:13-36)."""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import sanitize

_A, _B, _C, _D, _E, _F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
_W = 11.2


def _hable(x):
    return ((x * (_A * x + _C * _B) + _D * _E) / (x * (_A * x + _B) + _D * _F)) - _E / _F


def hable_tonemap(rgb, exposure):
    return _hable(exposure * rgb) / _hable(jnp.full_like(rgb, _W))


def tonemap(rgba, exposure, gamma):
    """In-place style tonemap of an (..., 4) framebuffer: filmic + gamma on
    rgb, alpha untouched (tonemap.glsl:29-36)."""
    rgb = jnp.power(jnp.maximum(hable_tonemap(rgba[..., :3], exposure), 0.0), 1.0 / gamma)
    return sanitize(jnp.concatenate([rgb, rgba[..., 3:]], axis=-1))
