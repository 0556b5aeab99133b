"""Counter-based stateless RNG: TEA-32 seeding + LCG stream.

Port of the reference RNG (/root/reference/shader/common.glsl:40-67): a
per-(pixel, sample) seed from the Tiny Encryption Algorithm, then a
linear congruential stream. Fully vectorized over lanes in uint32 — this is
the same stateless counter-based design, which maps perfectly onto TPU
vector lanes (no RNG state tables, identical sequences per lane for A/B
tests between estimators).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_U32 = jnp.uint32


def tea(val0, val1, n_rounds: int = 32):
    """TEA hash of two uint32 lanes (common.glsl:40-50)."""
    v0 = jnp.asarray(val0, _U32)
    v1 = jnp.asarray(val1, _U32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s0 = jnp.zeros_like(v0)

    def body(_, carry):
        v0, v1, s0 = carry
        s0 = s0 + _U32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + _U32(0xA341316C)) ^ (v1 + s0) ^ ((v1 >> 5) + _U32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + _U32(0xAD90777D)) ^ (v0 + s0) ^ ((v0 >> 5) + _U32(0x7E95761E))
        )
        return v0, v1, s0

    v0, v1, s0 = lax.fori_loop(0, n_rounds, body, (v0, v1, s0))
    return v0


def rng(state):
    """Advance the LCG and return (new_state, uniform in [0, 1))."""
    state = state * _U32(1664525) + _U32(1013904223)
    u = (state & _U32(0x00FFFFFF)).astype(jnp.float32) * (1.0 / float(0x01000000))
    return state, u


def rng_masked(state, active):
    """Advance only active lanes (keeps per-lane draw sequences identical to
    the reference's divergent control flow)."""
    new_state, u = rng(state)
    return jnp.where(active, new_state, state), u


def rng2_masked(state, active):
    state, a = rng_masked(state, active)
    state, b = rng_masked(state, active)
    return state, jnp.stack([a, b], axis=-1)


def rng2(state):
    state, a = rng(state)
    state, b = rng(state)
    return state, jnp.stack([a, b], axis=-1)


def rng3(state):
    state, a = rng(state)
    state, b = rng(state)
    state, c = rng(state)
    return state, jnp.stack([a, b, c], axis=-1)
