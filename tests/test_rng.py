import numpy as np
import jax.numpy as jnp

from volren_tpu.ops import rng as R

M32 = 0xFFFFFFFF


def tea_py(v0, v1, n=32):
    """Pure-python reference of the GLSL TEA (common.glsl:40-50)."""
    v0 &= M32
    v1 &= M32
    s0 = 0
    for _ in range(n):
        s0 = (s0 + 0x9E3779B9) & M32
        v0 = (v0 + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32) ^ ((v1 >> 5) + 0xC8013EA4))) & M32
        v1 = (v1 + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32) ^ ((v0 >> 5) + 0x7E95761E))) & M32
    return v0


def lcg_py(state):
    state = (state * 1664525 + 1013904223) & M32
    return state, (state & 0x00FFFFFF) / float(0x01000000)


def test_tea_matches_reference_implementation():
    for v0, v1 in [(0, 0), (1, 1), (42 * 12345, 7), (0xDEADBEEF, 0xCAFEBABE)]:
        got = int(R.tea(jnp.uint32(v0), jnp.uint32(v1), 32))
        assert got == tea_py(v0, v1), (v0, v1)


def test_lcg_stream_matches():
    s_py = tea_py(123, 4)
    s = jnp.uint32(s_py)
    for _ in range(10):
        s, u = R.rng(s)
        s_py, u_py = lcg_py(s_py)
        assert int(s) == s_py
        assert abs(float(u) - u_py) < 1e-7


def test_uniform_range_and_mean():
    s = R.tea(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(9), 32)
    s, u = R.rng(s)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.02


def test_masked_draws_freeze_inactive_lanes():
    s0 = R.tea(jnp.arange(8, dtype=jnp.uint32), jnp.uint32(1), 32)
    active = jnp.array([True, False] * 4)
    s1, _ = R.rng_masked(s0, active)
    s1 = np.asarray(s1)
    s0 = np.asarray(s0)
    assert (s1[1::2] == s0[1::2]).all()
    assert (s1[0::2] != s0[0::2]).all()
