import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volren_tpu.ops import envmap as E
from volren_tpu.ops import phase as P
from volren_tpu.ops import rng as R
from volren_tpu.ops import scene as dscene
from volren_tpu.ops.geometry import INV_4PI


def _u2(n, stream=0):
    s = R.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(stream + 1), 32)
    _, u = R.rng2(s)
    return u


# ---------------- phase ----------------


@pytest.mark.parametrize("g", [0.0, 0.3, -0.7, 0.9])
def test_hg_pdf_integrates_to_one(g):
    # integrate over sphere: 2*pi * int_-1^1 p(cos) dcos
    cos_t = np.linspace(-1, 1, 20001)
    pdf = np.asarray(P.phase_henyey_greenstein(jnp.asarray(cos_t), g))
    integral = 2 * np.pi * np.trapezoid(pdf, cos_t)
    assert abs(integral - 1.0) < 1e-3


@pytest.mark.parametrize("g", [0.0, 0.5, -0.5])
def test_hg_sampling_mean_cosine(g):
    """E[cos theta] of HG equals g."""
    n = 200_000
    u2 = _u2(n, stream=int(g * 10) + 5)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    w = np.asarray(P.sample_phase_henyey_greenstein(d, g, u2))
    assert np.abs(np.linalg.norm(w, axis=1) - 1).max() < 1e-4
    mean_cos = (w[:, 2]).mean()
    assert abs(mean_cos - g) < 0.01


def test_isotropic_sampling_uniform():
    n = 100_000
    w = np.asarray(P.sample_phase_isotropic(_u2(n)))
    assert abs(w.mean(axis=0)).max() < 0.02


# ---------------- environment ----------------


def test_white_env_uniform_pdf():
    from volren_tpu.scene.environment import Environment

    env = dscene.upload_environment(Environment.white())
    n = 4096
    le, pdf, w_i = jax.jit(E.sample_environment)(env, _u2(n))
    np.testing.assert_allclose(np.asarray(pdf), INV_4PI, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(le), 1.0, rtol=1e-5)
    assert np.abs(np.asarray(w_i).mean(axis=0)).max() < 0.05


def test_importance_sampling_consistency(table_mountain_env):
    """E[luma(Le)/pdf]/4pi must equal the average importance texel."""
    env = dscene.upload_environment(table_mountain_env)
    n = 65536
    le, pdf, _ = jax.jit(E.sample_environment)(env, _u2(n, 3))
    est = (np.asarray(E.luma(le)) / np.asarray(pdf)).mean() / (4 * np.pi)
    avg = float(np.asarray(env.imp_mips[-1]).reshape(()))
    assert abs(est - avg) / avg < 0.01


def test_alias_matches_warp_distribution(table_mountain_env):
    """Alias sampling and the hierarchical warp draw the same texel
    distribution (chi-square on a coarse binning)."""
    env = dscene.upload_environment(table_mountain_env)
    n = 131072
    _, pdf_w, w_w = jax.jit(E.sample_environment)(env, _u2(n, 11))
    _, _, pdf_a, w_a, _le = jax.jit(E.sample_environment_alias)(env, _u2(n, 12))
    # compare direction histograms over latitude bands
    for w, name in ((w_w, "warp"), (w_a, "alias")):
        pass
    y_w = np.asarray(w_w)[:, 1]
    y_a = np.asarray(w_a)[:, 1]
    hw, edges = np.histogram(y_w, bins=16, range=(-1, 1))
    ha, _ = np.histogram(y_a, bins=16, range=(-1, 1))
    # normalized frequencies agree within a few sigma
    fw, fa = hw / n, ha / n
    sigma = np.sqrt(np.maximum(fw, 1e-6) / n)
    assert (np.abs(fw - fa) < 6 * sigma + 1e-4).all()


def test_alias_pdf_consistency(table_mountain_env):
    """pdf returned by alias sampling equals the warp's pdf formula at the
    sampled texel."""
    env = dscene.upload_environment(table_mountain_env)
    n = 8192
    uv_x, uv_y, pdf, _, _le = jax.jit(E.sample_environment_alias)(env, _u2(n, 21))
    base = np.asarray(env.imp_mips[0])
    dim = base.shape[0]
    px = np.clip((np.asarray(uv_x) * dim).astype(int), 0, dim - 1)
    py = np.clip((np.asarray(uv_y) * dim).astype(int), 0, dim - 1)
    avg = float(np.asarray(env.imp_mips[-1]).reshape(()))
    expect = base[py, px] / avg * INV_4PI
    np.testing.assert_allclose(np.asarray(pdf), expect, rtol=1e-4)


def test_lookup_environment_poles(table_mountain_env):
    env = dscene.upload_environment(table_mountain_env)
    up = jnp.array([[0.0, 1.0, 0.0]])
    le = np.asarray(E.lookup_environment(env, up))
    # zenith row of the image (stored flipped: last v-order row)
    top_row = table_mountain_env.envmap[-1].mean(axis=0)
    assert np.allclose(le[0], top_row, rtol=0.2, atol=0.05)


@pytest.mark.parametrize("g", [0.0, 0.6, -0.4])
def test_hg_sampling_chi_square(g):
    """Chi-square of sampled cos(theta) against the HG pdf."""
    n = 200_000
    u2 = _u2(n, stream=int(g * 100) + 40)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    cos_t = np.asarray(P.sample_phase_henyey_greenstein(d, g, u2))[:, 2]
    bins = np.linspace(-1, 1, 41)
    hist, _ = np.histogram(cos_t, bins=bins)

    # numeric (robust) bin probabilities via fine quadrature. NOTE the
    # convention: phase_henyey_greenstein takes dot(-incoming, outgoing)
    # (common.glsl:618), i.e. -cos of the forward angle histogrammed here
    fine = np.linspace(-1, 1, 20001)
    pdf_fine = 2 * np.pi * np.asarray(P.phase_henyey_greenstein(jnp.asarray(-fine), g))
    cum = np.concatenate([[0], np.cumsum((pdf_fine[1:] + pdf_fine[:-1]) / 2 * np.diff(fine))])
    cum /= cum[-1]
    probs = np.diff(np.interp(bins, fine, cum))
    expect = probs * n
    chi2 = float(((hist - expect) ** 2 / np.maximum(expect, 1)).sum())
    # 40 bins -> dof ~39; mean 39, std ~8.8; allow 6 sigma
    assert chi2 < 39 + 6 * np.sqrt(2 * 39), chi2


def test_warp_texel_distribution_matches_importance(table_mountain_env):
    """The hierarchical warp must pick texels with probability w/(N*avg) —
    verified on a coarse binning of the importance map."""
    env = dscene.upload_environment(table_mountain_env)
    n = 262144
    uvx, uvy = [], []
    le, pdf, w = jax.jit(E.sample_environment)(env, _u2(n, 77))
    # recover uv from direction: v = 1 - acos(y)/pi, u = atan2(z,x)/2pi + .5
    wd = np.asarray(w)
    u = np.arctan2(wd[:, 2], wd[:, 0]) / (2 * np.pi) + 0.5
    v = 1.0 - np.arccos(np.clip(wd[:, 1], -1, 1)) / np.pi
    base = np.asarray(env.imp_mips[0])
    coarse = base.reshape(16, 32, 16, 32).mean(axis=(1, 3))  # 16x16 bins
    p_expect = coarse / coarse.sum()
    hist, _, _ = np.histogram2d(v, u, bins=16, range=[[0, 1], [0, 1]])
    p_got = hist / n
    # generous tolerance: absolute per-bin deviation
    assert np.abs(p_got - p_expect).max() < 0.01, np.abs(p_got - p_expect).max()
