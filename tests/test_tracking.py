import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volren_tpu.ops import rng as R
from volren_tpu.ops import scene as dscene
from volren_tpu.ops import tracking as T
from volren_tpu.ops.scene import SceneDevice, TraceConfig, TraceParams
from volren_tpu.voldata import build_brick_grid


def make_scene(dense, density_scale=1.0, transform=None):
    bg = build_brick_grid(np.asarray(dense, np.float32), transform)
    gd = dscene.upload_grid(bg, np.eye(4, dtype=np.float32))
    scene = SceneDevice(density=gd, emission=None, env=None, tf=None)
    lo = np.zeros(3, np.float32)
    hi = np.asarray(bg.voxel_extent, np.float32)
    maj = max(bg.minorant_majorant()[1] * density_scale, 1e-20)
    params = TraceParams(
        cam_pos=jnp.zeros(3),
        cam_transform=jnp.eye(3),
        cam_fov=jnp.float32(40.0),
        bb_min=jnp.asarray(lo),
        bb_max=jnp.asarray(hi),
        majorant=jnp.float32(maj),
        inv_majorant=jnp.float32(1.0 / maj),
        albedo=jnp.full(3, 0.8),
        phase_g=jnp.float32(0.0),
        density_scale=jnp.float32(density_scale),
        emission_scale=jnp.float32(0.0),
        emission_norm=jnp.float32(1.0),
        bounces=jnp.int32(100),
        show_environment=jnp.int32(1),
        seed=jnp.uint32(42),
    )
    return scene, params


def seeds(n, stream=0):
    return R.tea(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(stream + 1), 32)


CFG = TraceConfig(use_dda=False, use_tf=False, has_emission=False, max_steps=4096)
CFG_DDA = TraceConfig(use_dda=True, use_tf=False, has_emission=False, max_steps=4096)


def test_constant_density_transmittance_closed_form():
    """Tr through constant density sigma over length L is exp(-sigma*L)."""
    sigma = 0.35
    dense = np.full((16, 16, 16), sigma, np.float32)
    # perturb one voxel so the grid isn't "constant brick only" everywhere
    dense[0, 0, 0] = sigma * 1.0001
    scene, params = make_scene(dense)
    n = 40_000
    org = jnp.tile(jnp.array([[-5.0, 8.0, 8.0]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    active = jnp.ones(n, bool)
    expect = np.exp(-sigma * 16.0)
    for cfg, fn in ((CFG, T.transmittance), (CFG_DDA, T.transmittance_dda)):
        f = jax.jit(functools.partial(fn, cfg=cfg))
        tr, _ = f(scene, params, org=org, direction=d, seed=seeds(n), active=active)
        got = float(np.asarray(tr).mean())
        assert abs(got - expect) < 0.01, (fn.__name__, got, expect)


def test_transmittance_outside_box_is_one():
    scene, params = make_scene(np.ones((8, 8, 8), np.float32))
    org = jnp.array([[20.0, 20.0, 20.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    tr, _ = jax.jit(functools.partial(T.transmittance, cfg=CFG))(
        scene, params, org=org, direction=d, seed=seeds(1), active=jnp.ones(1, bool)
    )
    assert float(tr[0]) == 1.0


def test_sample_volume_free_flight_distribution():
    """In constant density, P(no collision) = exp(-sigma*L) and collision
    t's follow a truncated exponential."""
    sigma = 0.25
    dense = np.full((16, 16, 16), sigma, np.float32)
    dense[0, 0, 0] = sigma * 1.0001
    scene, params = make_scene(dense)
    n = 40_000
    org = jnp.tile(jnp.array([[-3.0, 8.0, 8.0]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    thr = jnp.ones((n, 3))
    le = jnp.zeros((n, 3))
    for cfg, fn in ((CFG, T.sample_volume), (CFG_DDA, T.sample_volume_dda)):
        f = jax.jit(functools.partial(fn, cfg=cfg))
        hit, t, thr_out, _, _ = f(
            scene, params, org=org, direction=d, throughput=thr, le=le,
            seed=seeds(n, 3), active=jnp.ones(n, bool),
        )
        hit = np.asarray(hit)
        p_escape = 1.0 - hit.mean()
        assert abs(p_escape - np.exp(-sigma * 16)) < 0.01, fn.__name__
        # mean collision t (from box entry at t=3): E[t] for truncated exp
        tt = np.asarray(t)[hit] - 3.0
        L = 16.0
        a = sigma
        expect_mean = (1 / a) - L * np.exp(-a * L) / (1 - np.exp(-a * L))
        assert abs(tt.mean() - expect_mean) < 0.05, fn.__name__
        # throughput multiplied by albedo exactly once on hit
        np.testing.assert_allclose(np.asarray(thr_out)[hit][:, 0], 0.8, rtol=1e-6)


def test_dda_and_delta_tracking_agree_on_heterogeneous_grid(random_grid16):
    scene, params = make_scene(random_grid16, density_scale=0.5)
    n = 30_000
    rng = np.random.default_rng(3)
    org = jnp.asarray((rng.random((n, 3)) * 30 - 7).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    active = jnp.ones(n, bool)
    tr_a, _ = jax.jit(functools.partial(T.transmittance, cfg=CFG))(
        scene, params, org=org, direction=d, seed=seeds(n, 5), active=active
    )
    tr_b, _ = jax.jit(functools.partial(T.transmittance_dda, cfg=CFG_DDA))(
        scene, params, org=org, direction=d, seed=seeds(n, 6), active=active
    )
    ma, mb = float(np.asarray(tr_a).mean()), float(np.asarray(tr_b).mean())
    # both unbiased estimators of the same integral
    assert abs(ma - mb) < 0.01, (ma, mb)


def test_tracking_respects_clip_box(random_grid16):
    """Shrinking bb_min/bb_max must increase transmittance."""
    scene, params = make_scene(random_grid16, density_scale=0.15)
    n = 20_000
    org = jnp.tile(jnp.array([[-3.0, 8.0, 8.0]]), (n, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    f = jax.jit(functools.partial(T.transmittance, cfg=CFG))
    tr_full, _ = f(scene, params, org=org, direction=d, seed=seeds(n, 7), active=jnp.ones(n, bool))
    params2 = params._replace(bb_min=jnp.asarray(np.array([12.0, 0, 0], np.float32)))
    tr_clip, _ = f(scene, params2, org=org, direction=d, seed=seeds(n, 8), active=jnp.ones(n, bool))
    assert float(np.asarray(tr_clip).mean()) > float(np.asarray(tr_full).mean())


def test_tf_dda_vs_delta_tracking_agree(random_grid16):
    """SURVEY hard part #4: with a CDF-rewritten (monotone-alpha) LUT the
    local TF majorant tf(maj).a * vol_majorant bounds tf(d).a * vol_majorant
    for every d <= maj, so DDA-TF tracking stays unbiased and must agree
    with global-majorant TF tracking."""
    from volren_tpu.ops import scene as dscene
    from volren_tpu.scene.transferfunc import TransferFunction

    scene, params = make_scene(random_grid16, density_scale=1.0)
    tf = TransferFunction("/root/reference/data/lut.txt")  # non-monotone -> CDF
    scene = scene._replace(tf=dscene.upload_transferfunc(tf))
    dev_alpha = np.asarray(scene.tf.lut)[:, 3]
    assert (np.diff(dev_alpha) >= -1e-7).all()

    cfg_tf = TraceConfig(use_dda=False, use_tf=True, has_emission=False, max_steps=4096)
    cfg_tf_dda = TraceConfig(use_dda=True, use_tf=True, has_emission=False, max_steps=4096)
    n = 30_000
    rng = np.random.default_rng(9)
    org = jnp.asarray((rng.random((n, 3)) * 30 - 7).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    active = jnp.ones(n, bool)
    tr_a, _ = jax.jit(functools.partial(T.transmittance, cfg=cfg_tf))(
        scene, params, org=org, direction=d, seed=seeds(n, 11), active=active
    )
    tr_b, _ = jax.jit(functools.partial(T.transmittance_dda, cfg=cfg_tf_dda))(
        scene, params, org=org, direction=d, seed=seeds(n, 12), active=active
    )
    ma, mb = float(np.asarray(tr_a).mean()), float(np.asarray(tr_b).mean())
    assert abs(ma - mb) < 0.01, (ma, mb)


def test_rotated_volume_estimators_agree(random_grid16):
    """Non-axis-aligned grid transform: world->index mapping and DDA still
    agree with global-majorant tracking."""
    c, s = np.cos(np.radians(30)), np.sin(np.radians(30))
    rot = np.array(
        [[c, -s, 0, 2.0], [s, c, 0, -1.0], [0, 0, 1.5, 0.5], [0, 0, 0, 1.0]],
        np.float32,
    )
    scene, params = make_scene(random_grid16, density_scale=0.4, transform=rot)
    # world AABB of the rotated grid
    from volren_tpu.voldata import build_brick_grid

    bg = build_brick_grid(random_grid16, rot)
    lo, hi = bg.world_aabb()
    params = params._replace(bb_min=jnp.asarray(lo), bb_max=jnp.asarray(hi))
    n = 30_000
    rng = np.random.default_rng(5)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) * 0.7
    org = jnp.asarray((center + rng.normal(size=(n, 3)) * radius).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    active = jnp.ones(n, bool)
    tr_a, _ = jax.jit(functools.partial(T.transmittance, cfg=CFG))(
        scene, params, org=org, direction=d, seed=seeds(n, 21), active=active
    )
    tr_b, _ = jax.jit(functools.partial(T.transmittance_dda, cfg=CFG_DDA))(
        scene, params, org=org, direction=d, seed=seeds(n, 22), active=active
    )
    ma, mb = float(np.asarray(tr_a).mean()), float(np.asarray(tr_b).mean())
    assert abs(ma - mb) < 0.01, (ma, mb)
    assert 0.05 < ma < 0.999


def test_trilinear_quad_rows_bit_identical(random_grid16):
    """The dense_quad 2-gather trilinear path must match the 8-tap brick
    path BIT-FOR-BIT, including clamped taps outside the padded extent
    (the TF classification path relies on this, common.glsl:289-297)."""
    from volren_tpu.ops.grid import lookup_density_trilinear

    scene, params = make_scene(random_grid16, density_scale=1.3)
    gd = scene.density
    assert gd.dense_quad is not None
    gd_plain = gd._replace(dense_quad=None)
    rng = np.random.default_rng(3)
    # positions spanning inside, boundary, and far outside (negative too)
    pos = np.concatenate(
        [
            rng.uniform(-3.0, 19.0, size=(20000, 3)),
            rng.uniform(-0.51, 0.51, size=(2000, 3)),  # all-negative floors
            rng.uniform(14.5, 18.0, size=(2000, 3)),  # high-clamp region
        ]
    ).astype(np.float32)
    pos = jnp.asarray(pos)
    a = jax.jit(lookup_density_trilinear)(gd, pos, params.density_scale)
    b = jax.jit(lookup_density_trilinear)(gd_plain, pos, params.density_scale)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
