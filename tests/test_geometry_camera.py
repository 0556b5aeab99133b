import numpy as np
import jax.numpy as jnp

from volren_tpu.ops import geometry as G
from volren_tpu.scene.camera import Camera


def test_intersect_box_basic():
    hit, near, far = G.intersect_box(
        jnp.array([[-2.0, 0.5, 0.5]]),
        jnp.array([[1.0, 0.0, 0.0]]),
        jnp.zeros(3),
        jnp.ones(3),
    )
    assert bool(hit[0])
    assert abs(float(near[0]) - 2.0) < 1e-6
    assert abs(float(far[0]) - 3.0) < 1e-6


def test_intersect_box_inside_origin_clamps_near():
    hit, near, far = G.intersect_box(
        jnp.array([[0.5, 0.5, 0.5]]),
        jnp.array([[0.0, 1.0, 0.0]]),
        jnp.zeros(3),
        jnp.ones(3),
    )
    assert bool(hit[0]) and float(near[0]) == 0.0 and abs(float(far[0]) - 0.5) < 1e-6


def test_intersect_box_miss_and_behind():
    hit, _, _ = G.intersect_box(
        jnp.array([[2.0, 2.0, 2.0], [5.0, 0.5, 0.5]]),
        jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
        jnp.zeros(3),
        jnp.ones(3),
    )
    assert not bool(hit[0])  # parallel miss
    assert not bool(hit[1])  # box behind the ray


def test_align_preserves_angle():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    v = rng.normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    out = np.asarray(G.align(jnp.asarray(n, jnp.float32), jnp.asarray(v, jnp.float32)))
    # align maps local +z to n: cos(angle to n) == v.z
    np.testing.assert_allclose((out * n).sum(1), v[:, 2], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_view_dir_center_is_camera_forward():
    cam = Camera(pos=np.zeros(3), dir=np.array([0.0, 0.0, -1.0]), fov_degree=45)
    wh = jnp.array([64, 64])
    d = np.asarray(
        G.view_dir(
            jnp.array([[32, 32]]), wh, jnp.array([[0.0, 0.0]]),
            jnp.asarray(cam.transform), jnp.float32(45.0),
        )
    )
    np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)


def test_view_dir_fov_edges():
    """Vertical edge rays span exactly the fov (y measured against h)."""
    fov = 60.0
    cam = Camera(pos=np.zeros(3), dir=np.array([0.0, 0.0, -1.0]), fov_degree=fov)
    wh = jnp.array([64, 64])
    top = np.asarray(
        G.view_dir(
            jnp.array([[32, 64]]), wh, jnp.array([[0.0, 0.0]]),
            jnp.asarray(cam.transform), jnp.float32(fov),
        )
    )[0]
    angle = np.degrees(np.arctan2(top[1], -top[2]))
    np.testing.assert_allclose(angle, fov / 2, atol=0.01)


def test_camera_view_world_roundtrip():
    cam = Camera(pos=np.array([1.0, 2.0, 3.0]), dir=np.array([0.3, -0.2, -0.9]))
    view = cam.view
    # transform = inverse(rotation of view): forward in camera space (-z)
    # maps to cam.dir in world space
    fwd = cam.transform @ np.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(fwd, cam.dir, atol=1e-6)
    # view maps cam.pos to origin
    p = view @ np.array([*cam.pos, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)


def test_colmap_quaternion_matches_rotation():
    cam = Camera(pos=np.array([0.5, -1.0, 2.0]), dir=np.array([-0.4, 0.1, -0.9]))
    q = cam.colmap_view_rot()
    w, x, y, z = (float(v) for v in q)
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    expect = (Camera._GL_TO_COLMAP @ cam.view.astype(np.float64))[:3, :3]
    np.testing.assert_allclose(R, expect, atol=1e-5)


def test_sanitize_and_luma():
    x = jnp.array([[np.inf, -np.inf, np.nan]])
    np.testing.assert_array_equal(np.asarray(G.sanitize(x)), 0.0)
    assert abs(float(G.luma(jnp.array([1.0, 1.0, 1.0]))) - 1.0) < 1e-6
