import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_offline_render(tmp_path):
    out = str(tmp_path / "out.png")
    env = {**os.environ, "VOLREN_PLATFORM": "cpu"}
    r = subprocess.run(
        [
            sys.executable, "-m", "volren_tpu.cli",
            "/root/reference/data/smoke.brick",
            "--render", "-w", "20", "-h", "20", "--spp", "2", "--bounces", "4",
            "--albedo", "0.7", "--phase", "0.2", "--density", "2",
            "--cam_pos", "1", "0", "1", "--cam_fov", "50",
            "--exposure", "2", "--gamma", "2.0",
            "--output", out,
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-500:]
    produced = str(tmp_path / "out_000000.png")
    assert os.path.exists(produced)
    from PIL import Image

    im = np.asarray(Image.open(produced))
    assert im.shape == (20, 20, 4)


def test_cli_bad_volume_keeps_running(tmp_path):
    """Asset load failures must not abort (main.cpp try/catch semantics)."""
    bad = str(tmp_path / "junk.brick")
    with open(bad, "wb") as f:
        f.write(b"nonsense")
    out = str(tmp_path / "o.png")
    env = {**os.environ, "VOLREN_PLATFORM": "cpu"}
    r = subprocess.run(
        [
            sys.executable, "-m", "volren_tpu.cli", bad,
            "--render", "-w", "12", "-h", "12", "--spp", "1", "--bounces", "2",
            "--output", out,
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    # falls back to the debug box volume (main.cpp:464-474)
    assert r.returncode == 0, r.stderr[-500:]
    assert "Unable to load" in r.stderr
    assert os.path.exists(str(tmp_path / "o_000000.png"))


def test_volpy_shim_flow(tmp_path):
    import volren_tpu.volpy as volpy

    volpy._bound["renderer"] = None  # isolate from other tests
    r = volpy.Renderer()
    r.init(12, 12)
    r.volume = volpy.Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.commit()
    r.albedo = volpy.vec3(0.8, 0.7, 0.6)
    r.phase = 0.3
    r.bounces = 4
    bb_min, bb_max = r.volume.AABB("density")
    center = np.asarray(bb_min) + (np.asarray(bb_max) - np.asarray(bb_min)) * 0.5
    r.cam_pos = center + np.array([0, 0, 2.0], np.float32)
    r.cam_dir = (center - np.asarray(r.cam_pos)) / np.linalg.norm(center - np.asarray(r.cam_pos))
    r.cam_fov = 50
    r.render(2)
    data = r.fbo_data()
    assert data.shape == (12, 12, 3)
    assert np.isfinite(data).all()
    assert float(r.colmap_focal_length()) > 0
    q = r.colmap_view_rot()
    assert abs(q.w**2 + q.x**2 + q.y**2 + q.z**2 - 1) < 1e-5
    res = volpy.Renderer.resolution()
    assert (res.x, res.y) == (12, 12)


def test_volpy_glm_types():
    """glm shim parity (reference bindings.cpp:220-417): int-backed
    i/uvec types, quat with Hamilton product and rotation semantics."""
    import sys
    sys.path.insert(0, REPO)
    from volren_tpu import volpy

    iv = volpy.ivec3(1, 2, 3)
    assert iv.dtype == np.int32 and (iv.x, iv.y, iv.z) == (1, 2, 3)
    assert isinstance(iv.x, int)
    uv = volpy.uvec2(5)
    assert uv.dtype == np.uint32 and (uv.x, uv.y) == (5, 5)
    v = volpy.vec3(1.5, 0.0, 0.0)
    assert isinstance(v.x, float) and v.normalize().x == 1.0

    # identity and 90-degree z-rotation
    q = volpy.quat()
    assert (q.w, q.x, q.y, q.z) == (1.0, 0.0, 0.0, 0.0)
    s = np.sin(np.pi / 4)
    qz = volpy.quat(np.cos(np.pi / 4), 0.0, 0.0, s)
    r = qz * volpy.vec3(1, 0, 0)
    assert np.allclose(r, [0, 1, 0], atol=1e-6)
    # Hamilton product: two 90-degree rotations = one 180-degree rotation
    r2 = (qz * qz) * volpy.vec3(1, 0, 0)
    assert np.allclose(r2, [-1, 0, 0], atol=1e-6)
    # conjugate undoes the rotation; normalize is idempotent on unit quats
    back = qz.conjugate() * r
    assert np.allclose(back, [1, 0, 0], atol=1e-6)
    n = (qz * qz).normalize()
    assert abs(n.w**2 + n.x**2 + n.y**2 + n.z**2 - 1) < 1e-6
    # buffer/array interop (reference quats expose the buffer protocol)
    assert np.asarray(qz).shape == (4,)
