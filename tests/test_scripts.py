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
