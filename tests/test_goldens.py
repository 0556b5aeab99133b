"""Golden regression renders: small fixed-seed frames of the real smoke
scene, compared against stored anchors. Catches unintended estimator
changes (the reference's quality control is golden images by eye,
README.md:70-77 — this is the automated version). Regenerate via
`python tests/test_goldens.py` after INTENTIONAL estimator changes."""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _render_smoke_frame(env, tf=False):
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.transferfunc import TransferFunction
    from volren_tpu.voldata import Volume

    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(env)
    if tf:
        r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
        r.show_environment = False
    r.bounces = 16
    r.seed = 42
    r.init(24, 24)
    r.commit()
    r.render(6)
    return np.asarray(r.framebuffer())


@pytest.mark.parametrize("name,tf", [("smoke_notf", False), ("smoke_tf", True)])
def test_golden(name, tf, table_mountain_env):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    fb = _render_smoke_frame(table_mountain_env, tf)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tests/test_goldens.py to create")
    ref = np.load(path)["fb"]
    # renders are deterministic; tolerance covers cross-backend fp diffs
    np.testing.assert_allclose(fb, ref, rtol=2e-3, atol=2e-4)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from volren_tpu.scene.environment import Environment

    env = Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, tf in [("smoke_notf", False), ("smoke_tf", True)]:
        fb = _render_smoke_frame(env, tf)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"), fb=fb)
        print(f"{name}: mean {fb[..., :3].mean():.5f} alpha {fb[..., 3].mean():.4f}")
