"""Golden regression renders: fixed-seed frames of the real smoke scene,
compared against stored anchors. Catches unintended estimator changes (the
reference's quality control is golden images by eye, README.md:70-77 — this
is the automated version).

Two tiers:
  24x24 / 6 spp   — fast change detectors (every run)
  128x128 / 32 spp — quality-bar goldens (TF, non-TF, emission), marked slow

A missing golden FAILS (a deleted anchor must not turn the suite green);
set VOLREN_ALLOW_MISSING_GOLDENS=1 to skip instead while regenerating.
Regenerate via `python tests/test_goldens.py` after INTENTIONAL estimator
changes.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

VARIANTS = {
    # name: (resolution, spp, use_tf, add_emission_grid)
    "smoke_notf": (24, 6, False, False),
    "smoke_tf": (24, 6, True, False),
    "smoke128_notf": (128, 32, False, False),
    "smoke128_tf": (128, 32, True, False),
    "smoke128_emission": (128, 32, False, True),
}
SLOW = {"smoke128_notf", "smoke128_tf", "smoke128_emission"}


def _flame_grid(density_grid):
    """Synthetic emission grid: vertical ramp over the smoke footprint at
    quarter resolution (exercises the independent emission brick grid +
    transform path, renderer.cpp:65-76)."""
    from volren_tpu.voldata import DenseGrid

    d, h, w = 32, 64, 32
    z, y, x = np.meshgrid(
        np.linspace(0, 1, d), np.linspace(0, 1, h), np.linspace(0, 1, w),
        indexing="ij",
    )
    ramp = np.clip(1.0 - y, 0.0, 1.0) ** 2 * np.exp(
        -8.0 * ((x - 0.5) ** 2 + (z - 0.5) ** 2)
    )
    scale = np.diag([4.0, 4.0, 4.0, 1.0]).astype(np.float32)
    tform = np.asarray(density_grid.transform, np.float32) @ scale
    return DenseGrid(w, h, d, ramp.astype(np.float32), transform=tform)


def _render_smoke_frame(env, res=24, spp=6, tf=False, emission=False):
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.transferfunc import TransferFunction
    from volren_tpu.voldata import Volume

    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    if emission:
        r.volume.update_grid_frame(0, _flame_grid(r.volume.current_grid()), "flame")
    r.scale_and_move_to_unit_cube()
    r.set_environment(env)
    if tf:
        r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
        r.show_environment = False
    r.bounces = 16
    r.seed = 42
    r.init(res, res)
    r.commit()
    r.render(spp)
    return np.asarray(r.framebuffer())


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW else n
        for n in VARIANTS
    ],
)
def test_golden(name, table_mountain_env):
    res, spp, tf, emission = VARIANTS[name]
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        if os.environ.get("VOLREN_ALLOW_MISSING_GOLDENS"):
            pytest.skip(f"golden {name} missing (regeneration mode)")
        pytest.fail(
            f"golden {name} missing — run `python tests/test_goldens.py` and "
            "commit the anchor (deleted goldens must not silently pass)"
        )
    fb = _render_smoke_frame(table_mountain_env, res, spp, tf, emission)
    ref = np.load(path)["fb"]
    # renders are deterministic; tolerance covers cross-backend fp diffs
    np.testing.assert_allclose(fb, ref, rtol=2e-3, atol=2e-4)
    # distribution-level guards: catch estimator-scale regressions even if
    # per-pixel tolerances are ever loosened
    assert abs(float(fb[..., :3].mean()) - float(ref[..., :3].mean())) < 1e-3
    assert np.isfinite(fb).all()
    ref_var = float(ref[..., :3].var())
    assert abs(float(fb[..., :3].var()) - ref_var) < max(1e-4, 0.02 * ref_var)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from volren_tpu.scene.environment import Environment

    env = Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    only = sys.argv[1:] or list(VARIANTS)
    for name in only:
        res, spp, tf, emission = VARIANTS[name]
        fb = _render_smoke_frame(env, res, spp, tf, emission)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"), fb=fb)
        print(f"{name}: mean {fb[..., :3].mean():.5f} alpha {fb[..., 3].mean():.4f}")
