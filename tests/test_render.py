import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import DenseGrid, Volume

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_renderer(random_grid16_module):
    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, random_grid16_module.transpose(0, 1, 2)))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.5))
    r.bounces = 16
    r.init(24, 24)
    r.commit()
    return r


@pytest.fixture(scope="module")
def random_grid16_module():
    rng = np.random.default_rng(7)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 3.0
    dense[:4] = 0.0
    return dense


def test_wavefront_render_finite_and_nonzero(tiny_renderer):
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(8)
    fb = np.asarray(r.framebuffer())
    assert np.isfinite(fb).all()
    assert fb[..., :3].mean() > 0.01
    assert 0.0 <= fb[..., 3].min() and fb[..., 3].max() <= 1.0


def test_wavefront_matches_oracle_mean(tiny_renderer):
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(24)
    wf = r.fbo_data()
    r.engine = "oracle"
    r.render(24)
    of = r.fbo_data()
    # same estimator, different RNG consumption: means agree within MC noise
    assert abs(wf.mean() - of.mean()) / max(of.mean(), 1e-6) < 0.05
    r.engine = "wavefront"


def test_progressive_equals_batch(tiny_renderer):
    """K calls of trace(1) must equal one render(K) exactly (same seeds)."""
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(4)
    batch = r.fbo_data().copy()
    r.reset()
    r._fb = jnp.zeros_like(r._fb)
    for _ in range(4):
        r.trace()
    prog = r.fbo_data()
    np.testing.assert_allclose(prog, batch, rtol=1e-5, atol=1e-6)


def test_env_only_pixels_match_direct_lookup(tiny_renderer):
    """Rays that miss the volume must return exactly the environment."""
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(2)
    fb = np.asarray(r.framebuffer())
    # corner pixels look away from the unit cube for this camera setup
    corner = fb[0, 0]
    assert corner[3] < 1e-6  # alpha 0 -> no volume interaction
    np.testing.assert_allclose(corner[:3], 0.5, atol=1e-4)


def test_alpha_zero_when_env_hidden(tiny_renderer):
    r = tiny_renderer
    r.engine = "wavefront"
    r.show_environment = False
    try:
        r.render(2)
        fb = np.asarray(r.framebuffer())
        corner = fb[0, 0]
        np.testing.assert_allclose(corner[:3], 0.0, atol=1e-6)
    finally:
        r.show_environment = True


def test_seed_determinism(tiny_renderer):
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(2)
    a = r.fbo_data().copy()
    r.render(2)
    b = r.fbo_data()
    np.testing.assert_array_equal(a, b)


def test_save_png(tiny_renderer, tmp_path):
    r = tiny_renderer
    p = str(tmp_path / "out.png")
    r.save(p)
    from PIL import Image

    im = np.asarray(Image.open(p))
    assert im.shape == (24, 24, 3)


def test_checkpoint_resume(tiny_renderer, tmp_path):
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(3)
    p = str(tmp_path / "ckpt.npz")
    r.save_checkpoint(p)
    fb3 = r.fbo_data().copy()
    # continue to 6 spp
    r.trace(spp=3)
    fb6 = r.fbo_data().copy()
    # resume from checkpoint and continue: must match exactly
    r.load_checkpoint(p)
    np.testing.assert_array_equal(r.fbo_data(), fb3)
    r.trace(spp=3)
    np.testing.assert_array_equal(r.fbo_data(), fb6)


def test_distribute_mesh_render(tiny_renderer):
    r = tiny_renderer
    r.engine = "wavefront"
    r.render(2)
    single = r.fbo_data().copy()
    r.distribute()
    try:
        r.render(2)
        np.testing.assert_allclose(r.fbo_data(), single, rtol=1e-6, atol=1e-7)
    finally:
        r.mesh = None


def test_animation_offline_loop(tmp_path):
    """Multi-frame volume folders render to numbered outputs via the CLI
    loop semantics (main.cpp:524-558)."""
    from volren_tpu.voldata import build_brick_grid, write_brick, Volume
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment

    rng = np.random.default_rng(3)
    for i in range(2):
        g = build_brick_grid(rng.random((8, 8, 8)).astype(np.float32))
        write_brick(str(tmp_path / f"f{i}.brick"), g)
    r = Renderer()
    r.volume = Volume.load_folder(str(tmp_path))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.5))
    r.bounces = 4
    r.init(12, 12)
    r.commit()
    frames = []
    for i in range(r.volume.n_grid_frames()):
        r.reset()
        r._fb = jnp.zeros_like(r._fb)
        r.volume.grid_frame_counter = i
        r.trace(spp=2)
        frames.append(r.fbo_data().copy())
    assert len(frames) == 2
    assert not np.array_equal(frames[0], frames[1])  # different grids


def test_draw_tonemap_toggle(tiny_renderer):
    r = tiny_renderer
    r.render(2)
    r.tonemapping = True
    tm = r.draw()
    r.tonemapping = False
    raw = r.draw()
    assert tm.shape == raw.shape == (24, 24, 4)
    assert not np.allclose(tm[..., :3], raw[..., :3])
    np.testing.assert_array_equal(tm[..., 3], raw[..., 3])  # alpha untouched


def test_vdb_animation_folder_cli(tmp_path):
    """BASELINE config 4 (VDB animation): a folder of .vdb frames renders
    through the full CLI offline loop to numbered PNGs, one per frame,
    with per-frame grid reload (main.cpp:524-558, README.md:80-82)."""
    import subprocess
    import sys as _sys
    from volren_tpu.voldata.vdb_reader import write_vdb

    rng = np.random.default_rng(11)
    vols = str(tmp_path / "anim")
    os.makedirs(vols)
    for i in range(3):
        dense = (rng.random((16, 16, 16)) * (i + 1) / 3).astype(np.float32)
        write_vdb(os.path.join(vols, f"frame_{i:03d}.vdb"), dense)

    out = str(tmp_path / "anim_out.png")
    proc = subprocess.run(
        [_sys.executable, "-m", "volren_tpu.cli", vols,
         "--render", "-w", "16", "-h", "16", "--spp", "2", "--bounces", "3",
         "--density", "4", "--output", out],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "VOLREN_PLATFORM": "cpu", "PYTHONPATH": REPO},
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stem = os.path.splitext(out)[0]
    imgs = []
    for i in range(3):
        fn = f"{stem}_{i:06d}.png"
        assert os.path.exists(fn), (fn, proc.stderr[-500:])
        from PIL import Image

        imgs.append(np.asarray(Image.open(fn), np.float32))
    assert all(np.isfinite(im).all() for im in imgs)
    # frames have different densities -> different renders
    assert not np.array_equal(imgs[0], imgs[2])


@pytest.mark.slow
def test_http_viewer(random_grid16_module):
    """The localhost viewer (GL-window/ImGui analogue): serves the live
    frame, the parameter panel state, and applies edits with a reset —
    mirroring main.cpp:164-305 where every ImGui change resets
    accumulation."""
    import json
    import urllib.request

    from volren_tpu.viewer import ViewerServer

    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, random_grid16_module))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.5))
    r.bounces = 4
    r.init(16, 16)
    r.commit()
    r.render(2)

    v = ViewerServer(r, port=0).start()
    try:
        base = f"http://127.0.0.1:{v.port}"
        html = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"volren_tpu" in html
        png = urllib.request.urlopen(base + "/frame.png", timeout=30).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        state = json.loads(
            urllib.request.urlopen(base + "/state.json", timeout=30).read()
        )
        assert state["sample"] == 2 and state["bounces"] == 4
        # a parameter edit applies and resets accumulation
        applied = json.loads(
            urllib.request.urlopen(
                base + "/set?bounces=7&albedo=0.5,0.6,0.7", timeout=30
            ).read()
        )
        assert applied == {"bounces": "7", "albedo": "0.5,0.6,0.7"}
        assert r.bounces == 7 and r.sample == 0
        np.testing.assert_allclose(r.albedo, [0.5, 0.6, 0.7])
        # unknown params are ignored, not applied
        ignored = json.loads(
            urllib.request.urlopen(base + "/set?nope=1", timeout=30).read()
        )
        assert ignored == {}
        # camera navigation (WASD analogue): pos moves along view dir,
        # accumulation resets
        r.render(1)
        pos0 = np.asarray(r.cam.pos).copy()
        urllib.request.urlopen(base + "/nav?fwd=1", timeout=30).read()
        assert r.sample == 0
        np.testing.assert_allclose(
            np.asarray(r.cam.pos), pos0 + 0.05 * np.asarray(r.cam.dir),
            rtol=1e-5,
        )
        # mouse look rotates dir but keeps it unit length
        dir0 = np.asarray(r.cam.dir).copy()
        urllib.request.urlopen(base + "/look?dx=40&dy=0", timeout=30).read()
        d = np.asarray(r.cam.dir)
        assert abs(np.linalg.norm(d) - 1.0) < 1e-5
        assert np.arccos(np.clip(d @ dir0, -1, 1)) > 0.1
        # snapshot flag is set for the serve loop to consume
        urllib.request.urlopen(base + "/snapshot", timeout=30).read()
        assert v.snapshot_requested
    finally:
        v.stop()


@pytest.mark.slow
def test_tiled_render_bit_identical(tiny_renderer):
    """2D tile-block rendering must reproduce the untiled chunked render
    exactly: per-lane sample streams depend only on the absolute pixel
    (col0 + x, row0 + y)."""
    from volren_tpu.ops.megakernel import (
        render_wavefront_chunked,
        render_wavefront_tiled,
    )

    r = tiny_renderer
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    full = np.asarray(
        render_wavefront_chunked(scene, params, cfg, 24, 24, 4, 0)
    )
    tiled = np.asarray(  # 3x3 grid of 8x8 tiles
        render_wavefront_tiled(scene, params, cfg, 24, 24, 4, 0, tile_rows=8)
    )
    np.testing.assert_array_equal(full, tiled)


def test_tile_program_shared_across_resolutions(tiny_renderer):
    """Frame dimensions are DYNAMIC megastep inputs: rendering two
    different frame resolutions through the same tile shape must not
    compile a second program (first-call program cost on the tunneled
    runtime is 88-580 s per shape — the whole point of the tile driver)."""
    from volren_tpu.ops.megakernel import _megastep_jit, render_wavefront_tiled

    r = tiny_renderer
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    render_wavefront_tiled(scene, params, cfg, 16, 16, 2, 0, tile_rows=8)
    before = _megastep_jit._cache_size()
    render_wavefront_tiled(scene, params, cfg, 24, 24, 2, 0, tile_rows=8)
    assert _megastep_jit._cache_size() == before
