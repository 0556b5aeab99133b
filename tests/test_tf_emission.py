"""End-to-end coverage of the transfer-function and emission variants
(the GLSL USE_TRANSFERFUNC / temperature-grid paths)."""

import numpy as np
import pytest

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.scene.transferfunc import TransferFunction
from volren_tpu.voldata import DenseGrid, Volume


@pytest.fixture(scope="module")
def base_volume():
    rng = np.random.default_rng(11)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 2.0
    return dense


def _renderer(dense):
    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, dense))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.6))
    r.bounces = 8
    r.init(16, 16)
    r.commit()
    return r


def test_tf_render_finite_and_tinted(base_volume):
    r = _renderer(base_volume)
    # a pure-red monotone TF: scattered light must lose green/blue
    tf = TransferFunction([(1, 0, 0, 0.0), (1, 0, 0, 1.0)])
    r.set_transferfunc(tf)
    r.show_environment = False
    r.render(16)
    fb = np.asarray(r.framebuffer())
    assert np.isfinite(fb).all()
    vol = fb[..., 3] > 0.5  # pixels that hit the volume
    assert vol.any()
    red = fb[..., 0][vol].mean()
    green = fb[..., 1][vol].mean()
    assert red > 0.0
    assert green < red * 0.2  # tinted by rgba.rgb at every scatter


def test_tf_cdf_rewrite_used_for_reference_lut(base_volume):
    r = _renderer(base_volume)
    r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
    r.render(4)
    assert np.isfinite(np.asarray(r.framebuffer())).all()


def test_tf_oracle_vs_wavefront(base_volume):
    r = _renderer(base_volume)
    tf = TransferFunction([(0.2, 0.8, 0.4, 0.0), (0.9, 0.3, 0.7, 1.0)])
    r.set_transferfunc(tf)
    r.render(24)
    wf = r.fbo_data().copy()
    r.engine = "oracle"
    r.render(24)
    of = r.fbo_data()
    assert abs(wf.mean() - of.mean()) / max(of.mean(), 1e-6) < 0.06
    r.engine = "wavefront"


def test_emission_adds_light(base_volume):
    r = _renderer(base_volume)
    # temperature grid named "flame" triggers the emission path
    # (renderer.cpp:65, EMISSION_GRID_NAMES)
    # graded temperature (normalization maps the peak to t=1; the interior
    # gradient keeps most samples below 1 so the t^2/t^4/t^8 spectrum shows)
    zz, yy, xx = np.meshgrid(*([np.arange(16)] * 3), indexing="ij")
    dist = np.sqrt((xx - 8) ** 2 + (yy - 8) ** 2 + (zz - 8) ** 2)
    temp = np.clip(1.0 - dist / 8.0, 0.0, 1.0).astype(np.float32)
    r.volume.update_grid_frame(0, DenseGrid(16, 16, 16, temp), "flame")
    r.commit()
    assert r._config().has_emission
    # black environment: the ONLY light is emission (note show_environment
    # only gates the escape/MIS contribution, not NEE — like the reference)
    r.set_environment(Environment.white(0.0))
    r.emission_scale = 50.0
    r.albedo = np.full(3, 0.5, np.float32)
    r.render(16)
    lit = r.fbo_data()
    assert np.isfinite(lit).all()
    assert lit.mean() > 1e-4
    # emission spectrum is (t^2, t^4, t^8): red-dominant for t<1
    assert lit[..., 0].mean() > lit[..., 2].mean()


def test_emission_oracle_vs_wavefront(base_volume):
    r = _renderer(base_volume)
    temp = np.zeros((16, 16, 16), np.float32)
    temp[4:12, 4:12, 4:12] = 0.8
    r.volume.update_grid_frame(0, DenseGrid(16, 16, 16, temp), "flame")
    r.commit()
    r.emission_scale = 20.0
    r.albedo = np.full(3, 0.6, np.float32)
    r.render(24)
    wf = r.fbo_data().copy()
    r.engine = "oracle"
    r.render(24)
    of = r.fbo_data()
    assert abs(wf.mean() - of.mean()) / max(of.mean(), 1e-6) < 0.06
    r.engine = "wavefront"
