import numpy as np
import jax.numpy as jnp
import pytest

from volren_tpu.ops import tonemap as TM
from volren_tpu.ops import transfer as TF
from volren_tpu.ops import scene as dscene
from volren_tpu.scene.transferfunc import TransferFunction


def test_lut_txt_load_reference():
    tf = TransferFunction("/root/reference/data/lut.txt")
    assert tf.lut.shape == (8, 4)
    assert np.allclose(tf.lut[1], [0.194948, 0.246476, 0.985946, 0.327626], atol=1e-6)


def test_cdf_rewrite_monotone_and_triggered():
    tf = TransferFunction("/root/reference/data/lut.txt")
    # reference lut alpha is non-monotone -> device lut must be CDF-rewritten
    dev = tf.device_lut()
    assert (np.diff(dev[:, 3]) >= -1e-7).all()
    assert abs(dev[-1, 3] - 1.0) < 1e-6
    # monotone luts pass through untouched
    mono = TransferFunction([(0, 0, 0, 0), (1, 1, 1, 0.5), (1, 1, 1, 1.0)])
    np.testing.assert_array_equal(mono.device_lut(), mono.lut)


def test_cdf_of_zero_alpha_lut_is_ramp():
    lut = np.zeros((4, 4), np.float32)
    lut[2, 3] = 0.0
    lut[1, 3] = 0.0
    out = TransferFunction.compute_lut_cdf(lut)
    np.testing.assert_allclose(out[:, 3], [0.25, 0.5, 0.75, 1.0])


def test_tf_lookup_windowing_and_interp():
    tf = TransferFunction([(0, 0, 0, 0), (1, 1, 1, 1)])
    tf.window_left = 0.25
    tf.window_width = 0.5
    dev = dscene.upload_transferfunc(tf)
    # below window -> first entry; above -> last
    lo = np.asarray(TF.tf_lookup(dev, jnp.array([0.0])))
    hi = np.asarray(TF.tf_lookup(dev, jnp.array([1.0])))
    assert np.allclose(lo[0], 0.0)
    assert np.allclose(hi[0], 1.0, atol=1e-5)
    # midpoint of window: tc = 0.5 -> idx 1 boundary interp
    mid = np.asarray(TF.tf_lookup(dev, jnp.array([0.5])))
    assert np.allclose(mid[0], 1.0, atol=1e-5)  # tc*size=1 -> lut[1]
    quarter = np.asarray(TF.tf_lookup(dev, jnp.array([0.375])))
    assert np.allclose(quarter[0], 0.5, atol=1e-5)


def test_tf_write_read_roundtrip(tmp_path):
    tf = TransferFunction()
    tf.randomize(n_bins=5, seed=3)
    p = str(tmp_path / "tf.txt")
    tf.write_to_file(p)
    tf2 = TransferFunction(p)
    np.testing.assert_allclose(tf2.lut, tf.lut, atol=1e-6)


def test_colormap_lut():
    tf = TransferFunction()
    tf.colormap("viridis", 64)
    assert tf.lut.shape == (64, 4)
    assert (np.diff(tf.lut[:, 3]) > 0).all()  # alpha ramp


def test_hable_tonemap_reference_values():
    """hable(W)/hable(W) = 1 -> exposure x with hable(x*e)=hable(W) maps to 1."""
    x = jnp.array([[11.2, 11.2, 11.2]])
    out = np.asarray(TM.hable_tonemap(x, 1.0))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)
    # zero stays zero-ish (hable(0) = -E/F... formula gives 0 at 0)
    z = np.asarray(TM.hable_tonemap(jnp.zeros((1, 3)), 5.0))
    assert np.allclose(z, 0.0, atol=1e-6)


def test_tonemap_sanitizes_nan():
    fb = jnp.array([[[np.nan, 1.0, np.inf, 0.5]]])
    out = np.asarray(TM.tonemap(fb, 1.0, 2.2))
    assert np.isfinite(out).all()
