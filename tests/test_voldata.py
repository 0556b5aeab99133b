import os
import tempfile

import numpy as np
import pytest

from volren_tpu.voldata import (
    BrickGrid,
    DenseGrid,
    Volume,
    build_brick_grid,
    read_brick,
    write_brick,
)
from volren_tpu.voldata.brick import build_range_mips


def test_smoke_brick_metadata(smoke_brick):
    g = smoke_brick
    assert g.n_bricks == (16, 32, 16)
    assert tuple(g.voxel_extent) == (128, 256, 128)
    mn, mj = g.minorant_majorant()
    assert mn == 0.0
    assert abs(mj - 5.7148) < 1e-3
    assert len(g.range_mips) == 3
    assert g.range_mips[0].shape == (8, 16, 8, 2)
    # transform decoded from the file header
    assert abs(g.transform[0, 0] - 0.47619) < 1e-4


def test_brick_roundtrip_exact(smoke_brick, tmp_path):
    p = str(tmp_path / "rt.brick")
    write_brick(p, smoke_brick)
    g2 = read_brick(p)
    np.testing.assert_array_equal(g2.indirection, smoke_brick.indirection)
    np.testing.assert_allclose(g2.range, smoke_brick.range, atol=0)
    np.testing.assert_array_equal(g2.atlas, smoke_brick.atlas)


def test_builder_quantization_bound(random_grid16):
    bg = build_brick_grid(random_grid16)
    dec = bg.to_dense()
    # error bounded by half a quantization step of the widest brick range
    widest = (bg.range[..., 1] - bg.range[..., 0]).max()
    assert np.abs(dec - random_grid16).max() <= widest / 255.0 / 2.0 + 1e-6


def test_builder_constant_bricks_have_no_slots():
    dense = np.zeros((16, 16, 16), np.float32)
    dense[8:, 8:, 8:] = 2.5  # one constant brick
    bg = build_brick_grid(dense)
    # only bricks with max > min are allocated; constant bricks decode via range
    assert bg.atlas.shape[0] == 1  # placeholder slot only
    assert np.allclose(bg.to_dense(), dense)


def test_range_mips_conservative(random_grid16):
    bg = build_brick_grid(random_grid16)
    for m, mip in enumerate(bg.range_mips):
        f = 2 ** (m + 1)
        bz, by, bx = bg.range.shape[:3]
        for zi in range(mip.shape[0]):
            for yi in range(mip.shape[1]):
                for xi in range(mip.shape[2]):
                    children = bg.range[
                        zi * f : (zi + 1) * f, yi * f : (yi + 1) * f, xi * f : (xi + 1) * f
                    ]
                    assert mip[zi, yi, xi, 1] >= children[..., 1].max() - 1e-6
                    assert mip[zi, yi, xi, 0] <= children[..., 0].min() + 1e-6


def test_mip_lookup_contract(smoke_brick):
    """majorant(mip m) at voxel v covers the brick at v >> (3+m)."""
    g = smoke_brick
    vox = np.array([100, 200, 77])
    for m, mip in enumerate(g.range_mips):
        b = vox >> (3 + m + 1)
        val = mip[b[2], b[1], b[0], 1]
        base_val = g.range[vox[2] >> 3, vox[1] >> 3, vox[0] >> 3, 1]
        assert val >= base_val - 1e-6


def test_dense_grid_uint8_normalization():
    g = DenseGrid(2, 2, 1, np.array([0, 51, 102, 255], np.uint8))
    assert abs(g.minorant_majorant()[1] - 1.0) < 1e-6
    assert abs(g.lookup(np.array([1, 0, 0]))[()] - 0.2) < 1e-6


def test_volume_folder_alphanumeric(tmp_path, smoke_brick):
    for i in (0, 2, 10, 1):
        write_brick(str(tmp_path / f"f_{i}.brick"), smoke_brick)
    v = Volume.load_folder(str(tmp_path))
    assert v.n_grid_frames() == 4


def test_volume_aabb_with_transform(smoke_brick):
    v = Volume(smoke_brick)
    lo, hi = v.AABB()
    # transform * [0, extent]
    assert np.allclose(lo, [-33.5714, -12.1428, -25.9523], atol=1e-3)
    assert np.allclose(hi, [27.38095, 109.7619, 35.0], atol=1e-3)


def test_unit_cube_scaling(smoke_brick):
    from volren_tpu.renderer import Renderer

    r = Renderer()
    r.volume = Volume(smoke_brick)
    r.scale_and_move_to_unit_cube()
    lo, hi = r.volume.AABB()
    assert np.max(hi - lo) <= 1.0 + 1e-5
    assert np.allclose((lo + hi) / 2, 0.0, atol=1e-5)
    # density compensated by size factor (renderer.cpp:227-242)
    assert abs(r.density_scale - 121.9047) < 0.01


def test_lookup_out_of_bounds_zero(random_grid16):
    bg = build_brick_grid(random_grid16)
    assert bg.lookup(np.array([-1, 0, 0])) == 0.0
    assert bg.lookup(np.array([0, 99, 0])) == 0.0


def test_native_builder_matches_numpy(random_grid16):
    from volren_tpu import native
    from volren_tpu.voldata.brick import build_brick_grid

    if not native.available():
        pytest.skip("native voldata library not built")
    g_nat = build_brick_grid(random_grid16, use_native=True)
    g_np = build_brick_grid(random_grid16, use_native=False)
    np.testing.assert_array_equal(g_nat.indirection, g_np.indirection)
    np.testing.assert_array_equal(g_nat.range, g_np.range)
    np.testing.assert_array_equal(g_nat.atlas, g_np.atlas)
    for a, b in zip(g_nat.range_mips, g_np.range_mips):
        np.testing.assert_array_equal(a, b)


def test_dense_file_roundtrip(tmp_path):
    from volren_tpu.voldata.brick_io import read_dense, write_dense

    rng = np.random.default_rng(4)
    g = DenseGrid(5, 6, 7, rng.random(5 * 6 * 7).astype(np.float32))
    g.transform = np.diag([2.0, 1.0, 0.5, 1.0]).astype(np.float32)
    p = str(tmp_path / "rt.dense")
    write_dense(p, g)
    g2 = read_dense(p)
    np.testing.assert_array_equal(g2.data, g.data)
    np.testing.assert_allclose(g2.transform, g.transform)
    # extension dispatch through Volume
    v = Volume(p)
    assert tuple(v.current_grid().index_extent()) == (5, 6, 7)


def test_buf3d_container():
    from volren_tpu.voldata import Buf3D

    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)  # (z, y, x)
    buf = Buf3D.from_array(arr)
    assert buf.stride == (4, 3, 2)
    assert buf.n_elements == 24


def test_device_decode_matches_host_build(random_grid16):
    """upload_grid decodes dense/dense_quad ON DEVICE from the u8 atlas
    (20x less host->device transfer); the decode matches the host numpy
    build to 1 ULP (XLA contracts min + u8/255*(max-min) into an FMA;
    exact zeros must stay exact so empty space stays empty)."""
    from volren_tpu.ops.scene import _build_dense_tables, upload_grid
    from volren_tpu.voldata.brick import build_brick_grid

    bg = build_brick_grid(random_grid16)
    dev = upload_grid(bg, np.eye(4, dtype=np.float32))
    host = _build_dense_tables(bg)
    assert dev.dense is not None and dev.dense_quad is not None
    d, h = np.asarray(dev.dense), np.asarray(host["dense"])
    np.testing.assert_allclose(d, h, rtol=3e-7, atol=0)
    np.testing.assert_array_equal(d == 0.0, h == 0.0)
    np.testing.assert_allclose(
        np.asarray(dev.dense_quad), np.asarray(host["dense_quad"]),
        rtol=3e-7, atol=0,
    )
    # padded slot axis must not change the decode at all
    dev_p = upload_grid(bg, np.eye(4, dtype=np.float32), pad_slots=True)
    np.testing.assert_array_equal(np.asarray(dev_p.dense), np.asarray(dev.dense))
