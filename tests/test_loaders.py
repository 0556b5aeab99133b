import struct

import numpy as np
import pytest

from volren_tpu.voldata import Volume
from volren_tpu.voldata.vdb_reader import read_vdb, write_vdb


def test_vdb_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    dense = rng.random((20, 33, 17)).astype(np.float32) * 2
    dense[:5] = 0.0
    t = np.diag([0.5, 0.25, 2.0, 1.0]).astype(np.float32)
    t[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "rt.vdb")
    write_vdb(p, dense, "density", t)
    g = read_vdb(p, "density")
    got = g.to_dense()
    pad = np.zeros((24, 40, 24), np.float32)
    pad[:20, :33, :17] = dense
    np.testing.assert_array_equal(got, pad)
    np.testing.assert_allclose(g.transform, t, atol=1e-6)


def test_vdb_through_volume(tmp_path):
    dense = np.zeros((8, 8, 8), np.float32)
    dense[2:6, 2:6, 2:6] = 3.0
    p = str(tmp_path / "v.vdb")
    write_vdb(p, dense)
    v = Volume(p)
    assert v.minorant_majorant()[1] == 3.0


def test_vdb_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.vdb")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_vdb(p)


def _write_synthetic_dicom(path, rows, cols, values, z, instance):
    """Minimal explicit-VR little-endian CT slice."""
    def elem(group, el, vr, val):
        if vr in (b"OB", b"OW"):
            return struct.pack("<HH2sH I", group, el, vr, 0, len(val)) + val
        return struct.pack("<HH2sH", group, el, vr, len(val)) + val

    meta = elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    body = b""
    body += elem(0x0018, 0x0050, b"DS", b"2.5 ")
    body += elem(0x0020, 0x0013, b"IS", str(instance).encode() + b" ")
    body += elem(0x0020, 0x0032, b"DS", f"0\\0\\{z}".encode())
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem(0x0028, 0x0030, b"DS", b"0.7\\0.7 ")
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0103, b"US", struct.pack("<H", 1))
    body += elem(0x0028, 0x1052, b"DS", b"-1024 ")
    body += elem(0x0028, 0x1053, b"DS", b"1 ")
    pix = values.astype("<i2").tobytes()
    body += elem(0x7FE0, 0x0010, b"OW", pix)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def test_dicom_series(tmp_path):
    from volren_tpu.voldata.dicom import read_dicom

    rng = np.random.default_rng(2)
    for i, z in enumerate([5.0, 0.0, 2.5]):  # unsorted on purpose
        vals = (rng.random((4, 6)) * 2000 - 500).astype(np.int16)
        _write_synthetic_dicom(str(tmp_path / f"s{i}.dcm"), 4, 6, vals, z, i)
    g = read_dicom(str(tmp_path))
    dense = g.to_dense()
    assert dense.shape == (3, 4, 6)
    assert dense.min() >= 0.0 and abs(dense.max() - 1.0) < 1e-6
    # spacing: dx=dy=0.7, dz=|2.5-0|=2.5
    assert abs(g.transform[0, 0] - 0.7) < 1e-6
    assert abs(g.transform[2, 2] - 2.5) < 1e-6
