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


def test_blosc_codec_roundtrip():
    """Pure-python Blosc1/LZ4 codec: compress -> decompress is identity
    across split/nosplit, shuffle, incompressible, and empty payloads."""
    from volren_tpu.voldata import blosc

    rng = np.random.default_rng(7)
    payloads = [
        b"",
        b"abc",
        np.arange(4096, dtype=np.float32).tobytes(),  # highly compressible
        rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes(),  # random
        (rng.random(2048).astype(np.float32) * 0.01).tobytes(),
    ]
    for data in payloads:
        for shuffle in (True, False):
            for split in (None, True, False):
                chunk = blosc.compress(data, typesize=4, shuffle=shuffle,
                                       split=split, blocksize=8192)
                assert blosc.decompress(chunk) == data


def test_lz4_block_edge_cases():
    from volren_tpu.voldata.blosc import lz4_compress, lz4_decompress

    cases = [
        b"",
        b"x" * 4,
        b"abcd" * 1000,          # long overlapping matches
        b"ab" * 5000,            # offset < minmatch (overlap copy path)
        bytes(range(256)) * 17,  # mixed literals/matches
    ]
    for data in cases:
        comp = lz4_compress(data)
        assert lz4_decompress(comp, len(data)) == data


@pytest.mark.parametrize("compression", ["zip", "blosc", "none"])
def test_vdb_roundtrip_compressions(tmp_path, compression):
    """write_vdb -> read_vdb across all three value-compression modes —
    blosc is the stock OpenVDB default for real-world files (VERDICT #7)."""
    rng = np.random.default_rng(3)
    dense = (rng.random((12, 19, 9)) * 4).astype(np.float32)
    dense[dense < 1.0] = 0.0
    p = str(tmp_path / f"c_{compression}.vdb")
    write_vdb(p, dense, "density", compression=compression)
    got = read_vdb(p, "density").to_dense()
    pad = np.zeros((16, 24, 16), np.float32)
    pad[:12, :19, :9] = dense
    np.testing.assert_array_equal(got, pad)


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


def _build_min_nvdb(path, codec=0):
    """Hand-assemble a minimal spec-conformant NanoVDB file (VERDICT #7):
    file header + FileMetaData + one float grid whose payload is
    GridData(672 B) + TreeData + a single 8^3 leaf at index origin (8,16,24).
    Layout per the public NanoVDB v32 ABI (nanovdb/NanoVDB.h, util/IO.h)."""
    import zlib

    leaf_vals = np.arange(512, dtype=np.float32) / 512.0
    mask = np.zeros(512, dtype=bool)
    mask[::3] = True  # sparse activity pattern

    # ---- leaf: CoordBBox min (3i) + bbox_dif (3B) + flags (B) + pad to 16
    leaf = struct.pack("<3i", 8, 16, 24) + bytes([7, 7, 7, 0])
    leaf += np.packbits(mask, bitorder="little").tobytes()  # 64 B value mask
    leaf += struct.pack("<4f", leaf_vals.min(), leaf_vals.max(), 0.0, 0.0)
    leaf += leaf_vals.tobytes()  # 512 floats, x fastest? (x,y,z) reader order
    assert len(leaf) == 12 + 3 + 1 + 64 + 16 + 2048

    # ---- GridData: 672 bytes; only the fields the reader consumes are set
    grid_data = bytearray(672)
    struct.pack_into("<Q", grid_data, 16, 672 + 48 + len(leaf))  # mGridSize
    # Map at 264: floats mMatF[9]+mInvMatF[9]+mVecF[3]+mTaperF (88 B), then
    # doubles mMatD[9]+mInvMatD[9]+mVecD[3]+mTaperD
    vox = 0.5  # voxel size -> scale map
    matd = [vox, 0, 0, 0, vox, 0, 0, 0, vox]
    struct.pack_into("<9d", grid_data, 264 + 88, *matd)
    struct.pack_into("<3d", grid_data, 264 + 88 + 144, 1.0, 2.0, 3.0)  # mVecD

    # ---- TreeData: mNodeOffset[4] (rel. to tree), mNodeCount[3], ...
    tree = bytearray(48)
    struct.pack_into("<Q", tree, 0, 48)  # leaves directly after TreeData
    struct.pack_into("<I", tree, 32, 1)  # one leaf

    payload = bytes(grid_data) + bytes(tree) + leaf
    if codec == 1:
        z = zlib.compress(payload)
        payload = struct.pack("<Q", len(z)) + z
    elif codec == 2:
        from volren_tpu.voldata import blosc

        c = blosc.compress(payload, typesize=4)
        payload = struct.pack("<Q", len(c)) + c

    name = b"density\x00"
    meta = bytearray(180)
    struct.pack_into("<QQQQII", meta, 0,
                     672 + 48 + len(leaf), len(payload), 0,
                     int(mask.sum()), 1, 1)  # grid_type=float, class=fog
    struct.pack_into("<6d", meta, 40, 4.0, 8.0, 12.0, 8.0, 12.0, 16.0)
    struct.pack_into("<6i", meta, 88, 8, 16, 24, 15, 23, 31)  # index bbox
    struct.pack_into("<3d", meta, 112, vox, vox, vox)
    struct.pack_into("<I", meta, 136, len(name))
    struct.pack_into("<4I", meta, 140, 1, 0, 0, 0)  # node counts
    struct.pack_into("<HHI", meta, 172, codec, 0, 32 << 21)  # codec, pad, version

    header = struct.pack("<QIHH", 0x324244566F6E614E, 32, 1, codec)
    with open(path, "wb") as f:
        f.write(header + bytes(meta) + name + payload)
    return leaf_vals, mask


@pytest.mark.parametrize("codec", [0, 1, 2], ids=["raw", "zip", "blosc"])
def test_nanovdb_minimal_file(tmp_path, codec):
    from volren_tpu.voldata.nanovdb import read_nanovdb

    p = str(tmp_path / "min.nvdb")
    vals, mask = _build_min_nvdb(p, codec=codec)
    g = read_nanovdb(p)
    assert g.data.shape == (8, 8, 8)  # (z, y, x) of the 8^3 index bbox
    expect = np.where(mask, vals, 0.0).reshape(8, 8, 8).transpose(2, 1, 0)
    np.testing.assert_allclose(g.data, expect)
    # transform: scale 0.5 map, origin mVecD + M @ bbox_min
    t = g.transform
    np.testing.assert_allclose(np.diag(t)[:3], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(t[:3, 3], [1.0 + 4.0, 2.0 + 8.0, 3.0 + 12.0])


def test_nanovdb_rejects_garbage(tmp_path):
    from volren_tpu.voldata.nanovdb import read_nanovdb

    p = str(tmp_path / "bad.nvdb")
    with open(p, "wb") as f:
        f.write(b"not a nanovdb file at all........")
    with pytest.raises(ValueError):
        read_nanovdb(p)
