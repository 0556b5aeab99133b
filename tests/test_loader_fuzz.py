"""Adversarial loader pass (round-3 verdict #10): every on-disk format
the framework reads (.vdb, .nvdb, DICOM, .brick) must fail GRACEFULLY on
corrupted input — a clean exception with a message, never a hang, an
interpreter crash, or an unbounded allocation. All fixtures start from
files our own writers produce (the only ground truth available in this
zero-egress environment — matches the reference's voldata formats,
/root/reference/README.md:37-40), then get truncated / bit-flipped /
header-corrupted.
"""

import struct

import numpy as np
import pytest

from volren_tpu.voldata.vdb_reader import read_vdb, write_vdb

# exceptions a loader may raise on corrupt input; anything else
# (segfault, MemoryError from a 100-GB alloc, infinite loop) fails
OK_ERRORS = (ValueError, EOFError, KeyError, IndexError, NotImplementedError,
             struct.error, OSError, OverflowError, RuntimeError)


def _fuzz_bytes(data: bytes, loader, tmp_path, suffix, n_flips=48,
                n_truncs=24, seed=0):
    """Truncation + byte-flip fuzz: loader(path) must either succeed or
    raise one of OK_ERRORS."""
    rng = np.random.default_rng(seed)
    failures = []

    def attempt(blob, what):
        p = str(tmp_path / f"fuzz{suffix}")
        with open(p, "wb") as f:
            f.write(blob)
        try:
            out = loader(p)
            # success on corrupt input is allowed, but the result must
            # be finite and sane (no NaN grids, no absurd dims)
            arr = np.asarray(getattr(out, "data", 0.0))
            if arr.size and not np.isfinite(arr).all():
                failures.append(f"{what}: non-finite output")
        except OK_ERRORS:
            pass
        except Exception as e:  # noqa: BLE001 - the point of the test
            failures.append(f"{what}: {type(e).__name__}: {e}")

    n = len(data)
    for cut in sorted(set(int(x) for x in rng.integers(0, n, n_truncs))):
        attempt(data[:cut], f"truncate@{cut}")
    for _ in range(n_flips):
        pos = int(rng.integers(0, n))
        bit = int(rng.integers(0, 8))
        blob = bytearray(data)
        blob[pos] ^= 1 << bit
        attempt(bytes(blob), f"flip@{pos}.{bit}")
    # multi-byte header scrambles (the version/compression/count fields
    # live early in every format)
    for start in (0, 8, 16, 24, 40, 64):
        if start + 8 > n:
            continue
        blob = bytearray(data)
        blob[start:start + 8] = rng.integers(0, 256, 8, np.uint8).tobytes()
        attempt(bytes(blob), f"scramble@{start}")
    assert not failures, failures[:10]


def test_vdb_fuzz(tmp_path):
    rng = np.random.default_rng(3)
    dense = rng.random((16, 16, 16)).astype(np.float32)
    p = str(tmp_path / "base.vdb")
    write_vdb(p, dense, "density")
    data = open(p, "rb").read()
    _fuzz_bytes(data, read_vdb, tmp_path, ".vdb")


@pytest.mark.parametrize("compression", ["zip", "blosc", "none"])
def test_vdb_fuzz_compressions(tmp_path, compression):
    """The compression byte gates three value-decode paths; fuzz each."""
    rng = np.random.default_rng(4)
    dense = (rng.random((8, 8, 8)) > 0.5).astype(np.float32)
    p = str(tmp_path / "c.vdb")
    write_vdb(p, dense, "density", compression=compression)
    data = open(p, "rb").read()
    _fuzz_bytes(data, read_vdb, tmp_path, ".vdb", n_flips=24, n_truncs=12,
                seed=hash(compression) % 1000)


def test_nvdb_fuzz(tmp_path):
    from test_loaders import _build_min_nvdb

    from volren_tpu.voldata.nanovdb import read_nanovdb

    p = str(tmp_path / "base.nvdb")
    _build_min_nvdb(p, codec=0)
    data = open(p, "rb").read()
    _fuzz_bytes(data, read_nanovdb, tmp_path, ".nvdb")


def test_dicom_fuzz(tmp_path):
    from test_loaders import _write_synthetic_dicom

    from volren_tpu.voldata.dicom import read_dicom

    p = str(tmp_path / "base.dcm")
    vals = (np.arange(64, dtype=np.int16).reshape(8, 8) * 10)
    _write_synthetic_dicom(p, 8, 8, vals, 0.0, 1)
    data = open(p, "rb").read()
    _fuzz_bytes(data, read_dicom, tmp_path, ".dcm")


def test_brick_fuzz(tmp_path):
    from volren_tpu.voldata import Volume
    from volren_tpu.voldata.brick import to_brick_grid
    from volren_tpu.voldata.brick_io import read_brick, write_brick

    rng = np.random.default_rng(5)
    dense = rng.random((16, 16, 16)).astype(np.float32)
    from volren_tpu.voldata import DenseGrid

    grid = to_brick_grid(DenseGrid(16, 16, 16, dense))
    p = str(tmp_path / "base.brick")
    write_brick(p, grid)
    data = open(p, "rb").read()
    _fuzz_bytes(data, read_brick, tmp_path, ".brick")
    del Volume


def test_nvdb_huge_bbox_rejected(tmp_path):
    """A header-declared astronomical index bbox must raise, not try to
    allocate the densified volume."""
    from test_loaders import _build_min_nvdb

    from volren_tpu.voldata.nanovdb import read_nanovdb

    p = str(tmp_path / "huge.nvdb")
    _build_min_nvdb(p, codec=0)
    blob = bytearray(open(p, "rb").read())
    # GridData::mWorldBBox at 304 (6d) then mIndexBBox... locate the
    # index bbox by searching for the known (1,2,3)-(8,8,8)-ish i32 runs
    # is brittle; instead corrupt EVERY aligned i32 in the first 700 B to
    # a huge value one at a time and require no MemoryError ever
    for off in range(0, 672, 4):
        b2 = bytearray(blob)
        b2[off:off + 4] = struct.pack("<i", 2**30)
        q = str(tmp_path / "h2.nvdb")
        with open(q, "wb") as f:
            f.write(bytes(b2))
        try:
            read_nanovdb(q)
        except OK_ERRORS:
            pass
        except MemoryError:
            raise AssertionError(f"unbounded allocation at offset {off}")
