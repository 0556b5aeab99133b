"""BASELINE config 4 on TPU: VDB animation per-frame reload + render timing,
and a DICOM-series + RGBA-TF render.

Synthesizes a JangaFX-style animation (N VDB frames of an advecting noise
cloud, alphanumeric order — README.md:80, main.cpp:40-42) because no real
VDB sequence ships in-env, then measures:
  a) preloaded playback: all frames committed once, per-frame advance =
     grid_frame_counter bump + reset + trace (the reference's per-frame
     GL texture bind, renderer.cpp:119-127);
  b) cold reload: read_vdb + brick build + device upload per frame, the
     worst-case streaming path.
All frames share grid shapes, so one compiled program serves every frame.
Run ALONE (one TPU process at a time).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

import jax  # noqa: F401  (backend init after cache setup)

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.scene.transferfunc import TransferFunction
from volren_tpu.voldata import Volume
from volren_tpu.voldata.vdb_reader import write_vdb

RES = int(os.environ.get("ANIM_RES", "256"))
SPP = int(os.environ.get("ANIM_SPP", "4"))
N_FRAMES = int(os.environ.get("ANIM_FRAMES", "8"))
VOXELS = int(os.environ.get("ANIM_VOXELS", "128"))
OUTDIR = "/tmp/anim_vdb"
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def emit(row):
    row["probe"] = "anim"
    print(json.dumps(row), flush=True)
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "anim.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def synth_frames():
    os.makedirs(OUTDIR, exist_ok=True)
    rng = np.random.default_rng(7)
    base = rng.random((VOXELS, VOXELS, VOXELS)).astype(np.float32)
    z = np.linspace(-1, 1, VOXELS, dtype=np.float32)
    zz, yy, xx = np.meshgrid(z, z, z, indexing="ij")
    r2 = zz * zz + yy * yy + xx * xx
    paths = []
    for i in range(N_FRAMES):
        # advect: roll the noise field, breathe the envelope
        field = np.roll(base, i * 3, axis=2) * np.clip(
            1.0 - r2 * (1.0 + 0.15 * np.sin(i)), 0.0, 1.0
        )
        p = os.path.join(OUTDIR, f"frame_{i:04d}.vdb")
        if not os.path.exists(p):
            write_vdb(p, field)
        paths.append(p)
    return paths


def build_renderer(volume, tf=None, pad_slots=None):
    r = Renderer()
    r.pad_slots = pad_slots  # cold-reload: force pow2 bucketing so single
    # -frame commits share program shapes across frames (a per-frame exact
    # shape would recompile 88-580 s per frame and swamp the timing)
    r.volume = volume
    r.scale_and_move_to_unit_cube()
    r.set_environment(
        Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")
    )
    if tf is not None:
        r.set_transferfunc(tf)
        r.show_environment = False
    r.bounces = 100
    r.seed = int(time.time()) & 0x7FFFFFFF
    r.init(RES, RES)
    r.commit()
    return r


def main():
    paths = synth_frames()

    # --- a) preloaded playback ---
    vol = Volume.load_folder(OUTDIR)
    r = build_renderer(vol)
    t0 = time.time()
    r.trace(SPP)
    np.asarray(r.framebuffer())  # PULL: honest timing through the tunnel
    compile_s = time.time() - t0

    t0 = time.time()
    means = []
    for i in range(vol.n_grid_frames()):
        vol.grid_frame_counter = i
        r.reset()
        r.trace(SPP)
        means.append(float(np.asarray(r.framebuffer())[..., :3].mean()))
    dt = time.time() - t0
    emit({
        "mode": "preloaded_playback", "res": RES, "spp": SPP,
        "frames": vol.n_grid_frames(), "voxels": VOXELS,
        "compile_s": round(compile_s, 1),
        "s_per_frame": round(dt / vol.n_grid_frames(), 3),
        "frames_per_s": round(vol.n_grid_frames() / dt, 3),
        "frame_means": [round(m, 4) for m in means[:4]],
    })
    assert len(set(round(m, 6) for m in means)) > 1, "frames identical?"

    # --- b) cold per-frame reload (load + brick build + upload + render) ---
    t0 = time.time()
    load_s = build_s = 0.0
    for p in paths:
        t1 = time.time()
        v = Volume(p)
        load_s += time.time() - t1
        t1 = time.time()
        r2_ = build_renderer(v, pad_slots=True)  # commit = build + upload
        build_s += time.time() - t1
        r2_.trace(SPP)
        np.asarray(r2_.framebuffer())
    dt = time.time() - t0
    emit({
        "mode": "cold_reload", "res": RES, "spp": SPP,
        "frames": len(paths), "voxels": VOXELS,
        "s_per_frame": round(dt / len(paths), 3),
        "vdb_read_s_per_frame": round(load_s / len(paths), 3),
        "commit_s_per_frame": round(build_s / len(paths), 3),
    })

    # --- DICOM fullbody CT stand-in + RGBA TF ---
    from tests.test_loaders import _write_synthetic_dicom  # reuse synth writer

    ddir = "/tmp/anim_dicom"
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.default_rng(3)
    nz, ny, nx = 64, 128, 128
    body = rng.random((nz, ny, nx)).astype(np.float32)
    if not os.listdir(ddir):
        for i in range(nz):
            _write_synthetic_dicom(
                os.path.join(ddir, f"ct_{i:04d}.dcm"), ny, nx,
                (body[i] * 4095).astype(np.uint16), float(i) * 2.0, i + 1,
            )
    t0 = time.time()
    vol = Volume(ddir)
    load_s = time.time() - t0
    tf = TransferFunction("/root/reference/data/lut.txt")
    r3 = build_renderer(vol, tf=tf)
    t0 = time.time()
    r3.trace(SPP)
    np.asarray(r3.framebuffer())
    compile_s = time.time() - t0
    r3.reset()
    t0 = time.time()
    r3.trace(SPP)
    mean = float(np.asarray(r3.framebuffer())[..., :3].mean())
    dt = time.time() - t0
    emit({
        "mode": "dicom_tf", "res": RES, "spp": SPP, "slices": nz,
        "dicom_load_s": round(load_s, 2), "compile_s": round(compile_s, 1),
        "spp_per_s": round(SPP / dt, 3), "mean": round(mean, 4),
    })


if __name__ == "__main__":
    main()
