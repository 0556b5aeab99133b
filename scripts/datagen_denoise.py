"""Denoising dataset generator.

Port of the reference scripts/datagen_denoise.py (runs inside volren via
the embedded interpreter there; here it's a normal script on top of the
volpy shim). Renders N_IMAGES randomized scenes twice — noisy (1-32 spp)
and converged (4096 spp) — into two HDF5 files with dataset 'color' of
shape (N, 3, H, W) float16, matching the reference's output contract
(datagen_denoise.py:49-52,113-121).

Settings are edited in-file, like the reference (README.md:86); env vars
DATAGEN_* override for automation.
"""

import math
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import volren_tpu.volpy as volpy

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# settings (reference datagen_denoise.py:13-20)
N_IMAGES = int(os.environ.get("DATAGEN_N_IMAGES", 256))
N_SAMPLES_TARGET = int(os.environ.get("DATAGEN_SPP_TARGET", 1 << 12))
SEED = 42
H5_NAME = os.environ.get("DATAGEN_H5_NAME", "dataset")
VOLPATH = os.environ.get("DATAGEN_VOLPATH", "/root/reference/data")
ENVPATH = os.environ.get("DATAGEN_ENVPATH", "/root/reference/data")
RESOLUTION = int(os.environ.get("DATAGEN_RES", 1024))
# multi-host fan-out (SURVEY section 7 step 6): DATAGEN_SHARD="k/n" renders
# only scenes with index % n == k into per-shard HDF5 files. Scene
# parameters are drawn for EVERY index on every shard, so scene i is
# identical regardless of the shard layout (embarrassingly parallel over
# DCN; merge = concat of the shard files in index order).
_shard = os.environ.get("DATAGEN_SHARD")
SHARD_K, SHARD_N = (int(v) for v in _shard.split("/")) if _shard else (0, 1)
assert 0 <= SHARD_K < SHARD_N, "DATAGEN_SHARD must be k/n with 0 <= k < n"
ENABLE_RANDOM_TRANSFERFUNC = os.environ.get("DATAGEN_RANDOM_TF", "0") == "1"
# resume support: skip the first DATAGEN_RESUME owned scenes and append
# into existing shard files (the scene parameter stream is drawn per
# index, so a restarted run reproduces the identical scenes) — lets a
# watchdog parent restart the run after a wedged device call
# (probes/probe_datagen.py)
RESUME = int(os.environ.get("DATAGEN_RESUME", "0"))


def glob_directory(root, ext=".hdr"):
    entries = []
    for dirname, _, files in os.walk(root):
        for fname in files:
            if os.path.splitext(fname)[1] == ext:
                entries.append(os.path.join(dirname, fname))
    return sorted(entries)


def uniform_sample_sphere():
    z = 1.0 - 2.0 * random.random()
    r = math.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * math.pi * random.random()
    return np.array([r * math.cos(phi), r * math.sin(phi), z], np.float32)


def randomize_parameters(volumes, envmaps):
    """Parameter ranges from the reference (datagen_denoise.py:60-80)."""
    return {
        "samples": random.randint(1, 32 + 1),
        "max_bounces": random.randint(1, 128 + 1),
        "seed_input": random.randint(0, 2**31),
        "seed_target": random.randint(0, 2**31),
        "env_path": random.choice(envmaps),
        "env_strength": 0.5 + random.random() * 10,
        "env_show": random.random() < 0.1,
        "lut_n_bins": random.randint(2, 32 + 1),
        "lut_window_left": random.random() * 0.25,
        "lut_window_width": random.random(),
        "vol_path": random.choice(volumes),
        "vol_albedo": np.array(
            [random.random(), random.random(), random.random()], np.float32
        ),
        "vol_phase": -0.9 + (random.random() * 1.8),
        "vol_density_scale": 0.01 + random.random() * 5,
        "cam_pos_sample": uniform_sample_sphere(),
        "cam_dir_sample": uniform_sample_sphere(),
        "cam_fov": 25 + (random.random() * 70),
    }


def fbo_to_dataset(fbo):
    """(H, W, 3) float framebuffer -> (3, H, W) float16, image row order."""
    return np.transpose(np.flip(fbo, axis=0).astype(np.float16), (2, 0, 1))


def main():
    import h5py

    renderer = volpy.Renderer()
    renderer.init(RESOLUTION, RESOLUTION)
    random.seed(SEED)

    volumes = glob_directory(VOLPATH, ".brick") + glob_directory(VOLPATH, ".vdb")
    envmaps = glob_directory(ENVPATH, ".hdr")
    print("#volumes:", len(volumes))
    print("#envmaps:", len(envmaps))
    if not volumes or not envmaps:
        raise SystemExit("no volumes or envmaps found")

    size = renderer.resolution()
    h, w = int(size.y), int(size.x)
    owned = [i for i in range(N_IMAGES) if i % SHARD_N == SHARD_K]
    h5_stem = H5_NAME + (f"_shard{SHARD_K}of{SHARD_N}" if SHARD_N > 1 else "")
    mode = "a" if RESUME else "w"
    file_input = h5py.File(h5_stem + "_input.h5", mode)
    dataset_input = file_input.require_dataset(
        "color", shape=(len(owned), 3, h, w), dtype=np.float16
    )
    file_target = h5py.File(h5_stem + "_target.h5", mode)
    dataset_target = file_target.require_dataset(
        "color", shape=(len(owned), 3, h, w), dtype=np.float16
    )

    j = -1
    for i in range(N_IMAGES):
        params = randomize_parameters(volumes, envmaps)
        if i % SHARD_N != SHARD_K:
            continue  # params drawn above keep the scene stream aligned
        j += 1
        if j < RESUME:
            continue
        print(f"rendering {i + 1}/{N_IMAGES}..", flush=True)
        renderer.volume = volpy.Volume(params["vol_path"])
        renderer.commit()
        renderer.albedo = params["vol_albedo"]
        renderer.phase = params["vol_phase"]
        renderer.density_scale = params["vol_density_scale"]
        env = volpy.Environment(params["env_path"])
        env.strength = params["env_strength"]
        renderer.environment = env
        renderer.show_environment = params["env_show"]
        if ENABLE_RANDOM_TRANSFERFUNC:
            tf = volpy.TransferFunction()
            tf.randomize(params["lut_n_bins"])
            tf.window_left = params["lut_window_left"]
            tf.window_width = params["lut_window_width"]
            renderer.transferfunc = tf
        else:
            renderer.transferfunc = None
        # camera on the volume's bounding sphere
        bb_min, bb_max = renderer.volume.AABB("density")
        bb_min, bb_max = np.asarray(bb_min), np.asarray(bb_max)
        center = bb_min + (bb_max - bb_min) * 0.5
        radius = float(np.linalg.norm(bb_max - center))
        renderer.cam_pos = center + params["cam_pos_sample"] * radius
        d = center + params["cam_dir_sample"] * radius * 0.1 - np.asarray(renderer.cam_pos)
        renderer.cam_dir = d / np.linalg.norm(d)
        renderer.cam_fov = params["cam_fov"]
        # noisy
        renderer.seed = params["seed_input"]
        renderer.bounces = params["max_bounces"]
        import time as _time

        def render_hb(spp, tag):
            """render() with a per-chunk heartbeat so the watchdog
            parent can tell a slow render from a wedged dispatch."""
            renderer.reset()
            done = 0
            t_hb = _time.time()
            while done < spp:
                n = min(64, spp - done)
                renderer._core.trace(n)
                np.asarray(renderer._core.framebuffer()[..., 0].sum())
                done += n
                print(f"@HB {tag} {done}/{spp} "
                      f"{done / (_time.time() - t_hb):.2f}spp/s",
                      flush=True)

        t0 = _time.time()
        render_hb(params["samples"], "noisy")
        dataset_input[j] = fbo_to_dataset(renderer.fbo_data())
        file_input.flush()
        t1 = _time.time()
        print(f"@SCENE {j} noisy {params['samples']}spp {t1 - t0:.1f}s",
              flush=True)
        # converged
        renderer.seed = params["seed_target"]
        renderer.bounces = params["max_bounces"]
        render_hb(N_SAMPLES_TARGET, "clean")
        dataset_target[j] = fbo_to_dataset(renderer.fbo_data())
        file_target.flush()
        print(f"@SCENE {j} clean {N_SAMPLES_TARGET}spp "
              f"{_time.time() - t1:.1f}s", flush=True)

    file_input.close()
    file_target.close()
    print(f"{h5_stem}_input.h5 / {h5_stem}_target.h5 written.")


if __name__ == "__main__":
    main()
