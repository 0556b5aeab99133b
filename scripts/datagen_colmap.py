"""COLMAP dataset generator.

Port of the reference scripts/datagen_colmap.py: renders N_VIEWS views of a
volume from Sobol-QMC camera positions on its bounding sphere, saves
view_%06d.png with alpha, and writes a COLMAP text model (SIMPLE_PINHOLE;
the world AABB smuggled as Point3D id 0 — datagen_colmap.py:69-73).
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import colmap_model as colmap
import volren_tpu.volpy as volpy

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# settings (reference datagen_colmap.py:22-37)
OUT_PATH = os.environ.get("DATAGEN_OUT", os.path.join(ROOT_DIR, "colmap"))
N_VIEWS = int(os.environ.get("DATAGEN_N_VIEWS", 256))
VOLUME = os.environ.get("DATAGEN_VOLUME", "/root/reference/data/smoke.brick")
ALBEDO = np.array([0.9, 0.9, 0.9], np.float32)
PHASE = 0.5
DENSITY_SCALE = 1.0
ENVMAP = os.environ.get(
    "DATAGEN_ENVMAP", "/root/reference/data/table_mountain_2_puresky_1k.hdr"
)
ENV_STRENGTH = 2.0
SAMPLES = int(os.environ.get("DATAGEN_SPP", 1 << 12))
BOUNCES = 128
FOVY = 70
SEED = 42
BACKGROUND = True
TONEMAPPING = True
RESOLUTION = int(os.environ.get("DATAGEN_RES", 1024))
# multi-host fan-out: DATAGEN_SHARD="k/n" renders views with index % n == k.
# Sobol draws advance for every index on every shard, so view i's camera is
# identical regardless of layout; each shard writes its own model_shardKofN
# dir (views are disjoint; merge = union of images + shared cameras/points).
_shard = os.environ.get("DATAGEN_SHARD")
SHARD_K, SHARD_N = (int(v) for v in _shard.split("/")) if _shard else (0, 1)
assert 0 <= SHARD_K < SHARD_N, "DATAGEN_SHARD must be k/n with 0 <= k < n"


def sample_unit_sphere(sample):
    z = 1.0 - 2.0 * sample[0]
    r = math.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * math.pi * sample[1]
    return np.array([r * math.cos(phi), r * math.sin(phi), z], np.float32)


def main():
    from scipy.stats import qmc

    renderer = volpy.Renderer()
    renderer.init(RESOLUTION, RESOLUTION)
    os.makedirs(OUT_PATH, exist_ok=True)

    renderer.seed = SEED
    renderer.bounces = BOUNCES
    renderer.volume = volpy.Volume(VOLUME)
    renderer.albedo = ALBEDO
    renderer.phase = PHASE
    renderer.density_scale = DENSITY_SCALE
    env = volpy.Environment(ENVMAP)
    env.strength = ENV_STRENGTH
    renderer.environment = env
    renderer.show_environment = BACKGROUND
    renderer.tonemapping = TONEMAPPING
    renderer.scale_and_move_to_unit_cube()
    renderer.commit()

    cameras, images, points3D = {}, {}, {}

    bb_min, bb_max = (np.asarray(v) for v in renderer.volume.AABB("density"))
    # world AABB smuggled as a Point3D (pos=bb_min, rgb=bb_max)
    points3D[0] = colmap.Point3D(id=0, xyz=list(bb_min), rgb=list(bb_max))

    res = renderer.resolution()
    cameras[0] = colmap.Camera(
        id=0,
        model="SIMPLE_PINHOLE",
        width=int(res.x),
        height=int(res.y),
        params=[renderer.colmap_focal_length(), int(res.x) // 2, int(res.y) // 2],
    )

    sampler_out = qmc.Sobol(d=2, seed=SEED + 1)
    sampler_in = qmc.Sobol(d=2, seed=SEED + 2)

    for i in range(N_VIEWS):
        center = bb_min + (bb_max - bb_min) * 0.5
        radius = float(np.linalg.norm(bb_max - center))
        pos = center + sample_unit_sphere(sampler_out.random()[0, 0:2]) * radius
        aim = center + sample_unit_sphere(sampler_in.random()[0, 0:2]) * radius * 0.1
        if i % SHARD_N != SHARD_K:
            continue  # Sobol draws above keep the view stream aligned
        print(f"rendering {i + 1}/{N_VIEWS}..")
        renderer.cam_pos = pos
        d = aim - np.asarray(renderer.cam_pos)
        renderer.cam_dir = d / np.linalg.norm(d)
        renderer.cam_fov = FOVY
        renderer.render(SAMPLES)
        filename = f"view_{i:06}.png"
        renderer.save_with_alpha(os.path.join(OUT_PATH, filename))
        q = renderer.colmap_view_rot()
        images[i] = colmap.Image(
            id=i,
            qvec=[q.w, q.x, q.y, q.z],
            tvec=list(np.asarray(renderer.colmap_view_trans())),
            camera_id=0,
            name=filename,
        )

    print("--------------------")
    print("#cameras:", len(cameras))
    print("#images:", len(images))
    print("#points3D:", len(points3D))
    model_path = OUT_PATH if SHARD_N == 1 else os.path.join(
        OUT_PATH, f"model_shard{SHARD_K}of{SHARD_N}"
    )
    colmap.write_model(cameras, images, points3D, path=model_path)


if __name__ == "__main__":
    main()
