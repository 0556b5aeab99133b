"""BASELINE config 3 on TPU: heavyweight cloud at 1024^2, 128 bounces, with
a density/albedo/phase/env_rot sweep.

The Disney WDAS cloud is not downloadable in-env; scripts/make_cloud.py
synthesizes a comparable sparse cumulus (fbm-displaced ellipsoid union).
All sweep parameters are TRACED inputs (renderer._trace_params), so the
whole sweep reuses one compiled program — only the first trace pays
compile. Measures steady spp/s at 1024^2 and per-sweep-point rates, then
extrapolates the 4096-spp wall time. Run ALONE.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

import jax  # noqa: F401  (backend init after cache setup)

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment, rotation_y
from volren_tpu.voldata import Volume

RES = int(os.environ.get("CLOUD_RES", "1024"))
SPP = int(os.environ.get("CLOUD_SPP", "16"))
VOL_RES = int(os.environ.get("CLOUD_VOLRES", "512"))
BRICK = f"/tmp/cloud_{VOL_RES}.brick"
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def emit(row):
    row["probe"] = "cloud"
    print(json.dumps(row), flush=True)
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "cloud.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    if not os.path.exists(BRICK):
        t0 = time.time()
        subprocess.run(
            [sys.executable, "scripts/make_cloud.py", "--res", str(VOL_RES),
             "--output", BRICK],
            check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        emit({"mode": "make_cloud", "vol_res": VOL_RES,
              "gen_s": round(time.time() - t0, 1),
              "mb": round(os.path.getsize(BRICK) / 1e6, 1)})

    t0 = time.time()
    vol = Volume(BRICK)
    load_s = time.time() - t0
    r = Renderer()
    r.volume = vol
    r.scale_and_move_to_unit_cube()
    r.set_environment(
        Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")
    )
    r.bounces = 128
    r.seed = int(time.time()) & 0x7FFFFFFF
    r.init(RES, RES)
    t0 = time.time()
    r.commit()
    commit_s = time.time() - t0

    t0 = time.time()
    r.trace(1)
    np.asarray(r.framebuffer())  # PULL (honest timing through the tunnel)
    compile_s = time.time() - t0

    r.reset()
    t0 = time.time()
    r.trace(SPP)
    mean = float(np.asarray(r.framebuffer())[..., :3].mean())
    dt = time.time() - t0
    rate = SPP / dt
    emit({
        "mode": "steady", "res": RES, "spp": SPP, "vol_res": VOL_RES,
        "bounces": 128, "load_s": round(load_s, 1),
        "commit_s": round(commit_s, 1), "compile_s": round(compile_s, 1),
        "spp_per_s": round(rate, 3), "mean": round(mean, 4),
        "extrapolated_4096spp_s": round(4096 / rate, 0),
        "engine": r.last_engine or r.step_engine,
    })

    # parameter sweep — all traced args, zero recompiles
    sweep = [
        {"density_scale": 0.5}, {"density_scale": 2.0},
        {"albedo": np.array([0.7, 0.8, 0.9], np.float32)}, {"phase": 0.3},
        {"phase": -0.3}, {"env_rot": 90.0}, {"env_rot": 270.0},
    ]
    base_density = r.density_scale
    for pt in sweep:
        for k, v in pt.items():
            if k == "env_rot":
                # env rotation lives on the transform (cli.py env_rot path)
                r.environment.transform = rotation_y(float(v))
                r.set_environment(r.environment)
            else:
                setattr(r, k, v)
        r.reset()
        t0 = time.time()
        r.trace(4)
        mean = float(np.asarray(r.framebuffer())[..., :3].mean())
        dt = time.time() - t0
        emit({
            "mode": "sweep", "point": {k: (v.tolist() if hasattr(v, "tolist") else v)
                                       for k, v in pt.items()},
            "res": RES, "spp": 4, "spp_per_s": round(4 / dt, 3),
            "mean": round(mean, 4),
        })
        # restore
        r.density_scale = base_density
        r.albedo = np.array([0.9, 0.9, 0.9], np.float32)
        r.phase = 0.0
        if "env_rot" in pt:
            r.environment.transform = rotation_y(0.0)
            r.set_environment(r.environment)


if __name__ == "__main__":
    main()
