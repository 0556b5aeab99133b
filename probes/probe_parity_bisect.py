"""Bisect the parity regression: README config at 256^2/64 spp on TPU,
across engine x use_onehot. The round-2 CPU render scored 1.82% rel RMSE;
the round-3 TPU device_queue render scored 21.7%. Suspects: bf16 one-hot
majorants (use_onehot), nearest-NEE env fetch (env_nearest_nee), or a
device_queue-specific bug at high density/bounces. Run ALONE."""

import json
import os
import sys
import subprocess
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np
import jax


from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment, rotation_y
from volren_tpu.voldata import Volume
from volren_tpu.utils.image import save_ldr

SPP = int(os.environ.get("PROBE_SPP", "64"))


def build(engine, onehot):
    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    env = Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")
    env.strength = 3.0
    env.transform = rotation_y(270.0)
    r.set_environment(env)
    r.bounces = 128
    r.albedo = np.array([0.8, 0.8, 0.8], np.float32)
    r.phase = 0.3
    r.density_scale = 100.0  # ABSOLUTE, like the CLI/reference: parse_cmd
# overwrites the unit-cube size compensation (main.cpp flag order);
# *= here once rendered 100*size — far denser smoke, 22% RMSE
    r.tonemap_exposure = 3.0
    r.tonemap_gamma = 2.0
    r.cam.fov_degree = 40.0
    r.step_engine = engine
    r.use_onehot = onehot
    r.init(256, 256)
    r.commit()
    return r


for label, engine, onehot in [
    ("device_queue onehot", "device_queue", True),
    ("device_queue exact", "device_queue", False),
    ("chunked exact", "chunked", False),
]:
    r = build(engine, onehot)
    t0 = time.time()
    r.render(SPP)
    img = r.draw()
    dt = time.time() - t0
    out = f"/tmp/parity_{label.replace(' ', '_')}.png"
    save_ldr(out, img, flip=True, alpha=False)
    cmp = subprocess.run(
        [sys.executable, "scripts/compare_rmse.py", out,
         "/root/reference/imgs/example.jpg", "--resize-b"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    rel = None
    for line in cmp.stdout.splitlines():
        if line.startswith("relative RMSE:"):
            rel = float(line.split()[-1].rstrip("%"))
    print(json.dumps({
        "probe": "parity_bisect", "label": label, "spp": SPP,
        "rel_rmse_pct": rel, "wall_s": round(dt, 1),
        "mean": float(np.asarray(img)[..., :3].mean()), "png": out,
    }), flush=True)
