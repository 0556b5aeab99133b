"""Bisect the 64-spp device_queue fault boundary (VERDICT r2 #4).

Round 2 observed: one 64-spp device_queue dispatch of the README parity
config (smoke, density 100, 1024^2) reproducibly faulted the TPU with an
UNAVAILABLE kernel fault, while 16-spp dispatches of the same total ran
fine. renderer.trace() has since fenced device_queue dispatches at 16 spp
(renderer.py:278-287). This probe maps the actual boundary so the fence
can be derived instead of hardcoded.

Each attempt runs in a CHILD process (the fault can wedge the client);
the parent records rc + stderr tail per (res, spp, lanes) point to
probes/results/fault.jsonl. Run ALONE (one TPU process at a time).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RESULTS = os.path.join(HERE, "results", "fault.jsonl")

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from volren_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()
import numpy as np
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops.worklist import render_wavefront_queue_device

res, spp, lanes = %(res)d, %(spp)d, %(lanes)d
r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment(
    "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
# README parity config (README.md:72-77)
r.environment.strength = 3.0
from volren_tpu.scene.environment import rotation_y
r.environment.transform = rotation_y(270.0)
r.set_environment(r.environment)
r.bounces = 128
r.albedo = np.array([0.8, 0.8, 0.8], np.float32)
r.phase = 0.3
r.density_scale = 100.0  # ABSOLUTE (parse_cmd overwrites the unit-cube
# compensation; see probe_parity.py)
r.init(res, res)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
t0 = time.time()
out = render_wavefront_queue_device(
    scene, params, cfg, res, res, spp, 0, lanes=lanes, csize=2, unroll=4)
out = np.asarray(out)
print("OK", round(time.time() - t0, 1), "s mean", float(out[..., :3].mean()) / spp)
"""


def attempt(res, spp, lanes, timeout=2400):
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO, "res": res,
                                            "spp": spp, "lanes": lanes}],
            capture_output=True, text=True, timeout=timeout,
        )
        rc, out, err = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        rc, out, err = -9, (e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or ""), "TIMEOUT"
    row = {
        "probe": "fault", "res": res, "spp": spp, "lanes": lanes, "rc": rc,
        "wall_s": round(time.time() - t0, 1),
        "out": out.strip()[-200:],
        "err_tail": err.strip()[-400:] if rc != 0 else "",
    }
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    return rc == 0


if __name__ == "__main__":
    # ladder up from the known-good point; stop ladder arm on first fault.
    # FAULT_POINTS="res:spp:lanes,..." overrides (rerun single points).
    pts = os.environ.get("FAULT_POINTS")
    if pts:
        for p in pts.split(","):
            res, spp, lanes = (int(v) for v in p.split(":"))
            attempt(res, spp, lanes)
    else:
        for res, lanes in ((1024, 16384), (1024, 32768), (256, 4096)):
            for spp in (16, 32, 64, 128):
                ok = attempt(res, spp, lanes)
                if not ok:
                    break
