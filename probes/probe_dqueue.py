"""End-to-end device-queue engine shootout on TPU.

One while_loop dispatch per render: no 27-33 ms per-megastep fixed cost,
no 25 ms activity pulls. Sweeps unroll and lane count vs the host-stepped
queue at 256^2. Run ALONE. JSON lines to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


RES = int(os.environ.get("PROBE_RES", "256"))
SPP = int(os.environ.get("PROBE_SPP", "16"))
SEED = int(time.time()) & 0x7FFFFFFF

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops.worklist import (
    render_wavefront_queue,
    render_wavefront_queue_device,
)

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.seed = SEED
r.init(RES, RES)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()

spp_base = [0]


def run(label, fn, **kw):
    t0 = time.time()
    out = fn(scene, params, cfg, RES, RES, SPP, 990_000 + spp_base[0], **kw)
    _ = np.asarray(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(scene, params, cfg, RES, RES, SPP, spp_base[0], **kw)
    out = np.asarray(out)
    dt = time.time() - t0
    spp_base[0] += SPP
    print(json.dumps({
        "probe": "dqueue", "label": label, "res": RES,
        "spp_s": round(SPP / dt, 3), "wall_s": round(dt, 2),
        "compile_s": round(compile_s, 1),
        "mean": float(out[..., :3].mean() / SPP), "seed": SEED,
    }), flush=True)


CONFIGS = os.environ.get(
    "PROBE_CONFIGS", "dev_u2,dev_u4,dev_u4_L16k,host_ce8"
).split(",")

if "dev_u2" in CONFIGS:
    run("device u=2 c2 L=64k", render_wavefront_queue_device, csize=2, unroll=2)
if "dev_u4" in CONFIGS:
    run("device u=4 c2 L=64k", render_wavefront_queue_device, csize=2, unroll=4)
if "dev_u4_L16k" in CONFIGS:
    run("device u=4 c2 L=16k", render_wavefront_queue_device, csize=2, unroll=4,
        lanes=16384)
if "dev_u8" in CONFIGS:
    run("device u=8 c2 L=64k", render_wavefront_queue_device, csize=2, unroll=8)
if "dev_u4_L32k" in CONFIGS:
    run("device u=4 c2 L=32k", render_wavefront_queue_device, csize=2, unroll=4,
        lanes=32768)
if "host_ce8" in CONFIGS:
    run("host queue c2 ce=8", render_wavefront_queue, csize=2, check_every=8)
