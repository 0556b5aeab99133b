"""Ground-truth step-count + wall-clock drain loops per config.

Async chained timings through this tunnel are FICTION: block_until_ready
returns without materializing (megastep u=32 "measured" 0.195 ms/call
while the host-free while_loop proves >= 1.8 ms/step). The only honest
numbers come from loops that pull real data. This probe runs the actual
drain loop per config, counting wavefront steps and wall time — it
answers BOTH what a step really costs and whether compaction changes the
step count (deferral) or the per-step cost. Run ALONE.
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
CE = int(os.environ.get("PROBE_CE", "8"))
SEED = int(time.time()) & 0x7FFFFFFF

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops import megakernel as M
from volren_tpu.ops.compact import budget

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.seed = SEED
r.init(RES, RES)
r.commit()
scene, params, cfg0 = r._scene_device(), r._trace_params(), r._config()

spp_base = [0]
side = RES
n = side * side


def drain(label, cfg, unroll=32):
    spp = jnp.asarray(SPP, jnp.int32)
    base = jnp.asarray(spp_base[0], jnp.int32)
    spp_base[0] += SPP
    state = M.init_state(side, side)
    # warm (program may come from the compilation cache)
    t0 = time.time()
    s2, na = M._megastep_jit(state, scene, params, cfg, side, spp, base, side,
                             8, unroll, 2)
    np.asarray(na)
    compile_s = time.time() - t0

    state = M.init_state(side, side)
    steps = 0
    t0 = time.time()
    while True:
        for _ in range(CE):
            state, n_active = M._megastep_jit(
                state, scene, params, cfg, side, spp, base, side, 8, unroll, 2
            )
        steps += CE * unroll
        if int(np.asarray(n_active)[0]) == 0:
            break
        if steps > 200_000:
            break
    dt = time.time() - t0
    img = np.asarray(state["accum"])
    print(json.dumps({
        "probe": "drain", "label": label, "res": RES, "spp": SPP,
        "steps": steps, "wall_s": round(dt, 2),
        "ms_per_step": round(dt / steps * 1000, 3),
        "spp_s": round(SPP / dt, 3), "compile_s": round(compile_s, 1),
        "mean": float(img[:, :3].mean() / SPP), "seed": SEED,
    }), flush=True)


# compact_* fields are DIVISORS (budget() is applied inside the stages);
# passing a precomputed budget here was the probe bug that produced the
# 128-lane starvation run
import os as _os
_divs = [int(d) for d in _os.environ.get("PROBE_DIVS", "8,16,32").split(",")]
for d in _divs:
    drain(f"compact={d} block", cfg0._replace(compact_resolve=d, compact_nee=d,
                                              compact_escape=d))
for d in _divs[:1]:
    drain(f"compact={d} topk", cfg0._replace(compact_resolve=d, compact_nee=d,
                                             compact_escape=d,
                                             compact_selector="topk"))
drain("compact=off", cfg0)
