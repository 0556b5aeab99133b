"""End-to-end TPU sweep of lane-compaction budgets (block selector).

Cost model (probe_cost): marginal scalar gather ~7.5 ns/index, onehot
~free, ~3.3 ms fixed per gather-containing call. The remaining scalar
gathers live in the resolve/NEE/escape stages — all compactable with
bit-exact deferral. This sweeps the VOLREN_COMPACT divisors end-to-end.
Run ALONE. JSON lines to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

if jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

RES = int(os.environ.get("PROBE_RES", "256"))
SPP = int(os.environ.get("PROBE_SPP", "16"))
SEED = int(time.time()) & 0x7FFFFFFF

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops.megakernel import render_wavefront_chunked
from volren_tpu.ops.worklist import render_wavefront_queue

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


def run(label, cfg, engine="chunked", **kw):
    fn = render_wavefront_chunked if engine == "chunked" else render_wavefront_queue
    t0 = time.time()
    out = fn(scene, params, cfg, RES, RES, 4, 990_000 + spp_base[0], **kw)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(scene, params, cfg, RES, RES, SPP, spp_base[0], **kw)
    jax.block_until_ready(out)
    dt = time.time() - t0
    spp_base[0] += SPP
    print(json.dumps({
        "probe": "compact", "label": label, "res": RES,
        "spp_s": round(SPP / dt, 3), "wall_s": round(dt, 2),
        "compile_s": round(compile_s, 1),
        "mean": float(np.asarray(out[..., :3]).mean() / SPP), "seed": SEED,
    }), flush=True)


WHICH = os.environ.get("PROBE_WHICH", "chunked")

if WHICH == "chunked":
    from volren_tpu.ops.compact import budget

    n = RES * RES
    run("chunked compact=off", cfg0, check_every=8)
    for d in (8, 16, 32):
        cfg = cfg0._replace(
            compact_resolve=budget(n, d),
            compact_nee=budget(n, d),
            compact_escape=budget(n, d),
        )
        run(f"chunked compact={d}", cfg, check_every=8)
else:
    from volren_tpu.ops.compact import budget

    lanes = int(os.environ.get("PROBE_QLANES", str(RES * RES // 8)))
    run("queue_c2 compact=off", cfg0, engine="queue", check_every=8, csize=2,
        lanes=lanes)
    for d in (4, 8):
        cfg = cfg0._replace(
            compact_resolve=budget(lanes, d),
            compact_nee=budget(lanes, d),
            compact_escape=budget(lanes, d),
        )
        run(f"queue_c2 compact={d}", cfg, engine="queue", check_every=8,
            csize=2, lanes=lanes)
