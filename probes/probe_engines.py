"""TPU engine shootout: chunked vs work-queue at 256^2 on the smoke scene.

Run ALONE (exactly one TPU process; concurrent pytest distorts both).
Writes one JSON line per config to stdout; bounded per-config by the
caller's timeout. The queue engine's 8-24x lane-step work reduction
(NOTES.md round-3 table) was only ever measured on CPU — this probe is
the TPU validation run queued since the tunnel wedged.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax


from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

RES = int(os.environ.get("PROBE_RES", "256"))
SPP = int(os.environ.get("PROBE_SPP", "24"))  # warmup takes the first 8
SEED = int(time.time()) & 0x7FFFFFFF  # novel seed: server-side result
# caching replays stale outputs at fake speeds (bench.py lesson)

CONFIGS = [
    # (label, engine, extra-attrs). bench.py already duels chunked vs
    # queue_c2 at 256^2; keep this list short — each static csize is a
    # fresh program and first-call program cost is ~450 s.
    ("chunked", "chunked", {}),
    ("queue_c2", "queue", {"queue_csize": 2}),
    ("queue_c1", "queue", {"queue_csize": 1}),
]
if os.environ.get("PROBE_CONFIGS"):
    want = os.environ["PROBE_CONFIGS"].split(",")
    CONFIGS = [c for c in CONFIGS if c[0] in want]

volume = Volume(os.environ.get("PROBE_VOLUME", "/root/reference/data/smoke.brick"))
env = Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")

for label, engine, extra in CONFIGS:
    r = Renderer()
    r.volume = volume
    r.scale_and_move_to_unit_cube()
    r.set_environment(env)
    r.bounces = 100
    r.seed = SEED
    r.step_engine = engine
    for k, v in extra.items():
        setattr(r, k, v)
    r.init(RES, RES)
    r.commit()
    chunk = max(1, min(8, SPP))
    t0 = time.time()
    r.render(chunk)  # warmup/compile
    jax.block_until_ready(r.framebuffer())
    compile_s = time.time() - t0
    done = chunk
    t0 = time.time()
    while done < SPP:
        n = min(chunk, SPP - done)
        r.trace(n)  # progressive: spp_base varies, inputs never repeat
        jax.block_until_ready(r.framebuffer())
        done += n
    dt = max(time.time() - t0, 1e-9)
    measured = done - chunk
    import numpy as np

    fb = np.asarray(r.framebuffer())
    print(
        json.dumps(
            {
                "probe": "engines",
                "label": label,
                "res": RES,
                "spp_s": round(measured / dt, 4) if measured else None,
                "first_call_s": round(compile_s, 1),
                "mean": float(fb[..., :3].mean()),
                "seed": SEED,
            }
        ),
        flush=True,
    )
