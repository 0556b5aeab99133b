"""How much of the render loop is tunnel-sync overhead?

The phases probe times REPS async-pipelined calls (one sync at the end)
and sees ~0.9 ms per unroll=32 megastep call; the render loops sync every
check_every calls to read n_active and see ~300 ms/spp. This probe sweeps
check_every for the chunked and queue engines, times the single-dispatch
device engine (lax.while_loop — zero host syncs), and measures the raw
sync round trip. Run ALONE. One JSON line per measurement.
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

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.seed = SEED
r.init(RES, RES)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()


def emit(**kw):
    print(json.dumps({"probe": "sync", **kw}), flush=True)


# raw sync round trip: a trivial program, dispatch+block per iteration
f = jax.jit(lambda x: x * 1.0001 + 0.1)
x = jnp.ones((8,), jnp.float32)
np.asarray(f(x))
t0 = time.time()
for _ in range(20):
    x = f(x)
    _ = np.asarray(x)  # host pull = sync
emit(label="sync roundtrip (trivial)", ms=round((time.time() - t0) / 20 * 1000, 2))

# async-pipelined trivial dispatches (no intermediate sync)
t0 = time.time()
for _ in range(100):
    x = f(x)
jax.block_until_ready(x)
emit(label="async dispatch (trivial)", ms=round((time.time() - t0) / 100 * 1000, 3))

# chunked + queue engines at several sync periods
from volren_tpu.ops.megakernel import render_wavefront_chunked
from volren_tpu.ops.worklist import render_wavefront_queue

spp_base = [0]  # progressive: every run traces fresh samples


def run(fn, label, warm_first=True, **kw):
    if warm_first:
        out = fn(scene, params, cfg, RES, RES, 4, 990_000, **kw)  # warm program
        jax.block_until_ready(out)
    t0 = time.time()
    out = fn(scene, params, cfg, RES, RES, SPP, spp_base[0], **kw)
    jax.block_until_ready(out)
    dt = time.time() - t0
    spp_base[0] += SPP
    emit(label=label, spp_s=round(SPP / dt, 3), wall_s=round(dt, 2),
         mean=float(np.asarray(out[..., :3]).mean() / SPP))


warmed = False
for ce in (2, 8, 32):
    run(render_wavefront_chunked, f"chunked ce={ce}", warm_first=not warmed,
        check_every=ce)
    warmed = True
for ce in (2, 8, 32):
    run(render_wavefront_queue, f"queue_c2 ce={ce}", warm_first=(ce == 2),
        check_every=ce, csize=2)

# device engine: ONE dispatch, while_loop till drained. Scene/params are
# ARGUMENTS (closed-over device arrays bake in as program constants and
# latch the degraded runtime mode — NOTES round-2 finding 5).
from volren_tpu.ops.megakernel import init_state, _tile_loop
from functools import partial


@partial(jax.jit, static_argnames=())
def _tile_loop_entry(state, scene, params, spp, base):
    s, it = _tile_loop(state, scene, params, cfg, RES, spp, base, RES, 8)
    return s["accum"].reshape(RES, RES, 4), it


def run_device():
    state = init_state(RES, RES)
    t0 = time.time()
    out, it = _tile_loop_entry(state, scene, params, jnp.int32(SPP),
                               jnp.int32(spp_base[0]))
    jax.block_until_ready(out)
    dt = time.time() - t0
    spp_base[0] += SPP
    emit(label="device while_loop", spp_s=round(SPP / dt, 3), wall_s=round(dt, 2),
         iters=int(np.asarray(it)), mean=float(np.asarray(out[..., :3]).mean() / SPP))


t0 = time.time()
state = init_state(RES, RES)
out, it = _tile_loop_entry(state, scene, params, jnp.int32(4), jnp.int32(995_000))
jax.block_until_ready(out)
emit(label="device while_loop compile", s=round(time.time() - t0, 1))
run_device()
run_device()
