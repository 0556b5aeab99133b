"""Bisect the on-device step cost: lax.scan over each REAL phase body
separately on the smoke scene, plus the combined step_body."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from volren_tpu.ops import megakernel as M
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 32

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.init(RES, RES)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
w = h = RES
spp, spp_base = jnp.int32(4), jnp.int32(0)

state = M.init_state(w, h)
for _ in range(8):
    state = M.phase_regen(state, scene, params, cfg, w, spp, spp_base, h)
    state = M.phase_march(state, scene, params, cfg, 8)
    state = M.phase_nee(state, scene, params, cfg)
    state = M.phase_finish(state, scene, params, cfg)
jax.block_until_ready(state["mode"])


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def scanner(body):
    @jax.jit
    def run(state, scene, params):
        def b(s, _):
            return body(s, scene, params), None

        s, _ = lax.scan(b, state, None, length=K)
        return s["t"]

    return lambda: run(state, scene, params)


cases = [
    ("regen ", lambda s, sc, p: M.phase_regen_body(s, sc, p, cfg, w, spp, spp_base, h)),
    ("march1", lambda s, sc, p: M.phase_march_body(s, sc, p, cfg, 1)),
    ("march4", lambda s, sc, p: M.phase_march_body(s, sc, p, cfg, 4)),
    ("nee   ", lambda s, sc, p: M.phase_nee_body(s, sc, p, cfg)),
    ("finish", lambda s, sc, p: M.phase_finish_body(s, sc, p, cfg)),
    ("step  ", lambda s, sc, p: M.step_body(s, sc, p, cfg, w, spp, spp_base, h, 1)),
]
print(f"{RES}^2 lanes, scan K={K}")
for name, body in cases:
    t = timeit(scanner(body))
    print(f"{name}: {t/K*1e3:8.3f} ms/iter")
