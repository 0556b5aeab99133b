"""Phase-level profiling of the wavefront engine on the real TPU.

Times each phase program at a given resolution on the smoke scene, counts
wavefront steps for a full render, and sweeps k_march / check_every.
Usage: python scripts/profile_phases.py [res] [spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volren_tpu.ops import megakernel as M
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 4
BOUNCES = int(os.environ.get("PROF_BOUNCES", "100"))


def build(res):
    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = BOUNCES
    r.init(res, res)
    r.commit()
    return r


def timeit(fn, n=30):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    r = build(RES)
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    w = h = RES
    spp = jnp.int32(SPP)
    spp_base = jnp.int32(0)

    state = M.init_state(w, h)
    # run a few steps so lane population is realistic (mixed modes)
    for _ in range(8):
        state = M.phase_regen(state, scene, params, cfg, w, spp, spp_base, h)
        state = M.phase_march(state, scene, params, cfg, 8)
        state = M.phase_nee(state, scene, params, cfg)
        state = M.phase_finish(state, scene, params, cfg)
    jax.block_until_ready(state["mode"])

    sm = dict(state)
    t_regen = timeit(lambda: M.phase_regen(sm, scene, params, cfg, w, spp, spp_base, h))
    t_nee = timeit(lambda: M.phase_nee(sm, scene, params, cfg))
    t_finish = timeit(lambda: M.phase_finish(sm, scene, params, cfg))
    for k in (1, 2, 4, 8, 16, 32):
        t_march = timeit(lambda: M.phase_march(sm, scene, params, cfg, k))
        print(f"march k={k:3d}: {t_march*1e3:8.3f} ms  ({t_march*1e3/k:6.3f} ms/microstep)")
    print(f"regen : {t_regen*1e3:8.3f} ms")
    print(f"nee   : {t_nee*1e3:8.3f} ms")
    print(f"finish: {t_finish*1e3:8.3f} ms")

    # full render: count steps
    for k_march in (4, 8, 16, 32):
        t0 = time.perf_counter()
        state = M.init_state(w, h)
        steps = 0
        while True:
            for _ in range(8):
                state = M.phase_regen(state, scene, params, cfg, w, spp, spp_base, h)
                state = M.phase_march(state, scene, params, cfg, k_march)
                state = M.phase_nee(state, scene, params, cfg)
                state = M.phase_finish(state, scene, params, cfg)
            steps += 8
            if not bool(M._any_active(state["mode"])):
                break
        dt = time.perf_counter() - t0
        print(
            f"render {RES}^2 x {SPP}spp k_march={k_march:3d}: {steps:5d} steps, "
            f"{dt:7.2f} s, {SPP/dt:7.3f} spp/s, {dt/steps*1e3:7.2f} ms/step"
        )


if __name__ == "__main__":
    main()
