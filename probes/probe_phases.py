"""Per-phase TPU cost bisection at wavefront scale (65k lanes).

Times each jitted phase program of the wavefront step in isolation, plus
the gather/selector microbenchmarks that model them. Goal: attribute the
measured ~5 ms/step marginal cost (NOTES.md round-2 bisection) to specific
ops so the next optimization is aimed, not guessed. Run ALONE (one TPU
process). Prints one JSON line per measurement.
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


N = int(os.environ.get("PROBE_LANES", str(256 * 256)))
REPS = int(os.environ.get("PROBE_REPS", "20"))


def timeit(label, fn, *args, **extra):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / REPS * 1000.0
    print(
        json.dumps({"probe": "phases", "label": label, "ms_per_call": round(ms, 4),
                    "compile_s": round(compile_s, 1), "lanes": N, **extra}),
        flush=True,
    )
    return ms


def main():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume
    from volren_tpu.ops import megakernel as M
    from volren_tpu.ops.gather import onehot_gather, vgather

    side = int(np.sqrt(N))
    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = 100
    r.init(side, side)
    r.commit()
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    w = h = side

    # warm state: run a few steps so event populations are realistic
    state = M.init_state(w, h)
    spp = jnp.asarray(8, jnp.int32)
    zero = jnp.asarray(0, jnp.int32)
    for _ in range(6):
        state = M.step_body(state, scene, params, cfg, w, spp, zero, h, 8,
                            test_every=2)
    jax.block_until_ready(state["mode"])

    # individual phases (the host-engine programs)
    timeit("phase_regen", lambda s: M.phase_regen(s, scene, params, cfg, w, spp, zero, h), state)
    for k_march, te in ((1, 1), (8, 2), (8, 8)):
        timeit(f"phase_march k={k_march} te={te}",
               lambda s, km=k_march, t=te: M.phase_march(s, scene, params, cfg, km, t),
               state, k_march=k_march, test_every=te)
    timeit("phase_nee", lambda s: M.phase_nee(s, scene, params, cfg), state)
    timeit("phase_finish", lambda s: M.phase_finish(s, scene, params, cfg), state)

    # megastep at several unrolls (the production program)
    for unroll in (1, 4, 32):
        ms = timeit(
            f"megastep unroll={unroll}",
            lambda s, u=unroll: M._megastep_jit(
                s, scene, params, cfg, w, spp, zero, h, 8, u, 2
            ),
            state,
            unroll=unroll,
        )
        print(json.dumps({"probe": "phases", "label": f"megastep per-step u={unroll}",
                          "ms_per_step": round(ms / unroll, 3)}), flush=True)

    # microbenchmarks: the cost-model primitives
    idx = jnp.asarray(np.random.default_rng(0).integers(0, scene.density.mip_maj.shape[0], N), jnp.int32)
    tbl = scene.density.mip_maj
    timeit("vgather Nx1", jax.jit(lambda t, i: vgather(t, i)), tbl, idx)
    timeit("onehot_gather N", jax.jit(lambda t, i: onehot_gather(t, i)), scene.density.mip_maj_oh, idx)
    k = N // 8
    idx_k = idx[:k]
    timeit("vgather (N/8)x1", jax.jit(lambda t, i: vgather(t, i)), tbl, idx_k)

    mask = jnp.asarray(np.random.default_rng(1).random(N) < 0.02)
    from jax import lax

    timeit("top_k N->N/8", jax.jit(lambda m: lax.top_k(m.astype(jnp.int32), N // 8)[1]), mask)

    from volren_tpu.ops.compact import _select_block

    timeit("block_select N->N/8", jax.jit(lambda m: _select_block(m, N // 8)), mask)

    # trivial floor references
    arrs = [jnp.ones((N,), jnp.float32) * i for i in range(25)]
    timeit("trivial 25-array elementwise", jax.jit(lambda *a: [x * 1.0001 + 0.1 for x in a]), *arrs)


main()
