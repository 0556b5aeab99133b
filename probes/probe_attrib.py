"""Cost attribution for the device_queue wavefront step.

The measured per-step cost (~45 ns/lane/step, NOTES.md bisection) has
three candidate explanations that imply DIFFERENT optimizations:
  (a) scalarized gathers inside the while_loop (~11 ns/index) -> cut
      gather ops per step;
  (b) per-HLO-op runtime overhead (the "degraded mode") -> cut op count
      per step (shorter programs, more work per op);
  (c) real compute/bandwidth (onehot matmuls, state RW) -> roofline work.

This probe times stripped-down variants of the step inside the SAME
while_loop program shape as the production engine, all on the real smoke
scene, fixed iteration counts, state carried across calls so the runtime's
(program, inputs) result cache can never replay (inputs differ each call),
and every timing ends in a host PULL (NOTES.md trap 2).

Run ALONE (one TPU process at a time).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops import rng as _rng
from volren_tpu.ops.megakernel import (
    MODE_EXTEND,
    MODE_INACTIVE,
    MODE_SHADOW,
    EV_NONE,
    phase_march_body,
    step_body,
)
from volren_tpu.ops.worklist import init_queue_state, step_body_queue
from volren_tpu.ops.grid import lookup_majorant
from volren_tpu.ops.tracking import MIP_SPEED_UP

RES = int(os.environ.get("ATTRIB_RES", "256"))
ITERS = int(os.environ.get("ATTRIB_ITERS", "64"))
CALLS = int(os.environ.get("ATTRIB_CALLS", "6"))
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def emit(row):
    row["probe"] = "attrib"
    print(json.dumps(row), flush=True)
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "attrib.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def build_scene():
    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(
        Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr")
    )
    r.bounces = 100
    r.seed = int(time.time()) & 0x7FFFFFFF
    r.init(RES, RES)
    r.commit()
    return r, r._scene_device(), r._trace_params(), r._config()


def march_micro_noresolve(s, scene, params, cfg, k_march):
    """phase_march_body's microstep loop with the resolve REMOVED: pure
    onehot majorant fetch + DDA boundary math. Crossing lanes just redraw
    tau with a fresh uniform (keeps lanes marching forever — steady-state
    load, not a estimator)."""
    f32, i32 = jnp.float32, jnp.int32
    grid = scene.density
    s = dict(s)
    for _ in range(k_march):
        mode, event = s["mode"], s["event"]
        t, far, tau, mip = s["t"], s["far"], s["tau"], s["mip"]
        ipos0, idir, ri = s["ipos0"], s["idir"], s["ri"]
        march = ((mode == MODE_EXTEND) | (mode == MODE_SHADOW)) & (event == EV_NONE)
        curr = ipos0 + t[..., None] * idir
        mip_i = jnp.round(mip).astype(i32)
        maj = lookup_majorant(
            grid, curr, mip_i, params.density_scale, onehot=cfg.use_onehot
        )
        dim = (8 << mip_i).astype(f32)[..., None]
        offs = jnp.where(ri >= 0.0, dim + 0.5, -0.5)
        dt = ((jnp.floor(curr / dim) * dim + offs - curr) * ri).min(axis=-1)
        t_adv = t + dt
        tau_adv = tau - maj * dt
        crossed = march & (tau_adv <= 0.0)
        # wrap: loop rays back to t=near when they leave the box
        exited = march & (t_adv >= far)
        t = jnp.where(march, jnp.where(exited, 0.0, t_adv), t)
        seed, u = _rng.rng_masked(s["seed"], crossed)
        s["seed"] = seed
        tau = jnp.where(march, jnp.where(crossed, -jnp.log(1.0 - u), tau_adv), tau)
        mip = jnp.where(march, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip)
        s.update(t=t, tau=tau, mip=mip)
    return s


def make_variant(name, scene, params, cfg, width, fh, n_chunks, csize, spp,
                 k_march=8, unroll=4, test_every=2):
    """Returns a jitted fn(state, fb, cursor, spp_base, n_iters) ->
    (state, fb, cursor, token8). Same while_loop shape as the production
    _queue_device_jit, but runs EXACTLY n_iters iterations."""

    def body_full(s, fb, cur, spp_base, i):
        for j in range(unroll):
            alt = j % 2 == 1
            s, fb, cur = step_body_queue(
                s, fb, cur, scene, params, cfg, width, fh, n_chunks, csize,
                spp, spp_base, k_march, do_escape=alt, test_every=test_every,
                do_nee=alt,
            )
        return s, fb, cur

    def body_noenv(s, fb, cur, spp_base, i):
        for _ in range(unroll):
            s, fb, cur = step_body_queue(
                s, fb, cur, scene, params, cfg, width, fh, n_chunks, csize,
                spp, spp_base, k_march, do_escape=False, test_every=test_every,
                do_nee=False,
            )
        return s, fb, cur

    def body_march(s, fb, cur, spp_base, i):
        for _ in range(unroll):
            s = phase_march_body(s, scene, params, cfg, k_march,
                                 test_every=test_every)
        return s, fb, cur

    def body_march_nores(s, fb, cur, spp_base, i):
        for _ in range(unroll):
            s = march_micro_noresolve(s, scene, params, cfg, k_march)
        return s, fb, cur

    def body_trivial(s, fb, cur, spp_base, i):
        s = dict(s)
        for _ in range(unroll):
            s["t"] = s["t"] + 1.0
            s["tau"] = s["tau"] * 0.999 + 0.001
        return s, fb, cur

    body = {
        "full": body_full,
        "noenv": body_noenv,
        "march": body_march,
        "march_noresolve": body_march_nores,
        "trivial": body_trivial,
    }[name]

    @partial(jax.jit, static_argnames=())
    def run(state, fb, cursor, spp_base, n_iters):
        def cond(c):
            s, fb_, cur, it = c
            return it < n_iters

        def loop(c):
            s, fb_, cur, it = c
            s, fb_, cur = body(s, fb_, cur, spp_base, it)
            return s, fb_, cur, it + unroll

        state, fb, cursor, it = lax.while_loop(
            cond, loop, (state, fb, cursor, jnp.int32(0))
        )
        token = jnp.broadcast_to(
            (state["mode"] != MODE_INACTIVE).sum(dtype=jnp.int32), (8,)
        )
        return state, fb, cursor, token

    return run


def measure(name, lanes, scene, params, cfg, width, fh):
    csize, spp = 2, 8
    n_chunks = spp // csize
    n_items = width * width * n_chunks
    state = init_queue_state(lanes)
    # pre-activate lanes: one dequeue+regen step so march variants have
    # marching lanes (variants that skip regen would otherwise no-op)
    fb = jnp.zeros((n_items, 4), jnp.float32)
    cursor = jnp.zeros((8,), jnp.int32)
    warm = make_variant("full", scene, params, cfg, width, fh, n_chunks,
                        csize, spp, unroll=1)
    state, fb, cursor, _ = warm(state, fb, cursor, jnp.int32(0), jnp.int32(2))

    fn = make_variant(name, scene, params, cfg, width, fh, n_chunks, csize, spp)
    t0 = time.time()
    state, fb, cursor, tok = fn(state, fb, cursor, jnp.int32(0), jnp.int32(ITERS))
    np.asarray(tok)  # PULL
    compile_s = time.time() - t0

    t0 = time.time()
    done = 0
    for k in range(CALLS):
        state, fb, cursor, tok = fn(
            state, fb, cursor, jnp.int32(k + 1), jnp.int32(ITERS)
        )
        done += ITERS
        active = int(np.asarray(tok)[0])  # PULL every call (honest)
    dt = time.time() - t0
    ms_per_step = dt / done * 1e3
    emit({
        "variant": name, "lanes": lanes, "iters": done,
        "ms_per_step": round(ms_per_step, 4),
        "ns_per_lane_step": round(ms_per_step * 1e6 / lanes, 2),
        "active_at_end": active, "compile_s": round(compile_s, 1),
        "wall_s": round(dt, 2),
    })
    return ms_per_step


def main():
    r, scene, params, cfg = build_scene()
    width, fh = RES, jnp.asarray(RES, jnp.int32)
    emit({"mode": "setup", "res": RES, "engine_cfg": {
        "use_onehot": cfg.use_onehot, "backend": jax.default_backend()}})

    for name in ("trivial", "march_noresolve", "march", "noenv", "full"):
        measure(name, 16384, scene, params, cfg, width, fh)

    # marginal-vs-fixed split for the full step
    for lanes in (4096, 65536):
        measure("full", lanes, scene, params, cfg, width, fh)

    # exact-gather A/B (cfg change recompiles; answers "are the gathers
    # the wall or is the onehot matmul the wall?")
    import dataclasses

    cfg_exact = dataclasses.replace(cfg, use_onehot=False, env_nearest_nee=False)
    measure("march", 16384, scene, params, cfg_exact, width, fh)
    measure("full", 16384, scene, params, cfg_exact, width, fh)


if __name__ == "__main__":
    main()
