"""True per-call execution cost model (result-cache-proof).

The runtime memoizes (program, inputs) -> outputs server-side, so timing
REPEATED calls on identical inputs (probe_phases round 3) measures the
CACHE, not the device (0.88 ms vs the real ~127 ms for megastep u=32).
Every measurement here chains call N's inputs from call N-1's outputs:
async-dispatched, one block at the end, so it measures pure execution.

Questions: what does a step cost as a function of (a) lane count,
(b) scalar-gather count, (c) onehot-gather count; and where does the
megastep's ~4 ms/step actually go. Run ALONE. JSON lines to stdout.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


N = int(os.environ.get("PROBE_LANES", str(256 * 256)))
CHAIN = int(os.environ.get("PROBE_CHAIN", "10"))


def emit(**kw):
    print(json.dumps({"probe": "cost", **kw}), flush=True)


def timeit_chained(label, fn, state, **extra):
    """fn: state -> state (pytree). Chains CHAIN calls, blocks once."""
    state = fn(state)  # warm/compile
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(CHAIN):
        state = fn(state)
    jax.block_until_ready(state)
    ms = (time.time() - t0) / CHAIN * 1000.0
    emit(label=label, ms_per_call=round(ms, 3), lanes=N, **extra)
    return ms


# ---- trivial elementwise, 25 arrays (state-shaped floor) ----
arrs = tuple(jnp.full((N,), 1.0 + i * 0.01, jnp.float32) for i in range(25))
f_triv = jax.jit(lambda a: tuple(x * 1.0001 + 1e-7 for x in a))
timeit_chained("trivial 25xN elementwise", f_triv, arrs)

# ---- pure scalar-gather programs: G gathers/call, indices evolve ----
from volren_tpu.ops.gather import onehot_gather, pack_onehot_table, vgather

T = 4096
table = jnp.asarray(np.random.default_rng(0).random(T), jnp.float32)
table_oh = pack_onehot_table(np.asarray(table))


def make_gather(g, kind):
    @jax.jit
    def step(c):
        idx, acc, tbl = c
        for _ in range(g):
            if kind == "vgather":
                v = vgather(tbl, idx)
            else:
                v = onehot_gather(tbl, idx)
            acc = acc + v
            idx = (idx * 1103515245 + 12345) % T
        return idx, acc, tbl

    return step


idx0 = jnp.asarray(np.random.default_rng(1).integers(0, T, N), jnp.int32)
acc0 = jnp.zeros((N,), jnp.float32)
for g in (1, 4, 16):
    timeit_chained(f"vgather x{g}", make_gather(g, "vgather"),
                   (idx0, acc0, table), gathers=g)
for g in (1, 4, 16):
    timeit_chained(f"onehot x{g}", make_gather(g, "onehot"),
                   (idx0, acc0, table_oh), gathers=g)

# ---- the real phases, state chained ----
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops import megakernel as M

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
spp = jnp.asarray(1_000_000, jnp.int32)  # lanes regen forever: steady load
zero = jnp.asarray(0, jnp.int32)

state0 = M.init_state(w, h)
for _ in range(6):
    state0 = M.step_body(state0, scene, params, cfg, w, spp, zero, h, 8,
                         test_every=2)
jax.block_until_ready(state0["mode"])

# scene/params/spp ride as ARGUMENTS (closed-over device arrays bake into
# the program as constants — the round-2 degrade-latch, finding 5)
_j_regen = jax.jit(lambda s, sc, pr, sp, z: M.phase_regen_body(s, sc, pr, cfg, w, sp, z, h))
_j_march = jax.jit(lambda s, sc, pr: M.phase_march(s, sc, pr, cfg, 8, 2))
_j_nee = jax.jit(lambda s, sc, pr: M.phase_nee_body(s, sc, pr, cfg))
_j_fin = jax.jit(lambda s, sc, pr: M.phase_finish_body(s, sc, pr, cfg))
timeit_chained("phase_regen", lambda s: _j_regen(s, scene, params, spp, zero), dict(state0))
timeit_chained("phase_march k=8 te=2", lambda s: _j_march(s, scene, params), dict(state0))
timeit_chained("phase_nee", lambda s: _j_nee(s, scene, params), dict(state0))
timeit_chained("phase_finish", lambda s: _j_fin(s, scene, params), dict(state0))

_j_step = jax.jit(lambda s, sc, pr, sp, z: M.step_body(s, sc, pr, cfg, w, sp, z,
                                                       h, 8, test_every=2))
timeit_chained("step_body (1 step)",
               lambda s: _j_step(s, scene, params, spp, zero), dict(state0))

ms = timeit_chained(
    "megastep u=32",
    lambda s: M._megastep_jit(s, scene, params, cfg, w, spp, zero, h, 8, 32, 2)[0],
    dict(state0),
)
emit(label="megastep per-step u=32", ms_per_step=round(ms / 32, 3))

# onehot off (pure scalar-gather march)
cfg_sc = cfg._replace(use_onehot=False, env_nearest_nee=False)
ms = timeit_chained(
    "megastep u=32 scalar-gather",
    lambda s: M._megastep_jit(s, scene, params, cfg_sc, w, spp, zero, h, 8, 32, 2)[0],
    dict(state0),
)
emit(label="megastep per-step u=32 scalar", ms_per_step=round(ms / 32, 3))
