"""Isolate compact_apply's own cost (cache-proof, chained inputs).

The end-to-end compaction sweep (probe_compact) measured 9x SLOWDOWN at
divisor 8 — either deferral step explosion or the compact machinery.
Times: block/topk selection alone, row gather by k indices vs width,
row scatter, and full compact_apply round trips. JSON lines to stdout.
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
from jax import lax

if jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from volren_tpu.ops.compact import _select_block, compact_apply, pack_cols
from volren_tpu.ops.gather import vgather, vscatter_rows

N = 65536
CHAIN = 10


def emit(**kw):
    print(json.dumps({"probe": "compact_iso", **kw}), flush=True)


def timeit_chained(label, fn, state, **extra):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(CHAIN):
        state = fn(state)
    jax.block_until_ready(state)
    ms = (time.time() - t0) / CHAIN * 1000.0
    emit(label=label, ms_per_call=round(ms, 3), **extra)
    return ms


rng = np.random.default_rng(0)
mask0 = jnp.asarray(rng.random(N) < 0.05)
vals0 = jnp.asarray(rng.random((N, 8)).astype(np.float32))

for k in (2048, 8192):
    # selection alone (mask evolves via a cheap roll)
    @jax.jit
    def sel_only(c, k=k):
        m, salt = c
        sel, picked = _select_block(m, k)
        m2 = jnp.roll(m, 1) ^ (sel.sum() % 2 == 0)
        return m2, salt + sel.sum()

    timeit_chained(f"select_block k={k}", sel_only, (mask0, jnp.int32(0)), k=k)

    # row gather: k indices x W cols, indices evolve
    for W in (1, 8, 16):
        tbl = vals0[:, :W] if W <= 8 else jnp.concatenate([vals0, vals0], -1)

        @jax.jit
        def g_only(c, k=k, W=W):
            t, idx = c
            rows = vgather(t, idx)
            t = t + 1e-12
            return t, (idx + 7) % N

        idx0 = jnp.asarray(rng.integers(0, N, k), jnp.int32)
        timeit_chained(f"row gather k={k} W={W}", g_only, (tbl, idx0), k=k, w=W)

    # row scatter
    for W in (1, 8):
        base0 = jnp.zeros((N, W), jnp.float32)
        rows0 = jnp.asarray(rng.random((k, W)).astype(np.float32))

        @jax.jit
        def s_only(c, k=k, W=W):
            base, rows, idx = c
            out = vscatter_rows(base, idx, rows)
            return out * 1e-9, rows + 1e-12, (idx + 13) % N

        # unique indices: strided
        idx0 = (jnp.arange(k, dtype=jnp.int32) * (N // k))
        timeit_chained(f"row scatter k={k} W={W}", s_only, (base0, rows0, idx0), k=k, w=W)

    # full compact_apply (block + topk)
    for selector in ("block", "topk"):
        @jax.jit
        def ca(c, k=k, selector=selector):
            m, iv = c
            def fn(rows, mm):
                return pack_cols(rows[..., 0] * 2.0, rows.sum(-1), mm)
            out = compact_apply(m, iv, fn, k, selector)
            m2 = jnp.roll(m, 3)
            return m2, iv + out[:, :1] * 1e-9

        timeit_chained(f"compact_apply {selector} k={k} W=8", ca, (mask0, vals0),
                       k=k, selector=selector)

# the decisive check: does ADDING compaction to the megastep latch a
# program-wide slow mode (pieces above are all <0.4 ms but the end-to-end
# compacted render lost 9x at EVERY budget)?
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops import megakernel as M
from volren_tpu.ops.compact import budget

side = 256
r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.init(side, side)
r.commit()
scene, params, cfg0 = r._scene_device(), r._trace_params(), r._config()
spp = jnp.asarray(1_000_000, jnp.int32)
zero = jnp.asarray(0, jnp.int32)

state0 = M.init_state(side, side)
for _ in range(6):
    state0 = M.step_body(state0, scene, params, cfg0, side, spp, zero, side, 8,
                         test_every=2)
jax.block_until_ready(state0["mode"])

n = side * side
for label, cfg in [
    ("megastep u=32 compact=off", cfg0),
    ("megastep u=32 compact=8 block", cfg0._replace(
        compact_resolve=budget(n, 8), compact_nee=budget(n, 8),
        compact_escape=budget(n, 8))),
    ("megastep u=32 compact=8 topk", cfg0._replace(
        compact_resolve=budget(n, 8), compact_nee=budget(n, 8),
        compact_escape=budget(n, 8), compact_selector="topk")),
    ("megastep u=32 compact=resolve-only", cfg0._replace(
        compact_resolve=budget(n, 8))),
    ("megastep u=32 compact=nee-only", cfg0._replace(
        compact_nee=budget(n, 8))),
    ("megastep u=32 compact=escape-only", cfg0._replace(
        compact_escape=budget(n, 8))),
]:
    ms = timeit_chained(
        label,
        lambda s, c=cfg: M._megastep_jit(s, scene, params, c, side, spp, zero,
                                         side, 8, 32, 2)[0],
        dict(state0),
    )
    emit(label=label + " per-step", ms_per_step=round(ms / 32, 3))
