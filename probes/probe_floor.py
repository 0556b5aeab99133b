"""Is the ~2.3 ms/while-iteration fixed floor per-ARRAY or per-ITERATION?

attrib.jsonl showed a trivial while_loop body over the full ~25-array
lane state costs 0.57 ms/step at unroll 4 (~60-90x its memory bound,
docs/ROOFLINE.md §3). If the floor scales with the number of carried
buffers (per-buffer bookkeeping in the tunneled runtime), packing the
state dict into a few wide arrays is the next big lever; if it scales
with bytes or is flat, packing buys nothing.

Matrix: n_arrays x unroll at fixed total bytes (16k lanes x 128 B),
trivial body (x = x + 1 on every array), drain loop with a host pull.
Run ALONE.
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
from jax import lax

LANES = int(os.environ.get("FLOOR_LANES", "16384"))
ITERS = int(os.environ.get("FLOOR_ITERS", "256"))
TOTAL_COLS = 32  # 32 f32 columns = 128 B/lane, ~ the real lane state


@partial(jax.jit, static_argnames=("n_arrays", "unroll", "iters"))
def run_loop(arrays, n_arrays, unroll, iters):
    def cond(c):
        return c[-1] < iters

    def body(c):
        *arrs, it = c
        for _ in range(unroll):
            arrs = [a + 1.0 for a in arrs]
        return (*arrs, it + unroll)

    out = lax.while_loop(cond, body, (*arrays, jnp.int32(0)))
    return [a.sum() for a in out[:-1]]


def measure(n_arrays, unroll):
    cols = TOTAL_COLS // n_arrays
    arrays = [
        jnp.zeros((LANES, cols) if cols > 1 else (LANES,), jnp.float32)
        + float(i)
        for i in range(n_arrays)
    ]
    t0 = time.time()
    out = run_loop(arrays, n_arrays, unroll, ITERS)
    np.asarray(out[0])
    compile_s = time.time() - t0
    t0 = time.time()
    out = run_loop([a + 0.5 for a in arrays], n_arrays, unroll, ITERS)
    vals = [np.asarray(o) for o in out]  # host pull forces completion
    dt = time.time() - t0
    print(json.dumps({
        "probe": "floor", "n_arrays": n_arrays, "unroll": unroll,
        "lanes": LANES, "iters": ITERS,
        "ms_per_step": round(dt / ITERS * 1e3, 4),
        "ms_per_iter": round(dt / (ITERS / unroll) * 1e3, 4),
        "compile_s": round(compile_s, 1), "check": float(vals[0]),
    }), flush=True)


@partial(jax.jit, static_argnames=("depth", "unroll", "iters"))
def run_chain(x, depth, unroll, iters):
    """One wide (n, 32) array, `depth` DEPENDENT adds per step: XLA fuses
    the chain into one kernel, so if cost ~ flat in depth the unit of
    overhead is the KERNEL, not the HLO op."""
    def cond(c):
        return c[1] < iters

    def body(c):
        x, it = c
        for _ in range(unroll):
            for _ in range(depth):
                x = x + 1.0
        return x, it + unroll

    x, _ = lax.while_loop(cond, body, (x, jnp.int32(0)))
    return x.sum()


def measure_chain(depth, unroll, lanes):
    x = jnp.zeros((lanes, TOTAL_COLS), jnp.float32)
    t0 = time.time()
    np.asarray(run_chain(x, depth, unroll, ITERS))
    compile_s = time.time() - t0
    t0 = time.time()
    v = np.asarray(run_chain(x + 0.5, depth, unroll, ITERS))
    dt = time.time() - t0
    print(json.dumps({
        "probe": "floor", "variant": "chain", "depth": depth,
        "unroll": unroll, "lanes": lanes, "iters": ITERS,
        "ms_per_step": round(dt / ITERS * 1e3, 4),
        "compile_s": round(compile_s, 1), "check": float(v),
    }), flush=True)


if __name__ == "__main__":
    which = os.environ.get("FLOOR_WHICH", "arrays")
    if which == "arrays":
        for n_arrays in (1, 4, 16, 32):
            for unroll in (4, 16):
                measure(n_arrays, unroll)
    elif which == "chain":
        # fusion-depth and lane-scaling matrix
        for depth in (1, 8, 32):
            measure_chain(depth, 4, LANES)
        for lanes in (4096, 65536):
            measure_chain(8, 4, lanes)
