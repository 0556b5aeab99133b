"""Bisect the flat ~51 us/round fixed cost of the DMA row-gather
(probe_dmagather: cost is independent of DMA count 32 vs 128, so the
per-DMA path is NOT the bottleneck — find what is).

Variants (all 512 rounds, serial accumulator):
  full        the probe_dmagather smem_n128 shape (reproduce)
  nostage     indices from fori index (no stage DMA, no SMEM read)
  bigwait     128 issues, ONE whole-buffer wait
  dma8        8 DMAs only + their waits
  stageonly   stage DMA + SMEM roundtrip + diag fetch, ZERO row DMAs
  diagonly    diag fetch on the stale landing buffer only
  unroll8     issue/drain fori_loops with unroll=8
  nomod       full but indices masked (& 0xFFFF) instead of % ROWS
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

i32 = jnp.int32

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "dmagather2.jsonl")
ROWS = 65536
ROUNDS = 512


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "dmagather2")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _diag(landv, col):
    n = landv.shape[0]
    iota_n = jax.lax.broadcasted_iota(i32, (n, 128), 0)
    lane = jax.lax.broadcasted_iota(i32, (n, 128), 1)
    G = jnp.take_along_axis(landv, jnp.broadcast_to(col, (n, 128)), axis=1)
    return jnp.sum(jnp.where(iota_n == lane, G, 0), axis=0, keepdims=True)


def make_fn(variant):
    stage_dma = variant in ("full", "stageonly", "nomod", "unroll8",
                            "bigwait", "dma8")
    n_dma = {"dma8": 8}.get(variant, 0 if variant in ("stageonly",
                                                      "diagonly") else 128)
    unroll = 8 if variant == "unroll8" else 1

    def kernel(idx_ref, tab_ref, out_ref, land, stage, smem, sem_i,
               sem_r):
        base = idx_ref[:]

        def body(k, acc):
            if variant == "nomod":
                ids = (base + k * 7919) & 0xFFFF
            else:
                ids = (base + k * 7919) % ROWS
            if stage_dma:
                stage[:] = ids
                cp = pltpu.make_async_copy(stage, smem, sem_i)
                cp.start()
                cp.wait()

            if n_dma:
                def issue(i, c):
                    if variant == "nostage":
                        row = (i * 523) % ROWS
                    else:
                        row = smem[0, i]
                    pltpu.make_async_copy(
                        tab_ref.at[pl.ds(row, 1), :],
                        land.at[pl.ds(i, 1), :], sem_r).start()
                    return c

                lax.fori_loop(0, n_dma, issue, 0, unroll=unroll)

                if variant == "bigwait":
                    pltpu.make_async_copy(
                        tab_ref.at[pl.ds(0, n_dma), :],
                        land.at[pl.ds(0, n_dma), :], sem_r).wait()
                else:
                    def drain(i, c):
                        pltpu.make_async_copy(
                            tab_ref.at[pl.ds(0, 1), :],
                            land.at[pl.ds(0, 1), :], sem_r).wait()
                        return c

                    lax.fori_loop(0, n_dma, drain, 0, unroll=unroll)
            lv = land[:]
            return acc + _diag(lv, ids & 127)

        out_ref[:] = lax.fori_loop(0, ROUNDS, body,
                                   jnp.zeros((1, 128), i32))

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((1, 128), i32),
        out_specs=pl.BlockSpec((1, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((128, 128), i32),
            pltpu.VMEM((1, 128), i32),
            pltpu.SMEM((1, 128), i32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    emit({"mode": "env", "rows": ROWS, "rounds": ROUNDS,
          "backend": jax.default_backend()})
    rng = np.random.default_rng(7)
    tab = jnp.asarray(
        rng.integers(0, 2**31 - 1, (ROWS, 128), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, ROWS, (1, 128), dtype=np.int32))
    for variant in ("diagonly", "stageonly", "nostage", "bigwait",
                    "dma8", "unroll8", "nomod", "full"):
        try:
            fn = make_fn(variant)
            t0 = time.time()
            np.asarray(fn(idx, tab))
            cold = time.time() - t0
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                np.asarray(fn(idx, tab))
            warm = (time.time() - t0) / reps
            emit({"tag": variant, "ok": True, "cold_s": round(cold, 1),
                  "us_per_round": round(warm / ROUNDS * 1e6, 2)})
        except Exception as e:
            emit({"tag": variant, "ok": False,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
