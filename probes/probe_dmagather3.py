"""Isolate the 47 us 'diagonly' cost of probe_dmagather2: which half of
the within-landing-buffer selection is slow — the loop, the gather, or
the masked reduce? And can the selection be skipped entirely by landing
each demanded WORD directly via 4-byte DMAs?

Variants (512 rounds):
  loop        empty body (acc + ids) — pure fori overhead
  load        land[:] materialize only (acc + lv[0:1])
  gather      take_along_axis only, no reduce
  reduce      masked reduce only (fixed G)
  diag        the full diagonal fetch (reproduce ~47us)
  hoist       land[:] hoisted out of the loop, diag inside
  word4       128 x 4-byte DMAs landing tab[row, col] directly into the
              (1,128) result row — NO selection pass at all
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
                   "dmagather3.jsonl")
ROWS = 65536
ROUNDS = 512


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "dmagather3")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def make_fn(variant):
    def kernel(idx_ref, tab_ref, out_ref, land, stage, smem, sem_i,
               sem_r):
        base = idx_ref[:]
        iota_n = jax.lax.broadcasted_iota(i32, (128, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (128, 128), 1)
        hit = iota_n == lane
        lv0 = land[:]

        def body(k, acc):
            ids = (base + k * 7919) & 0xFFFF
            col = ids & 127
            if variant == "loop":
                return acc + ids
            if variant == "load":
                lv = land[:]
                return acc + lv[0:1]
            if variant == "gather":
                lv = land[:]
                G = jnp.take_along_axis(
                    lv, jnp.broadcast_to(col, (128, 128)), axis=1)
                return acc + G[0:1]
            if variant == "reduce":
                return acc + jnp.sum(jnp.where(hit, lv0, 0), axis=0,
                                     keepdims=True)
            if variant in ("diag", "hoist"):
                lv = lv0 if variant == "hoist" else land[:]
                G = jnp.take_along_axis(
                    lv, jnp.broadcast_to(col, (128, 128)), axis=1)
                return acc + jnp.sum(jnp.where(hit, G, 0), axis=0,
                                     keepdims=True)
            if variant == "word4":
                stage[:] = ids
                cp = pltpu.make_async_copy(stage, smem, sem_i)
                cp.start()
                cp.wait()

                def issue(i, c):
                    row = smem[0, i]
                    colw = row & 127
                    pltpu.make_async_copy(
                        tab_ref.at[pl.ds(row, 1), pl.ds(colw, 1)],
                        stage.at[pl.ds(0, 1), pl.ds(i, 1)],
                        sem_r).start()
                    return c

                lax.fori_loop(0, 128, issue, 0)

                def drain(i, c):
                    pltpu.make_async_copy(
                        tab_ref.at[pl.ds(0, 1), pl.ds(0, 1)],
                        stage.at[pl.ds(0, 1), pl.ds(0, 1)],
                        sem_r).wait()
                    return c

                lax.fori_loop(0, 128, drain, 0)
                return acc + stage[:]
            raise ValueError(variant)

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
    tab_np = rng.integers(0, 2**31 - 1, (ROWS, 128), dtype=np.int32)
    tab = jnp.asarray(tab_np)
    idx = jnp.asarray(rng.integers(0, ROWS, (1, 128), dtype=np.int32))
    for variant in ("loop", "load", "gather", "reduce", "hoist", "diag",
                    "word4"):
        try:
            fn = make_fn(variant)
            t0 = time.time()
            out = np.asarray(fn(idx, tab))
            cold = time.time() - t0
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = np.asarray(fn(idx, tab))
            warm = (time.time() - t0) / reps
            rec = {"tag": variant, "ok": True, "cold_s": round(cold, 1),
                   "us_per_round": round(warm / ROUNDS * 1e6, 2)}
            if variant == "word4":
                # correctness: last round's words must match the table
                base = np.asarray(idx)[0]
                acc = np.zeros(128, np.int64)
                for k in range(ROUNDS):
                    ids = (base + k * 7919) & 0xFFFF
                    acc += tab_np[ids, ids & 127]
                rec["bitwise"] = bool(
                    ((acc & 0xFFFFFFFF) == (
                        out[0].astype(np.int64) & 0xFFFFFFFF)).all())
            emit(rec)
        except Exception as e:
            emit({"tag": variant, "ok": False,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
