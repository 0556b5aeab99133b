"""TRUE per-round cost of the DMA row-gather via DELTA timing.

probe_dmagather1-3 divided one call's wall time by 512 rounds — but an
EMPTY 512-round loop measures the same ~50 us/round, i.e. those probes
measured the ~25-35 ms per-call dispatch latch of this runtime, not the
loop body. Here every variant runs at TWO round counts and reports
  (T(R2) - T(R1)) / (R2 - R1)
which cancels the per-call cost exactly.

Variants: loop (empty), diag (landing-buffer pick), dma128 (stage+SMEM
+ 128 row DMAs + per-copy waits, no selection), dma128big (single
whole-buffer wait), full (dma128 + diag) — the real serve-round shape.
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
                   "dmagather4.jsonl")
ROWS = 65536
R1 = int(os.environ.get("PROBE_R1", "2048"))
R2 = int(os.environ.get("PROBE_R2", "32768"))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "dmagather4")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def make_fn(variant, rounds):
    def kernel(idx_ref, tab_ref, out_ref, land, stage, smem, sem_i,
               sem_r):
        base = idx_ref[:]
        iota_n = jax.lax.broadcasted_iota(i32, (128, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (128, 128), 1)
        hit = iota_n == lane

        def dma128(ids, bigwait):
            stage[:] = ids
            cp = pltpu.make_async_copy(stage, smem, sem_i)
            cp.start()
            cp.wait()

            def issue(i, c):
                row = smem[0, i]
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(row, 1), :],
                    land.at[pl.ds(i, 1), :], sem_r).start()
                return c

            lax.fori_loop(0, 128, issue, 0)
            if bigwait:
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(0, 128), :], land, sem_r).wait()
            else:
                def drain(i, c):
                    pltpu.make_async_copy(
                        tab_ref.at[pl.ds(0, 1), :],
                        land.at[pl.ds(0, 1), :], sem_r).wait()
                    return c

                lax.fori_loop(0, 128, drain, 0)

        def diag(col):
            lv = land[:]
            G = jnp.take_along_axis(
                lv, jnp.broadcast_to(col, (128, 128)), axis=1)
            return jnp.sum(jnp.where(hit, G, 0), axis=0, keepdims=True)

        def body(k, acc):
            ids = (base + k * 7919) & 0xFFFF
            if variant == "loop":
                return acc + ids
            if variant == "diag":
                return acc + diag(ids & 127)
            if variant == "dma128":
                dma128(ids, False)
                return acc + ids
            if variant == "dma128big":
                dma128(ids, True)
                return acc + ids
            if variant == "full":
                dma128(ids, False)
                return acc + diag(ids & 127)
            raise ValueError(variant)

        out_ref[:] = lax.fori_loop(0, rounds, body,
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
    emit({"mode": "env", "rows": ROWS, "r1": R1, "r2": R2,
          "backend": jax.default_backend()})
    rng = np.random.default_rng(7)
    tab = jnp.asarray(
        rng.integers(0, 2**31 - 1, (ROWS, 128), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, ROWS, (1, 128), dtype=np.int32))
    for variant in ("loop", "diag", "dma128", "dma128big", "full"):
        try:
            times = {}
            for rounds in (R1, R2):
                fn = make_fn(variant, rounds)
                np.asarray(fn(idx, tab))       # compile + warm
                reps = 3
                t0 = time.time()
                for _ in range(reps):
                    np.asarray(fn(idx, tab))
                times[rounds] = (time.time() - t0) / reps
            delta = (times[R2] - times[R1]) / (R2 - R1)
            emit({"tag": variant, "ok": True,
                  "t_r1_ms": round(times[R1] * 1e3, 2),
                  "t_r2_ms": round(times[R2] * 1e3, 2),
                  "us_per_round": round(delta * 1e6, 3)})
        except Exception as e:
            emit({"tag": variant, "ok": False,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
