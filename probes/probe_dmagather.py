"""Feasibility + cost of an in-kernel DMA ROW-GATHER from an HBM table.

The round-5 task is to break the pallas engine's VMEM atlas gate
(pack.supports_scene: <= 12288 slots) so the kernel can run the dense
-cloud north-star scene (VERDICT round-4 #1). Design under test: keep
the atlas in HBM (memory_space=ANY) and, per resolve serve round, fetch
the <= 128 demanded brick rows by issuing one 512 B DMA per compacted
rank into a (128, 128) VMEM landing buffer, then pick each lane's word
with the existing diagonal scan. The open questions only real TPU can
answer (Mosaic support + cost):

  Q1 does a dynamic-index DMA (`tab.at[pl.ds(row, 1)]`, row from SMEM)
     inside fori-inside-while lower and run correctly?
  Q2 what does one 128-row gather round cost (us) — vs the ~17 us
     VMEM-scan resolve fetch it would replace?
  Q3 scalarization: SMEM staging DMA vs 128 masked vector reduces?
  Q4 how does cost scale with rows-per-round (32 vs 128)?

Stages emit JSONL to results/dmagather.jsonl.
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
f32 = jnp.float32

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "dmagather.jsonl")
ROWS = int(os.environ.get("PROBE_ROWS", "65536"))   # 32 MB HBM table
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "512"))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "dmagather")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _diag_fetch(landv, col):
    """out[0,j] = landv[j, col[0,j]] via take_along_axis + masked reduce
    (the kernel's _scan_rows_block shape)."""
    n = landv.shape[0]
    iota_n = jax.lax.broadcasted_iota(i32, (n, 128), 0)
    lane = jax.lax.broadcasted_iota(i32, (n, 128), 1)
    cb = jnp.broadcast_to(col, (n, 128))
    G = jnp.take_along_axis(landv, cb, axis=1)
    hit = iota_n == lane
    return jnp.sum(jnp.where(hit, G, 0), axis=0, keepdims=True)


def make_fn(n_dma, scalarize, rounds):
    """pallas fn: idx (1,128) i32, tab (ROWS,128) i32 HBM -> (1,128) i32
    checksum after `rounds` gather rounds (indices rotate per round so
    the work is not cacheable)."""

    def kernel(idx_ref, tab_ref, out_ref, land, stage, idx_smem,
               sem_i, sem_r):
        base = idx_ref[:]

        def body(k, acc):
            ids = (base + k * 7919) % ROWS
            if scalarize == "smem":
                stage[:] = ids
                cp = pltpu.make_async_copy(stage, idx_smem, sem_i)
                cp.start()
                cp.wait()

            lane = jax.lax.broadcasted_iota(i32, (1, 128), 1)

            def issue(i, c):
                if scalarize == "smem":
                    row = idx_smem[0, i]
                else:
                    row = jnp.sum(jnp.where(lane == i, ids, 0))
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(row, 1), :],
                    land.at[pl.ds(i, 1), :], sem_r).start()
                return c

            lax.fori_loop(0, n_dma, issue, 0)

            def drain(i, c):
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(0, 1), :],
                    land.at[pl.ds(i, 1), :], sem_r).wait()
                return c

            lax.fori_loop(0, n_dma, drain, 0)
            landv = land[:]
            col = ids & 127
            v = _diag_fetch(landv[:n_dma], col)
            return acc + v

        out_ref[:] = lax.fori_loop(0, rounds, body,
                                   jnp.zeros((1, 128), i32))

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
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


def ref_checksum(idx, tab, n_dma, rounds):
    acc = np.zeros((1, 128), np.int64)
    base = np.asarray(idx)[0]
    for k in range(rounds):
        ids = (base + k * 7919) % ROWS
        col = ids & 127
        v = np.zeros(128, np.int64)
        v[:n_dma] = tab[ids[:n_dma], col[:n_dma]]
        acc[0] += v
    return (acc & 0xFFFFFFFF).astype(np.uint32).astype(np.int64)


def main():
    emit({"mode": "env", "rows": ROWS, "rounds": ROUNDS,
          "backend": jax.default_backend()})
    rng = np.random.default_rng(7)
    tab = rng.integers(0, 2**31 - 1, (ROWS, 128), dtype=np.int32)
    tab_d = jnp.asarray(tab)
    idx = jnp.asarray(
        rng.integers(0, ROWS, (1, 128), dtype=np.int32))

    for scalarize in ("smem", "reduce"):
        for n_dma in (128, 32):
            tag = f"{scalarize}_n{n_dma}"
            try:
                fn = make_fn(n_dma, scalarize, ROUNDS)
                t0 = time.time()
                out = np.asarray(fn(idx, tab_d))
                cold = time.time() - t0
                t0 = time.time()
                reps = 3
                for _ in range(reps):
                    out = np.asarray(fn(idx, tab_d))
                warm = (time.time() - t0) / reps
                want = ref_checksum(idx, tab, n_dma, ROUNDS)
                ok = bool(
                    (out.astype(np.int64) & 0xFFFFFFFF
                     == want & 0xFFFFFFFF).all())
                emit({"tag": tag, "ok": ok, "cold_s": round(cold, 1),
                      "warm_s": round(warm, 4),
                      "us_per_round": round(warm / ROUNDS * 1e6, 2),
                      "us_per_dma": round(warm / ROUNDS / n_dma * 1e6,
                                          3)})
            except Exception as e:
                emit({"tag": tag, "ok": False,
                      "error": f"{type(e).__name__}: {str(e)[:400]}"})


if __name__ == "__main__":
    main()
