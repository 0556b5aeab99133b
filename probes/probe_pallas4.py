"""Final Pallas de-risk before the megakernel: mask-reduce gather + a
30-carry in-kernel while_loop (the megakernel's shape).

probe_pallas3 verdicts: axis1 dynamic_gather exact and ~vector-speed at
(3584,128) (FAILS at 9344 — chunk taller tables); axis0 only at R=8;
transposes fine; wide rows banned. The megakernel therefore fetches from
flat/(R,128) tables with a MASK-REDUCE gather:
    out[j] = sum_n (n == r[j]) * T[n, c[j]-shuffled]
 per 128-lane pass:
    G = axis1_gather(T, bcast(c_row))      # G[n,j] = T[n, c[j]]
    out_row = sum_n where(n == bcast(r_row), G, 0)
Stages:
  X1 mask-reduce gather from (3584,128) i32 (atlas shape): correctness
     vs numpy + in-kernel marginal cost per gather-of-1024-lanes
  X2 mask-reduce gather from (74,128) f32 (majorant pyramid shape)
  X3 while_loop with 30 x (8,128) carries + ~60-op body + one X2 gather
     per iteration: compile wall + marginal cost/iter (megakernel shape)
Run ALONE (touch /tmp/tpu_busy).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas4.jsonl")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas4")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def guarded(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                rec = fn() or {}
                rec["stage"] = name
                rec["ok"] = True
            except Exception as e:
                rec = {"stage": name, "ok": False,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            rec["wall_s"] = round(time.time() - t0, 2)
            emit(rec)
            return rec
        return run
    return deco


def pull(x):
    return np.asarray(x)


def lcg(s):
    return s * jnp.uint32(1664525) + jnp.uint32(1013904223)


def lcg_np(s):
    with np.errstate(over="ignore"):
        return (s * np.uint32(1664525) + np.uint32(1013904223)).astype(
            np.uint32)


def mask_reduce_gather(t_vmem, r, c, R):
    """out[i,j] = T[r[i,j], c[i,j]] for an (8,128) lane block; T (R,128).
    8 passes of 128 lanes; all ops verified supported."""
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    out_rows = []
    for i in range(8):
        c_b = jnp.broadcast_to(c[i:i + 1, :], (R, 128))
        r_b = jnp.broadcast_to(r[i:i + 1, :], (R, 128))
        G = jnp.take_along_axis(t_vmem, c_b, axis=1)  # G[n,j] = T[n, c[j]]
        hit = (iota_n == r_b)
        out_rows.append(jnp.sum(jnp.where(hit, G, 0), axis=0,
                                keepdims=True))
    return jnp.concatenate(out_rows, axis=0)


def _marginal(make_fn, lo, hi, n=5):
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    pull(f_lo(jnp.uint32(1)))
    pull(f_hi(jnp.uint32(1)))

    def med(f):
        ts = []
        for i in range(n):
            t0 = time.time()
            pull(f(jnp.uint32(11 + i)))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    m_lo, m_hi = med(f_lo), med(f_hi)
    return m_lo, m_hi, (m_hi - m_lo) / (hi - lo)


def _mask_reduce_probe(name, R, np_dtype):
    @guarded(name)
    def probe():
        rng = np.random.default_rng(5)
        if np_dtype == np.int32:
            tn = rng.integers(0, 2**20, (R, 128)).astype(np.int32)
        else:
            tn = rng.random((R, 128)).astype(np.float32)
        t = jnp.asarray(tn)
        jdt = jnp.int32 if np_dtype == np.int32 else jnp.float32

        def make_fn(iters):
            def kernel(t_ref, s_ref, o_ref):
                tt = t_ref[:]

                def body(k, carry):
                    sd, acc = carry
                    sd = lcg(sd)
                    r = (sd >> jnp.uint32(8)).astype(jnp.int32) % R
                    sd = lcg(sd)
                    c = (sd >> jnp.uint32(8)).astype(jnp.int32) % 128
                    g = mask_reduce_gather(tt, r, c, R)
                    return sd, acc + g.astype(jnp.float32)

                sd0 = (jnp.broadcast_to(s_ref[0, 0], (8, 128))
                       + jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 0)
                       * jnp.uint32(7919)
                       + jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1))
                _, acc = lax.fori_loop(0, iters, body,
                                       (sd0, jnp.zeros((8, 128),
                                                       jnp.float32)))
                o_ref[0, 0] = jnp.sum(acc)

            @jax.jit
            def f(seed):
                s2 = jnp.broadcast_to(seed, (1, 1))
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.SMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                )(t, s2)
            return f

        f3 = make_fn(3)
        got = float(pull(f3(jnp.uint32(42)))[0, 0])
        sd = (np.full((8, 128), 42, np.uint64)
              + np.arange(8, dtype=np.uint64)[:, None] * 7919
              + np.arange(128, dtype=np.uint64)[None, :]).astype(np.uint32)
        acc = 0.0
        for _ in range(3):
            sd = lcg_np(sd)
            r = ((sd >> np.uint32(8)).astype(np.int64)) % R
            sd = lcg_np(sd)
            c = ((sd >> np.uint32(8)).astype(np.int64)) % 128
            acc += tn[r, c].astype(np.float64).sum()
        relerr = abs(got - acc) / max(abs(acc), 1.0)
        m_lo, m_hi, per = _marginal(make_fn, 8, 64)
        return {"R": R, "relerr": float(round(relerr, 7)),
                "ms_lo8": round(m_lo * 1e3, 2),
                "ms_hi64": round(m_hi * 1e3, 2),
                "us_per_gather1024": round(per * 1e6, 2)}
    return probe


@guarded("X3_carry30_while")
def x3():
    R = 74
    tn = np.random.default_rng(6).random((R, 128)).astype(np.float32)
    t = jnp.asarray(tn)

    def make_fn(iters):
        def kernel(t_ref, s_ref, o_ref):
            tt = t_ref[:]

            def cond(c):
                return c[0][0, 0] < iters

            def body(carry):
                it, sd, *arrs = carry
                sd = lcg(sd)
                r = (sd >> jnp.uint32(8)).astype(jnp.int32) % R
                sd = lcg(sd)
                cc = (sd >> jnp.uint32(8)).astype(jnp.int32) % 128
                g = mask_reduce_gather(tt, r, cc, R)
                new = []
                prev = g
                for a in arrs:
                    # ~2 ops per array, chained like a real phase body
                    a = a * 0.9999 + prev * 1e-4
                    prev = a
                    new.append(a)
                return (it + 1, sd, *new)

            sd0 = (jnp.broadcast_to(s_ref[0, 0], (8, 128))
                   + jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1))
            arrs0 = [jnp.full((8, 128), 0.01 * k, jnp.float32)
                     for k in range(30)]
            out = lax.while_loop(
                cond, body,
                (jnp.zeros((1, 1), jnp.int32), sd0, *arrs0))
            acc = out[2]
            for a in out[3:]:
                acc = acc + a
            o_ref[0, 0] = jnp.sum(acc)

        @jax.jit
        def f(seed):
            s2 = jnp.broadcast_to(seed, (1, 1))
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(t, s2)
        return f

    t0 = time.time()
    f64 = make_fn(64)
    pull(f64(jnp.uint32(1)))
    compile_s = time.time() - t0
    m_lo, m_hi, per = _marginal(make_fn, 64, 512)
    return {"compile_s": round(compile_s, 1),
            "us_per_iter": round(per * 1e6, 2),
            "ms_lo64": round(m_lo * 1e3, 2),
            "ms_hi512": round(m_hi * 1e3, 2)}


if __name__ == "__main__":
    emit({"mode": "env", "jax": jax.__version__,
          "devices": [str(d) for d in jax.devices()]})
    _mask_reduce_probe("X1_maskreduce_3584_i32", 3584, np.int32)()
    _mask_reduce_probe("X2_maskreduce_74_f32", 74, np.float32)()
    x3()
    emit({"mode": "done"})
