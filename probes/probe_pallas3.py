"""Pallas gather primitives, timed IN-KERNEL (probe_pallas2 follow-up).

probe_pallas2's per-call numbers were polluted by index uploads through
the tunnel (1.8 MB/call ~ 130 ms). Here every gather loop runs inside one
kernel with indices generated in-kernel by an LCG, so the marginal cost
per gather is (wall(hi_iters) - wall(lo_iters)) / d_iters — pure kernel
time. Correctness is checked against a numpy emulation of the same LCG.

Verified so far: axis1 dynamic_gather (within-128-lane shuffle) lowers at
any height; axis0 fails at (1024,128); transpose/repeat/(8,128)->(1,1024)
reshape work. Now measure/map:
  W1 axis1 gather marginal cost on (3584,128) f32 and (9344,128) f32
  W2 wide-row axis1 gather: (8,16384) — lowers? cost?
  W3 axis0 gather at tile heights: (8,128), (32,128)
  W4 transpose (128,1024)->(1024,128) in-kernel
  W5 MXU one-hot row fetch: T2T (128,3584) @ OH (3584,1024) f32, cost
  W6 i32 axis1 gather (3584,128)
  W7 two-step general gather composed: T2[r,c] for 1024 lanes via
     one-hot row fetch + transpose + axis1 select; correctness + cost

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
                   "pallas3.jsonl")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas3")
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


A_LCG = np.uint32(1664525)
C_LCG = np.uint32(1013904223)


def lcg_jnp(s):
    return s * jnp.uint32(1664525) + jnp.uint32(1013904223)


def lcg_np(s):
    with np.errstate(over="ignore"):
        return (s * A_LCG + C_LCG).astype(np.uint32)


def _marginal(make_fn, lo, hi, seed0, n=5):
    """Median wall at lo and hi in-kernel iterations; novel seed per call."""
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    pull(f_lo(jnp.uint32(seed0)))
    pull(f_hi(jnp.uint32(seed0)))

    def med(f):
        ts = []
        for i in range(n):
            t0 = time.time()
            pull(f(jnp.uint32(seed0 + 7 + i)))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    m_lo, m_hi = med(f_lo), med(f_hi)
    return m_lo, m_hi, (m_hi - m_lo) / (hi - lo)


# ---------------------------------------------------------- W1 / W6
def _axis1_loop_probe(R, dtype, name):
    @guarded(name)
    def probe():
        tn = (np.arange(R * 128) % 977).reshape(R, 128)
        tn = tn.astype(np.float32 if dtype == jnp.float32 else np.int32)
        t = jnp.asarray(tn)

        def make_fn(iters):
            def kernel(t_ref, s_ref, o_ref):
                tt = t_ref[:]

                def body(k, carry):
                    sd, acc = carry
                    sd = lcg_jnp(sd)
                    idx = (sd >> jnp.uint32(8)).astype(jnp.int32) % 128
                    g = jnp.take_along_axis(tt, idx, axis=1)
                    return sd, acc + g.astype(jnp.float32)

                sd0 = (jnp.broadcast_to(s_ref[0, 0], (R, 128))
                       + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 0)
                       * jnp.uint32(7919)
                       + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 1))
                _, acc = lax.fori_loop(0, iters, body, (
                    sd0, jnp.zeros((R, 128), jnp.float32)))
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

        # correctness at iters=3 vs numpy
        f3 = make_fn(3)
        got = float(pull(f3(jnp.uint32(42)))[0, 0])
        sd = (np.full((R, 128), 42, np.uint64)
              + np.arange(R, dtype=np.uint64)[:, None] * 7919
              + np.arange(128, dtype=np.uint64)[None, :]).astype(np.uint32)
        acc = np.zeros((R, 128), np.float64)
        for _ in range(3):
            sd = lcg_np(sd)
            idx = ((sd >> np.uint32(8)).astype(np.int64)) % 128
            acc += np.take_along_axis(tn, idx.astype(np.int64), axis=1)
        want = float(acc.sum())
        relerr = abs(got - want) / max(abs(want), 1.0)
        m_lo, m_hi, per = _marginal(make_fn, 16, 256, 1000)
        return {"R": R, "relerr": round(relerr, 6),
                "ms_lo16": round(m_lo * 1e3, 2),
                "ms_hi256": round(m_hi * 1e3, 2),
                "us_per_gather": round(per * 1e6, 2),
                "ns_per_elem": round(per * 1e9 / (R * 128), 2)}
    return probe


# ---------------------------------------------------------- W2
@guarded("W2_wide_axis1")
def w2():
    R, W = 8, 16384
    tn = (np.arange(R * W) % 977).astype(np.float32).reshape(R, W)
    t = jnp.asarray(tn)

    def make_fn(iters):
        def kernel(t_ref, s_ref, o_ref):
            tt = t_ref[:]

            def body(k, carry):
                sd, acc = carry
                sd = lcg_jnp(sd)
                idx = (sd >> jnp.uint32(8)).astype(jnp.int32) % W
                g = jnp.take_along_axis(tt, idx, axis=1)
                return sd, acc + g

            sd0 = (jnp.broadcast_to(s_ref[0, 0], (R, W))
                   + jax.lax.broadcasted_iota(jnp.uint32, (R, W), 0)
                   * jnp.uint32(7919)
                   + jax.lax.broadcasted_iota(jnp.uint32, (R, W), 1))
            _, acc = lax.fori_loop(0, iters, body,
                                   (sd0, jnp.zeros((R, W), jnp.float32)))
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
    sd = (np.full((R, W), 42, np.uint64)
          + np.arange(R, dtype=np.uint64)[:, None] * 7919
          + np.arange(W, dtype=np.uint64)[None, :]).astype(np.uint32)
    acc = np.zeros((R, W), np.float64)
    for _ in range(3):
        sd = lcg_np(sd)
        idx = ((sd >> np.uint32(8)).astype(np.int64)) % W
        acc += np.take_along_axis(tn, idx.astype(np.int64), axis=1)
    want = float(acc.sum())
    relerr = abs(got - want) / max(abs(want), 1.0)
    m_lo, m_hi, per = _marginal(make_fn, 4, 32, 2000)
    return {"relerr": round(relerr, 6), "us_per_gather": round(per * 1e6, 2),
            "ns_per_elem": round(per * 1e9 / (R * W), 2)}


# ---------------------------------------------------------- W3
@guarded("W3_axis0_small")
def w3():
    res = {}
    for R in (8, 32):
        tn = (np.arange(R * 128) % 977).astype(np.float32).reshape(R, 128)
        t = jnp.asarray(tn)

        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

        @jax.jit
        def f(idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, idx)

        try:
            i0n = np.random.default_rng(3).integers(0, R, (R, 128),
                                                    dtype=np.int32)
            got = pull(f(jnp.asarray(i0n)))
            want = np.take_along_axis(tn, i0n, axis=0)
            res[f"R{R}"] = "ok" if np.allclose(got, want) else "WRONG"
        except Exception as e:
            res[f"R{R}"] = f"FAIL {type(e).__name__}"[:60]
    return res


# ---------------------------------------------------------- W4
@guarded("W4_transpose_big")
def w4():
    res = {}
    for (a, b) in ((128, 1024), (1024, 128), (8, 1024)):
        tn = np.arange(a * b, dtype=np.float32).reshape(a, b)
        t = jnp.asarray(tn)

        def kernel(t_ref, o_ref):
            o_ref[:] = t_ref[:].T

        @jax.jit
        def f(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((b, a), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t)

        try:
            got = pull(f(t))
            res[f"{a}x{b}"] = "ok" if np.allclose(got, tn.T) else "WRONG"
        except Exception as e:
            res[f"{a}x{b}"] = f"FAIL {type(e).__name__}"[:60]
    return res


# ---------------------------------------------------------- W5 + W7
ATLAS_R = 3584


@guarded("W7_general_gather_v2")
def w7():
    """T2[r,c] for 1024 lanes: one-hot row fetch on MXU + transpose +
    axis1 select. All shapes lane-major-wide to dodge banned reshapes."""
    R = ATLAS_R
    tn = np.random.default_rng(2).random((R, 128)).astype(np.float32)
    t = jnp.asarray(tn)

    def make_fn(iters):
        def kernel(t_ref, s_ref, o_ref):
            tt = t_ref[:]  # (R, 128)
            iota_n_wide = jax.lax.broadcasted_iota(jnp.int32, (R, 1024), 0)

            def one_gather(sd):
                # in-kernel random (r, c) for 1024 lanes, lane-wide (1,1024)
                sd = lcg_jnp(sd)
                r = ((sd >> jnp.uint32(8)).astype(jnp.int32) % R)  # (1,1024)
                sd = lcg_jnp(sd)
                c = ((sd >> jnp.uint32(8)).astype(jnp.int32) % 128)
                oh = (iota_n_wide == jnp.broadcast_to(r, (R, 1024))).astype(
                    jnp.float32)  # (R, 1024) one-hot transposed
                rows_t = jax.lax.dot_general(
                    tt, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (128, 1024)
                rows = rows_t.T  # (1024, 128) lane-major rows
                cb = jnp.broadcast_to(c.T, (1024, 128))  # c as (1024,1)->bc
                sel = jnp.take_along_axis(rows, cb, axis=1)  # (1024,128)
                val = sel[:, 0:1].T  # (1,1024)
                return sd, val

            def body(k, carry):
                sd, acc = carry
                sd, val = one_gather(sd)
                return sd, acc + val

            sd0 = (jnp.broadcast_to(s_ref[0, 0], (1, 1024))
                   + jax.lax.broadcasted_iota(jnp.uint32, (1, 1024), 1))
            _, acc = lax.fori_loop(0, iters, body,
                                   (sd0, jnp.zeros((1, 1024), jnp.float32)))
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
    sd = (np.full((1, 1024), 42, np.uint64)
          + np.arange(1024, dtype=np.uint64)[None, :]).astype(np.uint32)
    acc = 0.0
    for _ in range(3):
        sd = lcg_np(sd)
        r = ((sd >> np.uint32(8)).astype(np.int64)) % ATLAS_R
        sd = lcg_np(sd)
        c = ((sd >> np.uint32(8)).astype(np.int64)) % 128
        acc += tn[r, c].sum()
    relerr = abs(got - acc) / max(abs(acc), 1.0)
    m_lo, m_hi, per = _marginal(make_fn, 8, 64, 3000)
    return {"relerr": round(relerr, 6),
            "ms_lo8": round(m_lo * 1e3, 2), "ms_hi64": round(m_hi * 1e3, 2),
            "us_per_general_gather_1024": round(per * 1e6, 2)}


if __name__ == "__main__":
    emit({"mode": "env", "jax": jax.__version__,
          "devices": [str(d) for d in jax.devices()]})
    w1a = _axis1_loop_probe(3584, jnp.float32, "W1_axis1_3584_f32")
    w1b = _axis1_loop_probe(9344, jnp.float32, "W1_axis1_9344_f32")
    w6 = _axis1_loop_probe(3584, jnp.int32, "W6_axis1_3584_i32")
    for stage in (w1a, w1b, w2, w3, w4, w6, w7):
        stage()
    emit({"mode": "done"})
