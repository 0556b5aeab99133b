"""Pallas/Mosaic feasibility on the tunneled TPU: can an in-kernel loop
escape the runtime's per-while-iteration floor?

docs/ROOFLINE.md §3 pinned the wall: a trivial lax.while_loop body costs
~0.5-0.6 ms/step at unroll 4 (~2.2 ms/iteration fixed), 60-90x its memory
bound — runtime per-op/per-iteration overhead, not hardware. A Pallas
kernel runs its whole internal loop as ONE runtime op, so if Mosaic
compiles here and the in-kernel per-iteration marginal is ~hardware-speed
(ns-µs), a march megakernel is a potential 10-100x on the headline bench.

Round-1 found Mosaic rejects "the per-lane gather pattern"; jax is now
0.9.0 — re-test every gather strategy the kernel would need:
  G1 vector take:   out = table[idx]   (idx a (8,128) vector)
  G2 one-hot MXU:   onehot(idx) @ table
  G3 scalar loop:   fori over lanes, table_ref[i] scalar loads
  G4 dynamic slice: per-row pl.ds(start, w) loads

Stages (each guarded; one jsonl line each):
  P0 trivial kernel dispatch cost (x*2, novel input per call, host pull)
  P1 in-kernel fori_loop marginal cost (iters 256 vs 4096 at fixed shape)
  P2 in-kernel data-dependent while_loop (march-loop shape)
  P3 gather strategies G1-G4
  P4 pallas_call INSIDE lax.while_loop (hybrid engine shape)

Timing per NOTES.md honest rules: every sample ends in a host pull
(np.asarray); inputs vary per call so the server-side result cache can't
fake numbers. Run ALONE (touch /tmp/tpu_busy).
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
                   "pallas.jsonl")


def emit(rec):
    rec = dict(rec)
    rec.setdefault("probe", "pallas")
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
                       "error": f"{type(e).__name__}: {e}",
                       "trace": traceback.format_exc()[-800:]}
            rec["wall_s"] = round(time.time() - t0, 2)
            emit(rec)
            return rec
        return run
    return deco


def pull(x):
    return np.asarray(x)


def time_calls(fn, make_arg, n=8):
    """Median wall of n calls, novel input each call, host pull each."""
    ts = []
    for i in range(n):
        a = make_arg(i)
        t0 = time.time()
        pull(fn(a))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


# ---------------------------------------------------------------- P0
@guarded("P0_trivial")
def p0():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    t_compile0 = time.time()
    base = pull(f(jnp.ones((8, 128), jnp.float32)))
    compile_s = time.time() - t_compile0
    assert float(base[0, 0]) == 2.0
    med, ts = time_calls(f, lambda i: jnp.full((8, 128), float(i + 3)))
    return {"compile_s": round(compile_s, 1), "ms_per_call":
            round(med * 1e3, 3), "all_ms": [round(t * 1e3, 2) for t in ts]}


# ---------------------------------------------------------------- P1
def _loop_kernel(iters):
    def kernel(x_ref, o_ref):
        def body(_, x):
            return x * 1.0000001 + 0.000001
        o_ref[:] = lax.fori_loop(0, iters, body, x_ref[:])
    return kernel


def _loop_fn(iters, shape=(256, 512)):
    @jax.jit
    def f(x):
        return pl.pallas_call(
            _loop_kernel(iters),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return f


@guarded("P1_inkernel_fori")
def p1():
    shape = (256, 512)  # 512 KB block, ~ a 16k-lane x 8-col state slab
    lo, hi = 256, 4096
    f_lo, f_hi = _loop_fn(lo, shape), _loop_fn(hi, shape)
    pull(f_lo(jnp.ones(shape)))
    pull(f_hi(jnp.ones(shape)))
    med_lo, _ = time_calls(f_lo, lambda i: jnp.full(shape, 1.0 + i * 1e-3))
    med_hi, _ = time_calls(f_hi, lambda i: jnp.full(shape, 1.0 + i * 1e-3))
    per_iter_us = (med_hi - med_lo) / (hi - lo) * 1e6
    return {"ms_lo": round(med_lo * 1e3, 3), "ms_hi": round(med_hi * 1e3, 3),
            "iters": [lo, hi], "marginal_us_per_iter": round(per_iter_us, 3)}


# ---------------------------------------------------------------- P2
@guarded("P2_inkernel_while")
def p2():
    # Data-dependent trip count inside the kernel: march-until-drain shape.
    shape = (256, 512)

    def kernel(x_ref, n_ref, o_ref):
        n = n_ref[0]

        def cond(c):
            i, _ = c
            return i < n

        def body(c):
            i, x = c
            return i + 1, x * 1.0000001 + 0.000001

        _, out = lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
        o_ref[:] = out

    @jax.jit
    def f(x, n):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, n)

    pull(f(jnp.ones(shape), jnp.array([64], jnp.int32)))
    med_lo, _ = time_calls(lambda a: f(a, jnp.array([256], jnp.int32)),
                           lambda i: jnp.full(shape, 1.0 + i * 1e-3))
    med_hi, _ = time_calls(lambda a: f(a, jnp.array([4096], jnp.int32)),
                           lambda i: jnp.full(shape, 1.0 + i * 1e-3))
    per_iter_us = (med_hi - med_lo) / (4096 - 256) * 1e6
    return {"ms_lo": round(med_lo * 1e3, 3), "ms_hi": round(med_hi * 1e3, 3),
            "marginal_us_per_iter": round(per_iter_us, 3)}


# ---------------------------------------------------------------- P3
TABLE_N = 16384
LANES2D = (8, 128)


def _mk_idx(i):
    rng = np.random.default_rng(1234 + i)
    return jnp.asarray(rng.integers(0, TABLE_N, size=LANES2D, dtype=np.int32))


def _table():
    return jnp.arange(TABLE_N, dtype=jnp.float32) * 0.5


def _check(out, idx):
    want = np.asarray(idx, np.int64) * 0.5
    got = np.asarray(out)
    assert np.allclose(got, want), (got.ravel()[:4], want.ravel()[:4])


@guarded("P3a_vector_take")
def p3a():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[:][i_ref[:]]

    @jax.jit
    def f(t, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(LANES2D, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx)

    t = _table()
    i0 = _mk_idx(0)
    _check(f(t, i0), i0)
    med, _ = time_calls(lambda idx: f(t, idx), _mk_idx)
    return {"ms_per_call": round(med * 1e3, 3)}


@guarded("P3b_onehot_mxu")
def p3b():
    def kernel(t_ref, i_ref, o_ref):
        idx = i_ref[:]  # (8,128) i32
        flat = idx.reshape(8 * 128 // 128, 128)  # keep 2D
        # one-hot (1024, TABLE_N) would blow VMEM; do (8,128) lanes in
        # 8 rows of 128: onehot (128, N) @ table (N, 1) per row is skinny;
        # instead do the whole block: (1024, N) f32 = 64 MB -> too big.
        # Realistic variant: N=2048 subtable one-hot.
        sub = t_ref[0:2048].reshape(2048, 1)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1024, 2048), 1)
        oh = (ids == (idx.reshape(1024, 1) % 2048)).astype(jnp.float32)
        res = jnp.dot(oh, sub, preferred_element_type=jnp.float32)
        o_ref[:] = res.reshape(8, 128)
        del flat

    @jax.jit
    def f(t, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(LANES2D, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx)

    t = _table()
    i0 = _mk_idx(0)
    want = (np.asarray(i0, np.int64) % 2048) * 0.5
    got = np.asarray(f(t, i0))
    assert np.allclose(got, want)
    med, _ = time_calls(lambda idx: f(t, idx), _mk_idx)
    return {"ms_per_call": round(med * 1e3, 3), "note": "N=2048 subtable"}


@guarded("P3c_scalar_loop")
def p3c():
    def kernel(t_ref, i_ref, o_ref):
        def body(k, _):
            row = k // 128
            col = k % 128
            o_ref[row, col] = t_ref[i_ref[row, col]]
            return 0
        lax.fori_loop(0, 8 * 128, body, 0)

    @jax.jit
    def f(t, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(LANES2D, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx)

    t = _table()
    i0 = _mk_idx(0)
    _check(f(t, i0), i0)
    med, _ = time_calls(lambda idx: f(t, idx), _mk_idx)
    return {"ms_per_call": round(med * 1e3, 3),
            "us_per_elem": round(med * 1e6 / 1024, 2)}


@guarded("P3d_dynamic_slice_rows")
def p3d():
    # per-row dynamic start: table2d (N/128, 128); fetch row table2d[r]
    def kernel(t_ref, r_ref, o_ref):
        def body(k, _):
            r = r_ref[k, 0]
            o_ref[k, :] = t_ref[pl.ds(r, 1), :][0, :]
            return 0
        lax.fori_loop(0, 8, body, 0)

    @jax.jit
    def f(t2, rows):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t2, rows)

    t2 = _table().reshape(TABLE_N // 128, 128)
    rows = jnp.asarray(
        np.random.default_rng(7).integers(0, TABLE_N // 128, (8, 1),
                                          dtype=np.int32))
    got = np.asarray(f(t2, rows))
    want = np.asarray(t2)[np.asarray(rows)[:, 0]]
    assert np.allclose(got, want)
    med, _ = time_calls(
        lambda r: f(t2, r),
        lambda i: jnp.asarray(np.random.default_rng(70 + i).integers(
            0, TABLE_N // 128, (8, 1), dtype=np.int32)))
    return {"ms_per_call": round(med * 1e3, 3)}


# ---------------------------------------------------------------- P4
@guarded("P4_pallas_in_while")
def p4():
    shape = (256, 512)
    inner = 64

    call = lambda x: pl.pallas_call(
        _loop_kernel(inner),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

    @jax.jit
    def f(x, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, x = c
            return i + 1, call(x)

        return lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    pull(f(jnp.ones(shape), jnp.int32(2)))
    med_lo, _ = time_calls(lambda a: f(a, jnp.int32(8)),
                           lambda i: jnp.full(shape, 1.0 + i * 1e-3))
    med_hi, _ = time_calls(lambda a: f(a, jnp.int32(64)),
                           lambda i: jnp.full(shape, 1.0 + i * 1e-3))
    per_outer_ms = (med_hi - med_lo) / (64 - 8) * 1e3
    return {"ms_lo": round(med_lo * 1e3, 3), "ms_hi": round(med_hi * 1e3, 3),
            "ms_per_outer_iter": round(per_outer_ms, 4),
            "inner_iters": inner}


if __name__ == "__main__":
    emit({"mode": "env", "jax": jax.__version__,
          "devices": [str(d) for d in jax.devices()]})
    for stage in (p0, p1, p2, p3a, p3b, p3c, p3d, p4):
        stage()
    emit({"mode": "done"})
