"""Pallas gather building blocks: cost + correctness of every primitive the
march megakernel needs (follow-up to probe_pallas.py).

probe_pallas.py established: in-kernel loop iterations ~0.2 us (vs 550
us/step XLA while_loop floor), data-dependent while works, and the ONLY
lowered gather is take_along_axis(T, idx, axis=0|1) with
T.shape == idx.shape (tpu.dynamic_gather). Schemes derived from that:

  S1 replicated flat-table gather: T (N,128) with every column the same
     flat table; axis0 gather with idx padded to (N,128) -> out[i,j] =
     flat[v[i,j]]. Cost O(N*128). For mip_maj (9360) and TF LUTs.
  S2 general 2D gather T[r,c] per sublane row (collision-free):
       C[n,j] = where(n == r[i,j], c[i,j], j)       (compare pass)
       Y      = axis1_gather(T, C)   # Y[n,j] = T[n, C[n,j]]
       out    = axis0_gather(Y, bcast(r[i,:]))[0]   # Y[r[i,j], j]
     For the (3584,128)-i32 packed atlas fetch.
  S3 u32 TEA/LCG arithmetic in-kernel (parity with ops/rng.py).

Stages:
  Q1 dynamic_gather axis0 cost vs operand height N (1k/4k/16k), f32+i32
  Q2 dynamic_gather axis1 in-row shuffle (8,128) and (3584,128)
  Q3 shape ops: transpose (8,128)->(128,8); pltpu.repeat; reshape bans
  Q4 S2 general gather: correctness + cost (atlas-sized (3584,128))
  Q5 TEA8 + LCG u32 arithmetic parity vs ops/rng.py on CPU... (TPU run:
     parity vs numpy reimplementation)
  Q6 medium-complexity kernel (march-ish body, ~200 ops) compile time

Honest timing: novel inputs per call, np.asarray pull per sample.
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
                   "pallas2.jsonl")


def emit(rec):
    rec = dict(rec)
    rec.setdefault("probe", "pallas2")
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
                       "error": f"{type(e).__name__}: {e}"[:400],
                       "trace": traceback.format_exc()[-500:]}
            rec["wall_s"] = round(time.time() - t0, 2)
            emit(rec)
            return rec
        return run
    return deco


def pull(x):
    return np.asarray(x)


def time_calls(fn, make_arg, n=6):
    ts = []
    for i in range(n):
        a = make_arg(i)
        t0 = time.time()
        pull(fn(a))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


# ---------------------------------------------------------------- Q1
def _axis0_gather_fn(N, dtype):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def f(t, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, idx)
    return f


@guarded("Q1_axis0_cost")
def q1():
    res = {}
    for N in (1024, 4096, 16384):
        # replicated flat table: T[n, j] = flat[n] for all j
        flat = np.arange(N, dtype=np.float32) * 0.25
        t = jnp.asarray(np.tile(flat[:, None], (1, 128)))
        f = _axis0_gather_fn(N, jnp.float32)

        def mk(i):
            rng = np.random.default_rng(100 + i)
            return jnp.asarray(rng.integers(0, N, (N, 128), dtype=np.int32))

        i0 = mk(0)
        got = pull(f(t, i0))
        want = flat[np.asarray(i0)]
        assert np.allclose(got, want), "replicated axis0 gather wrong"
        med = time_calls(lambda idx: f(t, idx), mk)
        res[f"f32_N{N}_ms"] = round(med * 1e3, 3)
    # i32 operand at 4096
    N = 4096
    flati = np.arange(N, dtype=np.int32) * 3
    ti = jnp.asarray(np.tile(flati[:, None], (1, 128)))
    fi = _axis0_gather_fn(N, jnp.int32)
    i0 = jnp.asarray(np.random.default_rng(5).integers(0, N, (N, 128),
                                                       dtype=np.int32))
    got = pull(fi(ti, i0))
    assert np.array_equal(got, flati[np.asarray(i0)])
    res["i32_N4096_ms"] = round(time_calls(
        lambda idx: fi(ti, idx),
        lambda i: jnp.asarray(np.random.default_rng(200 + i).integers(
            0, N, (N, 128), dtype=np.int32))) * 1e3, 3)
    return res


# ---------------------------------------------------------------- Q2
@guarded("Q2_axis1_shuffle")
def q2():
    res = {}
    for R in (8, 3584):
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

        @jax.jit
        def f(t, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, idx)

        tn = np.random.default_rng(1).random((R, 128)).astype(np.float32)
        t = jnp.asarray(tn)

        def mk(i):
            rng = np.random.default_rng(300 + i)
            return jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))

        i0 = mk(0)
        got = pull(f(t, i0))
        want = np.take_along_axis(tn, np.asarray(i0), axis=1)
        assert np.allclose(got, want)
        res[f"R{R}_ms"] = round(time_calls(lambda idx: f(t, idx), mk) * 1e3, 3)
    return res


# ---------------------------------------------------------------- Q3
@guarded("Q3_shape_ops")
def q3():
    res = {}

    def try_op(key, kernel, out_shape, *args):
        try:
            @jax.jit
            def f(*a):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct(*out_shape),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                              for _ in args],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(*a)
            pull(f(*args))
            res[key] = "ok"
        except Exception as e:
            res[key] = f"FAIL {type(e).__name__}: {e}"[:160]

    x = jnp.asarray(np.arange(8 * 128, dtype=np.float32).reshape(8, 128))

    def k_transpose(x_ref, o_ref):
        o_ref[:] = x_ref[:].T
    try_op("transpose_8x128", k_transpose, ((128, 8), jnp.float32), x)

    def k_repeat(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 4, axis=0)
    try_op("repeat_axis0", k_repeat, ((32, 128), jnp.float32), x)

    def k_reshape_wide(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1, 1024)
    try_op("reshape_8x128_to_1x1024", k_reshape_wide,
           ((1, 1024), jnp.float32), x)

    def k_reshape_tall(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1024, 1)
    try_op("reshape_8x128_to_1024x1", k_reshape_tall,
           ((1024, 1), jnp.float32), x)

    big = jnp.asarray(np.arange(256 * 128, dtype=np.float32).reshape(256, 128))

    def k_reshape_fold(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(128, 256)
    try_op("reshape_256x128_to_128x256", k_reshape_fold,
           ((128, 256), jnp.float32), big)

    def k_roll(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, 1)
    try_op("roll_axis1", k_roll, ((8, 128), jnp.float32), x)

    def k_broadcast_row(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(x_ref[0:1, :], (3584, 128))
    try_op("broadcast_row_to_3584", k_broadcast_row,
           ((3584, 128), jnp.float32), x)

    def k_iota_tall(x_ref, o_ref):
        o_ref[:] = (jax.lax.broadcasted_iota(jnp.int32, (3584, 128), 0)
                    .astype(jnp.float32) + x_ref[0, 0])
    try_op("iota_3584x128", k_iota_tall, ((3584, 128), jnp.float32), x)
    return res


# ---------------------------------------------------------------- Q4
ATLAS_R, ATLAS_C = 3584, 128


def _general_gather_rowwise(t_ref, r, c, R):
    """out[i,j] = T[r[i,j], c[i,j]] for lane block (8,128); T (R,128).
    Collision-free per-sublane-row two-gather scheme (S2)."""
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    rows = []
    for i in range(8):
        r_b = jnp.broadcast_to(r[i:i + 1, :], (R, 128))
        c_b = jnp.broadcast_to(c[i:i + 1, :], (R, 128))
        C = jnp.where(iota_n == r_b, c_b, iota_j)
        Y = jnp.take_along_axis(t_ref[:], C, axis=1)
        out_full = jnp.take_along_axis(Y, r_b, axis=0)
        rows.append(out_full[0:1, :])
    return jnp.concatenate(rows, axis=0)


@guarded("Q4_general_gather")
def q4():
    def kernel(t_ref, r_ref, c_ref, o_ref):
        o_ref[:] = _general_gather_rowwise(t_ref, r_ref[:], c_ref[:], ATLAS_R)

    @jax.jit
    def f(t, r, c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, r, c)

    tn = np.random.default_rng(2).random((ATLAS_R, 128)).astype(np.float32)
    t = jnp.asarray(tn)

    def mk(i):
        rng = np.random.default_rng(400 + i)
        return (jnp.asarray(rng.integers(0, ATLAS_R, (8, 128),
                                         dtype=np.int32)),
                jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32)))

    r0, c0 = mk(0)
    got = pull(f(t, r0, c0))
    want = tn[np.asarray(r0), np.asarray(c0)]
    assert np.allclose(got, want), "general gather wrong"
    med = time_calls(lambda rc: f(t, *rc), mk)
    return {"ms_per_call": round(med * 1e3, 3),
            "note": "1024 lanes from (3584,128)"}


# ---------------------------------------------------------------- Q5
@guarded("Q5_tea_u32")
def q5():
    # TEA8 round parity (ops/rng.py semantics) on u32 in-kernel
    def tea8(v0, v1):
        s = jnp.uint32(0)
        d = jnp.uint32(0x9E3779B9)
        for _ in range(8):
            s = s + d
            v0 = v0 + (((v1 << 4) + jnp.uint32(0xA341316C)) ^ (v1 + s)
                       ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4)))
            v1 = v1 + (((v0 << 4) + jnp.uint32(0xAD90777D)) ^ (v0 + s)
                       ^ ((v0 >> 5) + jnp.uint32(0x7E95761E)))
        return v0, v1

    def kernel(a_ref, b_ref, o0_ref, o1_ref):
        v0, v1 = tea8(a_ref[:], b_ref[:])
        o0_ref[:] = v0
        o1_ref[:] = v1

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((8, 128), jnp.uint32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(a, b)

    rng = np.random.default_rng(9)
    an = rng.integers(0, 2**32, (8, 128), dtype=np.uint32)
    bn = rng.integers(0, 2**32, (8, 128), dtype=np.uint32)
    g0, g1 = f(jnp.asarray(an), jnp.asarray(bn))
    # numpy reference
    def tea8_np(v0, v1):
        s = np.uint32(0)
        with np.errstate(over="ignore"):
            for _ in range(8):
                s = np.uint32(s + np.uint32(0x9E3779B9))
                v0 = v0 + ((((v1 << np.uint32(4)) + np.uint32(0xA341316C))
                            ^ (v1 + s)
                            ^ ((v1 >> np.uint32(5)) + np.uint32(0xC8013EA4))))
                v1 = v1 + ((((v0 << np.uint32(4)) + np.uint32(0xAD90777D))
                            ^ (v0 + s)
                            ^ ((v0 >> np.uint32(5)) + np.uint32(0x7E95761E))))
        return v0, v1
    w0, w1 = tea8_np(an.copy(), bn.copy())
    ok0 = np.array_equal(np.asarray(g0), w0)
    ok1 = np.array_equal(np.asarray(g1), w1)
    assert ok0 and ok1, "TEA mismatch"
    return {"tea_bitexact": True}


# ---------------------------------------------------------------- Q6
@guarded("Q6_compile_scale")
def q6():
    # march-ish body: DDA-ish math + 2 gathers + rng, 64 iters in-kernel
    R = 4096

    def kernel(t_ref, x_ref, s_ref, o_ref):
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)

        def body(k, carry):
            pos, vel, rstate = carry
            rstate = rstate * jnp.uint32(1664525) + jnp.uint32(1013904223)
            jitter = (rstate >> jnp.uint32(9)).astype(jnp.float32) * (
                1.0 / 8388608.0)
            cell = jnp.clip((pos * 16.0).astype(jnp.int32), 0, R - 1)
            idx = jnp.broadcast_to(cell[0:1, :], (R, 128))
            del iota_n
            maj = jnp.take_along_axis(t_ref[:], idx, axis=0)[0:8, :]
            step = jnp.where(maj > 0.5, 0.01, 0.05) * (0.5 + jitter[:8])
            pos = pos + vel * step
            vel = vel * 0.999
            return pos, vel, rstate

        pos0 = x_ref[:]
        vel0 = jnp.full((8, 128), 0.01, jnp.float32)
        r0 = s_ref[:]
        pos, vel, _ = lax.fori_loop(0, 64, body, (pos0, vel0, r0))
        o_ref[:] = pos + vel

    @jax.jit
    def f(t, x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, x, s)

    t = jnp.asarray(np.random.default_rng(3).random((R, 128), np.float32))
    x = jnp.asarray(np.random.default_rng(4).random((8, 128)).astype(
        np.float32))
    s = jnp.asarray(np.random.default_rng(5).integers(
        0, 2**32, (8, 128), dtype=np.uint32))
    t0 = time.time()
    pull(f(t, x, s))
    compile_s = time.time() - t0
    med = time_calls(lambda xx: f(t, xx, s),
                     lambda i: jnp.full((8, 128), 0.1 + i * 1e-3))
    return {"compile_s": round(compile_s, 1),
            "ms_per_call": round(med * 1e3, 3),
            "us_per_iter": round(med * 1e6 / 64, 2)}


if __name__ == "__main__":
    emit({"mode": "env", "jax": jax.__version__,
          "devices": [str(d) for d in jax.devices()]})
    for stage in (q1, q2, q3, q4, q5, q6):
        stage()
    emit({"mode": "done"})
