"""In-kernel gather formulation shootout (after probe_pallas_engine E4).

The v1 megakernel measured 0.37 spp/s @1024^2 — ~14x SLOWER than
device_queue — and probe_pallas4 X2 already showed one mask-reduce
gather of even a (74,128) table costs ~10 us (30x its elementwise
model): the 8x sublane-row loop with (R,128) broadcasts + axis0 reduces
carries a large fixed cost, and E4 showed the lax.cond block skip is
net negative. Candidates, all exact:

  V1 mask-reduce (current engine baseline)
  V2 mask-reduce with MXU reduce (ones(1,R) @ masked)
  V3 small-table shuffle: <=128 entries broadcast to (8,128), ONE
     axis1 dynamic_gather — no scan at all
  V4 group-select: table (G,128) = G groups of 128 entries;
     fori over groups: broadcast row -> axis1 shuffle by lo -> select
     where hi==g. 3-4 (8,128) ops per group, no sublane loop.
  V5 V4 with a static python loop (unrolled) instead of fori

Each measured in-kernel (LCG indices, host-pull timing, marginal
between iteration counts) at table sizes 74 (mip), 1024, 8192 (mip
level-0), 114688 i32 (the packed atlas), plus jnp.cumsum lowering
(future in-kernel queue). Run ALONE (touch /tmp/tpu_busy)."""

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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas5.jsonl")
f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas5")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def lcg(s):
    return s * u32(1664525) + u32(1013904223)


def lcg_np(s):
    with np.errstate(over="ignore"):
        return (s * np.uint32(1664525) + np.uint32(1013904223)).astype(
            np.uint32)


def idx_from(sd, n):
    return jax.lax.bitcast_convert_type(
        (sd >> u32(8)) & u32(0x7FFFFF), i32) % n


# ---- variants: each (table_value_or_ref, sd) -> (8,128) f32 of T[idx]
def v1_mask_reduce(tt, idx, R):
    r, c = idx >> 7, idx & 127
    rows = []
    iota_n = jax.lax.broadcasted_iota(i32, (R, 128), 0)
    for i in range(8):
        c_b = jnp.broadcast_to(c[i:i + 1, :], (R, 128))
        r_b = jnp.broadcast_to(r[i:i + 1, :], (R, 128))
        G = jnp.take_along_axis(tt, c_b, axis=1)
        rows.append(jnp.sum(jnp.where(iota_n == r_b, G, 0.0), axis=0,
                            keepdims=True))
    return jnp.concatenate(rows, axis=0)


def v2_mxu_reduce(tt, idx, R):
    r, c = idx >> 7, idx & 127
    ones = jnp.ones((1, R), f32)
    iota_n = jax.lax.broadcasted_iota(i32, (R, 128), 0)
    rows = []
    for i in range(8):
        c_b = jnp.broadcast_to(c[i:i + 1, :], (R, 128))
        r_b = jnp.broadcast_to(r[i:i + 1, :], (R, 128))
        G = jnp.take_along_axis(tt, c_b, axis=1)
        masked = jnp.where(iota_n == r_b, G, 0.0)
        rows.append(jnp.dot(ones, masked,
                            preferred_element_type=f32))
    return jnp.concatenate(rows, axis=0)


def v3_small_shuffle(tt, idx, R):
    # R == 1 row: table entries live along lanes
    row = jnp.broadcast_to(tt[0:1, :], (8, 128))
    return jnp.take_along_axis(row, idx, axis=1)


def v4_group_fori(tt, idx, R):
    hi, lo = idx >> 7, idx & 127

    def body(g, val):
        row = jnp.broadcast_to(lax.dynamic_slice(tt, (g, 0), (1, 128)),
                               (8, 128))
        shuf = jnp.take_along_axis(row, lo, axis=1)
        return jnp.where(hi == g, shuf, val)

    return lax.fori_loop(0, R, body, jnp.zeros((8, 128), f32))


def v5_group_static(tt, idx, R):
    hi, lo = idx >> 7, idx & 127
    val = jnp.zeros((8, 128), f32)
    for g in range(R):
        row = jnp.broadcast_to(tt[g:g + 1, :], (8, 128))
        shuf = jnp.take_along_axis(row, lo, axis=1)
        val = jnp.where(hi == g, shuf, val)
    return val


def v8_group_ilp(tt, idx, R):
    """v4 with 4 independent accumulators + 4-wide inner unroll: breaks
    the select dependency chain (suspected latency wall of v4)."""
    hi, lo = idx >> 7, idx & 127
    assert R % 4 == 0 or R < 4

    def body(q, vals):
        v0, v1, v2, v3 = vals
        outs = []
        for s, v in enumerate((v0, v1, v2, v3)):
            g = q * 4 + s
            row = jnp.broadcast_to(
                lax.dynamic_slice(tt, (g, 0), (1, 128)), (8, 128))
            shuf = jnp.take_along_axis(row, lo, axis=1)
            outs.append(jnp.where(hi == g, shuf, v))
        return tuple(outs)

    z = jnp.zeros((8, 128), f32)
    v0, v1, v2, v3 = lax.fori_loop(0, max(R // 4, 1), body, (z, z, z, z))
    return v0 + v1 + v2 + v3


VARIANTS = {
    "v1_maskreduce": v1_mask_reduce,
    "v2_mxu": v2_mxu_reduce,
    "v3_shuffle": v3_small_shuffle,
    "v4_group_fori": v4_group_fori,
    "v5_group_static": v5_group_static,
}


def bench_variant(name, fn, R, n_iters=(16, 1024), n_med=5):
    N = R * 128
    tn = ((np.arange(N) * 13) % 997).astype(np.float32).reshape(R, 128)
    t = jnp.asarray(tn)

    def make(iters):
        def kernel(t_ref, s_ref, o_ref):
            tt = t_ref[:]

            def body(k, carry):
                sd, acc = carry
                sd = lcg(sd)
                idx = idx_from(sd, N)
                acc = acc + fn(tt, idx, R)
                return sd, acc

            sd0 = (jnp.broadcast_to(s_ref[0, 0], (8, 128))
                   + jax.lax.broadcasted_iota(u32, (8, 128), 0) * u32(7919)
                   + jax.lax.broadcasted_iota(u32, (8, 128), 1))
            _, acc = lax.fori_loop(0, iters, body,
                                   (sd0, jnp.zeros((8, 128), f32)))
            o_ref[0, 0] = jnp.sum(acc)

        @jax.jit
        def f(seed):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), f32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(t, jnp.broadcast_to(seed, (1, 1)))
        return f

    t_comp = time.time()
    try:
        f3 = make(3)
        got = float(np.asarray(f3(u32(42)))[0, 0])
    except Exception as e:
        emit({"stage": f"{name}_R{R}", "ok": False,
              "error": f"{type(e).__name__}: {e}"[:250]})
        return
    compile_s = time.time() - t_comp
    # numpy check
    sd = (np.full((8, 128), 42, np.uint64)
          + np.arange(8, dtype=np.uint64)[:, None] * 7919
          + np.arange(128, dtype=np.uint64)[None, :]).astype(np.uint32)
    acc = 0.0
    for _ in range(3):
        sd = lcg_np(sd)
        idx = ((sd >> np.uint32(8)) & np.uint32(0x7FFFFF)).astype(
            np.int64) % (R * 128)
        acc += tn.reshape(-1)[idx].sum()
    relerr = abs(got - acc) / max(abs(acc), 1.0)

    lo, hi = n_iters
    f_lo, f_hi = make(lo), make(hi)
    np.asarray(f_lo(u32(1)))
    np.asarray(f_hi(u32(1)))

    def med(f):
        ts = []
        for i in range(n_med):
            t0 = time.time()
            np.asarray(f(u32(11 + i)))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    m_lo, m_hi = med(f_lo), med(f_hi)
    per = (m_hi - m_lo) / (hi - lo)
    emit({"stage": f"{name}_R{R}", "ok": True,
          "relerr": round(relerr, 7), "compile_s": round(compile_s, 1),
          "us_per_gather": round(per * 1e6, 2),
          "ms_lo": round(m_lo * 1e3, 2), "ms_hi": round(m_hi * 1e3, 2)})


def bench_cumsum():
    try:
        def kernel(x_ref, o_ref):
            o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

        x = jnp.asarray(np.random.default_rng(0).random((8, 128), np.float32))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), f32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.allclose(np.asarray(out), np.cumsum(np.asarray(x), axis=1),
                         rtol=1e-5)
        emit({"stage": "cumsum_axis1", "ok": bool(ok)})
    except Exception as e:
        emit({"stage": "cumsum_axis1", "ok": False,
              "error": f"{type(e).__name__}: {e}"[:200]})


if __name__ == "__main__":
    emit({"mode": "env", "devices": [str(d) for d in jax.devices()]})
    bench_variant("v3_shuffle", v3_small_shuffle, 1)
    for R in (74, 1024 // 128, 8192 // 128, 114688 // 128):
        pass
    for R in (74, 896):
        bench_variant("v1_maskreduce", v1_mask_reduce, R)
        bench_variant("v2_mxu", v2_mxu_reduce, R)
        bench_variant("v4_group_fori", v4_group_fori, R, n_iters=(16, 256))
        bench_variant("v8_group_ilp", v8_group_ilp, R, n_iters=(16, 256))
    emit({"mode": "done"})
