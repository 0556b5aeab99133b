"""Gather-cost experiments on the real TPU: find a formulation where random
gathers inside a larger jitted program retain the fast standalone-gather
implementation (~0.3 ns/elem) instead of the fused/scalarized slow path.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
T = 8192  # table rows (smoke brick count)

key = jax.random.PRNGKey(0)
table1 = jax.random.uniform(key, (T,), jnp.float32)
table3 = jax.random.uniform(key, (T, 3), jnp.float32)
tableA = jax.random.randint(key, (T * 512,), 0, 255, jnp.int32).astype(jnp.uint8)
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
x = jax.random.uniform(key, (N,), jnp.float32)


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def g(flat, i):
    return flat.at[i].get(mode="promise_in_bounds")


@jax.jit
def standalone(table1, idx):
    return g(table1, idx)


@jax.jit
def fused(table1, idx, x):
    # elementwise work feeding and consuming the gather (phase-program shape)
    i = jnp.clip(idx + (x > 0.5), 0, T - 1)
    v = g(table1, i)
    return jnp.where(x > 0.2, v * x + jnp.exp(-v), v)


@jax.jit
def barriered(table1, idx, x):
    i = jnp.clip(idx + (x > 0.5), 0, T - 1)
    (i,) = jax.lax.optimization_barrier((i,))
    v = g(table1, i)
    (v,) = jax.lax.optimization_barrier((v,))
    return jnp.where(x > 0.2, v * x + jnp.exp(-v), v)


@jax.jit
def row3(table3, idx):
    return g(table3, idx)


@jax.jit
def row3_split(table3, idx):
    c0 = g(table3[:, 0], idx)
    c1 = g(table3[:, 1], idx)
    c2 = g(table3[:, 2], idx)
    return c0 + c1 + c2


@jax.jit
def atlas_u8(tableA, idx):
    return g(tableA, idx * 512).astype(jnp.float32)


@jax.jit
def chain4(table1, idx, x):
    v = x
    i = idx
    for _ in range(4):
        i = jnp.clip(i + (v > 0.5), 0, T - 1)
        v = g(table1, i) + v * 0.5
    return v


@jax.jit
def chain4_barrier(table1, idx, x):
    v = x
    i = idx
    for _ in range(4):
        i = jnp.clip(i + (v > 0.5), 0, T - 1)
        (i,) = jax.lax.optimization_barrier((i,))
        w = g(table1, i)
        (w,) = jax.lax.optimization_barrier((w,))
        v = w + v * 0.5
    return v


@jax.jit
def take_fused(table1, idx, x):
    i = jnp.clip(idx + (x > 0.5), 0, T - 1)
    v = jnp.take(table1, i, indices_are_sorted=False, unique_indices=False)
    return jnp.where(x > 0.2, v * x + jnp.exp(-v), v)


def ns(t):
    return t / N * 1e9


print(f"N={N} lanes, table {T} rows")
for name, fn, args in [
    ("standalone gather      ", standalone, (table1, idx)),
    ("fused gather           ", fused, (table1, idx, x)),
    ("barriered gather       ", barriered, (table1, idx, x)),
    ("take fused             ", take_fused, (table1, idx, x)),
    ("row3 gather            ", row3, (table3, idx)),
    ("row3 split gather      ", row3_split, (table3, idx)),
    ("atlas u8 gather        ", atlas_u8, (tableA, idx)),
    ("chain of 4 dep gathers ", chain4, (table1, idx, x)),
    ("chain4 + barriers      ", chain4_barrier, (table1, idx, x)),
]:
    t = timeit(fn, *args)
    print(f"{name}: {t*1e6:9.1f} us  ({ns(t):7.3f} ns/lane)")
