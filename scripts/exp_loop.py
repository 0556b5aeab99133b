"""Do gathers inside device-side loops scalarize? Re-test on today's runtime.

Compares per-iteration cost of a dependent gather chain:
  flat     — K unrolled gathers in one program
  fori     — lax.fori_loop with K iterations, same body
  scan     — lax.scan, same body
  while    — lax.while_loop, same body
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
T = 8192

key = jax.random.PRNGKey(0)
table = jax.random.uniform(key, (T,), jnp.float32)
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
x = jax.random.uniform(key, (N,), jnp.float32)


def g(flat, i):
    return flat.at[i].get(mode="promise_in_bounds")


def body(table, i, v):
    i = (i + (v * 1024).astype(jnp.int32)) % T
    v = g(table, i) + v * 0.5
    return i, v


@jax.jit
def flat(table, idx, x):
    i, v = idx, x
    for _ in range(K):
        i, v = body(table, i, v)
    return v


@jax.jit
def fori(table, idx, x):
    def b(_, c):
        return body(table, *c)

    i, v = lax.fori_loop(0, K, b, (idx, x))
    return v


@jax.jit
def scan(table, idx, x):
    def b(c, _):
        return body(table, *c), None

    (i, v), _ = lax.scan(b, (idx, x), None, length=K)
    return v


@jax.jit
def wloop(table, idx, x):
    def cond(c):
        return c[0] < K

    def b(c):
        k, i, v = c
        i, v = body(table, i, v)
        return k + 1, i, v

    _, i, v = lax.while_loop(cond, b, (jnp.int32(0), idx, x))
    return v


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


print(f"N={N}, K={K}")
for name, fn in [("flat ", flat), ("fori ", fori), ("scan ", scan), ("while", wloop)]:
    t = timeit(fn, table, idx, x)
    print(f"{name}: {t*1e3:9.3f} ms total, {t/K*1e6:8.2f} us/iter, {t/K/N*1e9:7.3f} ns/lane/iter")
