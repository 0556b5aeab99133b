"""How does while-loop per-iteration cost scale with body complexity?

Body = G dependent (gather + small elementwise cluster) units over N lanes,
optionally with W extra carried state arrays (to model the wavefront state).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
K = 32
T = 8192

key = jax.random.PRNGKey(0)
table = jax.random.uniform(key, (T,), jnp.float32)
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
x = jax.random.uniform(key, (N,), jnp.float32)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make(G, W):
    extra = [x * (i + 1) for i in range(W)]

    @jax.jit
    def run(table, idx, x, *extra):
        def b(c, _):
            i, v, ex = c[0], c[1], list(c[2:])
            for g_ in range(G):
                i = (i + (v * 1024).astype(jnp.int32)) % T
                w = table.at[i].get(mode="promise_in_bounds")
                v = jnp.where(v > 0.5, w * 0.5 + v * 0.25, w)
            ex = [e + v for e in ex]
            return (i, v, *ex), None

        c, _ = lax.scan(b, (idx, x, *extra), None, length=K)
        return c[1]

    return lambda: run(table, idx, x, *extra)


print(f"N={N}, K={K} scan iters")
for G in (1, 2, 4, 8, 16):
    for W in (0, 8, 16):
        t = timeit(make(G, W))
        print(f"G={G:2d} gathers, W={W:2d} carried: {t/K*1e3:8.3f} ms/iter")
