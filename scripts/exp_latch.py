"""Find the minimal program that latches the session into degraded-gather
mode. Usage: python scripts/exp_latch.py <suspect>

Each invocation is one fresh process: time a small gather-loop probe,
run the suspect program once, re-time the SAME compiled probe.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from volren_tpu.ops import megakernel as M
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

SUSPECT = sys.argv[1] if len(sys.argv) > 1 else "march"
K = 32
N = 65536

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.init(256, 256)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
grid0 = scene.density
dims, offs_t = grid0.mip_dims, grid0.mip_offsets


def idx_of(pos3, mip):
    iipos = jnp.floor(pos3).astype(jnp.int32)
    idx = jnp.zeros(pos3.shape[:-1], jnp.int32)
    for m in range(4):
        mz, my, mx = dims[m]
        bxm = jnp.clip(iipos[..., 0] >> (3 + m), 0, mx - 1)
        bym = jnp.clip(iipos[..., 1] >> (3 + m), 0, my - 1)
        bzm = jnp.clip(iipos[..., 2] >> (3 + m), 0, mz - 1)
        idx = jnp.where(mip == m, offs_t[m] + (bzm * my + bym) * mx + bxm, idx)
    return idx


@jax.jit
def probe(sub, mip_maj):
    def b(s, _):
        pos3 = s["ipos0"] + s["t"][..., None] * s["idir"]
        mip = jnp.round(s["mip"]).astype(jnp.int32)
        v = mip_maj.at[idx_of(pos3, mip)].get(mode="promise_in_bounds")
        return dict(s, t=s["t"] + v * 1e-6), None

    s, _ = lax.scan(b, sub, None, length=K)
    return s["t"]


key = jax.random.PRNGKey(0)
sub = {
    "t": jax.random.uniform(key, (N,)) * 10,
    "mip": jax.random.randint(key, (N,), 0, 4).astype(jnp.float32),
    "ipos0": jax.random.uniform(key, (N, 3)) * jnp.array([128.0, 256.0, 128.0]),
    "idir": jax.random.normal(key, (N, 3)),
}


def t_probe(n=20):
    o = probe(sub, grid0.mip_maj)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = probe(sub, grid0.mip_maj)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n / K * 1e3


before = t_probe()

state = M.init_state(256, 256)
spp, spp_base = jnp.int32(4), jnp.int32(0)
if SUSPECT == "none":
    pass
elif SUSPECT == "regen":
    state = M.phase_regen(state, scene, params, cfg, 256, spp, spp_base, 256)
elif SUSPECT == "march":
    state = M.phase_march(state, scene, params, cfg, 8)
elif SUSPECT == "march1":
    state = M.phase_march(state, scene, params, cfg, 1)
elif SUSPECT == "nee":
    state = M.phase_nee(state, scene, params, cfg)
elif SUSPECT == "finish":
    state = M.phase_finish(state, scene, params, cfg)
elif SUSPECT == "step":
    state = M.step_body(state, scene, params, cfg, 256, spp, spp_base, 256, 1)
jax.block_until_ready(state["mode"])

after = t_probe()
print(f"suspect={SUSPECT}: probe before {before:.4f} ms/iter, after {after:.4f} ms/iter")
