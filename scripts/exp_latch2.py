"""Bisect WHICH part of phase_finish latches the session.
Usage: python scripts/exp_latch2.py <esc|esc_uv|esc_env|scat|acc|setup|rr>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from volren_tpu.ops import megakernel as M
from volren_tpu.ops import rng as _rng
from volren_tpu.ops.geometry import luma, sanitize, INV_4PI
from volren_tpu.ops.phase import phase_henyey_greenstein, sample_phase_henyey_greenstein
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

SUSPECT = sys.argv[1]
K, N = 32, 65536

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
s = state
p_dir = jax.random.normal(key, (N, 3))
p_dir = p_dir / jnp.linalg.norm(p_dir, axis=-1, keepdims=True)
throughput = jax.random.uniform(key, (N, 3))
event = jax.random.randint(key, (N,), 0, 6)
n_paths = jax.random.randint(key, (N,), 0, 4)
seed0 = jax.random.randint(key, (N,), 0, 2**31 - 1).astype(jnp.uint32)


@jax.jit
def run_esc(p_dir, throughput, n_paths, scene):
    uv_x, uv_y = M._dir_to_uv(scene.env.inv_transform, p_dir)
    le_env = scene.env.strength * M._env_bilinear_rows(scene.env.envmap, uv_x, uv_y)
    avg_w = scene.env.imp_mips[-1].reshape(())
    pdf_esc = luma(le_env) / avg_w * INV_4PI
    a2 = jnp.ones((N,))
    mis = jnp.where(n_paths > 0, a2 / jnp.maximum(a2 + pdf_esc * pdf_esc, 1e-32), 1.0)
    return throughput * mis[..., None] * le_env


@jax.jit
def run_esc_uv(p_dir, scene):
    uv_x, uv_y = M._dir_to_uv(scene.env.inv_transform, p_dir)
    return uv_x + uv_y


@jax.jit
def run_esc_env(p_dir, scene):
    uv_x = jnp.abs(p_dir[..., 0]) * 0.99
    uv_y = jnp.abs(p_dir[..., 1]) * 0.99
    return M._env_bilinear_rows(scene.env.envmap, uv_x, uv_y)


@jax.jit
def run_avgw(throughput, scene):
    avg_w = scene.env.imp_mips[-1].reshape(())
    return throughput / avg_w


@jax.jit
def run_scat(p_dir, throughput, seed, event):
    alive = event == 5
    rr_val = luma(throughput)
    rr = alive & (rr_val < 0.1)
    seed, u_rr = _rng.rng_masked(seed, rr)
    killed = rr & (u_rr < 1.0 - rr_val)
    seed, u2s = _rng.rng2_masked(seed, alive)
    sc_dir = sample_phase_henyey_greenstein(p_dir, params.phase_g, u2s)
    f_p_sc = phase_henyey_greenstein(jnp.sum(-p_dir * sc_dir, axis=-1), params.phase_g)
    return sc_dir, f_p_sc, seed


@jax.jit
def run_acc(s_accum, le, n_paths, event):
    end = event == 2
    alpha = jnp.clip(n_paths.astype(jnp.float32), 0.0, 1.0)
    sample_rgba = sanitize(jnp.concatenate([le, alpha[..., None]], axis=-1))
    return s_accum + jnp.where(end[..., None], sample_rgba, 0.0)


@jax.jit
def run_setup(s4, p_dir, scene):
    mask = jnp.ones((N,), bool)
    return M._setup_ray(
        dict(s4), scene.density.inv_transform, params.bb_min, params.bb_max,
        s4["p_org"], p_dir, mask,
    )["t"]


if SUSPECT == "esc":
    out = run_esc(p_dir, throughput, n_paths, scene)
elif SUSPECT == "esc_uv":
    out = run_esc_uv(p_dir, scene)
elif SUSPECT == "esc_env":
    out = run_esc_env(p_dir, scene)
elif SUSPECT == "avgw":
    out = run_avgw(throughput, scene)
elif SUSPECT == "scat":
    out = run_scat(p_dir, throughput, seed0, event)
elif SUSPECT == "acc":
    out = run_acc(state["accum"], throughput, n_paths, event)
elif SUSPECT == "setup":
    s4 = {k: state[k] for k in ("seed", "t", "far", "tau", "mip", "ipos0", "idir", "ri", "p_org")}
    out = run_setup(s4, p_dir, scene)
jax.block_until_ready(out)

after = t_probe()
print(f"suspect={SUSPECT}: probe before {before:.4f} ms/iter, after {after:.4f} ms/iter")
