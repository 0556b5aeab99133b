"""Bisect the march microstep ON DEVICE (inside lax.scan) piece by piece."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from volren_tpu.ops import megakernel as M
from volren_tpu.ops import rng as _rng
from volren_tpu.ops.grid import (
    lookup_majorant,
    lookup_density_brick,
    stochastic_tricubic_filter,
)
from volren_tpu.ops.tracking import MIP_SPEED_UP, _density_at, _add_emission
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 32

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.init(RES, RES)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
w = h = RES

state = M.init_state(w, h)
for _ in range(8):
    state = M.phase_regen(state, scene, params, cfg, w, jnp.int32(4), jnp.int32(0), h)
    state = M.phase_march(state, scene, params, cfg, 8)
    state = M.phase_nee(state, scene, params, cfg)
    state = M.phase_finish(state, scene, params, cfg)
jax.block_until_ready(state["mode"])


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def scanner(body):
    @jax.jit
    def run(state, scene, params):
        def b(s, _):
            return body(dict(s), scene, params), None

        s, _ = lax.scan(b, state, None, length=K)
        return s["t"]

    return lambda: run(state, scene, params)


f32, i32 = jnp.float32, jnp.int32


def b_mask_math(s, scene, params):
    """curr + dt math, constant majorant, no gather, no density."""
    t, far, tau, mip = s["t"], s["far"], s["tau"], s["mip"]
    ipos0, idir, ri = s["ipos0"], s["idir"], s["ri"]
    march = ((s["mode"] == M.MODE_EXTEND) | (s["mode"] == M.MODE_SHADOW)) & (s["event"] == M.EV_NONE)
    curr = ipos0 + t[..., None] * idir
    mip_i = jnp.round(mip).astype(i32)
    maj = t * 0.01 + 1.0
    dim = (8 << mip_i).astype(f32)[..., None]
    offs = jnp.where(ri >= 0.0, dim + 0.5, -0.5)
    dt = ((jnp.floor(curr / dim) * dim + offs - curr) * ri).min(axis=-1)
    t_adv = t + dt
    tau_adv = tau - maj * dt
    collide = march & (tau_adv <= 0.0)
    t = jnp.where(march, jnp.where(collide, t_adv + tau_adv / jnp.maximum(maj, 1e-20), t_adv), t)
    s.update(t=t, tau=jnp.where(march, tau_adv, tau), mip=jnp.where(march, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip))
    return s


def b_majorant(s, scene, params):
    """mask math + real majorant gather."""
    t, mip = s["t"], s["mip"]
    curr = s["ipos0"] + t[..., None] * s["idir"]
    mip_i = jnp.round(mip).astype(i32)
    maj = lookup_majorant(scene.density, curr, mip_i, params.density_scale)
    s.update(t=t + maj * 1e-6)
    return s


def b_advance(s, scene, params):
    """mask math + majorant gather (full advance, no density test)."""
    t, far, tau, mip = s["t"], s["far"], s["tau"], s["mip"]
    ipos0, idir, ri = s["ipos0"], s["idir"], s["ri"]
    march = ((s["mode"] == M.MODE_EXTEND) | (s["mode"] == M.MODE_SHADOW)) & (s["event"] == M.EV_NONE)
    curr = ipos0 + t[..., None] * idir
    mip_i = jnp.round(mip).astype(i32)
    maj = lookup_majorant(scene.density, curr, mip_i, params.density_scale)
    dim = (8 << mip_i).astype(f32)[..., None]
    offs = jnp.where(ri >= 0.0, dim + 0.5, -0.5)
    dt = ((jnp.floor(curr / dim) * dim + offs - curr) * ri).min(axis=-1)
    t_adv = t + dt
    tau_adv = tau - maj * dt
    collide = march & (tau_adv <= 0.0)
    t = jnp.where(march, jnp.where(collide, t_adv + tau_adv / jnp.maximum(maj, 1e-20), t_adv), t)
    s.update(t=t, tau=jnp.where(march, tau_adv, tau), mip=jnp.where(march, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip))
    return s


def b_density(s, scene, params):
    """density test only (stochastic tricubic + 2 gathers)."""
    test = s["event"] == M.EV_NONE
    pos_col = s["ipos0"] + s["t"][..., None] * s["idir"]
    d, _rgba, seed = _density_at(scene, params, cfg, pos_col, s["seed"], test)
    s.update(seed=seed, t=s["t"] + d * 1e-6)
    return s


def b_tricubic_only(s, scene, params):
    """stochastic tricubic filter (9 rng draws) without the table gather."""
    test = s["event"] == M.EV_NONE
    pos_col = s["ipos0"] + s["t"][..., None] * s["idir"]
    tap, seed = stochastic_tricubic_filter(pos_col, s["seed"], test)
    s.update(seed=seed, t=s["t"] + tap[..., 0] * 1e-6)
    return s


def b_brick_lookup(s, scene, params):
    """plain nearest brick lookup (2 gathers), no filter."""
    pos_col = s["ipos0"] + s["t"][..., None] * s["idir"]
    d = lookup_density_brick(scene.density, pos_col)
    s.update(t=s["t"] + d * 1e-6)
    return s


def b_emission(s, scene, params):
    test = s["event"] == M.EV_NONE
    pos_col = s["ipos0"] + s["t"][..., None] * s["idir"]
    le, seed = _add_emission(
        scene, params, cfg, pos_col, s["t"], s["throughput"], s["L"], s["seed"], test
    )
    s.update(seed=seed, L=le)
    return s


def b_full(s, scene, params):
    return M.phase_march_body(s, scene, params, cfg, 1)


print(f"{RES}^2 lanes, scan K={K}")
for name, body in [
    ("mask+dt math        ", b_mask_math),
    ("majorant gather only", b_majorant),
    ("advance (math+major)", b_advance),
    ("brick lookup only   ", b_brick_lookup),
    ("tricubic filter only", b_tricubic_only),
    ("density test        ", b_density),
    ("emission            ", b_emission),
    ("FULL march k=1      ", b_full),
]:
    t = timeit(scanner(body))
    print(f"{name}: {t/K*1e3:8.3f} ms/iter")
