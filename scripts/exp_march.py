"""Strip-down timing of the march phase to locate the per-microstep cost.

Variants at N lanes on the real smoke scene:
  ident      — jit identity over the same state pytree (dispatch+copy floor)
  advance    — majorant gather + DDA step math only
  adv_nogath — same but majorant replaced by a constant (no gather)
  classify   — density test + emission + tau redraw only
  full       — the real phase_march k=1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from volren_tpu.ops import megakernel as M
from volren_tpu.ops import rng as _rng
from volren_tpu.ops.grid import lookup_majorant
from volren_tpu.ops.tracking import MIP_SPEED_UP, _density_at, _add_emission
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256

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


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


MKEYS = M._RW["march"]


@jax.jit
def ident(rw):
    return {k: v * 1 for k, v in rw.items()}


def advance_body(s, use_gather=True):
    f32, i32 = jnp.float32, jnp.int32
    grid = scene.density
    mode, event = s["mode"], s["event"]
    t, far, tau, mip = s["t"], s["far"], s["tau"], s["mip"]
    ipos0, idir, ri = s["ipos0"], s["idir"], s["ri"]
    march = ((mode == M.MODE_EXTEND) | (mode == M.MODE_SHADOW)) & (event == M.EV_NONE)
    curr = ipos0 + t[..., None] * idir
    mip_i = jnp.round(mip).astype(i32)
    if use_gather:
        maj = lookup_majorant(grid, curr, mip_i, params.density_scale)
    else:
        maj = t * 0.1 + 1.0
    dim = (8 << mip_i).astype(f32)[..., None]
    offs = jnp.where(ri >= 0.0, dim + 0.5, -0.5)
    dt = ((jnp.floor(curr / dim) * dim + offs - curr) * ri).min(axis=-1)
    t_adv = t + dt
    tau_adv = tau - maj * dt
    collide = march & (tau_adv <= 0.0)
    t = jnp.where(march, jnp.where(collide, t_adv + tau_adv / jnp.maximum(maj, 1e-20), t_adv), t)
    exited = march & (t >= far)
    mip = jnp.where(march, jnp.minimum(mip + MIP_SPEED_UP, 3.0), mip)
    tau = jnp.where(march & ~collide, tau_adv, tau)
    event = jnp.where(collide & ~exited, 99, jnp.where(exited, 98, event))
    return dict(s, event=event, t=t, tau=tau, mip=mip)


@jax.jit
def advance(s):
    out = advance_body(s)
    return {k: out[k] for k in MKEYS}


@jax.jit
def adv_nogath(s):
    out = advance_body(s, use_gather=False)
    return {k: out[k] for k in MKEYS}


@jax.jit
def classify(s):
    test = s["event"] == M.EV_NONE
    is_extend = s["mode"] == M.MODE_EXTEND
    seed = s["seed"]
    pos_col = s["ipos0"] + s["t"][..., None] * s["idir"]
    d, _rgba, seed = _density_at(scene, params, cfg, pos_col, seed, test)
    le, seed = _add_emission(
        scene, params, cfg, pos_col, d * params.inv_majorant,
        s["throughput"], s["L"], seed, test & is_extend,
    )
    seed, u_cls = _rng.rng_masked(seed, test)
    real = test & (u_cls * 5.0 < d)
    seed, u_tau = _rng.rng_masked(seed, test & ~real)
    tau = jnp.where(test & ~real, -jnp.log(1.0 - u_tau), s["tau"])
    event = jnp.where(real, 97, s["event"])
    return dict(event=event, seed=seed, t=s["t"], tau=tau, mip=s["mip"], L=le)


rw = {k: state[k] for k in MKEYS}
full_state = dict(state)

print(f"{RES}^2 = {RES*RES} lanes")
t = timeit(ident, rw)
print(f"ident      : {t*1e3:8.3f} ms")
t = timeit(advance, full_state)
print(f"advance    : {t*1e3:8.3f} ms")
t = timeit(adv_nogath, full_state)
print(f"adv_nogath : {t*1e3:8.3f} ms")
t = timeit(classify, full_state)
print(f"classify   : {t*1e3:8.3f} ms")
t = timeit(lambda s: M.phase_march(s, scene, params, cfg, 1), full_state)
print(f"full k=1   : {t*1e3:8.3f} ms")
t = timeit(lambda s: M.phase_march(s, scene, params, cfg, 8), full_state)
print(f"full k=8   : {t*1e3:8.3f} ms")
