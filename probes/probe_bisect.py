"""Bisect the REAL per-step cost of the wavefront megastep.

Truthful timing only: fixed-length loops of u=32 megastep calls with a
host pull of n_active every call (async chains without pulls are fiction
on this runtime). spp=1e6 keeps every lane active, so each config pays
steady-state cost. Decomposes by k_march, test_every, NEE/escape on/off,
onehot on/off, compaction, and lane count. Run ALONE.
"""

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


from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops import megakernel as M

CALLS = int(os.environ.get("PROBE_CALLS", "16"))

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.init(256, 256)
r.commit()
scene, params, cfg0 = r._scene_device(), r._trace_params(), r._config()

spp = jnp.asarray(1_000_000, jnp.int32)
zero = jnp.asarray(0, jnp.int32)


def measure(label, cfg=None, side=256, k_march=8, unroll=32, te=2, **extra):
    cfg = cfg0 if cfg is None else cfg
    state = M.init_state(side, side)
    # warm: 2 calls, pull
    t0 = time.time()
    for _ in range(2):
        state, na = M._megastep_jit(state, scene, params, cfg, side, spp, zero,
                                    side, k_march, unroll, te)
        np.asarray(na)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(CALLS):
        state, na = M._megastep_jit(state, scene, params, cfg, side, spp, zero,
                                    side, k_march, unroll, te)
        np.asarray(na)  # force
    dt = time.time() - t0
    ms_call = dt / CALLS * 1000
    print(json.dumps({
        "probe": "bisect", "label": label, "lanes": side * side,
        "ms_per_call": round(ms_call, 2), "ms_per_step": round(ms_call / unroll, 3),
        "k_march": k_march, "unroll": unroll, "te": te,
        "compile_s": round(compile_s, 1), **extra,
    }), flush=True)


ONLY = os.environ.get("PROBE_ONLY", "").split(",") if os.environ.get("PROBE_ONLY") else None


def want(name):
    return ONLY is None or name in ONLY


if want("base"):
    measure("base k8 te2 u32")
if want("k1"):
    measure("k_march=1", k_march=1, te=1)
if want("k2"):
    measure("k_march=2", k_march=2, te=2)
if want("te8"):
    measure("te=8 (1 resolve/step)", te=8)
if want("u8"):
    measure("unroll=8", unroll=8)
if want("u128"):
    measure("unroll=128", unroll=128)
if want("scalar"):
    measure("onehot off", cfg=cfg0._replace(use_onehot=False, env_nearest_nee=False))
if want("side128"):
    measure("lanes 128^2", side=128)
if want("side512"):
    measure("lanes 512^2", side=512)
