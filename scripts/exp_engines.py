"""Head-to-head: host-stepped phase engine vs single-jit while_loop engine
on the real smoke scene at a given resolution/spp."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from volren_tpu.ops import megakernel as M
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 4
ENGINES = sys.argv[3].split(",") if len(sys.argv) > 3 else ["host", "device"]

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.init(RES, RES)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()

if "host" in ENGINES:
    t0 = time.perf_counter()
    acc = M.render_wavefront_host(scene, params, cfg, RES, RES, SPP, 0)
    jax.block_until_ready(acc)
    t_host = time.perf_counter() - t0
    print(f"host-stepped : {t_host:8.2f} s  ({SPP/t_host:8.3f} spp/s)  mean {float(acc.mean()):.4f}")

if "device" in ENGINES:
    t0 = time.perf_counter()
    acc2, it = M.render_wavefront_stats(scene, params, cfg, RES, RES, jnp.int32(SPP), jnp.int32(0))
    jax.block_until_ready(acc2)
    t_compile_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc2, it = M.render_wavefront_stats(scene, params, cfg, RES, RES, jnp.int32(SPP), jnp.int32(0))
    jax.block_until_ready(acc2)
    t_dev = time.perf_counter() - t0
    print(
        f"single-jit   : {t_dev:8.2f} s  ({SPP/t_dev:8.3f} spp/s)  "
        f"iters={int(it)}  {t_dev/int(it)*1e3:.3f} ms/iter  "
        f"(first call incl compile {t_compile_run:.1f} s)  mean {float(acc2.mean()):.4f}"
    )
