"""Device-queue L x csize sweep at 256^2 and 1024^2 (smoke, 100 bounces).

L=16k tripled throughput over L=64k at 256^2 (15.7 vs 5.2 spp/s): per-step
cost ~ a + b*L while queue work is L-independent, so small lane arrays win
until steps ~ max(W/L, straggler depth) bites. Finds the optimum per
resolution. Run ALONE.
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


SEED = int(time.time()) & 0x7FFFFFFF

from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import Volume
from volren_tpu.ops.worklist import render_wavefront_queue_device

r = Renderer()
r.volume = Volume("/root/reference/data/smoke.brick")
r.scale_and_move_to_unit_cube()
r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
r.bounces = 100
r.seed = SEED
r.init(256, 256)
r.commit()
scene, params, cfg = r._scene_device(), r._trace_params(), r._config()

spp_base = [0]


def run(res, spp, cfg=cfg, tag="", **kw):
    label = f"{res}^2 spp{spp} {tag} " + " ".join(f"{k}={v}" for k, v in kw.items())
    t0 = time.time()
    out = render_wavefront_queue_device(
        scene, params, cfg, res, res, spp, 990_000 + spp_base[0], **kw
    )
    _ = np.asarray(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = render_wavefront_queue_device(
        scene, params, cfg, res, res, spp, spp_base[0], **kw
    )
    out = np.asarray(out)
    dt = time.time() - t0
    spp_base[0] += spp
    print(json.dumps({
        "probe": "dq_sweep", "label": label, "res": res,
        "spp_s": round(spp / dt, 3), "wall_s": round(dt, 2),
        "compile_s": round(compile_s, 1),
        "mean": float(out[..., :3].mean() / spp), "seed": SEED,
    }), flush=True)


PART = os.environ.get("PROBE_PART", "256")

if PART.startswith("parity"):
    # the README parity config (dense medium: density 100 ABSOLUTE,
    # bounces 128, env 3/270°, phase .3, albedo .8): te x dequeue-gating
    # matrix. Result (parity256.jsonl): current defaults are FASTEST here
    # too (58.8 vs 28.6 spp/s for the round-2 knob set) — the apparent
    # "60x regression" in fault.jsonl walls was cold compile, not render.
    r.environment.strength = 3.0
    from volren_tpu.scene.environment import rotation_y

    r.environment.transform = rotation_y(270.0)
    r.set_environment(r.environment)
    r.bounces = 128
    r.albedo = np.array([0.8, 0.8, 0.8], np.float32)
    r.phase = 0.3
    r.density_scale = 100.0
    r.commit()
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    if PART == "parity256":
        run(256, 16, csize=2, unroll=4, lanes=4096, test_every=2,
            dequeue_every=1, tag="r2-config")
        run(256, 16, csize=2, unroll=4, lanes=4096, test_every=2,
            tag="te2-gated")
        run(256, 16, csize=2, unroll=4, lanes=4096, test_every=4,
            dequeue_every=1, tag="te4-ungated")
        run(256, 16, csize=2, unroll=4, lanes=4096, tag="current-default")
elif PART == "256":
    for L in (4096, 8192, 16384):
        run(256, 16, csize=2, unroll=4, lanes=L)
    run(256, 16, csize=1, unroll=4, lanes=8192)
    run(256, 16, csize=4, unroll=4, lanes=8192)
    run(256, 16, csize=2, unroll=8, lanes=8192)
elif PART == "1024":
    for L in (16384, 32768):
        run(1024, 16, csize=2, unroll=4, lanes=L)
elif PART == "knobs":
    # march/test granularity at the L=4096 optimum (256^2): per-step cost
    # at small L is op-count-bound, so k_march/test_every trade op count
    # against step count
    run(256, 16, csize=2, unroll=4, lanes=4096, k_march=4)
    run(256, 16, csize=2, unroll=4, lanes=4096, k_march=16)
    run(256, 16, csize=2, unroll=4, lanes=4096, test_every=4)
    run(256, 16, csize=2, unroll=4, lanes=4096, k_march=16, test_every=4)
    run(256, 16, csize=2, unroll=4, lanes=2048)
    run(256, 64, csize=2, unroll=4, lanes=4096)
elif PART == "1024b":
    run(1024, 16, csize=2, unroll=4, lanes=8192)
    run(1024, 16, csize=1, unroll=4, lanes=16384)
    run(1024, 64, csize=2, unroll=4, lanes=16384)
elif PART == "1024knobs":
    run(1024, 16, csize=2, unroll=4, lanes=16384, test_every=4)
    run(1024, 16, csize=2, unroll=4, lanes=16384, k_march=4, test_every=4)
    run(1024, 16, csize=2, unroll=4, lanes=16384, k_march=4)
    run(1024, 64, csize=2, unroll=4, lanes=16384, test_every=4)
elif PART == "gate":
    # dequeue gating A/B + unroll sweep: the claim/flush machinery is
    # ~0.87 ms/step at 16k lanes (attrib.jsonl) and the while_loop carries
    # ~2.2 ms/iteration FIXED -> gating pays ~40%/unroll and bigger unroll
    # divides the fixed cost.
    run(256, 16, csize=2, unroll=4, lanes=4096, dequeue_every=1)
    run(256, 16, csize=2, unroll=4, lanes=4096)   # gated (= unroll)
    run(256, 16, csize=2, unroll=8, lanes=4096)
    run(256, 16, csize=2, unroll=16, lanes=4096)
elif PART == "gate2":
    # post-gating re-sweep at 1024^2 (the old optima were measured with
    # per-step dequeues): lane count, test_every, csize, NEE frequency
    run(1024, 16, csize=2, unroll=4, lanes=8192)
    run(1024, 16, csize=2, unroll=4, lanes=24576)
    run(1024, 16, csize=2, unroll=4, lanes=32768)
    run(1024, 16, csize=2, unroll=4, lanes=16384, test_every=4)
    run(1024, 16, csize=1, unroll=4, lanes=16384)
    run(1024, 16, csize=2, unroll=4, lanes=16384, nee_every=4)
elif PART == "gate3":
    # 256^2 refinements at the gated optimum
    run(256, 16, csize=2, unroll=4, lanes=4096, test_every=4)
    run(256, 16, csize=2, unroll=4, lanes=8192)
    run(256, 16, csize=2, unroll=4, lanes=4096, nee_every=4)
    run(256, 16, csize=1, unroll=4, lanes=4096)
elif PART == "km":
    # march-group length at the work-bound 1024^2 regime: micro-steps fuse
    # (floor_chain.jsonl), so longer k_march trades nearly-free micro-steps
    # for fewer NEE/finish phases per drain; baseline repeated for a noise
    # reference (the degraded-mode lottery makes single runs +-30%)
    run(1024, 16, csize=2, unroll=4, lanes=16384, tag="base-k8")
    run(1024, 16, csize=2, unroll=4, lanes=16384, k_march=16, tag="k16")
    run(1024, 16, csize=2, unroll=4, lanes=16384, k_march=16, test_every=8,
        tag="k16te8")
    run(1024, 16, csize=4, unroll=4, lanes=16384, tag="csize4")
    run(1024, 16, csize=2, unroll=4, lanes=16384, tag="base-k8-rep")
elif PART == "pack":
    # packed while-carry A/B (floor.jsonl: ~0.1 ms per carried buffer per
    # step; the state dict is ~25 leaves -> packing should cut the
    # per-step fixed floor several-fold at small lane counts)
    run(256, 16, csize=2, unroll=4, lanes=4096, tag="packed")
    run(256, 16, csize=2, unroll=4, lanes=4096, pack_carry=False,
        tag="unpacked")
    run(1024, 16, csize=2, unroll=4, lanes=16384, tag="packed")
    run(1024, 16, csize=2, unroll=4, lanes=16384, pack_carry=False,
        tag="unpacked")
    run(1024, 16, csize=2, unroll=4, lanes=4096, tag="packed-L4k")
    run(1024, 16, csize=2, unroll=2, lanes=16384, tag="packed-u2")
elif PART == "gate4":
    # pick the renderer's auto-lane cap at 1024^2 under the new te=4
    # default (gate2 measured te4 only at L=16384)
    run(1024, 16, csize=2, unroll=4, lanes=32768, test_every=4)
    run(1024, 16, csize=2, unroll=4, lanes=24576, test_every=4)
    run(1024, 16, csize=2, unroll=4, lanes=16384, test_every=4)
elif PART == "gate1024":
    run(1024, 16, csize=2, unroll=4, lanes=16384, dequeue_every=1)
    run(1024, 16, csize=2, unroll=4, lanes=16384)
    run(1024, 16, csize=2, unroll=8, lanes=16384)
    run(1024, 16, csize=2, unroll=16, lanes=16384)
    run(1024, 16, csize=2, unroll=16, lanes=32768)
elif PART == "256b":
    run(256, 16, csize=2, unroll=4, lanes=2048, test_every=4)
    run(256, 16, csize=2, unroll=4, lanes=4096, test_every=8)
    run(256, 16, csize=2, unroll=4, lanes=4096, k_march=4, test_every=4)
