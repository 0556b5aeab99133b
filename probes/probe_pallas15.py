"""Round-4: Precision.HIGHEST exactness fix — re-check + cost.

pallas14 proved the queue engine's scatter_flush outer-product ran at
Mosaic's default bf16 dot precision (strip-vs-queue max_abs 0.011 on
TPU, bitwise-equal on the interpreter). The shipped fix is
Precision.HIGHEST — Mosaic's contract_precision<fp32>, a true f32
contract and therefore exact (Mosaic lowers only DEFAULT|HIGHEST; the
bf16x3 HIGH pass documented in earlier drafts does not exist there).
This probe verifies the fix ON TPU and prices it:

1. strip vs queue(+tile) bitwise at 256^2/4spp -> must now be TRUE.
2. fresh fixed-seed dump for the interpreter cross-check
   (probe_pallas14_cpu.py with PALLAS15=1).
3. champion ee2 rate at 1024^2/16spp (cost of HIGHEST in the fetch
   row-sums + flush; pallas13 same-session baseline was 9.58/9.35).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas15.jsonl")
NPY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas15_tpu.npy")
SEED = 424243


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas15")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def build(res):
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = 100
    r.seed = SEED
    r.init(res, res)
    r.commit()
    return r


def main():
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    emit({"mode": "env", "seed": SEED})
    RES, SPP = 256, 4
    r = build(RES)
    scene = r._scene_device()
    packed = pack_scene(scene)
    pool = build_env_pool(scene, SEED, 0)
    pf, pi = build_params_rows(scene, r._trace_params(), RES, RES, 0)
    n_pix = RES * RES

    t0 = time.time()
    strip = np.asarray(render_strips(packed, pool, pf, pi, n_pix, RES,
                                     SPP))
    emit({"stage": "strip", "cold_s": round(time.time() - t0, 1),
          "mean": float(strip[:, :3].mean())})
    queue = np.asarray(render_strips(packed, pool, pf, pi, n_pix, RES,
                                     SPP, queue_items=65536, tile_w=256))
    emit({"stage": "queue_vs_strip", "bitwise": bool(
        np.array_equal(strip, queue)),
        "max_abs": float(np.abs(strip - queue).max())})
    full = np.asarray(render_strips(packed, pool, pf, pi, n_pix, RES,
                                    SPP, queue_items=65536, tile_w=256,
                                    resolve_full=True, escape_full=True,
                                    nee_full=True))
    emit({"stage": "full_vs_queue", "bitwise": bool(
        np.array_equal(full, queue)),
        "max_abs": float(np.abs(full - queue).max())})
    np.save(NPY, full)

    # champion rate at 1024^2/16spp (ee2 config, now with HIGH dots)
    r2 = build(1024)
    scene = r2._scene_device()
    packed = pack_scene(scene)
    pool = build_env_pool(scene, SEED, 0)
    pf, pi = build_params_rows(scene, r2._trace_params(), 1024, 1024, 0)
    kw = dict(k_march=4, test_every=2, unroll=2, escape_every=2,
              queue_items=65536, resolve_full=True, escape_full=True,
              nee_full=True, tile_w=256, return_iters=True)
    t0 = time.time()
    img, iters = render_strips(packed, pool, pf, pi, 1024 * 1024, 1024,
                               16, **kw)
    np.asarray(img)
    cold = time.time() - t0
    for tag in ("ee2_high", "rep_ee2_high"):
        t0 = time.time()
        img, iters = render_strips(packed, pool, pf, pi, 1024 * 1024,
                                   1024, 16, **kw)
        imgh = np.asarray(img)
        warm = time.time() - t0
        it = np.asarray(iters)
        emit({"stage": "rate", "tag": tag, "cold_s": round(cold, 1),
              "warm_s": round(warm, 2),
              "spp_per_s": round(16 / warm, 2),
              "iters_mean": round(float(it.mean()), 1),
              "us_per_step": round(warm * 1e6 / max(float(it.sum()), 1),
                                   2),
              "mean": round(float(imgh[:, :3].mean()), 5)})
        cold = 0.0
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
