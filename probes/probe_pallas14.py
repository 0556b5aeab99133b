"""Round-4: TPU fetch-path exactness audit + end-to-end verify drive.

pallas13 proved Mosaic's DEFAULT f32 dot_general precision is bf16
(the one-hot MXU experiment decoded garbage from 16-bit halves). The
production kernel's dynamic_gather fetch ALSO reduces through f32
dot_generals (`ones(1,bn) @ masked` row-sums; scatter_flush's
outer-product) that the interpret-mode tests can't audit — if Mosaic
lowers those to bf16 MXU passes too, every f32 table fetch (meta lo/hi,
pool, tf) carries a silent ~0.4% truncation on real TPU.

Stages (one TPU process; CPU cross-check runs separately):
1. strip vs queue(+tile) bitwise equality ON TPU — isolates
   scatter_flush (queue-only) against the strip path.
2. compacted vs full-lane serving bitwise equality ON TPU.
3. dump a fixed-seed 256^2 render to .npy; scripts then compare
   against the CPU interpreter (true f32) — bf16 truncation shows as
   ~1e-3 relative divergence, fp-contraction noise as <1e-5.
4. end-to-end Renderer.trace + PNG (the verify-skill drive).
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
                   "pallas14.jsonl")
NPY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas14_tpu.npy")
SEED = 424243          # FIXED: the CPU cross-check must reproduce it


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas14")
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
    params = r._trace_params()
    pool = build_env_pool(scene, SEED, 0)
    pf, pi = build_params_rows(scene, params, RES, RES, 0)
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
        "max_abs": float(np.abs(strip - queue).max()),
        "mean": float(queue[:, :3].mean())})

    full = np.asarray(render_strips(packed, pool, pf, pi, n_pix, RES,
                                    SPP, queue_items=65536, tile_w=256,
                                    resolve_full=True, escape_full=True,
                                    nee_full=True))
    emit({"stage": "full_vs_queue", "bitwise": bool(
        np.array_equal(full, queue)),
        "max_abs": float(np.abs(full - queue).max()),
        "mean": float(full[:, :3].mean())})

    np.save(NPY, full)
    emit({"stage": "dump", "path": NPY})

    # end-to-end verify drive: Renderer.trace through the champion
    # engine defaults + PNG save (the verify-skill recipe, library
    # boundary)
    r2 = build(128)
    r2.step_engine = "pallas"
    r2.trace(4)
    img = np.asarray(r2.fbo_data())
    finite = bool(np.isfinite(img).all())
    from volren_tpu.utils.image import save_ldr

    png = "/tmp/verify_out.png"
    save_ldr(png, img)
    ok = os.path.exists(png) and os.path.getsize(png) > 0
    emit({"stage": "verify_e2e", "finite": finite,
          "mean": float(img.mean()), "png_ok": bool(ok),
          "nonblack": bool(img.mean() > 0.01)})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
