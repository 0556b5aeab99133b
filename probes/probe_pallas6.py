"""Megakernel attribution: per-while-iteration cost + drain-tail
inflation, via the kernel's new per-strip iteration counter.

For each config at 1024^2/16spp (smoke + table_mountain, bounces 100):
  wall_s, total iters, per-iter us, and inflation =
  (iters * 1024 lanes) / (n_pix * spp * 4.3 steps/sample)
(4.3 wavefront-steps/sample is the queue engine's measured work bound,
NOTES.md). Run ALONE (touch /tmp/tpu_busy)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas6.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas6")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    emit({"mode": "env", "seed": SEED})
    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = 100
    r.seed = SEED
    r.init(1024, 1024)
    r.commit()
    scene = r._scene_device()
    packed = pack_scene(scene)
    params = r._trace_params()
    pool = build_env_pool(scene, SEED, 0)
    SPP = 16

    for res in (1024, 256):
        n_pix = res * res
        pf, pi = build_params_rows(scene, params, res, res, 0)
        for te, un, ee in ((4, 1, 1), (4, 2, 2), (2, 2, 2), (2, 4, 4)):
            try:
                args = (packed, pool, pf, pi, n_pix, res, SPP)
                kw = dict(test_every=te, unroll=un, escape_every=ee,
                          return_iters=True)
                t0 = time.time()
                img, iters = render_strips(*args, **kw)
                np.asarray(img)
                cold = time.time() - t0
                t0 = time.time()
                img, iters = render_strips(*args, **kw)
                np.asarray(img)
                warm = time.time() - t0
                it = np.asarray(iters)
                total_steps = float(it.sum()) * un  # iters count unrolled
                lane_steps = total_steps * 1024 / un  # per-iter lanes
                # NOTE: oit counts while-iterations (each = `un` steps)
                wf_steps = float(it.sum())  # already step units (it+unroll)
                infl = wf_steps * 1024 / (n_pix * SPP * 4.3)
                emit({"stage": f"attrib_{res}", "te": te, "unroll": un,
                      "ee": ee, "ok": True,
                      "warm_s": round(warm, 2), "cold_s": round(cold, 2),
                      "spp_per_s": round(SPP / warm, 2),
                      "iters_mean": round(float(it.mean()), 1),
                      "iters_p99": float(np.percentile(it, 99)),
                      "us_per_step": round(
                          warm * 1e6 / max(wf_steps, 1), 2),
                      "inflation_vs_queuebound": round(infl, 2),
                      "mean": round(float(np.asarray(img)[:, :3].mean()),
                                    5)})
                del lane_steps, total_steps
            except Exception as e:
                emit({"stage": f"attrib_{res}", "te": te, "unroll": un,
                      "ee": ee, "ok": False,
                      "error": f"{type(e).__name__}: {e}"[:800]})
                return
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
