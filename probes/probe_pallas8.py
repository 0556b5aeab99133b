"""In-kernel cost attribution for the queue-mode megakernel.

Each variant duplicates ONE phase's work (folded in at 1e-30 so physics,
scheduling and iteration counts are bit-identical to base) — the warm-run
delta vs base is that phase's marginal per-step cost. Run ALONE.
Base config = round-3 best (te2 u2 ee1 km8 qi65536, pallas7.jsonl).
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
                   "pallas8.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas8")
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
    res = 1024
    n_pix = res * res
    pf, pi = build_params_rows(scene, params, res, res, 0)

    variants = [((), True), (("rank",), True), (("tricubic",), True),
                (("mip",), True), (("nee",), True), (("resolve",), True),
                (("escape",), True), (("flush",), True), ((), False),
                ((), True)]
    base_us = None
    for dup, rgbe in variants:
        try:
            kw = dict(test_every=2, unroll=2, escape_every=1, k_march=8,
                      queue_items=65536, return_iters=True, probe_dup=dup,
                      env_rgbe=rgbe)
            t0 = time.time()
            img, iters = render_strips(packed, pool, pf, pi, n_pix, res,
                                       SPP, **kw)
            np.asarray(img)
            cold = time.time() - t0
            t0 = time.time()
            img, iters = render_strips(packed, pool, pf, pi, n_pix, res,
                                       SPP, **kw)
            np.asarray(img)
            warm = time.time() - t0
            it = np.asarray(iters)
            wf_steps = float(it.sum())
            us = warm * 1e6 / max(wf_steps, 1)
            if dup == () and rgbe and base_us is None:
                base_us = us
            emit({"stage": "attrib", "rgbe": rgbe,
                  "dup": "+".join(dup) or "base",
                  "ok": True, "warm_s": round(warm, 2),
                  "cold_s": round(cold, 2),
                  "spp_per_s": round(SPP / warm, 2),
                  "iters_mean": round(float(it.mean()), 1),
                  "us_per_step": round(us, 2),
                  "delta_us": round(us - base_us, 2)
                  if base_us is not None else None,
                  "mean": round(float(np.asarray(img)[:, :3].mean()), 5)})
        except Exception as e:
            emit({"stage": "attrib", "dup": "+".join(dup) or "base",
                  "ok": False, "error": f"{type(e).__name__}: {e}"[:900]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
