"""Queue-mode megakernel on TPU: spp/s + inflation at 1024^2 and 256^2.

Queue mode (kernel.py _make_kernel queue_items>0) rebuilds the XLA
device_queue's load balancing in-kernel: expectation is the strip
engine's 6-8x drain-tail inflation (pallas6.jsonl) collapses to ~1.2x.
Run ALONE (touch /tmp/tpu_busy)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas7.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas7")
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
        for qi, te, un, ee, km in ((65536, 2, 2, 1, 8),
                                   (65536, 2, 2, 1, 16),
                                   (65536, 2, 2, 2, 8),
                                   (65536, 3, 3, 1, 12)):
            if qi > n_pix:
                qi = n_pix
            try:
                kw = dict(test_every=te, unroll=un, escape_every=ee,
                          k_march=km, queue_items=qi, return_iters=True)
                t0 = time.time()
                img, iters = render_strips(packed, pool, pf, pi, n_pix,
                                           res, SPP, **kw)
                np.asarray(img)
                cold = time.time() - t0
                t0 = time.time()
                img, iters = render_strips(packed, pool, pf, pi, n_pix,
                                           res, SPP, **kw)
                np.asarray(img)
                warm = time.time() - t0
                it = np.asarray(iters)
                wf_steps = float(it.sum())
                infl = wf_steps * 1024 / (n_pix * SPP * 4.3)
                emit({"stage": f"queue_{res}", "qi": qi, "te": te,
                      "unroll": un, "ee": ee, "km": km, "ok": True,
                      "warm_s": round(warm, 2), "cold_s": round(cold, 2),
                      "spp_per_s": round(SPP / warm, 2),
                      "iters_mean": round(float(it.mean()), 1),
                      "us_per_step": round(warm * 1e6 / max(wf_steps, 1),
                                           2),
                      "inflation_vs_queuebound": round(infl, 2),
                      "mean": round(float(np.asarray(img)[:, :3].mean()),
                                    5)})
            except Exception as e:
                emit({"stage": f"queue_{res}", "qi": qi, "ok": False,
                      "error": f"{type(e).__name__}: {e}"[:900]})
                break
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
