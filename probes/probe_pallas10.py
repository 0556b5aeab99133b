"""Round-4 stage I: fresh cost attribution at the CURRENT champion
config (tile_w=256, km4 te2 u2 ee1, full-lane resolve/escape/NEE
serving, 9.8 spp/s @1024^2/16spp in pallas9g). The old attribution
(pallas9) predates full-lane serving, so its resolve/escape/nee rows
measured code paths that no longer run. Duplicate-work-at-1e-30 deltas
rank the phases; `mean` must agree on every row (dups fold in at 1e-30
-> bit-identical physics).

Run ALONE (one TPU process at a time).
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
                   "pallas10.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas10")
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

    variants = [
        ("base", ()),
        ("rfull", ("rfull",)),      # full-lane resolve fetch (scans)
        ("rtric", ("rtric",)),      # stochastic tricubic arithmetic
        ("efull", ("efull",)),      # full-lane env fetch
        ("nfull", ("nfull",)),      # full-lane NEE pool fetch
        ("mip", ("mip",)),          # majorant_at per march substep
        ("march", ("march",)),      # DDA substep arithmetic
        ("dqrank", ("dqrank",)),    # dequeue prefix ranks
        ("flush", ("flush",)),      # scatter_flush MXU adds
        ("finisharith", ("finisharith",)),
        ("uv", ("uv",)),            # escape uv (atan2/acos)
        ("setup", ("setup",)),      # setup_ray
        ("tea", ("tea",)),
        ("base_rep", ()),
    ]
    base_mean = None
    for tag, dup in variants:
        try:
            kw = dict(k_march=4, test_every=2, unroll=2, escape_every=1,
                      queue_items=65536, resolve_full=True,
                      escape_full=True, nee_full=True, tile_w=256,
                      return_iters=True, probe_dup=dup)
            t0 = time.time()
            img, iters = render_strips(packed, pool, pf, pi, n_pix, res,
                                       SPP, **kw)
            np.asarray(img)
            cold = time.time() - t0
            t0 = time.time()
            img, iters = render_strips(packed, pool, pf, pi, n_pix, res,
                                       SPP, **kw)
            imgh = np.asarray(img)
            warm = time.time() - t0
            it = np.asarray(iters)
            wf_steps = float(it.sum())
            us = warm * 1e6 / max(wf_steps, 1)
            mean = float(imgh[:, :3].mean())
            if base_mean is None:
                base_mean = mean
            emit({"stage": "attrib", "tag": tag, "ok": True,
                  "warm_s": round(warm, 2), "cold_s": round(cold, 1),
                  "spp_per_s": round(SPP / warm, 2),
                  "iters_mean": round(float(it.mean()), 1),
                  "us_per_step": round(us, 2),
                  "mean": round(mean, 5),
                  "mean_ok": bool(abs(mean - base_mean)
                                  <= 2e-5 * max(1.0, abs(base_mean)))})
        except Exception as e:  # noqa: BLE001
            emit({"stage": "attrib", "tag": tag, "ok": False,
                  "err": f"{type(e).__name__}: {e}"[:300]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
