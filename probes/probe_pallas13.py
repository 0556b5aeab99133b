"""Round-4 late: the one-hot MXU fetch engine duel. The kernel is
FETCH-BOUND (pallas10: resolve +17, NEE +7.8, env +5 us/step) and the
dynamic_gather scan costs ~1 cycle/table-row per sublane row; the
one-hot matmul form rides the MXU at ~rows/8 + fixed. Bit-exact
(tests/test_pallas.py::test_mxu_gather_bitexact), so `mean` must agree
across every row. Also re-tries the cadence knobs under mxu: if the
fetch cost drops, km8te4/nee2 may recompose."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas13.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas13")
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

    BASE = dict(k_march=4, test_every=2, unroll=2, escape_every=2,
                queue_items=65536, resolve_full=True, escape_full=True,
                nee_full=True, tile_w=256)
    variants = [
        ("ee2", {}),                          # champion re-base
        ("ee2_mxu", dict(mxu_gather=True)),
        ("ee2_mxu_km8te4", dict(mxu_gather=True, k_march=8,
                                test_every=4)),
        ("ee2_mxu_nee2", dict(mxu_gather=True, nee_every=2)),
        ("best_rep", None),
    ]
    base_mean = None
    rates = {}
    for tag, extra in variants:
        if extra is None:
            if not rates:
                continue
            bt = max(rates, key=lambda t: rates[t][0])
            extra = dict(rates[bt][1])
            tag = f"rep_{bt}"
        try:
            kw = dict(BASE)
            kw.update(extra)
            kw.update(return_iters=True)
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
            us = warm * 1e6 / max(float(it.sum()), 1)
            mean = float(imgh[:, :3].mean())
            if base_mean is None:
                base_mean = mean
            rate = SPP / warm
            if not tag.startswith("rep_"):
                rates[tag] = (rate, dict(extra))
            emit({"stage": "sweep", "tag": tag, "ok": True,
                  "warm_s": round(warm, 2), "cold_s": round(cold, 1),
                  "spp_per_s": round(rate, 2),
                  "iters_mean": round(float(it.mean()), 1),
                  "us_per_step": round(us, 2),
                  "mean": round(mean, 5),
                  "mean_ok": bool(abs(mean - base_mean)
                                  <= 2e-5 * max(1.0, abs(base_mean)))})
        except Exception as e:  # noqa: BLE001
            emit({"stage": "sweep", "tag": tag, "ok": False,
                  "err": f"{type(e).__name__}: {e}"[:300]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
