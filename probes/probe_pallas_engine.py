"""First TPU run of the Pallas megakernel engine (ops/pallas) on the
bench scene: compile check, statistical parity vs device_queue, and the
honest spp/s ladder.

Stages (one jsonl line each, results/pallas_engine.jsonl):
  E1 128^2 spp4   compile + mean-vs-device_queue check
  E2 256^2 spp16  honest timed (np.asarray pull)
  E3 1024^2 spp16 honest timed
  E4 1024^2 spp16 test_every x unroll knob sweep

Run ALONE (touch /tmp/tpu_busy).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "pallas_engine.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas_engine")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def build(res, engine, seed):
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = 100
    r.seed = seed
    r.step_engine = engine
    r.init(res, res)
    r.commit()
    return r


def main():
    emit({"mode": "env", "seed": SEED})

    # ---- E1: compile + parity at 128^2
    try:
        t0 = time.time()
        rp = build(128, "pallas", SEED)
        rp.trace(4)
        img_p = np.asarray(rp._fb)
        compile_s = time.time() - t0
        rq = build(128, "device_queue", SEED)
        rq.trace(4)
        img_q = np.asarray(rq._fb)
        mean_p = float(img_p[..., :3].mean())
        mean_q = float(img_q[..., :3].mean())
        emit({"stage": "E1_parity128", "ok": True,
              "compile_plus_run_s": round(compile_s, 1),
              "mean_pallas": round(mean_p, 5), "mean_queue": round(mean_q, 5),
              "mean_ratio": round(mean_p / max(mean_q, 1e-9), 4)})
    except Exception as e:
        emit({"stage": "E1_parity128", "ok": False,
              "error": f"{type(e).__name__}: {e}"[:1500],
              "trace": traceback.format_exc()[-1200:]})
        return

    # ---- E2/E3: honest ladder
    for res, spp in ((256, 16), (1024, 16)):
        try:
            r = build(res, "pallas", SEED + res)
            t0 = time.time()
            r.trace(spp)
            np.asarray(r._fb)
            cold = time.time() - t0
            t0 = time.time()
            r.trace(spp)
            np.asarray(r._fb)
            warm = time.time() - t0
            emit({"stage": f"E_ladder_{res}", "ok": True,
                  "cold_s": round(cold, 2), "warm_s": round(warm, 2),
                  "spp_per_s": round(spp / warm, 2),
                  "mean": round(float(np.asarray(r._fb)[..., :3].mean()), 5)})
        except Exception as e:
            emit({"stage": f"E_ladder_{res}", "ok": False,
                  "error": f"{type(e).__name__}: {e}"[:1200]})
            return

    # ---- E4: test_every / unroll sweep at 1024^2
    try:
        from volren_tpu.ops.pallas import pack_scene
        from volren_tpu.ops.pallas.kernel import render_strips
        from volren_tpu.ops.pallas.pack import build_env_pool, \
            build_params_rows

        r = build(1024, "pallas", SEED + 7)
        scene = r._scene_device()
        packed = pack_scene(scene)
        params = r._trace_params()
        pool = build_env_pool(scene, SEED + 7, 0)
        pf, pi = build_params_rows(scene, params, 1024, 1024, 0)
        for te, un in ((4, 2), (2, 2), (8, 2), (4, 1), (4, 4)):
            t0 = time.time()
            out = render_strips(packed, pool, pf, pi, 1024 * 1024, 1024,
                                16, test_every=te, unroll=un)
            np.asarray(out)
            cold = time.time() - t0
            t0 = time.time()
            out = render_strips(packed, pool, pf, pi, 1024 * 1024, 1024,
                                16, test_every=te, unroll=un)
            np.asarray(out)
            warm = time.time() - t0
            emit({"stage": "E4_knobs", "test_every": te, "unroll": un,
                  "ok": True, "cold_s": round(cold, 2),
                  "warm_s": round(warm, 2),
                  "spp_per_s": round(16 / warm, 2)})
    except Exception as e:
        emit({"stage": "E4_knobs", "ok": False,
              "error": f"{type(e).__name__}: {e}"[:1200]})

    emit({"mode": "done"})


if __name__ == "__main__":
    main()
