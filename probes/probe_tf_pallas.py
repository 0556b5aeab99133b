"""TF + emission kernel variants on REAL TPU: compile + stat-check vs
device_queue (config 2 shape: lut.txt TF on smoke, 512^2) and a
synthetic emission scene. CPU-interpret equality already holds
(tests/test_pallas.py); this checks Mosaic swallows the TF kernel's
fori_loop-in-cond corners and measures its rate."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volren_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "tf_pallas.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "tf_pallas")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def run(r, engine, spp, tag):
    r.step_engine = engine
    t0 = time.time()
    r.render(spp)
    fb = r.fbo_data()
    cold = time.time() - t0
    r.reset()
    t0 = time.time()
    r.render(spp)
    fb = r.fbo_data()
    warm = time.time() - t0
    emit({"tag": tag, "engine": engine, "ok": True,
          "spp": spp, "cold_s": round(cold, 1),
          "warm_s": round(warm, 2),
          "spp_per_s": round(spp / warm, 2),
          "mean": round(float(fb.mean()), 5)})
    return float(fb.mean())


def main():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.scene.transferfunc import TransferFunction
    from volren_tpu.voldata import DenseGrid, Volume

    emit({"mode": "env", "seed": SEED})

    # --- config 2: TF on smoke at 512^2
    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
    r.show_environment = False
    r.bounces = 100
    r.seed = SEED
    r.init(512, 512)
    r.commit()
    try:
        m_dq = run(r, "device_queue", 32, "tf512")
        m_pl = run(r, "pallas", 32, "tf512")
        emit({"tag": "tf512", "rel_mean_diff":
              round(abs(m_pl - m_dq) / max(m_dq, 1e-9), 4)})
    except Exception as e:
        emit({"tag": "tf512", "ok": False,
              "error": f"{type(e).__name__}: {e}"[:400]})

    # --- emission scene at 256^2
    rng = np.random.default_rng(11)
    dense = rng.random((32, 32, 32)).astype(np.float32)
    zz, yy, xx = np.meshgrid(*([np.arange(32)] * 3), indexing="ij")
    dist = np.sqrt((xx - 16) ** 2 + (yy - 16) ** 2 + (zz - 16) ** 2)
    temp = np.clip(1.0 - dist / 16.0, 0.0, 1.0).astype(np.float32)
    r2 = Renderer()
    r2.volume = Volume(DenseGrid(32, 32, 32, dense))
    r2.volume.update_grid_frame(0, DenseGrid(32, 32, 32, temp), "flame")
    r2.scale_and_move_to_unit_cube()
    r2.set_environment(Environment.white(0.5))
    r2.emission_scale = 30.0
    r2.bounces = 50
    r2.seed = SEED
    r2.init(256, 256)
    r2.commit()
    try:
        m_dq = run(r2, "device_queue", 32, "emi256")
        m_pl = run(r2, "pallas", 32, "emi256")
        emit({"tag": "emi256", "rel_mean_diff":
              round(abs(m_pl - m_dq) / max(m_dq, 1e-9), 4)})
    except Exception as e:
        emit({"tag": "emi256", "ok": False,
              "error": f"{type(e).__name__}: {e}"[:400]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
