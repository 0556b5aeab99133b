"""Interactive preview rate on TPU (VERDICT r4 #9): the --serve viewer
renders at <=256 px preview resolution on the default engine (pallas on
TPU). Measure steady preview spp/s and effective preview fps (one
tonemapped frame per trace chunk of 4 spp, cli.py interactive loop
cadence) at the viewer's actual preview sizes.

Emits results/preview.jsonl.
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
                   "preview.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "preview")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    emit({"mode": "env", "seed": SEED})
    for res in (256, 128):
        r = Renderer()
        r.volume = Volume("/root/reference/data/smoke.brick")
        r.scale_and_move_to_unit_cube()
        r.set_environment(Environment(
            "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
        r.bounces = 100
        r.seed = SEED
        r.step_engine = "pallas"
        r.init(res, res)
        r.commit()
        t0 = time.time()
        r.trace(4)
        np.asarray(r._fb)
        cold = time.time() - t0
        # the interactive loop traces 4-spp chunks and tonemaps a
        # preview each second; measure the chunk cadence incl. the
        # draw() tonemap + readback the viewer pays per frame
        chunks = 8
        t0 = time.time()
        for _ in range(chunks):
            r.trace(4)
            frame = np.asarray(r.draw())
        dt = time.time() - t0
        emit({"tag": f"preview{res}", "engine": r.last_engine,
              "cold_s": round(cold, 1),
              "spp_per_s": round(4 * chunks / dt, 2),
              "chunk_fps": round(chunks / dt, 2),
              "mean": float(frame.mean())})


if __name__ == "__main__":
    main()
