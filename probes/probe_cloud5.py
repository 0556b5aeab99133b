"""Round-5 cloud ladder: pallas-hbm tuning A/B vs device_queue, ONE
session (cloud512 stand-in, 1024^2, 100 bounces, PROBE_SPP=16).

Configs: devq (device_queue, the round-4 fallback champion at 3.03),
base (pallas auto: hbm + u8 mips), metablk (compacted meta scans in
128-row demand-gated blocks), rr4 (resolve capacity 512/step), te1
(resolve cadence every substep), s16 (16 sublanes = 2048 lanes).
Emits results/cloud5.jsonl.
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
                   "cloud5.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
SPP = int(os.environ.get("PROBE_SPP", "16"))
ONLY = os.environ.get("PROBE_ONLY", "")
CLOUD_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "cloud512.brick")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "cloud5")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


CONFIGS = {
    "devq": {"step_engine": "device_queue"},
    "base": {},
    "metablk": {"pallas_meta_block": 128},
    "rr4": {"pallas_resolve_rounds": 4},
    "te1": {"pallas_test_every": 1},
    "s16": {"pallas_sublanes": 16},
    # round-2 combos (te1 +11%, rr4 +6% solo — resolve serve cadence x
    # capacity is the cloud's binding constraint)
    "te1rr4": {"pallas_test_every": 1, "pallas_resolve_rounds": 4},
    "te1rr8": {"pallas_test_every": 1, "pallas_resolve_rounds": 8},
    "km8te1rr4": {"pallas_k_march": 8, "pallas_test_every": 1,
                  "pallas_resolve_rounds": 4},
    "te1rr4s16": {"pallas_test_every": 1, "pallas_resolve_rounds": 4,
                  "pallas_sublanes": 16},
    "te1rr4ee1": {"pallas_test_every": 1, "pallas_resolve_rounds": 4,
                  "pallas_escape_every": 1},
}


def main():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    if not os.path.exists(CLOUD_CACHE):
        os.makedirs(os.path.dirname(CLOUD_CACHE), exist_ok=True)
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "scripts"))
        from make_cloud import make_cloud

        from volren_tpu.voldata import build_brick_grid, write_brick

        write_brick(CLOUD_CACHE, build_brick_grid(make_cloud(512, 7)))
    emit({"mode": "env", "seed": SEED, "spp": SPP})
    vol = Volume(CLOUD_CACHE)
    env = Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr")
    names = [n for n in CONFIGS if not ONLY or n in ONLY.split(",")]
    for name in names:
        try:
            r = Renderer()
            r.volume = vol
            r.scale_and_move_to_unit_cube()
            r.set_environment(env)
            r.bounces = 100
            r.seed = SEED
            r.step_engine = "pallas"
            if name == "devq":
                r.queue_csize = 2
            for k, v in CONFIGS[name].items():
                setattr(r, k, v)
            r.init(1024, 1024)
            r.commit()
            t0 = time.time()
            r.trace(min(SPP, 16))
            np.asarray(r._fb)
            cold = time.time() - t0
            rates = []
            for _ in range(2):
                r.reset()
                t0 = time.time()
                r.trace(SPP)
                fb = np.asarray(r._fb)
                rates.append(SPP / (time.time() - t0))
            emit({"tag": name, "ok": True, "engine": r.last_engine,
                  "cold_s": round(cold, 1),
                  "spp_per_s": round(float(np.median(rates)), 2),
                  "rates": [round(x, 2) for x in rates],
                  "mean": float(fb.mean())})
        except Exception as e:
            emit({"tag": name, "ok": False,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
