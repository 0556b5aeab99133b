"""Round-5 in-session ladder at 1024^2/16spp (smoke, production config
base): price the new knobs against each other in ONE session so the
numbers are comparable (cross-session noise ~20%, NOTES round-4).

Configs: base (r4 default + auto mip block-skip), mb0 (mip block-skip
off = the exact r4 program), u8 (u8 mips), u8mb0, u8s16 (u8 + 16
sublanes), hbm4/hbm8 (forced HBM fetch + u8 + resolve_rounds 4/8).
Emits results/r5sweep.jsonl.
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
                   "r5sweep.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
SPP = int(os.environ.get("PROBE_SPP", "16"))
RES = int(os.environ.get("PROBE_RES", "1024"))
ONLY = os.environ.get("PROBE_ONLY", "")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "r5sweep")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


CONFIGS = {
    "base": {},
    "mb0": {"pallas_mip_block": 0},
    "u8": {"pallas_mip_u8": "1"},
    "u8mb0": {"pallas_mip_u8": "1", "pallas_mip_block": 0},
    "u8s16": {"pallas_mip_u8": "1", "pallas_sublanes": 16},
    "hbm4": {"pallas_force_hbm": True, "pallas_mip_u8": "1",
             "pallas_resolve_rounds": 4},
    "hbm8": {"pallas_force_hbm": True, "pallas_mip_u8": "1",
             "pallas_resolve_rounds": 8},
    # round-5b: re-tune the r4 optimum under u8 mips + RGBE pool
    "pool0": {"pallas_pool_rgbe": False},
    "nee2": {"pallas_nee_every": 2},
    "ee1": {"pallas_escape_every": 1},
    "ee4": {"pallas_escape_every": 4},
    "te1": {"pallas_test_every": 1},
    "te4": {"pallas_test_every": 4},
    "km2": {"pallas_k_march": 2},
    "km8": {"pallas_k_march": 8},
    "tile128": {"pallas_tile_w": 128},
    "tile512": {"pallas_tile_w": 512},
    "sb4": {"pallas_scan_blocks": 4},
    "sb16": {"pallas_scan_blocks": 16},
    "u4": {"pallas_unroll": 4},
    "u1": {"pallas_unroll": 1},
    "u8off": {"pallas_mip_u8": "0"},
    "tile64": {"pallas_tile_w": 64},
    "tile128b": {"pallas_tile_w": 128},
    "tile128ee1": {"pallas_tile_w": 128, "pallas_escape_every": 1},
    "tile128nee2": {"pallas_tile_w": 128, "pallas_nee_every": 2},
    "tile32": {"pallas_tile_w": 32},
    "t64s16": {"pallas_tile_w": 64, "pallas_sublanes": 16},
    "t64nee2": {"pallas_tile_w": 64, "pallas_nee_every": 2},
    "t64ee4": {"pallas_tile_w": 64, "pallas_escape_every": 4},
    "t64sb16": {"pallas_tile_w": 64, "pallas_scan_blocks": 16},
}


def main():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    emit({"mode": "env", "seed": SEED, "spp": SPP, "res": RES})
    vol = Volume("/root/reference/data/smoke.brick")
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
            for k, v in CONFIGS[name].items():
                setattr(r, k, v)
            r.init(RES, RES)
            r.commit()
            t0 = time.time()
            r.trace(SPP)
            np.asarray(r._fb)
            cold = time.time() - t0
            rates = []
            for _ in range(2):
                r.reset()
                t0 = time.time()
                r.trace(SPP)
                fb = np.asarray(r._fb)
                rates.append(SPP / (time.time() - t0))
            emit({"tag": name, "ok": True, "cold_s": round(cold, 1),
                  "spp_per_s": round(float(np.median(rates)), 2),
                  "rates": [round(x, 2) for x in rates],
                  "mean": float(fb.mean())})
        except Exception as e:
            emit({"tag": name, "ok": False,
                  "error": f"{type(e).__name__}: {str(e)[:300]}"})


if __name__ == "__main__":
    main()
