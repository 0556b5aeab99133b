"""Morton atlas-slot permutation A/B on real TPU (pack._pack_brick_tables).

The kernel PROGRAM is identical in both arms — only the slot table /
atlas row order changes — so the image must be EXACTLY equal and any
rate delta is pure scan/DMA locality. Arms: smoke 1024^2/48spp (vmem
full-lane serving, the headline config) and the 512^3 cumulus cloud at
1024^2/16spp on the hbm engine (DMA row locality).

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
                   "morton.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
ONLY = os.environ.get("PROBE_ONLY", "")

CLOUD_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scene_cache", "cloud512.brick")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "morton")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def run(vol, env, res, spp, morton):
    from volren_tpu.renderer import Renderer

    os.environ["VOLREN_PALLAS_MORTON"] = morton
    r = Renderer()
    r.volume = vol
    r.scale_and_move_to_unit_cube()
    r.set_environment(env)
    r.bounces = 100
    r.seed = SEED
    r.step_engine = "pallas"
    r.init(res, res)
    r.commit()
    t0 = time.time()
    r.trace(spp)
    np.asarray(r._fb)
    cold = time.time() - t0
    rates = []
    for _ in range(2):
        r.reset()
        t0 = time.time()
        r.trace(spp)
        fb = np.asarray(r._fb)
        rates.append(spp / (time.time() - t0))
    return cold, rates, float(fb[..., :3].mean()), r.last_engine


def main():
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    emit({"mode": "env", "seed": SEED})
    env = Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr")
    arms = []
    if not ONLY or "smoke" in ONLY:
        arms.append(("smoke", Volume("/root/reference/data/smoke.brick"),
                     1024, 48))
    if (not ONLY or "cloud" in ONLY) and os.path.exists(CLOUD_CACHE):
        arms.append(("cloud", Volume(CLOUD_CACHE), 1024, 16))
    for name, vol, res, spp in arms:
        means = {}
        for morton in ("0", "1"):
            try:
                cold, rates, mean, used = run(vol, env, res, spp, morton)
                means[morton] = mean
                emit({"tag": f"{name}_m{morton}", "ok": True,
                      "engine": used, "cold_s": round(cold, 1),
                      "spp_per_s": round(float(np.median(rates)), 2),
                      "rates": [round(x, 2) for x in rates],
                      "mean": round(mean, 6)})
            except Exception as e:  # noqa: BLE001
                emit({"tag": f"{name}_m{morton}", "ok": False,
                      "err": f"{type(e).__name__}: {e}"[:300]})
        if len(means) == 2:
            emit({"tag": f"{name}_exact",
                  "equal": bool(means["0"] == means["1"]),
                  "means": [means["0"], means["1"]]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
