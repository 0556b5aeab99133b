"""Classify-then-serve (bound_cmp) A/B on real TPU — the compacted/hbm
resolve path. Phase A resolves ranked lanes from meta bounds alone;
phase B's atlas/DMA rounds serve only the ambiguous subset (all rounds
demand-gated, incl. round 0). BITWISE contract: phase-B capacity ==
phase-A capacity and need is a subset of act, so outputs must be
EXACTLY equal to the unbound path.

Arms: the 512^3 cumulus on the hbm engine (north-star config 3 shape)
and smoke 1024^2 FORCED-hbm (the round-4 capacity-bound case).

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
                   "rbound2.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
ONLY = os.environ.get("PROBE_ONLY", "")

CLOUD_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scene_cache", "cloud512.brick")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "rbound2")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def run(vol, env, res, spp, rbound, force_hbm=False):
    from volren_tpu.renderer import Renderer

    os.environ["VOLREN_PALLAS_RBOUND"] = rbound
    r = Renderer()
    r.volume = vol
    r.scale_and_move_to_unit_cube()
    r.set_environment(env)
    r.bounces = 100
    r.seed = SEED
    r.step_engine = "pallas"
    if force_hbm:
        r.pallas_force_hbm = True
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
    if os.path.exists(CLOUD_CACHE):
        arms.append(("cloud", Volume(CLOUD_CACHE), 1024, 16, False))
    arms.append(("smokehbm", Volume("/root/reference/data/smoke.brick"),
                 1024, 16, True))
    if ONLY:
        arms = [a for a in arms if a[0] in ONLY.split(",")]
    for name, vol, res, spp, fh in arms:
        means = {}
        for rb in ("0", "1"):
            try:
                cold, rates, mean, used = run(vol, env, res, spp, rb, fh)
                means[rb] = mean
                emit({"tag": f"{name}_rb{rb}", "ok": True, "engine": used,
                      "cold_s": round(cold, 1),
                      "spp_per_s": round(float(np.median(rates)), 2),
                      "rates": [round(x, 2) for x in rates],
                      "mean": round(mean, 6)})
            except Exception as e:  # noqa: BLE001
                emit({"tag": f"{name}_rb{rb}", "ok": False,
                      "err": f"{type(e).__name__}: {e}"[:300]})
        if len(means) == 2:
            emit({"tag": f"{name}_exact",
                  "equal": bool(means["0"] == means["1"]),
                  "means": [means["0"], means["1"]]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
