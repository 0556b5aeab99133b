"""Range-bound resolve classify A/B on real TPU (kernel bound_cls).

Arms: VOLREN_PALLAS_RBOUND=0 vs 1 at the production smoke config
(full-lane serving). The decision u_cls*maj < d is classified from the
brick meta's exact f32 decode bounds; only ambiguous lanes demand the
atlas scan. Must be EXACTLY mean-equal (the skipped fetches cannot
change any decision); the rate delta prices the demand cut.

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
                   "rbound.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
ONLY = os.environ.get("PROBE_ONLY", "")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "rbound")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def run(vol, env, res, spp, rbound):
    from volren_tpu.renderer import Renderer

    os.environ["VOLREN_PALLAS_RBOUND"] = rbound
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
    return cold, rates, float(fb[..., :3].mean())


def main():
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    emit({"mode": "env", "seed": SEED})
    env = Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr")
    vol = Volume("/root/reference/data/smoke.brick")
    arms = [("smoke1024", 1024, 48), ("smoke512", 512, 32)]
    if ONLY:
        arms = [a for a in arms if a[0] in ONLY.split(",")]
    for name, res, spp in arms:
        means = {}
        for rb in ("0", "1"):
            try:
                cold, rates, mean = run(vol, env, res, spp, rb)
                means[rb] = mean
                emit({"tag": f"{name}_rb{rb}", "ok": True,
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
