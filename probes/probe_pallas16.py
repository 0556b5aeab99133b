"""Round-5b: fresh cost attribution at the CURRENT production default
config (tile64, ee2, u8 mips, RGBE pool, full-lane serving, 48-spp
dispatches — the BENCH_r05 headline path). The last attribution
(pallas10) predates u8 mips / RGBE pool / tile64, so its ranking may be
stale. Duplicate-work-at-1e-30 deltas rank the phases; `mean` must
agree on every row (dups fold in at 1e-30 -> bit-identical physics).

Monkeypatches kernel.render_strips to inject probe_dup so the measured
kwargs are EXACTLY what Renderer._render_pallas builds (no hand-copied
config drift — the pallas10 failure mode).

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
                   "pallas16.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
SPP = int(os.environ.get("PROBE_SPP", "48"))
RES = int(os.environ.get("PROBE_RES", "1024"))
ONLY = os.environ.get("PROBE_ONLY", "")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas16")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


VARIANTS = [
    ("base", ()),
    ("rfull", ("rfull",)),      # full-lane resolve fetch (meta+atlas scan)
    ("rtric", ("rtric",)),      # stochastic tricubic arithmetic
    ("efull", ("efull",)),      # full-lane env fetch (escape)
    ("nfull", ("nfull",)),      # full-lane NEE pool fetch
    ("mip", ("mip",)),          # majorant_at per march substep
    ("march", ("march",)),      # DDA substep arithmetic
    ("dqrank", ("dqrank",)),    # dequeue prefix ranks
    ("flush", ("flush",)),      # scatter_flush MXU adds
    ("finisharith", ("finisharith",)),
    ("uv", ("uv",)),            # escape uv (atan2/acos)
    ("setup", ("setup",)),      # setup_ray
    ("base_rep", ()),
]


def main():
    from volren_tpu import renderer as rmod
    from volren_tpu.ops.pallas import kernel as kmod
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    emit({"mode": "env", "seed": SEED, "spp": SPP, "res": RES})
    vol = Volume("/root/reference/data/smoke.brick")
    env = Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr")

    real_render_strips = kmod.render_strips
    dup_holder = {"dup": ()}

    def patched(*args, **kw):
        kw["probe_dup"] = dup_holder["dup"]
        return real_render_strips(*args, **kw)

    kmod.render_strips = patched

    names = [v for v in VARIANTS if not ONLY or v[0] in ONLY.split(",")]
    base_mean = None
    for tag, dup in names:
        dup_holder["dup"] = dup
        try:
            r = Renderer()
            r.volume = vol
            r.scale_and_move_to_unit_cube()
            r.set_environment(env)
            r.bounces = 100
            r.seed = SEED
            r.step_engine = "pallas"
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
            mean = float(fb[..., :3].mean())
            if base_mean is None:
                base_mean = mean
            emit({"stage": "attrib", "tag": tag, "ok": True,
                  "cold_s": round(cold, 1),
                  "spp_per_s": round(float(np.median(rates)), 2),
                  "rates": [round(x, 2) for x in rates],
                  "mean": round(mean, 5),
                  "mean_ok": bool(abs(mean - base_mean)
                                  <= 2e-5 * max(1.0, abs(base_mean)))})
        except Exception as e:  # noqa: BLE001
            emit({"stage": "attrib", "tag": tag, "ok": False,
                  "err": f"{type(e).__name__}: {e}"[:300]})
    kmod.render_strips = real_render_strips
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
