"""Round-4 kernel probe: attribution + knob sweep on the improved
queue-mode megakernel (block-skipped scans, demand-gated escape/resolve
rounds, unrolled TEA).

Stage A re-runs the pallas8 cost attribution (duplicate-work-at-1e-30
deltas) with the NEW dups (tea / uv / finisharith / setup / march) to
find the unattributed ~12 us/while-iter of pallas8.
Stage B sweeps k_march/test_every: with event serving cheaper, smaller
k_march (events served more often -> less post-event idling) may now
win. All configs are bitwise-identical physics (pure scheduling), so
`mean` must agree across EVERY row — a free correctness check.

Run ALONE (compiles are minutes; results append to pallas9.jsonl).
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
                   "pallas9.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
STAGE = os.environ.get("PROBE_STAGE", "AB")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "pallas9")
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

    emit({"mode": "env", "seed": SEED, "stage_sel": STAGE})
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

    # (tag, dup, extra-kwargs)
    variants = []
    if "A" in STAGE:
        variants += [
            ("base", (), {}),
            ("tea", ("tea",), {}),
            ("uv", ("uv",), {}),
            ("finisharith", ("finisharith",), {}),
            ("setup", ("setup",), {}),
            ("march", ("march",), {}),
            ("resolve", ("resolve",), {}),
            ("escape", ("escape",), {}),
            ("mip", ("mip",), {}),
        ]
    if "B" in STAGE:
        variants += [
            ("km4te2", (), dict(k_march=4, test_every=2)),
            ("km4te1", (), dict(k_march=4, test_every=1)),
            ("km2te1", (), dict(k_march=2, test_every=1)),
            ("km2te2", (), dict(k_march=2, test_every=2)),
            ("km8te4", (), dict(k_march=8, test_every=4)),
            ("base2", (), {}),
        ]
    base_us = None
    base_mean = None
    for tag, dup, extra in variants:
        try:
            kw = dict(test_every=2, unroll=2, escape_every=1, k_march=8,
                      queue_items=65536, return_iters=True, probe_dup=dup)
            kw.update(extra)
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
            wf_steps = float(it.sum())
            us = warm * 1e6 / max(wf_steps, 1)
            mean = float(imgh[:, :3].mean())
            if tag == "base":
                base_us = us
                base_mean = mean
            emit({"stage": "attrib", "tag": tag,
                  "ok": True, "warm_s": round(warm, 2),
                  "cold_s": round(cold, 2),
                  "spp_per_s": round(SPP / warm, 2),
                  "iters_mean": round(float(it.mean()), 1),
                  "us_per_step": round(us, 2),
                  "delta_us": round(us - base_us, 2)
                  if base_us is not None else None,
                  "mean": round(mean, 5),
                  "mean_ok": (None if base_mean is None
                              else bool(abs(mean - base_mean) < 2e-5))})
        except Exception as e:
            emit({"stage": "attrib", "tag": tag,
                  "ok": False, "error": f"{type(e).__name__}: {e}"[:900]})
    emit({"mode": "done"})


if __name__ == "__main__":
    main()
