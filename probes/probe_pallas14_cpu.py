"""CPU half of the pallas14 exactness audit: render the first 1024
pixels of the pallas14 fixed-seed config on the CPU interpreter (true
f32 dot_generals) and compare against the TPU dump. Per-(pixel,sample)
TEA streams make strip 0 independent of the rest of the frame, so a
1024-pixel interpret render (minutes) audits the full-frame dump.

Verdict key: max relative diff < ~1e-5 = fp-contraction noise only (the
TPU f32 reduce dots are exact); ~1e-3+ = Mosaic lowered them at bf16
(silent fetch truncation in the production kernel)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

RESDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
SEED = 424243


def main():
    which = "pallas15_tpu.npy" if os.environ.get("PALLAS15") else \
        "pallas14_tpu.npy"
    tpu = np.load(os.path.join(RESDIR, which))[:1024]

    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    r = Renderer()
    r.volume = Volume("/root/reference/data/smoke.brick")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = 100
    r.seed = SEED
    r.init(256, 256)
    r.commit()
    scene = r._scene_device()
    packed = pack_scene(scene)
    pool = build_env_pool(scene, SEED, 0)
    pf, pi = build_params_rows(scene, r._trace_params(), 256, 256, 0)
    cpu = np.asarray(render_strips(packed, pool, pf, pi, 1024, 256, 4,
                                   interpret=True))

    diff = np.abs(cpu - tpu)
    denom = np.maximum(np.abs(cpu), 1e-6)
    rel = (diff / denom).max()
    rec = {
        "probe": "pallas15_cpu" if os.environ.get("PALLAS15") else "pallas14_cpu",
        "bitwise": bool(np.array_equal(cpu, tpu)),
        "max_abs": float(diff.max()),
        "max_rel": float(rel),
        "cpu_mean": float(cpu[:, :3].mean()),
        "tpu_mean": float(tpu[:, :3].mean()),
        "verdict": ("exact" if np.array_equal(cpu, tpu) else
                    "contraction-noise" if rel < 1e-4 else
                    "BF16-TRUNCATED" if rel < 0.2 else "DIVERGED"),
    }
    line = json.dumps(rec)
    print(line, flush=True)
    with open(os.path.join(RESDIR, "pallas14.jsonl"), "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
