"""HBM-atlas kernel on REAL TPU: Mosaic lowering smoke, bitwise vs the
VMEM fetch engine, and the first cloud-scale pallas rate.

Round-4 proved twice that interpret-mode equality cannot certify Mosaic
lowering (sub-8-row crash, bf16 dots), so the round-5 HBM engine gets
its own on-TPU audit before it becomes the big-scene default:

  1. smoke 256^2/4spp: pallas-hbm (forced) vs pallas-vmem, BITWISE
     (same compact serve schedule, only the fetch transport differs) +
     both rates.
  2. smoke 1024^2/16spp: hbm rate vs the vmem default (does the DMA
     gather beat the block-skipped VMEM scan even in-gate?).
  3. cloud512 (the BASELINE config-3 stand-in, ~33k slots, past the
     VMEM gate): pallas actually executes (assert last_engine ==
     'pallas', no fallback) at 1024^2; rate vs the device_queue 3.03
     spp/s round-4 number. u8 mips on (auto for hbm).

Results: results/hbm.jsonl.
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
                   "hbm.jsonl")
SEED = int(os.environ.get("PROBE_SEED", str(int(time.time()) % 100000)))
STAGES = os.environ.get("PROBE_STAGES", "bitwise,rate1024,cloud").split(",")
CLOUD_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "cloud512.brick")


def emit(rec):
    rec = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
           for k, v in dict(rec).items()}
    rec.setdefault("probe", "hbm")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def build(res, volume_path, seed):
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    r = Renderer()
    r.volume = Volume(volume_path)
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment(
        "/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    r.bounces = 100
    r.seed = seed
    r.step_engine = "pallas"
    r.init(res, res)
    r.commit()
    return r


def timed(r, spp):
    t0 = time.time()
    r.trace(spp)
    fb = np.asarray(r._fb)
    cold = time.time() - t0
    r.reset()
    t0 = time.time()
    r.trace(spp)
    fb = np.asarray(r._fb)
    warm = time.time() - t0
    return fb, cold, warm


def main():
    smoke = "/root/reference/data/smoke.brick"
    emit({"mode": "env", "seed": SEED, "stages": STAGES})

    if "bitwise" in STAGES:
        # compact-resolve vmem vs hbm must be BITWISE equal on TPU
        r = build(256, smoke, SEED)
        r.pallas_resolve_full = False
        fb_v, cold_v, warm_v = timed(r, 4)
        emit({"tag": "vmem_compact_256", "cold_s": round(cold_v, 1),
              "warm_s": round(warm_v, 3),
              "spp_per_s": round(4 / warm_v, 2),
              "mean": float(fb_v.mean())})
        r2 = build(256, smoke, SEED)
        r2.pallas_resolve_full = False
        r2.pallas_force_hbm = True
        r2.pallas_mip_u8 = "0"   # isolate the fetch engine (mip_u8
        # defaults to auto=on for hbm and would confound the bitwise bit)
        fb_h, cold_h, warm_h = timed(r2, 4)
        emit({"tag": "hbm_256", "cold_s": round(cold_h, 1),
              "warm_s": round(warm_h, 3),
              "spp_per_s": round(4 / warm_h, 2),
              "mean": float(fb_h.mean()),
              "bitwise_vs_vmem": bool(np.array_equal(fb_v, fb_h)),
              "max_abs": float(np.abs(fb_v - fb_h).max())})
        # u8 mips on the same scene: statistical (different collision
        # schedule), must stay within a loose band of the f32 mean
        r3 = build(256, smoke, SEED)
        r3.pallas_resolve_full = False
        r3.pallas_mip_u8 = "1"
        fb_u, cold_u, warm_u = timed(r3, 4)
        emit({"tag": "mipu8_256", "cold_s": round(cold_u, 1),
              "warm_s": round(warm_u, 3),
              "spp_per_s": round(4 / warm_u, 2),
              "mean": float(fb_u.mean()),
              "mean_rel_vs_f32": float(
                  abs(fb_u[..., :3].mean() - fb_v[..., :3].mean())
                  / max(fb_v[..., :3].mean(), 1e-9))})

    if "rate1024" in STAGES:
        for tag, hbm, u8 in (("vmem_1024", False, "0"),
                             ("hbm_1024", True, "0"),
                             ("vmem_u8_1024", False, "1")):
            r = build(1024, smoke, SEED)
            if hbm:
                r.pallas_force_hbm = True
                r.pallas_resolve_full = False
            r.pallas_mip_u8 = u8
            fb, cold, warm = timed(r, 16)
            emit({"tag": tag, "cold_s": round(cold, 1),
                  "warm_s": round(warm, 2),
                  "spp_per_s": round(16 / warm, 2),
                  "mean": float(fb.mean())})

    if "cloud" in STAGES:
        if not os.path.exists(CLOUD_CACHE):
            os.makedirs(os.path.dirname(CLOUD_CACHE), exist_ok=True)
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "scripts"))
            from make_cloud import make_cloud

            from volren_tpu.voldata import build_brick_grid, write_brick

            write_brick(CLOUD_CACHE, build_brick_grid(make_cloud(512, 7)))
        r = build(1024, CLOUD_CACHE, SEED)
        from volren_tpu.ops.pallas import kernel_plan

        plan = kernel_plan(r._scene_device(), r._config())
        emit({"tag": "cloud_plan", "plan": plan,
              "slots": int(r._scene_device().density.atlas.shape[0])})
        spp = int(os.environ.get("PROBE_CLOUD_SPP", "8"))
        fb, cold, warm = timed(r, spp)
        emit({"tag": "cloud_1024", "engine": r.last_engine,
              "cold_s": round(cold, 1), "warm_s": round(warm, 2),
              "spp_per_s": round(spp / warm, 2),
              "mean": float(fb.mean()),
              "vs_r4_device_queue": round(spp / warm / 3.03, 2)})


if __name__ == "__main__":
    main()
