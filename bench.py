"""Benchmark: smoke.brick at 1024x1024, wavefront engine, spp/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is computed
against a documented nominal desktop-GPU throughput for the reference
renderer on this scene (NOMINAL_REFERENCE_SPP_S below).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reference OpenGL renderer, smoke scene @1024^2 on a desktop GPU (RTX
# 2070-class): ~30 progressive samples/sec is the nominal anchor used for
# vs_baseline until a measured GL number exists.
NOMINAL_REFERENCE_SPP_S = 30.0

RES = int(os.environ.get("BENCH_RES", "1024"))
SPP = int(os.environ.get("BENCH_SPP", "32"))
BOUNCES = int(os.environ.get("BENCH_BOUNCES", "100"))
USE_TF = os.environ.get("BENCH_TF", "0") == "1"  # BASELINE config 2 variant
# BASELINE config 3 stand-in: point at a heavyweight volume (e.g. generated
# by scripts/make_cloud.py) instead of the bundled smoke plume
VOLUME = os.environ.get("BENCH_VOLUME", "/root/reference/data/smoke.brick")


def _watchdog(seconds):
    """Emit a fallback JSON line if the device hangs (the tunneled TPU
    occasionally wedges); the driver always gets its one line."""
    import signal

    def on_alarm(signum, frame):
        print(
            json.dumps(
                {
                    "metric": f"spp/sec @ {RES}x{RES} (wavefront DDA, {BOUNCES} bounces)",
                    "value": 0.0,
                    "unit": "spp/s",
                    "vs_baseline": 0.0,
                    "error": f"device timeout after {seconds}s",
                }
            ),
            flush=True,
        )
        raise SystemExit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    _watchdog(int(os.environ.get("BENCH_TIMEOUT", "1500")))
    import jax

    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import Volume

    r = Renderer()
    r.volume = Volume(VOLUME)
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment("/root/reference/data/table_mountain_2_puresky_1k.hdr"))
    if USE_TF:
        from volren_tpu.scene.transferfunc import TransferFunction

        r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
        r.show_environment = False
    r.bounces = BOUNCES
    r.init(RES, RES)
    r.commit()

    # warmup / compile
    r.render(2)

    t0 = time.time()
    r.render(SPP)
    jax.block_until_ready(r.framebuffer())
    dt = time.time() - t0
    spp_per_sec = SPP / dt

    variant = "TF" if USE_TF else "no-TF"
    print(
        json.dumps(
            {
                "metric": f"spp/sec @ {RES}x{RES} {os.path.basename(VOLUME)} ({variant}, wavefront DDA, {BOUNCES} bounces)",
                "value": round(spp_per_sec, 3),
                "unit": "spp/s",
                "vs_baseline": round(spp_per_sec / NOMINAL_REFERENCE_SPP_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
