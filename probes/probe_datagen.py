"""Datagen scale point (VERDICT r4 #7): N scenes at 1024^2 with the
reference contract (noisy 1-32 spp + clean 4096 spp fp16 HDF5 pairs,
datagen_denoise.py:14-16,49-52) on the current default engine, under a
WATCHDOG parent — a wedged tunnel dispatch (the round-4/5 bimodal
pathology froze the first attempt mid-scene for 50 min) kills and
restarts the child with DATAGEN_RESUME at the last completed scene.

Emits results/datagen5.jsonl with per-scene timings + scenes/hour +
the 256-scene extrapolation.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "probes", "results", "datagen5.jsonl")
N = int(os.environ.get("PROBE_N", "8"))
RES = int(os.environ.get("PROBE_RES", "1024"))
STALL_S = int(os.environ.get("PROBE_STALL_S", "600"))
BUDGET_S = int(os.environ.get("PROBE_BUDGET_S", "7200"))
WORKDIR = os.environ.get("PROBE_WORKDIR", "/tmp/datagen_r5")


def emit(rec):
    rec = dict(rec)
    rec.setdefault("probe", "datagen5")
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    emit({"mode": "env", "n": N, "res": RES, "stall_s": STALL_S})
    deadline = time.time() + BUDGET_S
    resume = 0
    restarts = 0
    scene_times = {}
    t_start = time.time()
    while resume < N and time.time() < deadline and restarts <= 6:
        env = dict(os.environ)
        env.update(DATAGEN_N_IMAGES=str(N), DATAGEN_RES=str(RES),
                   DATAGEN_SPP_TARGET="4096",
                   DATAGEN_RESUME=str(resume))
        child = subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "scripts", "datagen_denoise.py")],
            cwd=WORKDIR, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        last_line = time.time()
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(child.stdout, selectors.EVENT_READ)
        buf = ""
        wedged = False
        while True:
            if time.time() > deadline:
                wedged = True
                break
            events = sel.select(timeout=10.0)
            if events:
                chunk = os.read(child.stdout.fileno(), 65536).decode(
                    errors="replace")
                if not chunk:
                    break
                buf += chunk
                last_line = time.time()
                while "\n" in buf:
                    line, buf = buf.split("\n", 1)
                    if line.startswith("@SCENE"):
                        parts = line.split()
                        j, kind, spp, secs = (int(parts[1]), parts[2],
                                              parts[3], float(
                                                  parts[4].rstrip("s")))
                        scene_times.setdefault(j, {})[kind] = secs
                        emit({"scene": j, "kind": kind, "spp": spp,
                              "s": secs})
                        if kind == "clean":
                            resume = j + 1
                    elif line.strip():
                        print("# " + line, file=sys.stderr, flush=True)
            elif child.poll() is not None:
                break
            elif time.time() - last_line > STALL_S:
                wedged = True
                break
        if wedged:
            child.kill()
            restarts += 1
            emit({"event": "restart", "resume": resume,
                  "restarts": restarts})
        else:
            child.wait()
            if child.returncode == 0:
                break
            restarts += 1
            emit({"event": "child_exit", "rc": child.returncode,
                  "resume": resume, "restarts": restarts})
    wall = time.time() - t_start
    done = resume
    clean_s = [v["clean"] for v in scene_times.values() if "clean" in v]
    rec = {"done_scenes": done, "wall_s": round(wall, 1),
           "restarts": restarts,
           "scenes_per_hour": round(done / (wall / 3600.0), 2)
           if done else 0.0}
    if clean_s:
        rec["median_clean_s"] = sorted(clean_s)[len(clean_s) // 2]
        rec["full_256_extrapolation_h"] = round(
            256 * (wall / max(done, 1)) / 3600.0, 1)
    emit(rec)


if __name__ == "__main__":
    main()
