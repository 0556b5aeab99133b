"""Command-line interface.

Flag-for-flag port of the reference's renderer arguments
(/root/reference/src/main.cpp:360-435 parse_cmd) plus the window flags that
still make sense headless (-w/-h from init_opengl_from_args,
main.cpp:311-357). Bare paths are dispatched by extension exactly like
handle_path (main.cpp:93-102): .py scripts, .hdr envmaps, .txt transfer
functions, anything else a volume. The offline loop renders every animation
frame, tonemaps in place, and writes numbered PNGs (main.cpp:524-558).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .renderer import Renderer
from .scene.environment import Environment, rotation_y
from .scene.transferfunc import TransferFunction
from .voldata import Volume


def _load_volume(renderer: Renderer, path: str) -> None:
    print(f"load volume: {path}")
    if os.path.isdir(path):
        renderer.volume = Volume.load_folder(path)
    else:
        renderer.volume = Volume(path)
        if path.endswith(".vdb"):
            from .voldata.volume import load_grid

            for name in ("flame", "flames", "temperature"):
                try:
                    renderer.volume.update_grid_frame(
                        renderer.volume.grid_frame_counter, load_grid(path, name), name
                    )
                    break
                except Exception:
                    continue
    renderer.density_scale = 1.0
    renderer.scale_and_move_to_unit_cube()
    renderer.commit()
    renderer.reset()


def _handle_path(renderer: Renderer, path: str) -> None:
    try:
        if path.endswith(".py"):
            run_script(renderer, path)
        elif path.endswith(".hdr"):
            renderer.set_environment(Environment(path))
            renderer.reset()
        elif path.endswith(".txt"):
            renderer.set_transferfunc(TransferFunction(path))
            renderer.show_environment = False
            renderer.reset()
        else:
            _load_volume(renderer, path)
    except Exception as e:  # keep previous state, like main.cpp:37-91
        print(f"Unable to load {path}: {e}", file=sys.stderr)


def run_script(renderer: Renderer, path: str) -> None:
    """Execute a Python script with the ``volpy`` shim bound to this
    renderer (counterpart of the embedded interpreter, main.cpp:83-91)."""
    from . import volpy

    volpy.bind_renderer(renderer)
    code = open(path).read()
    glb = {"__name__": "__main__", "__file__": path}
    exec(compile(code, path, "exec"), glb)


def _interactive_loop(renderer, out_filename, animate, animation_fps, serve_port=None):
    """Headless analogue of the reference's interactive loop
    (main.cpp:477-523): progressive accumulation with a live preview file,
    1 Hz kernel hot-reload polling (resets accumulation on change, like
    shader reload), volume animation advance at animation_fps, auto-save of
    the raw framebuffer at convergence (main.cpp:512-513). Ctrl-C exits.

    With serve_port set, a localhost HTTP viewer (live frame + editable
    parameter panel + WASD/mouse camera — the GL-window/ImGui analogue)
    runs alongside. The live view then renders at preview resolution
    (long edge <= 256 px, where the device_queue engine sustains an
    interactive rate) and the page's "full-res snapshot" button renders
    one frame at the requested resolution to out_filename."""
    import contextlib
    import time

    from .utils.hotreload import KernelWatcher
    from .utils.image import save_ldr

    watcher = KernelWatcher()
    preview = os.path.splitext(out_filename)[0] + "_preview.png"
    reload_timer = time.time()
    animation_timer = time.time()
    preview_timer = 0.0
    viewer = None
    lock = contextlib.nullcontext()
    full_res = renderer.resolution
    if serve_port is not None:
        from .viewer import ViewerServer

        # interactive preview resolution: shrink the long edge to 256
        w, h = full_res
        if max(w, h) > 256:
            scale = 256.0 / max(w, h)
            renderer.resize(max(16, round(w * scale)), max(16, round(h * scale)))
            print(
                f"serving at preview {renderer.resolution[0]}x"
                f"{renderer.resolution[1]} (full {w}x{h} via /snapshot)"
            )
        viewer = ViewerServer(renderer, port=serve_port).start()
        lock = viewer.lock
        print(f"viewer: http://127.0.0.1:{viewer.port}/")
    print(f"interactive (headless): preview -> {preview}, Ctrl-C to stop")
    try:
        while True:
            if time.time() - reload_timer >= 1.0:  # shader_check_delay_ms
                if watcher.reload_modified_kernels():
                    renderer.reset()
                reload_timer = time.time()
            if viewer is not None and viewer.snapshot_requested:
                viewer.snapshot_requested = False
                pw, ph = renderer.resolution
                with lock:
                    renderer.resize(*full_res)
                    print(f"\nsnapshot: rendering {full_res[0]}x{full_res[1]}"
                          f" at {renderer.sppx} spp...")
                    while renderer.sample < renderer.sppx:
                        renderer.trace(spp=min(renderer.sppx - renderer.sample, 4))
                        print(f"snapshot {renderer.sample}/{renderer.sppx}",
                              end="\r", flush=True)
                    save_ldr(out_filename, renderer.draw(), flip=True, alpha=True)
                    print(f"\n{out_filename} written (tonemapped snapshot).")
                    renderer.resize(pw, ph)
            if animate and time.time() - animation_timer >= 1.0 / animation_fps:
                renderer.volume.grid_frame_counter = (
                    renderer.volume.grid_frame_counter + 1
                ) % renderer.volume.n_grid_frames()
                renderer.reset()
                animation_timer = time.time()
            if renderer.sample < renderer.sppx:
                t0 = time.time()
                with lock:
                    step = min(renderer.sppx - renderer.sample, 4)
                    renderer.trace(spp=step)
                dt = time.time() - t0
                eta = dt / step * (renderer.sppx - renderer.sample)
                print(
                    f"sample {renderer.sample}/{renderer.sppx} "
                    f"({step / dt:.2f} spp/s, est: {int(eta) // 60}m {int(eta) % 60}s)",
                    end="\r",
                    flush=True,
                )
                # throttle preview writes to ~1 Hz: the reference only pays a
                # tonemap draw per frame, while a full PNG encode at 1024^2 is
                # a meaningful slice of chunk time (round-1 review finding)
                if time.time() - preview_timer >= 1.0 or renderer.sample >= renderer.sppx:
                    save_ldr(preview, renderer.draw(), flip=True, alpha=False)
                    preview_timer = time.time()
                if renderer.sample >= renderer.sppx:
                    if renderer.resolution == full_res:
                        # reference auto-saves the raw (untonemapped) fb
                        save_ldr(out_filename, np.asarray(renderer.framebuffer()), flip=True, alpha=True)
                        print(f"\n{out_filename} written.")
                    else:
                        # preview-res serve mode: out_filename is reserved
                        # for full-res /snapshot renders
                        print(f"\npreview converged ({renderer.sample} spp).")
            else:
                time.sleep(0.1)  # 10 fps idle (main.cpp:515)
    except KeyboardInterrupt:
        print("\nexiting.")
    finally:
        if viewer is not None:
            viewer.stop()
    return 0


def _apply_platform(argv: list[str]) -> list[str]:
    """Honor --cpu / VOLREN_PLATFORM before the first backend touch.

    Setting JAX_PLATFORMS in the environment is NOT reliable here: site
    hooks may import jax at interpreter startup, after which only
    jax.config.update takes effect. Must run before any jax.devices()/
    array creation."""
    platform = os.environ.get("VOLREN_PLATFORM", "")
    if "--cpu" in argv:
        argv = [a for a in argv if a != "--cpu"]
        platform = "cpu"
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return argv


def main(argv: list[str] | None = None) -> int:
    argv = _apply_platform(list(sys.argv[1:] if argv is None else argv))
    renderer = Renderer()

    interactive = True
    out_filename = "output.png"
    width, height = 1024, 1024
    animate = False
    animation_fps = 30.0
    serve_port = None
    paths: list[str] = []
    pending: list[tuple] = []  # deferred flag applications, in order

    i = 0
    while i < len(argv):
        arg = argv[i]

        def take(n=1):
            nonlocal i
            vals = argv[i + 1 : i + 1 + n]
            i += n
            return vals if n > 1 else vals[0]

        if arg == "-w":
            width = int(take())
        elif arg == "-h":
            height = int(take())
        elif arg in ("--title", "--font"):
            take()  # window-only flags, accepted for parity
        elif arg in ("--major", "--minor", "--swap", "--fontsize"):
            take()
        elif arg in (
            "--no-resize",
            "--no-decoration",
            "--floating",
            "--maximised",
            "---debug",
            "--hidden",
        ):
            pass
        elif arg == "--render":
            interactive = False
        elif arg == "--output":
            out_filename = take()
        elif arg in ("--samples", "--spp", "--sppx"):
            renderer.sppx = int(take())
        elif arg == "--bounces":
            renderer.bounces = int(take())
        elif arg == "--albedo":
            renderer.albedo = np.full(3, float(take()), np.float32)
        elif arg == "--density":
            renderer.density_scale = float(take())
        elif arg == "--emission":
            renderer.emission_scale = float(take())
        elif arg == "--phase":
            renderer.phase = float(take())
        elif arg == "--env_strength":
            pending.append(("env_strength", float(take())))
        elif arg == "--env_rot":
            pending.append(("env_rot", float(take())))
        elif arg == "--env_hide":
            renderer.show_environment = False
        elif arg in ("--turbo", "--viridis"):
            tf = renderer.transferfunc or TransferFunction()
            tf.colormap(arg.lstrip("-"))
            pending.append(("tf", tf))
        elif arg == "--fau":
            tf = TransferFunction(
                [
                    (0, 0, 0, 0),
                    (4 / 255, 49 / 255, 106 / 255, 0.33),
                    (38 / 255, 97 / 255, 65 / 255, 0.66),
                    (151 / 255, 27 / 255, 47 / 255, 1.0),
                ]
            )
            pending.append(("tf", tf))
        elif arg == "--tf_left":
            pending.append(("tf_left", float(take())))
        elif arg == "--tf_width":
            pending.append(("tf_width", float(take())))
        elif arg == "--cam_pos":
            renderer.cam.pos = np.array([float(v) for v in take(3)], np.float32)
        elif arg == "--cam_dir":
            d = np.array([float(v) for v in take(3)], np.float32)
            renderer.cam.dir = d / np.linalg.norm(d)
        elif arg == "--cam_fov":
            renderer.cam.fov_degree = float(take())
        elif arg == "--exposure":
            renderer.tonemap_exposure = float(take())
        elif arg == "--gamma":
            renderer.tonemap_gamma = float(take())
        elif arg in ("--vol_rot_x", "--vol_rot_y", "--vol_rot_z"):
            axis = {"x": 0, "y": 1, "z": 2}[arg[-1]]
            pending.append(("vol_rot", axis, float(take())))
        elif arg == "--vol_crop_min":
            renderer.vol_clip_min = np.array([float(v) for v in take(3)], np.float32)
        elif arg == "--vol_crop_max":
            renderer.vol_clip_max = np.array([float(v) for v in take(3)], np.float32)
        elif arg == "--no-dda":
            # global-majorant estimators exist only in the oracle engine
            renderer._use_dda = False
            renderer.engine = "oracle"
        elif arg == "--engine":
            renderer.engine = take()
        elif arg == "--step-engine":
            # chunked | device | host | queue | device_queue (renderer.py)
            renderer.step_engine = take()
        elif arg == "--animate":
            animate = True
        elif arg == "--fps":
            animation_fps = float(take())
        elif arg == "--distribute":
            pending.append(("distribute",))
        elif arg == "--serve":
            # localhost HTTP viewer (GL-window/ImGui analogue); optional port
            has_port = i + 1 < len(argv) and argv[i + 1].isdigit()
            serve_port = int(take()) if has_port else 8710
        elif os.path.exists(arg):
            paths.append(arg)
        else:
            print(f"ignoring unknown argument: {arg}", file=sys.stderr)
        i += 1

    renderer.init(width, height)

    for path in paths:
        _handle_path(renderer, path)

    # default debug volume if nothing loaded (main.cpp:464-474)
    if not renderer.volume.grids:
        from .voldata import DenseGrid

        values = np.array([1.0, 2.5, 5.0, 10.0], np.float32)
        box = DenseGrid(1, 1, 4, values)
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = 2.0 * renderer.cam.dir + np.array([0, -0.5, -2], np.float32)
        box.transform = t
        renderer.volume = Volume(box)
        renderer.commit()

    # deferred flags that touch environment / tf objects
    for item in pending:
        if item[0] == "env_strength":
            renderer.environment.strength = item[1]
            renderer.set_environment(renderer.environment)
        elif item[0] == "env_rot":
            renderer.environment.transform = rotation_y(item[1])
            renderer.set_environment(renderer.environment)
        elif item[0] == "tf":
            renderer.set_transferfunc(item[1])
        elif item[0] == "tf_left" and renderer.transferfunc:
            renderer.transferfunc.window_left = item[1]
            renderer.set_transferfunc(renderer.transferfunc)
        elif item[0] == "tf_width" and renderer.transferfunc:
            renderer.transferfunc.window_width = item[1]
            renderer.set_transferfunc(renderer.transferfunc)
        elif item[0] == "distribute":
            renderer.distribute()
        elif item[0] == "vol_rot":
            axis, deg = item[1], item[2]
            c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
            rot = np.eye(4, dtype=np.float32)
            a, b = [(1, 2), (0, 2), (0, 1)][axis]
            rot[a, a] = c
            rot[b, b] = c
            rot[a, b] = -s if axis != 1 else s
            rot[b, a] = s if axis != 1 else -s
            renderer.volume.transform = renderer.volume.transform @ rot

    renderer.reset()

    if interactive:
        return _interactive_loop(
            renderer, out_filename, animate, animation_fps, serve_port=serve_port
        )
    # offline render loop (main.cpp:524-558)
    print("rendering...")
    for frame in range(renderer.volume.n_grid_frames()):
        renderer.reset()
        renderer.volume.grid_frame_counter = frame
        import time

        t0 = time.time()
        while renderer.sample < renderer.sppx:
            # chunk samples per device call: regeneration amortizes ragged
            # path lengths within a chunk
            step = min(renderer.sppx - renderer.sample, 64)
            renderer.trace(spp=step)
            # sync per chunk: dispatch is async, so without this the
            # progress line and the spp/s summary time only enqueueing
            import jax

            jax.block_until_ready(renderer.framebuffer())
            print(f"{renderer.sample} / {renderer.sppx}", end="\r", flush=True)
        dt = time.time() - t0
        # newline first: the \r progress line above leaves the cursor mid-line
        # (and concatenates with this summary when stdout is not a tty)
        print(f"\n{renderer.sppx} samples in {dt:.1f}s ({renderer.sppx / dt:.2f} spp/s)")
        stem = os.path.splitext(out_filename)[0]
        if renderer.volume.n_grid_frames() > 1 or not interactive:
            out_fn = f"{stem}_{frame:06d}.png"
        else:
            out_fn = out_filename
        from .utils.image import save_ldr

        save_ldr(out_fn, renderer.draw(), flip=True, alpha=True)
        print(f"{out_fn} written.")
        if interactive:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
