"""App / CLI: the reference's entry point, TPU-native.

Reference: src/main.rs (CLI: `-p <asset dir>`, `-s <pipeline>`, 800x800
default) + src/app.rs (asset loading, window, per-frame loop with
a/d camera and q/e light orbit at 3.0 rad/s scaled by frame dt, FPS print).

Headless-first: `--frames N` renders N frames (optionally orbiting) without
a display; `--save` writes PNG; `--dump-z/--dump-shadow` expose the debug
buffer views the reference hides behind commented-out code
(src/app.rs:213-215).  `--interactive` opens a matplotlib viewer with the
reference's keybindings when a display is available.

Examples:
  python -m tiny_renderer_tpu.app -p /root/reference/assets/diablo -s shadow \
      --frames 100 --orbit --save out.png
  python -m tiny_renderer_tpu.app -s occlusion --interactive
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

from . import PIPELINE_NAMES
from .assets.model import load_model
from .config import RenderConfig
from .scene import Scene
from .utils.png import write_png
from .utils.timing import FpsCounter, profile_trace

DEFAULT_ASSET_ROOTS = (
    "assets",
    "/root/reference/assets",
)


def _default_asset_path() -> str:
    for root in DEFAULT_ASSET_ROOTS:
        p = os.path.join(root, "diablo")
        if os.path.isdir(p):
            return p
    return "assets/diablo"


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tiny_renderer_tpu",
        description="TPU-native tiny renderer (capabilities of litzendraht/tiny_renderer)",
    )
    ap.add_argument("-p", dest="asset_path", default=_default_asset_path(),
                    help="asset directory (model.obj + 4 TGA maps)")
    ap.add_argument("-s", dest="pipeline", default="default", choices=PIPELINE_NAMES,
                    help="shader pipeline name")
    ap.add_argument("--size", nargs=2, type=int, default=[800, 800],
                    metavar=("W", "H"), help="frame size (default 800 800)")
    ap.add_argument("--frames", type=int, default=60,
                    help="number of frames to render in headless mode")
    ap.add_argument("--orbit", action="store_true",
                    help="animate camera+light orbit in headless mode")
    ap.add_argument("--camera-angle", type=float, default=0.0,
                    help="initial camera orbit angle (radians)")
    ap.add_argument("--light-angle", type=float, default=0.0,
                    help="initial light orbit angle (radians)")
    ap.add_argument("--save", metavar="PNG", help="write the final frame to PNG")
    ap.add_argument("--save-seq", metavar="DIR",
                    help="render the whole orbit animation as one device "
                         "burst and write frame_%%04d.png into DIR")
    ap.add_argument("--dump-z", metavar="PNG", help="write the z-buffer debug view")
    ap.add_argument("--dump-shadow", metavar="PNG", help="write the shadow-buffer debug view")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "jnp", "pallas_interpret"],
                    help="raster backend (auto: pallas on TPU, jnp elsewhere)")
    ap.add_argument("--interactive", action="store_true",
                    help="open an interactive viewer (requires a display)")
    ap.add_argument("--no-fps", action="store_true", help="disable the FPS printout")
    ap.add_argument("--timing", action="store_true",
                    help="print a per-frame wall-time summary at exit")
    ap.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace of the run to DIR")
    return ap


def _angles_to_vectors(camera_angle: float, light_angle: float):
    """Camera and light on the unit XZ circle (src/app.rs:200-207)."""
    look_from = np.array(
        [math.sin(camera_angle), 0.0, math.cos(camera_angle)], np.float32
    )
    light = np.array([math.sin(light_angle), 0.0, math.cos(light_angle)], np.float32)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    return look_from, look_at, up, light


def run_headless(scene: Scene, args) -> np.ndarray:
    cfg = scene.config
    fps = FpsCounter(enabled=not args.no_fps)
    camera_angle = args.camera_angle
    light_angle = args.light_angle
    frame_time = 0.0
    times = []
    for _ in range(max(1, args.frames)):
        t0 = time.monotonic()
        if args.orbit:
            camera_angle += cfg.camera_speed * frame_time
            light_angle -= cfg.light_speed * frame_time
        look_from, look_at, up, light = _angles_to_vectors(camera_angle, light_angle)
        scene.set_camera(look_from, look_at, up)
        scene.set_light_direction(light)
        scene.render()
        # Headless: frames stay on device; only the final one is fetched.
        scene.block_until_ready()
        fps.tick()
        frame_time = time.monotonic() - t0
        times.append(frame_time)
    if args.timing and times:
        steady = times[1:] or times  # drop the compile frame
        print(
            f"frame time: mean {1e3 * sum(steady) / len(steady):.2f} ms, "
            f"min {1e3 * min(steady):.2f} ms over {len(steady)} frames "
            f"(first frame incl. compile: {1e3 * times[0]:.0f} ms)"
        )
    return scene.get_frame_buffer()


def run_interactive(scene: Scene, args) -> np.ndarray:
    if not os.environ.get("DISPLAY"):
        print("no display available; falling back to headless")
        return run_headless(scene, args)
    try:
        import matplotlib

        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover - depends on host GUI
        print(f"interactive viewer unavailable ({e}); falling back to headless")
        return run_headless(scene, args)

    cfg = scene.config
    state = {
        "camera": args.camera_angle,
        "light": args.light_angle,
        "keys": set(),
        "exit": False,
    }

    def on_press(event):
        if event.key == "escape":
            state["exit"] = True
        else:
            state["keys"].add(event.key)

    def on_release(event):
        state["keys"].discard(event.key)

    fig, ax = plt.subplots(figsize=(6, 6))
    fig.canvas.mpl_connect("key_press_event", on_press)
    fig.canvas.mpl_connect("key_release_event", on_release)
    ax.set_axis_off()
    im = None
    fps = FpsCounter(enabled=not args.no_fps)
    frame_time = 0.0
    frame = None
    plt.ion()
    plt.show()
    while not state["exit"] and plt.fignum_exists(fig.number):
        t0 = time.monotonic()
        # Reference keymap (src/app.rs:63-77): a/d camera, q/e light.
        if "d" in state["keys"]:
            state["camera"] += cfg.camera_speed * frame_time
        if "a" in state["keys"]:
            state["camera"] -= cfg.camera_speed * frame_time
        if "e" in state["keys"]:
            state["light"] += cfg.light_speed * frame_time
        if "q" in state["keys"]:
            state["light"] -= cfg.light_speed * frame_time
        look_from, look_at, up, light = _angles_to_vectors(state["camera"], state["light"])
        scene.set_camera(look_from, look_at, up)
        scene.set_light_direction(light)
        scene.render()
        frame = scene.get_frame_buffer()
        if im is None:
            im = ax.imshow(frame)
        else:
            im.set_data(frame)
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
        fps.tick()
        frame_time = time.monotonic() - t0
    plt.ioff()
    plt.close(fig)
    return frame


def run_sequence(scene: Scene, args) -> np.ndarray:
    """Render the orbit animation as ONE device burst and dump PNG frames."""
    import jax.numpy as jnp

    from .pipelines.frame import make_burst_fn

    cfg = scene.config
    n = max(1, args.frames)
    # Fixed-dt orbit (the interactive loop scales by real frame time; a
    # sequence export uses a deterministic 60 fps step).
    dt = 1.0 / 60.0
    cams = (args.camera_angle + cfg.camera_speed * dt * np.arange(n)).astype(np.float32)
    ligs = (args.light_angle - cfg.light_speed * dt * np.arange(n)).astype(np.float32)
    burst = make_burst_fn(
        args.pipeline, cfg, backend=args.backend, keep_frames=True
    )
    out = burst(scene._geom, scene._textures, jnp.asarray(cams), jnp.asarray(ligs))
    from .utils.transfer import fetch

    frames = fetch(out["frames"])
    os.makedirs(args.save_seq, exist_ok=True)
    for i in range(n):
        write_png(os.path.join(args.save_seq, f"frame_{i:04d}.png"), frames[i][::-1])
    print(f"wrote {n} frames to {args.save_seq}")
    return frames[-1][::-1]


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    width, height = args.size

    model = load_model(args.asset_path)
    print(f"cooking up a scene with '{args.pipeline}' shader pipeline")
    config = RenderConfig(width=width, height=height)
    scene = Scene(model, args.pipeline, config, backend=args.backend)

    with profile_trace(args.profile):
        if args.save_seq:
            frame = run_sequence(scene, args)
        elif args.interactive:
            frame = run_interactive(scene, args)
        else:
            frame = run_headless(scene, args)

    if args.save and frame is not None:
        write_png(args.save, frame)
        print(f"wrote {args.save}")
    if args.dump_z:
        write_png(args.dump_z, scene.get_z_buffer())
        print(f"wrote {args.dump_z}")
    if args.dump_shadow:
        write_png(args.dump_shadow, scene.get_shadow_buffer())
        print(f"wrote {args.dump_shadow}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
