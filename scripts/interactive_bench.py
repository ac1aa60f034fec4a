"""End-to-end interactive-loop measurement (VERDICT r3 weak #6 / next #4).

Runs the REAL `run_interactive` loop — real X11Viewer over real libX11
against the in-repo wire-protocol server (tests/x11_wire_server.py) — on
the TPU for ~100 frames, pipelined presentation ON then OFF, and prints
ms/frame for both.  This turns the "~12-20 FPS on the dev tunnel" claim
(assembled from component measurements: 85 ms/frame pipelined blit) into
one measured end-to-end artifact.  Reference frame loop:
/root/reference/src/app.rs:155-247.

The loop is byte-real down to the X11 socket: XOpenDisplay, per-frame
XPutImage (split at the 256 KB request cap), event drain; the camera
orbits via a server-injected held 'd' key so every frame renders a new
pose (the runtime dedupes bit-identical executions — CLAUDE.md).

Usage: scripts/tpu_retry.sh /tmp/ib.log x python scripts/interactive_bench.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_FRAMES = 100
ESCAPE = 0xFF1B
KEY_D = 0x0064


def measure(srv, serial_present: bool, size: int = 800) -> tuple[float, int]:
    from tiny_renderer_tpu import RenderConfig, Scene, load_model
    from tiny_renderer_tpu.app import build_arg_parser, run_interactive
    from tiny_renderer_tpu.viewer_x11 import X11Viewer

    model = load_model("/root/reference/assets/diablo", verbose=False)
    scene = Scene(model, "shadow", RenderConfig(width=size, height=size))
    argv = ["--interactive", "--no-fps"]
    if serial_present:
        argv.append("--serial-present")
    args, _ = build_arg_parser().parse_known_args(argv)

    viewer = X11Viewer(scene.config.width, scene.config.height)
    shown = {"n": 0, "t0": None, "t1": None}
    real_show = viewer.show

    def counting_show(frame):
        real_show(frame)
        shown["n"] += 1
        if shown["n"] == 1:
            shown["t0"] = time.perf_counter()
            srv.send_key(KEY_D, True)  # hold 'd': camera orbits every frame
        if shown["n"] == N_FRAMES:
            shown["t1"] = time.perf_counter()
            srv.send_key(ESCAPE, True)

    viewer.show = counting_show
    run_interactive(scene, args, viewer=viewer)
    if shown["t1"] is None:  # loop exited early (viewer died)
        raise RuntimeError(f"loop ended after {shown['n']} frames")
    ms = (shown["t1"] - shown["t0"]) * 1e3 / (N_FRAMES - 1)
    return ms, shown["n"]


def main() -> int:
    global N_FRAMES
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=N_FRAMES)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test the harness on the CPU backend "
                         "(use a small --size/--frames)")
    args = ap.parse_args()
    N_FRAMES = args.frames

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    from x11_wire_server import MiniXServer

    if not args.cpu:
        import bench

        h = bench.chip_health()
        mxu = h["mxu_tflops"]
        print(
            f"chip health: "
            f"{f'{mxu:.1f} Tflop/s' if mxu is not None else 'unreliable'}, "
            f"{h['gather_ns_per_row']:.1f} ns/row",
            flush=True,
        )

    # One server per run: MiniXServer serves a single client connection
    # for its lifetime (tests/x11_wire_server.py _serve).
    for label, serial in [("pipelined", False), ("serial", True)]:
        with MiniXServer() as srv:
            os.environ["DISPLAY"] = srv.display
            try:
                ms, n = measure(srv, serial, size=args.size)
            finally:
                os.environ.pop("DISPLAY", None)
        print(
            f"interactive {label:9s} {ms:7.1f} ms/frame "
            f"({1e3 / ms:5.1f} FPS) over {n} frames",
            flush=True,
        )
    print("PROBE-DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
