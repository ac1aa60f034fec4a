"""Blit (device->host frame fetch) probe over the axon tunnel.

VERDICT r2 #8: the presentation path measured ~1.4 s/frame against 5 ms of
render.  This probe (a) re-sweeps utils/transfer.fetch chunk sizes in the
current chip state, and (b) measures whether fetching frame N-1 while
frame N renders overlaps transfer with compute (double-buffered
presentation) or the tunnel serializes them.

Usage: scripts/tpu_retry.sh /tmp/blit.log x python scripts/blit_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu import RenderConfig, Scene, load_model
    from tiny_renderer_tpu.utils.transfer import fetch

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    import bench

    h = bench.chip_health()
    mxu = h["mxu_tflops"]
    mxu_s = f"{mxu:.1f}" if mxu is not None else "unreliable"
    print(f"chip health: {mxu_s} Tflop/s, {h['gather_ns_per_row']:.1f} ns/row",
          flush=True)

    model = load_model("/root/reference/assets/diablo", verbose=False)
    cfg = RenderConfig(width=800, height=800)
    scene = Scene(model, "shadow", cfg, backend="pallas")

    rng = np.random.default_rng()

    def set_state(eps):
        a = 0.37 + eps
        scene.set_camera(
            np.array([np.sin(a), 0.0, np.cos(a)], np.float32),
            np.zeros(3, np.float32),
            np.array([0.0, 1.0, 0.0], np.float32),
        )
        scene.set_light_direction(
            np.array([np.sin(-0.6 + eps), 0.0, np.cos(-0.6 + eps)], np.float32)
        )

    set_state(0.0)
    out = scene.render()
    np.asarray(out["frame"][0, 0])
    frame = out["frame"]

    # (a) chunk-size sweep on the rendered 1.9 MB u8 frame.
    print("chunk-size sweep (device->host, (800,800,3) u8):", flush=True)
    for kb in (16, 32, 64, 128, 256, 512, 1024, None):
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            if kb is None:
                np.asarray(frame)
            else:
                fetch(frame, max_chunk_bytes=kb << 10)
        ms = (time.perf_counter() - t0) * 1e3 / reps
        label = f"{kb:5d} KB" if kb is not None else " single"
        print(f"  {label}: {ms:9.1f} ms", flush=True)

    # (b) overlap: serial render+fetch vs fetch(N-1) during render(N).
    def timed(loop_fn, frames=6):
        set_state(float(rng.uniform(0, 1e-3)))
        scene.render()
        np.asarray(scene._out["frame"][0, 0])
        t0 = time.perf_counter()
        loop_fn(frames)
        return (time.perf_counter() - t0) * 1e3 / frames

    def serial(n):
        for i in range(n):
            set_state(1e-4 * (i + 1))
            out = scene.render()
            np.asarray(out["frame"][0, 0])  # completion barrier
            fetch(out["frame"])

    def overlapped(n):
        prev = None
        for i in range(n):
            set_state(1e-4 * (i + 1) + 0.5)
            out = scene.render()  # async dispatch
            if prev is not None:
                fetch(prev)  # fetch N-1 while N renders
            prev = out["frame"]
        np.asarray(prev[0, 0])
        fetch(prev)

    s = timed(serial)
    o = timed(overlapped)
    print(f"serial render+fetch:     {s:9.1f} ms/frame", flush=True)
    print(f"double-buffered fetch:   {o:9.1f} ms/frame", flush=True)
    print("PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()
