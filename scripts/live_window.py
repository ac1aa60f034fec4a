"""Single-process live-window runner for the axon tunnel.

The dev tunnel has DEAD phases where every fresh JAX process wedges at
its first device op (see CLAUDE.md); a live window must therefore be
spent in as FEW processes as possible.  This runs the whole pending
on-hardware queue in ONE process — one init, one wedge risk.

Round-4e queue (earlier queues live in git history and
docs/live_window_r4.log / _r4c.log / _r4d.log):

    1. app drive        (the verify recipe's real-TPU leg: diablo shadow,
                         10 orbit frames, PNG saved for visual check)
    2. app save-seq     (render_sequence burst with keep_frames — first
                         hardware run of the burst's new per-frame
                         overflow output, af3bec7)
    3. tpu_smoke x2     (parity certification on both assets — expected
                         IDENTICAL mismatch fractions: nothing this round
                         changes a pixel)
    4. official bench   (bench.py --all on the shipped code)

Each step's outcome is printed as a `[live-window] <step> rc=<n>` line;
a failing step never blocks the next.

Usage: scripts/one_attempt.sh /tmp/live_window_r4e.log python scripts/live_window.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def _step(name, argv, fn):
    print(f"[live-window] {name} start at {time.strftime('%H:%M:%S')}",
          flush=True)
    old = sys.argv
    sys.argv = argv
    rc, ret = 0, None
    try:
        ret = fn()
    except SystemExit as e:
        # e.code may be None (success), an int, or a message string.
        rc = e.code if isinstance(e.code, int) else (0 if e.code is None else 1)
    except Exception as e:  # noqa: BLE001 — keep draining the queue
        import traceback

        traceback.print_exc()
        print(f"[live-window] {name} EXCEPTION: {e!r}", flush=True)
        rc = 99
    finally:
        sys.argv = old
    print(f"[live-window] {name} rc={rc} at {time.strftime('%H:%M:%S')}",
          flush=True)
    return rc, ret


def main():
    # One trivial device op up front: the supervisor's liveness sentinel.
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    from tiny_renderer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench
    import tpu_smoke
    from tiny_renderer_tpu.app import main as app_main

    rcs = {}
    rcs["drive"], _ = _step(
        "app drive",
        ["app", "-p", "/root/reference/assets/diablo", "-s", "shadow",
         "--frames", "10", "--orbit", "--save", "/tmp/verify_r4e_tpu.png"],
        lambda: app_main(sys.argv[1:]),
    )
    rcs["seq"], _ = _step(
        "app save-seq (burst overflow output)",
        ["app", "-p", "/root/reference/assets/diablo", "-s", "shadow",
         "--frames", "6", "--save-seq", "/tmp/r4e_seq"],
        lambda: app_main(sys.argv[1:]),
    )
    for asset in ("diablo", "african_head"):
        rcs[f"smoke {asset}"], _ = _step(
            f"tpu_smoke {asset}",
            ["tpu_smoke.py", "--asset", f"/root/reference/assets/{asset}"],
            tpu_smoke.main,
        )
    rcs["bench"], _ = _step(
        "bench --all", ["bench.py", "--all", "--frames", "64"], bench.main
    )
    print(f"[live-window] done: {rcs}", flush=True)
    sys.exit(max(rcs.values()))


if __name__ == "__main__":
    main()
