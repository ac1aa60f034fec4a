"""Single-process live-window runner for the axon tunnel.

The dev tunnel has DEAD phases where every fresh JAX process wedges at
its first device op (see CLAUDE.md); a live window must therefore be
spent in as FEW processes as possible.  This runs the whole pending
on-hardware queue in ONE process — one init, one wedge risk.

Round-4d queue (earlier queues live in git history and
docs/live_window_r4.log / docs/live_window_r4c.log):

    1. knob sweep       (scripts/knob_sweep.py — tile_h 48/64, the one
                         axis whose round-3 trend was still improving at
                         its measured end, raw and composed with the
                         shipped tex_tile=16)
    2. official bench   (bench.py --all at the round-4 flipped defaults:
                         the first official numbers with tex_tile=16 on
                         default/normal_map/darboux)

Each step's outcome is printed as a `[live-window] <step> rc=<n>` line;
a failing step never blocks the next.

Usage: /tmp/one_attempt.sh /tmp/live_window.log python scripts/live_window.py
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
    import knob_sweep

    rcs = {}
    rc, sweep_ret = _step("knob_sweep", ["knob_sweep.py"], knob_sweep.main)
    medians, bad = sweep_ret if sweep_ret else ({}, set())
    rcs["sweep"] = rc if rc else (1 if bad else 0)
    for base, var in [("shadow s32", "shadow s48"),
                      ("shadow s32", "shadow s64"),
                      ("shadow s32+t16", "shadow s64+t16")]:
        if base in medians and var in medians:
            d = medians[var] - medians[base]
            print(f"[live-window] {var} vs {base}: {d:+.3f} ms "
                  f"({medians[base]:.3f} -> {medians[var]:.3f})",
                  flush=True)
    rcs["bench"], _ = _step(
        "bench --all", ["bench.py", "--all", "--frames", "64"], bench.main
    )
    print(f"[live-window] done: {rcs}", flush=True)
    sys.exit(max(rcs.values()))


if __name__ == "__main__":
    main()
