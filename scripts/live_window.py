"""Single-process live-window runner for the axon tunnel.

The dev tunnel has DEAD phases where every fresh JAX process wedges at
its first device op (see CLAUDE.md); a live window must therefore be
spent in as FEW processes as possible.  This runs the whole pending
on-hardware queue in ONE process — one init, one wedge risk:

    1. knob sweep             (scripts/knob_sweep.py — the open experiment)
    2. parity smoke x2 assets (scripts/tpu_smoke.py — re-certification)
    3. official bench         (bench.py --all)

Each step's outcome is printed as a `[live-window] <step> rc=<n>` line;
a failing step never blocks the next (the certification matters even if
a sweep variant trips its parity guard).

Usage: /tmp/one_attempt.sh /tmp/live_window.log python scripts/live_window.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _step(name, argv, fn):
    print(f"[live-window] {name} start at {time.strftime('%H:%M:%S')}",
          flush=True)
    old = sys.argv
    sys.argv = argv
    rc = 0
    try:
        fn()
    except SystemExit as e:
        rc = int(e.code or 0)
    except Exception as e:  # noqa: BLE001 — keep draining the queue
        import traceback

        traceback.print_exc()
        print(f"[live-window] {name} EXCEPTION: {e!r}", flush=True)
        rc = 99
    finally:
        sys.argv = old
    print(f"[live-window] {name} rc={rc} at {time.strftime('%H:%M:%S')}",
          flush=True)
    return rc


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
    import tpu_smoke

    rcs = {}
    rcs["sweep"] = _step("knob_sweep", ["knob_sweep.py"], knob_sweep.main)
    rcs["smoke_head"] = _step(
        "tpu_smoke african_head", ["tpu_smoke.py"], tpu_smoke.main
    )
    rcs["smoke_diablo"] = _step(
        "tpu_smoke diablo",
        ["tpu_smoke.py", "--asset", "/root/reference/assets/diablo"],
        tpu_smoke.main,
    )
    rcs["bench"] = _step(
        "bench --all", ["bench.py", "--all", "--frames", "64"], bench.main
    )
    print(f"[live-window] done: {rcs}", flush=True)
    sys.exit(max(rcs.values()))


if __name__ == "__main__":
    main()
