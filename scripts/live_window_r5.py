"""Single-process live-window runner — round-5 hardware queue.

The dev tunnel has DEAD phases where every fresh JAX process wedges at
its first device op (see CLAUDE.md); a live window must therefore be
spent in as FEW processes as possible.  This runs the whole pending
on-hardware queue in ONE process — one init, one wedge risk.

Round-5 queue (VERDICT r4 "Next round" #1 and #2; earlier queues live in
git history and docs/live_window_r4*.log):

    1. tpu_smoke --size 800 x2 assets
                        FLAGSHIP-SHAPE parity certification at the
                        shipped round-4 tuned defaults (every round-4
                        hardware parity run was 256^2; the headline and
                        the parity north star are both defined at 800^2,
                        /root/reference/src/main.rs:6-7).  Budget 0.005:
                        round 3's worst 800^2 mismatch was 0.073%.
    2. official bench   bench.py --all --frames 64 (now drift-aware:
                        per-config deltas vs .bench_last_good.json ride
                        in the JSON line)
    3. stress validate  first recorded hardware number for the
                        80k-triangle capacity config + the out-of-sample
                        predicted-vs-measured test of the round-4 fitted
                        scaling model (scripts/stress_validate.py)

Ordered by evidentiary value so an early tunnel death still banks the
most important artifact.  Each step's outcome is printed as a
`[live-window] <step> rc=<n>` line; a failing step never blocks the next.

Usage: scripts/one_attempt.sh /tmp/live_window_r5.log python scripts/live_window_r5.py
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
    import importlib.util

    import bench
    import tpu_smoke

    def _load(name):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
        spec = importlib.util.spec_from_file_location(name[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    stress_validate = _load("stress_validate.py")

    rcs = {}
    for asset in ("diablo", "african_head"):
        rcs[f"smoke800 {asset}"], _ = _step(
            f"tpu_smoke 800 {asset}",
            ["tpu_smoke.py", "--size", "800", "--budget", "0.005",
             "--asset", f"/root/reference/assets/{asset}"],
            tpu_smoke.main,
        )
    rcs["bench"], _ = _step(
        "bench --all", ["bench.py", "--all", "--frames", "64"], bench.main
    )
    rcs["stress"], _ = _step(
        "stress validate", ["stress_validate.py"], stress_validate.main
    )
    print(f"[live-window] done: {rcs}", flush=True)
    sys.exit(max(rcs.values()))


if __name__ == "__main__":
    main()
