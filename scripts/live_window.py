"""Single-process live-window runner for the axon tunnel.

The dev tunnel has DEAD phases where every fresh JAX process wedges at
its first device op (see CLAUDE.md); a live window must therefore be
spent in as FEW processes as possible.  This runs the whole pending
on-hardware queue in ONE process — one init, one wedge risk.

Round-4c queue (the r4a/r4b queue that ran 2026-08-19 09:48-10:31 lives
in git history and docs/live_window_r4.log):

    1. scaling model rerun    (scripts/scaling_model.py at the round-4
                               tuned defaults -> docs/scaling_r4_data.jsonl;
                               fit with scripts/scaling_fit.py — VERDICT r3 #2)
    2. knob sweep             (scripts/knob_sweep.py — tex_tile for the
                               pipelines r4a/r4b left unmeasured)
    3. interactive bench      (scripts/interactive_bench.py — the REAL
                               run_interactive loop over the in-repo X11
                               wire server, pipelined vs serial — VERDICT r3 #4)
    4. parity smoke x2 assets (scripts/tpu_smoke.py — re-certification)
    5. official bench         (bench.py --all)

Each step's outcome is printed as a `[live-window] <step> rc=<n>` line;
a failing step never blocks the next (the certification matters even if
a sweep variant trips its parity guard).

Usage: /tmp/one_attempt.sh /tmp/live_window.log python scripts/live_window.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

SCALING_OUT = os.path.join(REPO, "docs", "scaling_r4_data.jsonl")


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
    import interactive_bench
    import knob_sweep
    import scaling_model
    import tpu_smoke

    rcs = {}
    # Fresh data file per window: scaling_model --out appends, and a
    # retried window must not leave duplicate lines for the fit.
    open(SCALING_OUT, "w").close()
    rcs["scaling"], _ = _step(
        "scaling_model", ["scaling_model.py", "--out", SCALING_OUT],
        scaling_model.main,
    )
    rc, sweep_ret = _step("knob_sweep", ["knob_sweep.py"], knob_sweep.main)
    medians, bad = sweep_ret if sweep_ret else ({}, set())
    rcs["sweep"] = rc if rc else (1 if bad else 0)
    for base, tuned in [("default d0", "default d16"),
                        ("default h0", "default h16"),
                        ("normal_map n0", "normal_map n16"),
                        ("darboux x0", "darboux x16")]:
        if base in medians and tuned in medians:
            d = medians[tuned] - medians[base]
            print(f"[live-window] {tuned} vs {base}: {d:+.3f} ms "
                  f"({medians[base]:.3f} -> {medians[tuned]:.3f})",
                  flush=True)
    rcs["interactive"], _ = _step(
        "interactive_bench", ["interactive_bench.py"], interactive_bench.main
    )
    rcs["smoke_head"], _ = _step(
        "tpu_smoke african_head", ["tpu_smoke.py"], tpu_smoke.main
    )
    rcs["smoke_diablo"], _ = _step(
        "tpu_smoke diablo",
        ["tpu_smoke.py", "--asset", "/root/reference/assets/diablo"],
        tpu_smoke.main,
    )
    rcs["bench"], _ = _step(
        "bench --all", ["bench.py", "--all", "--frames", "64"], bench.main
    )
    print(f"[live-window] done: {rcs}", flush=True)
    sys.exit(max(rcs.values()))


if __name__ == "__main__":
    main()
