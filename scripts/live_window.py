"""Single-process live-window runner for the axon tunnel.

The dev tunnel has DEAD phases where every fresh JAX process wedges at
its first device op (see CLAUDE.md); a live window must therefore be
spent in as FEW processes as possible.  This runs the whole pending
on-hardware queue in ONE process — one init, one wedge risk:

    1. knob sweep             (scripts/knob_sweep.py — the open experiment)
    2. parity smoke x2 assets (scripts/tpu_smoke.py — re-certification)
    3. official bench         (bench.py --all)
    4. flipped-config bench   (headline with the sweep's winning knobs,
                               only when a parity-clean variant beat the
                               default by >0.1 ms — the defaults-flip
                               confirmation number)
    5. blit probe             (scripts/blit_probe.py — re-measure the
                               bimodal device->host transfer regime)

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


# Sweep-variant label -> the --knob overrides that reproduce it (must
# mirror scripts/knob_sweep.py's plan).  Used to run the flipped-config
# confirmation bench inside the SAME live window as the sweep that
# justified it — the tunnel may be dead again before a second window.
SHADOW_VARIANT_KNOBS = {
    "shadow t0": ["auto_tune=0"],
    "shadow t16": ["auto_tune=0", "tex_tile=16"],
    "shadow sp53": ["auto_tune=0", "max_span_y=5", "max_span_x=3"],
    "shadow t16sp53": ["auto_tune=0", "tex_tile=16",
                       "max_span_y=5", "max_span_x=3"],
    "shadow t16sp42": ["auto_tune=0", "tex_tile=16",
                       "max_span_y=4", "max_span_x=2"],
}


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
    import blit_probe
    import knob_sweep
    import tpu_smoke

    rcs = {}
    rc, sweep_ret = _step("knob_sweep", ["knob_sweep.py"], knob_sweep.main)
    medians, bad = sweep_ret if sweep_ret else ({}, set())
    rcs["sweep"] = rc if rc else (1 if bad else 0)
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
    # Flipped-config confirmation: if the sweep measured a parity-clean
    # shadow variant beating the default config by >0.1 ms, bench the
    # headline with exactly those knobs — the number that decides the
    # config.py defaults flip.
    shadow = {k: v for k, v in medians.items()
              if k in SHADOW_VARIANT_KNOBS and k not in bad}
    if shadow.get("shadow t0") is not None:
        best = min(shadow, key=shadow.get)
        gain = shadow["shadow t0"] - shadow[best]
        print(f"[live-window] sweep best: {best} ({shadow[best]:.3f} ms, "
              f"-{gain:.3f} vs t0)", flush=True)
        if best != "shadow t0" and gain > 0.1:
            knobs = SHADOW_VARIANT_KNOBS[best]
            argv = ["bench.py", "--frames", "64"]
            for k in knobs:
                argv += ["--knob", k]
            rcs["bench_flipped"], _ = _step(
                f"bench flipped ({' '.join(knobs)})", argv, bench.main
            )
    # Blit-regime re-probe, last (CLAUDE.md: the device->host transfer
    # regime FLIPS between tunnel states; utils/transfer.fetch's default
    # was set from the round-3 probe — re-measure in this window).
    rcs["blit_probe"], _ = _step("blit_probe", ["blit_probe.py"], blit_probe.main)
    print(f"[live-window] done: {rcs}", flush=True)
    sys.exit(max(rcs.values()))


if __name__ == "__main__":
    main()
