"""Round-5c live-window queue: capacity numbers + post-banding re-cert.

Ordered by evidentiary value for a short window:

  1. stress_validate levels=2 (80,352 tris) — the first hardware
     capacity number + the out-of-sample scaling-model check (VERDICT
     r4 #2), now through the auto row-banded raster (2 bands).
  2. stress_validate levels=3 (321,408 tris, 64x reference) — scaling-
     headroom datapoint (25 gathered bands); best effort.
  3. tpu_smoke 256^2 both assets — cheap re-certification that the
     banding change left every reference-class pixel identical on
     hardware (reference scenes run the 1-band path; expected mismatch
     table: worst 0.20% head default, as rounds 2-5).
  4. bench.py --all — fresh drift-aware official line at this state.

Usage: scripts/one_attempt.sh /tmp/live_r5c.log python scripts/live_window_r5c.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax.numpy as jnp
    import numpy as np

    from tiny_renderer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    from _measure import step

    sv = _load("stress_validate.py")
    smoke = _load("tpu_smoke.py")
    import bench

    rc2, _ = step(
        "capacity levels=2 (80k tris) + model check",
        ["stress_validate.py", "--levels", "2", "--frames", "40"],
        sv.main, tag="r5c",
    )
    rc3, _ = step(
        "capacity levels=3 (321k tris) headroom",
        ["stress_validate.py", "--levels", "3", "--frames", "16"],
        sv.main, tag="r5c",
    )
    smoke_rcs = {}
    for asset in ("diablo", "african_head"):
        smoke_rcs[asset], _ = step(
            f"post-banding smoke {asset} 256px",
            ["tpu_smoke.py", "--size", "256", "--budget", "0.005",
             "--asset", f"/root/reference/assets/{asset}"],
            smoke.main, tag="r5c",
        )
    rcb, _ = step("official bench", ["bench.py", "--all", "--frames", "64"],
                  bench.main, tag="r5c")
    print(f"QUEUE-DONE rc2={rc2} rc3={rc3} smoke={smoke_rcs} bench={rcb}",
          flush=True)
    sys.exit(0 if rc2 == 0 else 1)


if __name__ == "__main__":
    main()
