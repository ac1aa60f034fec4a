"""Round-5b live-window queue: the capacity numbers the first r5 window
could not bank.

The 2026-08-20 23:43 UTC window certified 800^2 parity and the official
bench (docs/live_window_r5.log) but its capacity step failed TPU AOT
compile — the 80k-triangle csr_indirect id list exceeded the 1 MB SMEM
scalar-prefetch budget.  With the gathered-record fallback in place
(binning.SMEM_ID_LIST_BUDGET_BYTES), this queue banks, in ONE process:

  1. stress_validate at levels=2 (80,352 tris, 16x the reference's max)
     — the first hardware capacity number + the out-of-sample scaling-
     model check (VERDICT r4 #2), and
  2. stress_validate at levels=3 (321,408 tris, 64x) — a scaling-
     headroom datapoint far past the reference; best effort (fewer
     frames; a failure here does not void step 1).

Both append JSON lines to docs/scaling_r5_stress.jsonl.

Usage: scripts/one_attempt.sh /tmp/live_r5b.log python scripts/live_window_r5b.py
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
    rc2, _ = step(
        "capacity levels=2 (80k tris) + model check",
        ["stress_validate.py", "--levels", "2", "--frames", "40"],
        sv.main, tag="r5b",
    )
    rc3, _ = step(
        "capacity levels=3 (321k tris) headroom",
        ["stress_validate.py", "--levels", "3", "--frames", "16"],
        sv.main, tag="r5b",
    )
    print(f"QUEUE-DONE rc2={rc2} rc3={rc3}", flush=True)
    sys.exit(0 if rc2 == 0 else 1)


if __name__ == "__main__":
    main()
