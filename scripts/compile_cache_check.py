"""Cold/warm persistent-compile-cache check on the real TPU.

Runs the CLI app twice against a shared cache dir and reports wall time
and cache entry counts; the warm run must add no new entries and start
faster (it skips the first-frame XLA compile).

Usage (one invocation per process — the TPU is single-tenant):
    rm -rf /tmp/trt_tpu_cache
    bash scripts/tpu_retry.sh /tmp/cache_cold.log x python scripts/compile_cache_check.py cold
    bash scripts/tpu_retry.sh /tmp/cache_warm.log x python scripts/compile_cache_check.py warm

Measured 2026-08-17 (dev tunnel, default pipeline 128x128, 2 frames):
cold 22.8 s -> warm 15.0 s, 16 cache entries both runs (zero recompiles).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jnp.ones(8))  # first device op
print("TUNNEL-LIVE", flush=True)

from tiny_renderer_tpu.app import main  # noqa: E402

label = sys.argv[1] if len(sys.argv) > 1 else "run"
cache = os.environ.get("TRT_CACHE_DIR", "/tmp/trt_tpu_cache")
t0 = time.time()
rc = main(["-p", "/root/reference/assets/african_head", "-s", "default",
           "--size", "128", "128", "--frames", "2", "--no-fps",
           "--compile-cache", cache,
           "--save", f"/tmp/trt_{label}.png"])
print(f"{label} rc={rc} wall={time.time()-t0:.1f}s "
      f"cache_entries={len(os.listdir(cache))}", flush=True)
