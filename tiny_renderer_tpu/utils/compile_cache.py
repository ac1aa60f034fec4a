"""Persistent XLA compilation cache for warm CLI starts.

The reference app is ready the instant assets load (src/main.rs:36 —
a CPU renderer has nothing to compile).  Our frame functions JIT-compile
per (pipeline, size, backend), which costs seconds on CPU and minutes on
the TPU tunnel for the slowest pipelines.  JAX's persistent compilation
cache removes that cost from every run after the first: compiled
executables are keyed by HLO + compile options + platform and reloaded
from disk, so a repeat `python -m tiny_renderer_tpu.app` invocation
skips straight to rendering.

Enabled by default by the CLI (app.py) at `~/.cache/tiny_renderer_tpu/xla`
(override with --compile-cache DIR or $TINY_RENDERER_TPU_CACHE; disable
with --no-compile-cache).  Library users call `enable_compile_cache()`
themselves if they want it — importing the package does not mutate
global JAX config.
"""

from __future__ import annotations

import os
import sys

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tiny_renderer_tpu", "xla"
)
_ENV_VAR = "TINY_RENDERER_TPU_CACHE"


def default_cache_dir() -> str:
    """$TINY_RENDERER_TPU_CACHE if set, else ~/.cache/tiny_renderer_tpu/xla."""
    return os.environ.get(_ENV_VAR) or DEFAULT_CACHE_DIR


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (created if needed).

    Caches every compile regardless of duration/size — the renderer's
    frame functions are exactly the executables worth keeping, and on the
    TPU tunnel even "fast" compiles cost whole seconds.  Returns the
    directory in use, or None if the cache could not be enabled (unwritable
    path, exotic backend) — rendering proceeds uncached in that case.
    """
    import jax

    path = path or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        # Thresholds first, cache dir LAST: the dir setting is what turns
        # the cache on, so a partial failure leaves it fully disabled
        # (matching the message below) rather than half-configured.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception as e:  # pragma: no cover - depends on host FS/backend
        # stderr: bench.py's stdout is a one-JSON-line contract.
        print(f"compilation cache disabled ({e})", file=sys.stderr)
        return None
    return path
