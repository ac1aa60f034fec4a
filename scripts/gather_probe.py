"""Micro-probe of gather/scatter/compaction costs on the dev TPU.

Measures the marginal device cost of the memory ops that dominate frame
time (per-pixel texture/shadow gathers, compaction scatter, nonzero), to
size the coverage-compaction design.  Protocol per CLAUDE.md: TUNNEL-LIVE
sentinel, input jitter against the runtime's execution dedupe, tiny host
fetches as completion barriers, marginal cost between two scan lengths so
dispatch latency cancels.

Usage: scripts/tpu_retry.sh /tmp/probe.log x python scripts/gather_probe.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)) * 2)
print("TUNNEL-LIVE", flush=True)


def marginal_ms(fn, args, k_small=4, k_big=16):
    """Marginal ms per scan iteration between two scan lengths."""
    f_small = jax.jit(functools.partial(fn, k=k_small), static_argnames=())
    f_big = jax.jit(functools.partial(fn, k=k_big), static_argnames=())

    def run(f, eps):
        out = f(*args, eps=eps)
        np.asarray(out)  # fetch barrier

    run(f_small, 0.0)  # compile
    run(f_big, 1.0)
    t0 = time.perf_counter()
    run(f_small, 2.0)
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(f_big, 3.0)
    t_b = time.perf_counter() - t0
    return (t_b - t_s) * 1e3 / (k_big - k_small)


def gather_fn(table, idx, *, k, eps):
    """k gathers of idx rows (idx jittered per iteration vs dedupe)."""
    def body(acc, i):
        j = (idx + i) % table.shape[0]
        g = table[j]
        return acc + jnp.sum(g, dtype=jnp.float32), 0

    acc, _ = jax.lax.scan(body, jnp.float32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


def scatter_fn(zeros, idx, vals, *, k, eps):
    size = zeros.shape[0]

    def body(acc, i):
        j = (idx + i) % size
        out = zeros.at[j].set(vals + acc)
        return acc + out[0] + jnp.float32(1.0), 0

    acc, _ = jax.lax.scan(body, jnp.float32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


def nonzero_fn(mask, *, k, eps):
    n = mask.shape[0]

    def body(acc, i):
        m = mask != (i % 2 == 2)  # jitter-free but i-dependent no-op tweak
        (cidx,) = jnp.nonzero(m, size=n, fill_value=n)
        return acc + cidx[0] + i, 0

    acc, _ = jax.lax.scan(body, jnp.int32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


def slice_gather_fn(img, ys, xs, *, width, k, eps):
    """Per-row slice gather: fetch a (1, width) window per index pair."""
    H, W = img.shape

    def body(acc, i):
        y = (ys + i) % (H - 1)
        x = jnp.minimum(xs, W - width)
        start = jnp.stack([y, x], axis=-1)
        g = jax.lax.gather(
            img,
            start,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            ),
            slice_sizes=(1, width),
        )
        return acc + jnp.sum(g, dtype=jnp.float32), 0

    acc, _ = jax.lax.scan(body, jnp.float32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gather", action="store_true")
    ap.add_argument("--compaction", action="store_true")
    opts = ap.parse_args()
    if getattr(opts, "compaction", False):
        rng = np.random.default_rng(1)
        mask = jnp.asarray(rng.random(640_000) < 0.2)
        vals = jnp.asarray(rng.integers(0, 2, size=640_000).astype(np.int32))
        print(f"cumsum 640k           {marginal_ms(cumsum_fn, (vals,)):7.3f} ms", flush=True)
        print(f"nonzero 640k          {marginal_ms(nonzero_fn, (mask,)):7.3f} ms", flush=True)
        print(f"handrolled nz 640k    {marginal_ms(handrolled_nonzero_fn, (mask,)):7.3f} ms", flush=True)
        print(f"twolevel nz 640k      {marginal_ms(twolevel_nonzero_fn, (mask,)):7.3f} ms", flush=True)
        print("PROBE-DONE", flush=True)
        return

    rng = np.random.default_rng(0)
    results = []

    # --- gather: rows x table size x row width
    gather_rows = () if opts.skip_gather else (160_000, 320_000, 640_000)
    for n_rows in gather_rows:
        for t_rows, width in [
            (1 << 20, 1), (1 << 20, 4),      # texture-sized table
            (640_000, 1), (640_000, 4),      # shadow-map-sized
            (16_384, 4),                     # small table
            (640_000, 17),                   # wide rows (stencil window)
        ]:
            table = jnp.asarray(
                rng.standard_normal((t_rows, width), dtype=np.float32)
            )
            idx = jnp.asarray(
                rng.integers(0, t_rows, size=n_rows).astype(np.int32)
            )
            ms = marginal_ms(gather_fn, (table, idx))
            results.append(
                ("gather", n_rows, t_rows, width, ms)
            )
            print(
                f"gather rows={n_rows:7d} table={t_rows:8d}x{width:2d} "
                f"{ms:7.3f} ms  ({ms * 1e6 / n_rows:6.1f} ns/row)",
                flush=True,
            )

    # --- scatter
    zeros = jnp.zeros((640_000,), jnp.float32)
    for n_rows in (160_000, 320_000, 640_000):
        idx = jnp.asarray(rng.integers(0, 640_000, size=n_rows).astype(np.int32))
        vals = jnp.asarray(rng.standard_normal(n_rows, dtype=np.float32))
        ms = marginal_ms(scatter_fn, (zeros, idx, vals))
        print(
            f"scatter rows={n_rows:7d} -> 640k   {ms:7.3f} ms "
            f"({ms * 1e6 / n_rows:6.1f} ns/row)",
            flush=True,
        )

    # --- nonzero (compaction index build)
    mask = jnp.asarray(rng.random(640_000) < 0.3)
    ms = marginal_ms(nonzero_fn, (mask,))
    print(f"nonzero 640k                    {ms:7.3f} ms", flush=True)

    # --- slice gather: (1, 17) windows from an 800x800 image
    img = jnp.asarray(rng.standard_normal((800, 800), dtype=np.float32))
    for n_rows in (160_000, 640_000):
        ys = jnp.asarray(rng.integers(0, 799, size=n_rows).astype(np.int32))
        xs = jnp.asarray(rng.integers(0, 780, size=n_rows).astype(np.int32))
        # width must stay a Python int under jit (it shapes the slice).
        fn17 = functools.partial(slice_gather_fn, width=17)
        ms = marginal_ms(fn17, (img, ys, xs))
        print(
            f"slice-gather rows={n_rows:7d} (1,17) {ms:7.3f} ms "
            f"({ms * 1e6 / n_rows:6.1f} ns/row)",
            flush=True,
        )

    print("PROBE-DONE", flush=True)




# Appendix probes (run with --compaction): candidate replacements for the
# 5.8 ms jnp.nonzero in the occlusion pixel compaction.


def handrolled_nonzero_fn(mask, *, k, eps):
    """cumsum + one scatter, vs jnp.nonzero's fused machinery."""
    n = mask.shape[0]

    def body(acc, i):
        cov = mask != (i < -1)  # i-dependent no-op to defeat CSE
        pos = jnp.cumsum(cov.astype(jnp.int32)) - 1
        tgt = jnp.where(cov, pos, n)
        cidx = (
            jnp.full((n,), n, jnp.int32)
            .at[tgt]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        return acc + cidx[0] + i, 0

    acc, _ = jax.lax.scan(body, jnp.int32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


def twolevel_nonzero_fn(mask, *, k, eps):
    """strip-sum + tiny cumsum + minor-axis cumsum + one scatter."""
    n = mask.shape[0]
    SL = 128
    ns = n // SL

    def body(acc, i):
        cov = (mask != (i < -1)).reshape(ns, SL)
        covi = cov.astype(jnp.int32)
        per_strip = jnp.sum(covi, axis=1)
        offs = jnp.cumsum(per_strip) - per_strip  # (ns,)
        within = jnp.cumsum(covi, axis=1) - covi  # minor-axis cumsum
        pos = offs[:, None] + within
        tgt = jnp.where(cov, pos, n).reshape(-1)
        cidx = (
            jnp.full((n,), n, jnp.int32)
            .at[tgt]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        return acc + cidx[0] + i, 0

    acc, _ = jax.lax.scan(body, jnp.int32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


def cumsum_fn(vals, *, k, eps):
    def body(acc, i):
        return acc + jnp.cumsum(vals + i)[-1], 0

    acc, _ = jax.lax.scan(body, jnp.int32(eps), jnp.arange(k, dtype=jnp.int32))
    return acc


if __name__ == "__main__":
    main()
