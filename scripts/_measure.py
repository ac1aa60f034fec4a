"""Shared measurement scaffolding for the on-hardware scripts.

One implementation of the protocol pieces every sweep/queue script needs
(VERDICT r4 #6 — previously knob_sweep{,2,3}.py each re-implemented
them, so protocol drift between scripts was possible):

* sentinel()            the TUNNEL-LIVE first device op supervisors watch
* chip_health_line()    bench.chip_health() printed in the standard form
* load_scene()          load + expand_geometry + prepack_textures, cached
* make_measure()        the interleaved long-vs-short burst-marginal
                        measure (median of `inner` reps of n-vs-8 bursts;
                        dispatch latency cancels, inputs jittered against
                        the runtime's bit-identical-input execution dedupe
                        — see CLAUDE.md / BASELINE.md "protocol")
* checksum8()           full-frame SHA-256 golden on a fixed 8-pose burst
* run_variants()        the interleaved rep loop + median table
* step()                run a queue step with argv munging; never let one
                        failing step kill the rest of a live window

A new sweep is now ~30 lines: build a variants list and call
run_variants(variants, make_measure(...)).
"""

from __future__ import annotations

import contextlib
import io
import sys
import time

import numpy as np

_GEOMS = {}
_PACKS = {}


def sentinel():
    """First device op + the liveness line one_attempt.sh/tpu_retry.sh watch."""
    import jax.numpy as jnp

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)


def chip_health_line():
    """Print the standard chip-health line; returns the probe dict."""
    import bench

    h = bench.chip_health()
    mxu = h["mxu_tflops"]
    mxu_s = f"{mxu:.1f} Tflop/s" if mxu is not None else "unreliable"
    print(f"chip health: {mxu_s}, {h['gather_ns_per_row']:.1f} ns/row",
          flush=True)
    return h


def load_scene(asset, pipeline="shadow", tile=0):
    """(expanded geometry, prepacked textures) for an asset dir name.

    Cached per (asset, pipeline, tile): multi-MB texture packs are the
    tunnel's transfer bottleneck, so a plan reusing a pack must upload
    it once.
    """
    import jax.numpy as jnp

    from tiny_renderer_tpu import load_model
    from tiny_renderer_tpu.ops.vertex import expand_geometry
    from tiny_renderer_tpu.pipelines.frame import prepack_textures

    if asset not in _GEOMS:
        model = load_model(f"/root/reference/assets/{asset}", verbose=False)
        geom = expand_geometry({
            "positions": jnp.asarray(model.mesh.positions),
            "tex_coords": jnp.asarray(model.mesh.tex_coords),
            "normals": jnp.asarray(model.mesh.normals),
            "pos_idx": jnp.asarray(model.mesh.pos_idx),
            "tex_idx": jnp.asarray(model.mesh.tex_idx),
            "normal_idx": jnp.asarray(model.mesh.normal_idx),
        })
        raw_tex = {
            "texture": jnp.asarray(model.texture),
            "normal_map": jnp.asarray(model.normal_map),
            "normal_map_tangent": jnp.asarray(model.normal_map_tangent),
            "specular_map": jnp.asarray(model.specular_map),
        }
        # The SAME geom object for every variant of an asset: parity
        # goldens (run_variants) key on (pipeline, id(geom)), and the
        # expanded arrays upload once per asset, not once per pack.
        _GEOMS[asset] = (geom, raw_tex)
    geom, raw_tex = _GEOMS[asset]
    key = (asset, pipeline, tile)
    if key not in _PACKS:
        _PACKS[key] = prepack_textures(raw_tex, pipeline, tile=tile)
    return geom, _PACKS[key]


def make_measure(backend="pallas", n=72, inner=5):
    """The burst-marginal measure: measure(cfg, pipeline, geom, tex) -> ms.

    Median of `inner` long-vs-short burst marginals (n vs 8).  Longer
    bursts + median (not min) suppress both tunnel-RTT jitter and the
    sporadic fast/slow chip excursions that made best-of-3 at n=40 swing
    ±0.5 ms rep to rep (round-4 protocol, BASELINE.md).
    """
    import jax.numpy as jnp

    from tiny_renderer_tpu.pipelines.frame import make_burst_fn

    rng = np.random.default_rng()

    def measure(cfg, pipeline, geom, tex):
        base = float(rng.uniform(0, 1e-2))
        cam = (0.37 + base + 1e-4 * np.arange(n)).astype(np.float32)
        lig = (-0.6 + base + 1e-4 * np.arange(n)).astype(np.float32)
        burst = make_burst_fn(pipeline, cfg, backend=backend)

        def run(c, l):
            out = burst(geom, tex, jnp.asarray(c), jnp.asarray(l))
            np.asarray(out["checksums"])

        run(cam[:8], lig[:8])  # compile short
        run(cam, lig)          # compile long
        vals = []
        for rep in range(inner):
            e = (rep + 1) * 1e-5
            t0 = time.perf_counter(); run(cam[:8] + e, lig[:8]); t8 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(cam + e, lig); tn = time.perf_counter() - t0
            vals.append((tn - t8) * 1e3 / (n - 8))
        return float(np.median(vals))

    return measure


def checksum8(cfg, pipeline, geom, tex, backend="pallas"):
    """SHA-256 of the full frame bytes on a FIXED 8-pose burst.

    Full frames, not the device-side pixel-sum checksums: a sum is
    permutation-invariant, exactly the failure mode a broken swizzle
    would have.  Knob variants of a pipeline must match their baseline
    bit-for-bit or their timing is excluded (the knobs under sweep are
    pure permutations / flagged-clamp grids).
    """
    import hashlib

    import jax.numpy as jnp

    from tiny_renderer_tpu.pipelines.frame import make_burst_fn

    cam = (0.9 + 0.05 * np.arange(8)).astype(np.float32)
    lig = (-1.3 + 0.05 * np.arange(8)).astype(np.float32)
    burst = make_burst_fn(pipeline, cfg, backend=backend, keep_frames=True)
    out = burst(geom, tex, jnp.asarray(cam), jnp.asarray(lig))
    return hashlib.sha256(np.asarray(out["frames"]).tobytes()).hexdigest()


def run_variants(variants, measure, reps=4, backend="pallas",
                 parity_golden=False):
    """Interleaved rep loop over variants; returns (medians, excluded).

    variants: [(name, cfg, pipeline, geom, tex), ...].  A/B experiments
    MUST interleave inside one process (the chip drifts ~±20% across
    runs); this is that loop.  With parity_golden=True, rep 0 checksums
    every variant against the first variant seen for its (pipeline, id
    of geom) and excludes mismatches from timing.
    """
    results = {name: [] for name, *_ in variants}
    golden, bad = {}, set()
    for rep in range(reps):
        for name, cfg, pipe, geom, tex in variants:
            if rep == 0 and parity_golden:
                cs = checksum8(cfg, pipe, geom, tex, backend=backend)
                if golden.setdefault((pipe, id(geom)), cs) != cs:
                    bad.add(name)
                    print(f"parity {name} MISMATCH — EXCLUDED from timing",
                          flush=True)
                else:
                    print(f"parity {name} OK", flush=True)
            if name in bad:
                continue
            ms = measure(cfg, pipe, geom, tex)
            results[name].append(ms)
            print(f"rep{rep} {name} {ms:7.3f} ms/frame", flush=True)
    print("--- medians over reps ---", flush=True)
    medians = {}
    for name, vals in results.items():
        if name in bad:
            print(f"{name} EXCLUDED (parity mismatch)", flush=True)
            continue
        medians[name.strip()] = float(np.median(vals))
        print(f"{name} median {np.median(vals):7.3f}  "
              f"min {min(vals):7.3f}  max {max(vals):7.3f}", flush=True)
    return medians, {n.strip() for n in bad}


def step(name, argv, fn, tag="live-window", capture=False):
    """Run fn with sys.argv=argv; never let one step kill the queue.

    Returns (rc, out) where out is fn's return value, or the captured
    stdout text when capture=True (still echoed to the real stdout).
    """
    print(f"[{tag}] {name} start at {time.strftime('%H:%M:%S')}", flush=True)
    old = sys.argv
    sys.argv = argv
    buf = io.StringIO()
    rc, ret = 0, None

    class _Tee:
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)

        def flush(self):
            sys.__stdout__.flush()

    ctx = contextlib.redirect_stdout(_Tee()) if capture \
        else contextlib.nullcontext()
    try:
        with ctx:
            ret = fn()
    except SystemExit as e:
        # e.code may be None (success), an int, or a message string.
        rc = e.code if isinstance(e.code, int) else (0 if e.code is None else 1)
    except Exception as e:  # noqa: BLE001 — keep draining the queue
        import traceback

        traceback.print_exc()
        print(f"[{tag}] {name} EXCEPTION: {e!r}", flush=True)
        rc = 99
    finally:
        sys.argv = old
    print(f"[{tag}] {name} rc={rc} at {time.strftime('%H:%M:%S')}", flush=True)
    return rc, (buf.getvalue() if capture else ret)
