"""On-hardware knob-sweep harness (diablo shadow headline by default).

Edit the loop at the bottom to sweep whichever RenderConfig knobs are
under investigation (past sweeps: raster_group, strip_len, idx_int16,
strip_pack_words, tile_h x strip_batch — results recorded in config.py
comments and BASELINE.md).  Burst-marginal protocol identical to bench.py
(dispatch latency cancels, inputs jittered against the runtime's
execution dedupe); prints the chip-health probe first so runs are only
compared same-state.

Usage: scripts/tpu_retry.sh /tmp/sweep.log x python scripts/knob_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_plan(RenderConfig):
    """The sweep plan: (label, config, pipeline, pack tile, asset).

    The label's first token must be the pipeline name (the harness keys
    parity goldens on (pipeline, asset)).  Packs are built lazily from
    the (pipeline, tile, asset) triples so only planes a variant uses get
    packed and uploaded (multi-MB — transfer is the tunnel bottleneck).
    Earlier sweeps' variant lists live in git history; results in
    BASELINE.md "Round 4"/"Round 4b"/"Round 4c" and config.py comments.

    Every variant pins auto_tune=False: the sweep measures RAW knob
    deltas against a raw baseline — with auto-tune on, baselines would
    silently resolve to the tuned defaults earlier sweeps justified and
    the deltas would stop meaning anything.

    VARIANT_KNOBS below must mirror this plan (tests pin it): the
    flipped-config confirmation benches run with --knob overrides, not
    the sweep's RenderConfig objects, so a drift between the two would
    bench a config the sweep never measured."""
    import functools

    RenderConfig = functools.partial(RenderConfig, auto_tune=False)
    return [
        # Round 4d: the tile_h axis's unmeasured end.  The round-3 sweep
        # measured 8 -> 16 -> 32 at 5.448 -> 5.066 -> 4.899 (the ~1 us/
        # grid-step output-DMA cost dominates, so fewer/taller tiles win)
        # and stopped at 32; the diminishing trend (-0.38, -0.17) leaves
        # 48/64 plausibly worth another ~0.05-0.1 ms before per-candidate
        # VPU waste (each CSR candidate rasterizes the whole tile) turns
        # it around, as it did widthwise at (32, 256).  Composed with
        # tex_tile=16 because that is the shipped shadow config — a
        # raw-only win that vanishes under the tuned default must not
        # flip (different bottleneck mix).
        ("shadow s32    ", RenderConfig(), "shadow", 0, "diablo"),
        ("shadow s48    ", RenderConfig(tile_h=48), "shadow", 0, "diablo"),
        ("shadow s64    ", RenderConfig(tile_h=64), "shadow", 0, "diablo"),
        ("shadow s32+t16", RenderConfig(tex_tile=16), "shadow", 16,
         "diablo"),
        ("shadow s64+t16", RenderConfig(tile_h=64, tex_tile=16), "shadow",
         16, "diablo"),
    ]


# Variant label -> the --knob overrides that reproduce its config (the
# flipped-config confirmation benches run with knobs; tests pin this
# mirror against build_plan).
VARIANT_KNOBS = {
    "shadow s32": ["auto_tune=0"],
    "shadow s48": ["auto_tune=0", "tile_h=48"],
    "shadow s64": ["auto_tune=0", "tile_h=64"],
    "shadow s32+t16": ["auto_tune=0", "tex_tile=16"],
    "shadow s64+t16": ["auto_tune=0", "tile_h=64", "tex_tile=16"],
}


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cpu-smoke", action="store_true",
        help="validate the whole plan/pack/parity flow on the CPU backend "
             "(interpret kernel, small frames, 1 rep) — run this BEFORE "
             "spending a live tunnel window on a new plan",
    )
    args, _ = ap.parse_known_args()

    import jax

    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tiny_renderer_tpu import RenderConfig, load_model
    from tiny_renderer_tpu.pipelines.frame import make_burst_fn, prepack_textures

    backend = "pallas_interpret" if args.cpu_smoke else "pallas"

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    def load_raw(asset):
        model = load_model(f"/root/reference/assets/{asset}", verbose=False)
        geom = {
            "positions": model.mesh.positions,
            "tex_coords": model.mesh.tex_coords,
            "normals": model.mesh.normals,
            "pos_idx": model.mesh.pos_idx,
            "tex_idx": model.mesh.tex_idx,
            "normal_idx": model.mesh.normal_idx,
        }
        tex = {
            "texture": model.texture,
            "normal_map": model.normal_map,
            "normal_map_tangent": model.normal_map_tangent,
            "specular_map": model.specular_map,
        }
        return {k: jnp.asarray(v) for k, v in geom.items()}, tex

    n = 16 if args.cpu_smoke else 72
    rng = np.random.default_rng()

    def measure(cfg, pipeline, geom, tex, inner=1 if args.cpu_smoke else 5):
        """Median of `inner` long-vs-short burst marginals (n=72 vs 8).
        Longer bursts + median (not min) suppress both the tunnel-RTT
        jitter and the sporadic fast/slow chip excursions that made
        best-of-3 at n=40 swing +-0.5 ms rep to rep."""
        g, tjx = geom, tex
        base = float(rng.uniform(0, 1e-2))
        cam = (0.37 + base + 1e-4 * np.arange(n)).astype(np.float32)
        lig = (-0.6 + base + 1e-4 * np.arange(n)).astype(np.float32)
        burst = make_burst_fn(pipeline, cfg, backend=backend)

        def run(c, l):
            out = burst(g, tjx, jnp.asarray(c), jnp.asarray(l))
            np.asarray(out["checksums"])

        run(cam[:8], lig[:8])
        run(cam, lig)
        vals = []
        for rep in range(inner):
            e = (rep + 1) * 1e-5
            t0 = time.perf_counter(); run(cam[:8] + e, lig[:8]); t8 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(cam + e, lig); tn = time.perf_counter() - t0
            vals.append((tn - t8) * 1e3 / (n - 8))
        return float(np.median(vals))

    def checksum8(cfg, pipeline, geom, tex):
        """SHA-256 of the full frame bytes on a FIXED 8-pose burst: every
        variant of a pipeline must match its baseline variant bit-for-bit
        (the knobs under sweep are all pure permutations / flagged-clamp
        grids) — a divergence means the 'speedup' is rendering wrong.
        Full frames, not the device-side pixel-sum checksums: a sum is
        permutation-invariant, exactly the failure mode a broken swizzle
        would have."""
        import hashlib

        cam = (0.9 + 0.05 * np.arange(8)).astype(np.float32)
        lig = (-1.3 + 0.05 * np.arange(8)).astype(np.float32)
        burst = make_burst_fn(pipeline, cfg, backend=backend,
                              keep_frames=True)
        out = burst(geom, tex, jnp.asarray(cam), jnp.asarray(lig))
        return hashlib.sha256(np.asarray(out["frames"]).tobytes()).hexdigest()

    import bench
    h = bench.chip_health()
    # mxu_tflops is None when RTT jitter swamps the marginal (bench.py) —
    # exactly the degraded states this harness must survive.
    mxu = h["mxu_tflops"]
    mxu_s = f"{mxu:.1f} Tflop/s" if mxu is not None else "unreliable"
    print(
        f"chip health: {mxu_s}, {h['gather_ns_per_row']:.1f} ns/row",
        flush=True,
    )
    from tiny_renderer_tpu.ops.vertex import expand_geometry

    plan = build_plan(RenderConfig)
    if args.cpu_smoke:
        # Small frames: the interpret-mode kernel at 800x800 x 8 variants
        # would take tens of minutes; 128x128 exercises the identical
        # plan/pack/golden flow.
        plan = [
            (name, dataclasses.replace(cfg, width=128, height=128), p, t, a)
            for name, cfg, p, t, a in plan
        ]
    geoms, raw_tex, packs = {}, {}, {}
    for _, _, p, t, asset in plan:
        if asset not in geoms:
            gj, raw = load_raw(asset)
            geoms[asset] = expand_geometry(gj)
            raw_tex[asset] = raw
        if (p, t, asset) not in packs:
            packs[p, t, asset] = prepack_textures(
                {k: jnp.asarray(v) for k, v in raw_tex[asset].items()},
                p, tile=t,
            )
    variants = [
        (name, cfg, geoms[asset], packs[p, t, asset], asset)
        for name, cfg, p, t, asset in plan
    ]
    results = {name: [] for name, _, _, _, _ in variants}
    golden, bad = {}, set()
    for rep in range(1 if args.cpu_smoke else 4):
        for name, cfg, g, tx, asset in variants:
            pipe = name.split()[0]
            if rep == 0:
                cs = checksum8(cfg, pipe, g, tx)
                if golden.setdefault((pipe, asset), cs) != cs:
                    bad.add(name)
                    print(f"parity {name} MISMATCH — EXCLUDED from timing",
                          flush=True)
                else:
                    print(f"parity {name} OK", flush=True)
            if name in bad:
                continue
            ms = measure(cfg, pipe, g, tx)
            results[name].append(ms)
            print(f"rep{rep} {name} {ms:7.3f} ms/frame", flush=True)
    print("--- medians over reps ---", flush=True)
    medians = {}
    for name, vals in results.items():
        if name in bad:
            print(f"{name} EXCLUDED (parity mismatch)", flush=True)
            continue
        medians[name.strip()] = float(np.median(vals))
        print(
            f"{name} median {np.median(vals):7.3f}  "
            f"min {min(vals):7.3f}  max {max(vals):7.3f}",
            flush=True,
        )
    # Returned (not just printed) so live_window.py can pick the winning
    # knob set for its flipped-config confirmation bench in-process.
    return medians, {n.strip() for n in bad}


if __name__ == "__main__":
    _, bad_names = main()
    if bad_names:
        sys.exit(1)
