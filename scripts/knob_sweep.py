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
    """The sweep plan: (label, config, pack pipeline, pack tile).

    Current sweep: tex_tile (tile-swizzled packed texture plane — a pure
    permutation targeting the shade's gather-locality gap: diablo's
    effective cost was fitted at 9.9 ns/row vs the microprobe's 7.3,
    the difference being index scatter), shadow_tile, the span-grid
    shrink, and the strip_len axis with constant-fragments controls.
    Texture-sampling pipelines only for tex_tile (z-plane gathers are
    unaffected).  Packs are built lazily from the (pipeline, tile) pairs
    so only planes a variant uses get packed and uploaded (multi-MB —
    transfer is the tunnel bottleneck).  Occlusion samples no texture
    maps (its "pack" is the raw dict), and shadow_tile — the knob under
    test there — swizzles the in-frame shadow-map copy, not a prepacked
    plane.  Earlier sweeps' variant lists live in git history.
    Module-level so tests can pin the label->knobs mirror in
    scripts/live_window.py against the configs here."""
    return [
        ("shadow t0      ", RenderConfig(), "shadow", 0),
        ("shadow t8      ", RenderConfig(tex_tile=8), "shadow", 8),
        ("shadow t16     ", RenderConfig(tex_tile=16), "shadow", 16),
        ("shadow t32     ", RenderConfig(tex_tile=32), "shadow", 32),
        ("shadow s16     ", RenderConfig(shadow_tile=16), "shadow", 0),
        ("shadow t16+s16 ", RenderConfig(tex_tile=16, shadow_tile=16),
         "shadow", 16),
        # Span-grid shrink (see BASELINE.md round-3 span study): worst real
        # spans at 800x800 over the FULL orbit parameterization are 4x2
        # tiles (exhaustive 720-angle sweep, both passes, both assets), so
        # 5x3 keeps a tile of margin and 4x2 is the measured floor.  The
        # fitted binning law (1.82 ns x sort elements, 32 per triangle at
        # the 8x4 default) predicts -0.31 ms (5x3) / -0.44 ms (4x2).
        ("shadow sp53    ", RenderConfig(max_span_y=5, max_span_x=3),
         "shadow", 0),
        ("shadow sp42    ", RenderConfig(max_span_y=4, max_span_x=2),
         "shadow", 0),
        # SL=8: strip coverage waste 7.4% vs SL=16's 15.1% (5-angle CPU
        # measurement, scripts/strip_waste.py) -> predicted -6.7% shade
        # rows ~ -0.28 ms.
        ("shadow SL8     ", RenderConfig(strip_len=8), "shadow", 0),
        # Constant-fragments-per-batch controls: SL8 halves and SL4
        # quarters the 8192 fragments a strip_batch=512 shade step
        # processes, confounding waste savings with while_loop iteration
        # count.  b1024/b2048 hold fragments/step at 8192 so the SL axis
        # isolates coverage waste (scripts/strip_waste.py, 5 angles:
        # SL16 +15.1% / SL8 +7.4% / SL4 +3.3%).
        ("shadow SL8b1k  ", RenderConfig(strip_len=8, strip_batch=1024),
         "shadow", 0),
        ("shadow SL4b2k  ", RenderConfig(strip_len=4, strip_batch=2048),
         "shadow", 0),
        # Combined candidate: every open knob at its predicted-best value,
        # measured in the same process as the singles.
        ("shadow combo   ", RenderConfig(tex_tile=16, shadow_tile=16,
                                         max_span_y=4, max_span_x=2,
                                         strip_len=8), "shadow", 16),
        ("specular t0    ", RenderConfig(), "specular", 0),
        ("specular t16   ", RenderConfig(tex_tile=16), "specular", 16),
        ("occlusion s0   ", RenderConfig(), "occlusion", 0),
        ("occlusion s8   ", RenderConfig(shadow_tile=8), "occlusion", 0),
        ("occlusion s16  ", RenderConfig(shadow_tile=16), "occlusion", 0),
        ("occlusion s32  ", RenderConfig(shadow_tile=32), "occlusion", 0),
        # Occlusion carries 17 gather rows per fragment, so the SL8 strip-
        # waste cut (15.1% -> 7.4%) is worth ~7.8% of its ~18.8 ms gather
        # floor ~ -1.5 ms — the largest single prediction in this sweep.
        ("occlusion SL8  ", RenderConfig(strip_len=8), "occlusion", 0),
        ("occlusion SL8b1k", RenderConfig(strip_len=8, strip_batch=1024),
         "occlusion", 0),
        ("occlusion combo", RenderConfig(strip_len=8, shadow_tile=16,
                                         max_span_y=4, max_span_x=2),
         "occlusion", 0),
    ]


def main():
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu import RenderConfig, load_model
    from tiny_renderer_tpu.pipelines.frame import make_burst_fn, prepack_textures

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    model = load_model("/root/reference/assets/diablo", verbose=False)
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
    gj = {k: jnp.asarray(v) for k, v in geom.items()}
    tj = {k: jnp.asarray(v) for k, v in tex.items()}
    tj = prepack_textures(tj, "shadow")

    n = 72
    rng = np.random.default_rng()

    def measure(cfg, pipeline="shadow", geom=None, inner=5, tex=None):
        """Median of `inner` long-vs-short burst marginals (n=72 vs 8).
        Longer bursts + median (not min) suppress both the tunnel-RTT
        jitter and the sporadic fast/slow chip excursions that made
        best-of-3 at n=40 swing +-0.5 ms rep to rep."""
        g = gj if geom is None else geom
        tjx = tj if tex is None else tex
        base = float(rng.uniform(0, 1e-2))
        cam = (0.37 + base + 1e-4 * np.arange(n)).astype(np.float32)
        lig = (-0.6 + base + 1e-4 * np.arange(n)).astype(np.float32)
        burst = make_burst_fn(pipeline, cfg, backend="pallas")

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
        burst = make_burst_fn(pipeline, cfg, backend="pallas",
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

    gx = expand_geometry(gj)
    plan = build_plan(RenderConfig)
    packs = {}
    for _, _, p, t in plan:
        if (p, t) not in packs:
            packs[p, t] = prepack_textures(
                {k: jnp.asarray(v) for k, v in tex.items()}, p, tile=t
            )
    variants = [(name, cfg, gx, packs[p, t]) for name, cfg, p, t in plan]
    results = {name: [] for name, _, _, _ in variants}
    golden, bad = {}, set()
    for rep in range(4):
        for name, cfg, g, tx in variants:
            pipe = name.split()[0]
            if rep == 0:
                cs = checksum8(cfg, pipe, g, tx)
                if golden.setdefault(pipe, cs) != cs:
                    bad.add(name)
                    print(f"parity {name} MISMATCH — EXCLUDED from timing",
                          flush=True)
                else:
                    print(f"parity {name} OK", flush=True)
            if name in bad:
                continue
            ms = measure(cfg, pipeline=pipe, geom=g, tex=tx)
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
