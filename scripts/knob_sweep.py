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
    scripts/live_window.py against the configs here.

    Every variant pins auto_tune=False: the sweep measures RAW knob
    deltas against a raw baseline — with auto-tune on, the shadow "t0"
    baseline would silently resolve to tex_tile=16 (the tuned default
    this very sweep justified) and the deltas would stop meaning
    anything."""
    import functools

    RenderConfig = functools.partial(RenderConfig, auto_tune=False)
    return [
        # Round 4b: COMPOSITION of the round-4a singles (r4a full table in
        # BASELINE.md "Round 4" + docs/live_window_r4.log).  r4a measured
        # tex_tile=16 -0.288 ms and span 5x3/4x2 -0.206/-0.266 ms on the
        # shadow headline as SINGLES; they act on different stages (shade
        # gather locality vs binning sort elements) so the deltas should
        # be additive — predicted t16+sp42 ~ 4.34 ms.  t0/t16/sp53 rerun
        # as in-process anchors (cross-run drift is +-20%).
        ("shadow t0      ", RenderConfig(), "shadow", 0),
        ("shadow t16     ", RenderConfig(tex_tile=16), "shadow", 16),
        ("shadow sp53    ", RenderConfig(max_span_y=5, max_span_x=3),
         "shadow", 0),
        ("shadow t16sp53 ", RenderConfig(tex_tile=16, max_span_y=5,
                                         max_span_x=3), "shadow", 16),
        ("shadow t16sp42 ", RenderConfig(tex_tile=16, max_span_y=4,
                                         max_span_x=2), "shadow", 16),
        # Span shrink acts on the pipeline-independent binning stage; if
        # it replicates on phong the flip generalizes beyond shadow.
        # tex_tile=16 on phong probes whether the texture-locality win
        # extends to the 1-texture-gather pipelines (r4a: -0.29 shadow
        # but +0.09 specular).
        ("phong t0       ", RenderConfig(), "phong", 0),
        ("phong t16      ", RenderConfig(tex_tile=16), "phong", 16),
        ("phong sp53     ", RenderConfig(max_span_y=5, max_span_x=3),
         "phong", 0),
        # Occlusion: anchor at its r4a-flipped tuned default (SL8 b1024,
        # 22.37 ms) and compose with the span shrink; SL4 b2048 (waste
        # 3.3% vs SL8's 7.4% at constant 8192 fragments/step) was never
        # measured on occlusion — its 17-row shade floor amortizes the
        # extra while_loop iterations far better than shadow's 3 rows
        # (where SL4b2k cost +2.7 ms).
        ("occlusion b0   ", RenderConfig(strip_len=8, strip_batch=1024),
         "occlusion", 0),
        ("occlusion bsp53", RenderConfig(strip_len=8, strip_batch=1024,
                                         max_span_y=5, max_span_x=3),
         "occlusion", 0),
        ("occlusion bsp42", RenderConfig(strip_len=8, strip_batch=1024,
                                         max_span_y=4, max_span_x=2),
         "occlusion", 0),
        ("occlusion SL4b2k", RenderConfig(strip_len=4, strip_batch=2048),
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
