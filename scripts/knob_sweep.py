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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    from _measure import (
        chip_health_line,
        load_scene,
        make_measure,
        run_variants,
        sentinel,
    )
    from tiny_renderer_tpu import RenderConfig

    backend = "pallas_interpret" if args.cpu_smoke else "pallas"

    sentinel()
    # mxu_tflops prints "unreliable" when RTT jitter swamps the marginal —
    # exactly the degraded states this harness must survive.
    chip_health_line()

    plan = build_plan(RenderConfig)
    if args.cpu_smoke:
        # Small frames: the interpret-mode kernel at 800x800 x 8 variants
        # would take tens of minutes; 128x128 exercises the identical
        # plan/pack/golden flow.
        plan = [
            (name, dataclasses.replace(cfg, width=128, height=128), p, t, a)
            for name, cfg, p, t, a in plan
        ]
    # The label's first token is the pipeline name (build_plan contract);
    # load_scene caches per (asset, pipeline, tile) so shared packs upload
    # once.  Parity goldens key on the shared geom object per asset.
    variants = [
        (name, cfg, name.split()[0], *load_scene(a, p, t))
        for name, cfg, p, t, a in plan
    ]
    measure = make_measure(backend=backend,
                           n=16 if args.cpu_smoke else 72,
                           inner=1 if args.cpu_smoke else 5)
    # Returned (not just printed) so a live-window queue can pick the
    # winning knob set for its flipped-config confirmation bench.
    return run_variants(variants, measure,
                        reps=1 if args.cpu_smoke else 4,
                        backend=backend, parity_golden=True)


if __name__ == "__main__":
    _, bad_names = main()
    if bad_names:
        sys.exit(1)
