"""Third round-3 sweep: raster tile geometry (grid-step overhead).

If the raster stage's ~1.1 ms is dominated by per-grid-step fixed cost
(~350 steps/pass at (16,128) tiles) rather than HBM target writes (sweep 1
showed byte knobs don't move the headline), then fewer/larger tiles should
cut it roughly with the step count: (32,128) or (16,256) halve the steps,
(32,256) quarters them.  Total candidate-evaluation work is roughly
tile-size-independent (bbox coverage), and the tie rule is exact at any
tile size.  Results: BASELINE.md "Round 3" (tile_h won up to 32; width
256 lost to per-candidate VPU waste).  Scaffolding: scripts/_measure.py.

Usage: scripts/tpu_retry.sh /tmp/sweep3.log x python scripts/knob_sweep3.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from _measure import chip_health_line, load_scene, make_measure, run_variants, sentinel
    from tiny_renderer_tpu import RenderConfig

    sentinel()
    chip_health_line()

    scene = load_scene("diablo", "shadow")
    variants = [
        ("t16x128 (base)", RenderConfig(), "shadow", *scene),
        ("t32x128       ", RenderConfig(tile_h=32), "shadow", *scene),
        ("t16x256       ", RenderConfig(tile_w=256), "shadow", *scene),
        ("t32x256       ", RenderConfig(tile_h=32, tile_w=256), "shadow", *scene),
        ("t8x128        ", RenderConfig(tile_h=8), "shadow", *scene),
        ("t16x128 g32   ", RenderConfig(raster_group=32), "shadow", *scene),
    ]
    run_variants(variants, make_measure(backend="pallas"), reps=4)


if __name__ == "__main__":
    main()
