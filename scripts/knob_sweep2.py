"""Second round-3 sweep: shade-loop granularity + occlusion dedup.

Hypothesis from sweep 1 (all byte-saving knobs ~invisible at the headline):
the strip shade's while_loop serializes ~17 batch iterations whose
latency, not HBM bytes, dominates — so coarser batches (fewer serialized
iterations, same total gather rows, more quantization waste) should move
the headline if true.  Also A/Bs the exact occlusion dedup gather.
Results: BASELINE.md "Round 3" (sb1024 won for occlusion; dedup 2.3x
slower).  Measurement scaffolding: scripts/_measure.py.

Usage: scripts/tpu_retry.sh /tmp/sweep2.log x python scripts/knob_sweep2.py
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

    shadow = load_scene("diablo", "shadow")
    occ = load_scene("diablo", "occlusion")
    variants = [
        ("sb512         ", RenderConfig(), "shadow", *shadow),
        ("sb1024        ", RenderConfig(strip_batch=1024), "shadow", *shadow),
        ("sb2048        ", RenderConfig(strip_batch=2048), "shadow", *shadow),
        ("sb256         ", RenderConfig(strip_batch=256), "shadow", *shadow),
        ("occ-base      ", RenderConfig(), "occlusion", *occ),
        ("occ-dedup     ", RenderConfig(occlusion_dedup=True), "occlusion", *occ),
    ]
    run_variants(variants, make_measure(backend="pallas"), reps=4)


if __name__ == "__main__":
    main()
