"""Second round-3 sweep: shade-loop granularity + occlusion dedup.

Hypothesis from sweep 1 (all byte-saving knobs ~invisible at the headline):
the strip shade's while_loop serializes ~17 batch iterations whose
latency, not HBM bytes, dominates — so coarser batches (fewer serialized
iterations, same total gather rows, more quantization waste) should move
the headline if true.  Also A/Bs the exact occlusion dedup gather.

Usage: scripts/tpu_retry.sh /tmp/sweep2.log x python scripts/knob_sweep2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from tiny_renderer_tpu import RenderConfig, load_model
    from tiny_renderer_tpu.ops.vertex import expand_geometry
    from tiny_renderer_tpu.pipelines.frame import make_burst_fn, prepack_textures

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    model = load_model("/root/reference/assets/diablo", verbose=False)
    gj = expand_geometry(
        {
            "positions": jnp.asarray(model.mesh.positions),
            "tex_coords": jnp.asarray(model.mesh.tex_coords),
            "normals": jnp.asarray(model.mesh.normals),
            "pos_idx": jnp.asarray(model.mesh.pos_idx),
            "tex_idx": jnp.asarray(model.mesh.tex_idx),
            "normal_idx": jnp.asarray(model.mesh.normal_idx),
        }
    )
    tj = prepack_textures(
        {
            "texture": jnp.asarray(model.texture),
            "normal_map": jnp.asarray(model.normal_map),
            "normal_map_tangent": jnp.asarray(model.normal_map_tangent),
            "specular_map": jnp.asarray(model.specular_map),
        },
        "shadow",
    )
    tj_occ = tj  # occlusion samples no textures

    n = 72
    rng = np.random.default_rng()

    def measure(cfg, pipeline="shadow", inner=5):
        base = float(rng.uniform(0, 1e-2))
        cam = (0.37 + base + 1e-4 * np.arange(n)).astype(np.float32)
        lig = (-0.6 + base + 1e-4 * np.arange(n)).astype(np.float32)
        burst = make_burst_fn(pipeline, cfg, backend="pallas")
        tex = tj_occ if pipeline == "occlusion" else tj

        def run(c, l):
            out = burst(gj, tex, jnp.asarray(c), jnp.asarray(l))
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

    import bench

    h = bench.chip_health()
    mxu = h["mxu_tflops"]
    mxu_s = f"{mxu:.1f} Tflop/s" if mxu is not None else "unreliable"
    print(f"chip health: {mxu_s}, {h['gather_ns_per_row']:.1f} ns/row", flush=True)

    variants = [
        ("sb512         ", RenderConfig(), "shadow"),
        ("sb1024        ", RenderConfig(strip_batch=1024), "shadow"),
        ("sb2048        ", RenderConfig(strip_batch=2048), "shadow"),
        ("sb256         ", RenderConfig(strip_batch=256), "shadow"),
        ("occ-base      ", RenderConfig(), "occlusion"),
        ("occ-dedup     ", RenderConfig(occlusion_dedup=True), "occlusion"),
    ]
    results = {name: [] for name, _, _ in variants}
    for rep in range(4):
        for name, cfg, pipe in variants:
            ms = measure(cfg, pipeline=pipe)
            results[name].append(ms)
            print(f"rep{rep} {name} {ms:7.3f} ms/frame", flush=True)
    print("--- medians over reps ---", flush=True)
    for name, vals in results.items():
        print(
            f"{name} median {np.median(vals):7.3f}  "
            f"min {min(vals):7.3f}  max {max(vals):7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
