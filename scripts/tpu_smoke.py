"""TPU smoke test: renders every pipeline on hardware and cross-checks the
oracle at reduced size.  Run manually on a TPU host:

    python scripts/tpu_smoke.py [--size 256] [--full]

Exits non-zero on any parity failure.  (The pytest suite runs on CPU; this
is the on-hardware counterpart.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--asset", default="/root/reference/assets/african_head")
    ap.add_argument("--budget", type=float, default=0.01,
                    help="allowed pixel mismatch fraction vs oracle")
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="skip the persistent XLA compile cache (repeat "
                         "certifications re-pay the multi-minute compiles)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if not args.no_compile_cache:
        from tiny_renderer_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

    from tiny_renderer_tpu import RenderConfig, load_model
    from tiny_renderer_tpu.oracle import render_oracle
    from tiny_renderer_tpu.pipelines.frame import PIPELINES, make_frame_fn

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    model = load_model(args.asset, verbose=False)
    cfg = RenderConfig(width=args.size, height=args.size)
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
    light = np.array([0.35, 0.0, 0.94], np.float32)
    look_from = np.array([0.25, 0.0, 0.97], np.float32)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)

    gj = {k: jnp.asarray(v) for k, v in geom.items()}
    tj = {k: jnp.asarray(v) for k, v in tex.items()}
    cam = (jnp.asarray(light), jnp.asarray(look_from), jnp.asarray(look_at), jnp.asarray(up))

    # Every pipeline at the default config, plus the pure-permutation
    # layout knobs (tex_tile / shadow_tile) on the pipelines they touch —
    # certifying the swizzled gather paths on REAL hardware, not just
    # interpret mode.
    runs = [(p, cfg, "") for p in sorted(PIPELINES)]
    if args.size % 16 == 0:
        import dataclasses

        swz = dataclasses.replace(cfg, tex_tile=16, shadow_tile=16)
        runs += [(p, swz, "+swz16") for p in ("shadow", "occlusion", "specular")]

    failures = 0
    for pipeline, rcfg, tag in runs:
        fn = make_frame_fn(pipeline, rcfg)
        t0 = time.time()
        out = jax.block_until_ready(fn(gj, tj, *cam))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            out = fn(gj, tj, *cam)
        jax.block_until_ready(out)
        ms = (time.time() - t0) * 1e3 / 10

        oracle = render_oracle(geom, tex, light, look_from, look_at, up,
                               pipeline=pipeline, config=rcfg)
        frame = np.asarray(out["frame"])
        mismatch = (frame != oracle["frame"]).any(axis=-1).mean()
        ok = mismatch <= args.budget
        failures += 0 if ok else 1
        print(
            f"{pipeline + tag:17s} {'OK ' if ok else 'FAIL'} "
            f"mismatch={mismatch:.4%} "
            f"{ms:7.3f} ms/frame (compile {compile_s:.1f}s)"
        )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
