"""Quantify the flat-index locality of the shade's three gather streams,
row-major vs tile-swizzled (config.tex_tile / config.shadow_tile).

The scaling model fitted diablo's effective shade gather at ~9.9 ns/row
vs the microprobe's 7.3 and head's 7.6 (BASELINE.md) — the residual is
access locality.  The swizzles are pure permutations that make 2D-local
sample clusters flat-local; this probe measures, for real frames on CPU,
how much flat locality each tile size actually buys per gather stream:

  * texture rows  (1 word/texel packed plane, uv-driven)
  * shadow-compare rows (shadow pipeline's 1 fetch/fragment)
  * occlusion probe rows (17 fetches/fragment)

in strip-shade device order (covered fragments, ascending strip id).
Metric: unique 512 B segments touched per 8192-row window (one strip
batch) — a proxy for DRAM row-buffer/sector reuse — plus the median
absolute index delta between consecutive rows.

Usage: python scripts/gather_locality.py [--size 800]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tiny_renderer_tpu import RenderConfig, load_model
from tiny_renderer_tpu.ops import mathlib as ml
from tiny_renderer_tpu.ops.raster_jnp import rasterize_jnp
from tiny_renderer_tpu.ops.vertex import triangle_setup
from tiny_renderer_tpu.oracle.reference_cpu import _gather_fragments_np
from tiny_renderer_tpu.pipelines import shaders
from tiny_renderer_tpu.pipelines.frame import _GATHER_KEYS, PIPELINES
from tiny_renderer_tpu.pipelines.shaders import (
    VARYING_SPECS,
    compute_varyings,
    shadow_flat_indices,
)


def strip_order_fragments(cfg, geom, pipeline, light, look_from, look_at, up):
    """Covered-fragment data in strip-shade device order: the strip shade
    batches covered 16-px strips ascending, lanes row-major inside — i.e.
    covered pixels sorted by flat pixel index."""
    spec = PIPELINES[pipeline]
    if spec.two_pass:
        u1 = ml.shadow_pass_1_prepare(cfg, light, look_at, up, np)
        s1 = triangle_setup(
            geom, u1, cfg, matrix_key="shadow_matrix", cull=False, needs=(), xp=jnp
        )
        shadow_z, _ = rasterize_jnp(s1, cfg.height, cfg.width)
        uniforms = ml.shadow_pass_2_prepare(cfg, light, look_from, look_at, up, np)
        uniforms["shadow_matrix"] = u1["shadow_matrix"]
    else:
        uniforms = ml.default_prepare(cfg, light, look_from, look_at, up, np)
        shadow_z = None
    setup = triangle_setup(geom, uniforms, cfg, needs=spec.needs, xp=jnp)
    _, idx = rasterize_jnp(setup, cfg.height, cfg.width)
    idx = np.asarray(idx)
    setup = {k: np.asarray(v) for k, v in setup.items() if hasattr(v, "shape")}
    frag = _gather_fragments_np(setup, idx, _GATHER_KEYS[pipeline])
    varys = compute_varyings(frag, VARYING_SPECS[pipeline], np)
    covered = idx >= 0
    py, px = np.nonzero(covered)  # row-major == strip-shade device order
    out = {"x": px, "y": py}
    if "uv" in varys:
        out["uv"] = varys["uv"][py, px]
    if "zfrag" in varys:
        out["zfrag"] = varys["zfrag"][py, px]
    if shadow_z is not None:
        out["shadow_z"] = np.asarray(shadow_z)
    return out, uniforms


def seg_stats(rows, bytes_per_row, name, seg=512, window=8192):
    """rows: flat row indices in gather order."""
    segs = (rows.astype(np.int64) * bytes_per_row) // seg
    uniq = []
    for i in range(0, len(segs) - window + 1, window):
        uniq.append(len(np.unique(segs[i : i + window])))
    deltas = np.abs(np.diff(rows.astype(np.int64)))
    print(
        f"  {name:26s} rows={len(rows):8d} "
        f"uniq {seg}B-segs/{window}-row window: mean={np.mean(uniq):7.1f} "
        f"p95={np.percentile(uniq, 95):7.1f}  median|drow|={np.median(deltas):8.1f}",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--asset", default="/root/reference/assets/diablo")
    ap.add_argument("--angle", type=float, default=0.0)
    args = ap.parse_args()

    cfg = RenderConfig(width=args.size, height=args.size)
    model = load_model(args.asset, verbose=False)
    geom = {
        "positions": model.mesh.positions,
        "tex_coords": model.mesh.tex_coords,
        "normals": model.mesh.normals,
        "pos_idx": model.mesh.pos_idx,
        "tex_idx": model.mesh.tex_idx,
        "normal_idx": model.mesh.normal_idx,
    }
    th, tw = model.texture.shape[:2]
    light = np.array([0.35, 0.0, 0.94], np.float32)
    a = np.float32(args.angle)
    look_from = np.array(
        [np.cos(a) * 0.25 + np.sin(a) * 0.97, 0.0,
         -np.sin(a) * 0.25 + np.cos(a) * 0.97], np.float32)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)

    print(f"asset={os.path.basename(args.asset)} size={args.size} "
          f"tex={tw}x{th} angle={args.angle}", flush=True)

    # --- texture rows (shadow pipeline's sampler stream) ------------------
    f, uniforms = strip_order_fragments(
        cfg, geom, "shadow", light, look_from, look_at, up
    )
    cx, cy = shaders._tex_coords(f["uv"], tw, th, np)
    print("texture plane (4 B/row):", flush=True)
    seg_stats(cy.astype(np.int64) * tw + cx, 4, "row-major")
    for t in (8, 16, 32):
        seg_stats(shaders._swizzle_index(cx, cy, tw, t, np), 4, f"tex_tile={t}")

    # --- shadow-compare rows ----------------------------------------------
    sm = ml.mat4_mul(uniforms["shadow_matrix"], uniforms["i_vpmv"])
    p = np.stack(
        [f["x"].astype(np.float32), f["y"].astype(np.float32), f["zfrag"]], axis=-1
    )
    sc = ml.mat4_transform_point(sm, p, np)
    H, W = cfg.height, cfg.width
    print("shadow compare (4 B/row):", flush=True)
    seg_stats(shadow_flat_indices(sc[..., 0], sc[..., 1], (H, W), W, np),
              4, "row-major")
    for t in (8, 16, 32):
        seg_stats(
            shadow_flat_indices(sc[..., 0], sc[..., 1], (H, W), W, np, tile=t),
            4, f"shadow_tile={t}")

    # --- occlusion probe rows (17 interleaved fetches/fragment) ------------
    fo, uo = strip_order_fragments(
        cfg, geom, "occlusion", light, look_from, look_at, up
    )
    sxs, sys_ = shaders.occlusion_sample_coords(
        fo["x"].astype(np.float32), fo["y"].astype(np.float32), fo["zfrag"],
        uo, cfg, np,
    )
    # Device order: the (17, N) gather flattens sample-major over each
    # batch; approximate with sample-major over 8192-fragment batches.
    print("occlusion probes (4 B/row):", flush=True)

    def occ_stream(tile):
        flat = shadow_flat_indices(sxs, sys_, (H, W), W, np, tile=tile)  # (17,N)
        B = 8192
        chunks = [flat[:, i : i + B].ravel() for i in range(0, flat.shape[1], B)]
        return np.concatenate(chunks)

    seg_stats(occ_stream(0), 4, "row-major")
    for t in (8, 16, 32):
        seg_stats(occ_stream(t), 4, f"shadow_tile={t}")


if __name__ == "__main__":
    main()
