"""Quantify the flat-index locality of the shade's packed-ATTRIBUTE gather
(the one stream scripts/gather_locality.py did not cover).

Every covered fragment gathers ONE (L,) row of the per-frame packed
attribute table (pipelines/frame._gather_fragments), indexed by the
winning triangle id in OBJ order.  After round-4's tex_tile=16 flip the
headline's residual locality gap is ~0.2-0.3 ms (BASELINE.md scaling
refit: diablo effective 8.99 ns/row vs the 7.3 microprobe floor) — this
probe asks how much of that could sit in the attribute stream by
measuring, in strip-shade device order:

  * OBJ order (shipped): rows = winning triangle ids as-is
  * first-coverage rank: ids remapped by order of first appearance in
    the covered stream — the per-pose IDEAL permutation (upper bound)
  * Morton(centroid): ids remapped by Morton code of the triangle's
    object-space centroid — a static, pose-independent permutation a
    loader could apply once

Metric matches gather_locality.py: unique 512 B segments per 8192-row
window + median |delta row|.  Row stride = L*4 B (L = 7 edge/z lanes +
the pipeline's attribute lanes; 19 for shadow — BASELINE.md winner-
record pricing).

If OBJ order is already near the permuted bound, the attribute stream
is compact and the residual gap lives elsewhere (record as a measured
negative-by-prediction in BASELINE.md).  Reference for the stream being
modeled: /root/reference/src/scene.rs:174-197 (per-pixel varying fetch).

Usage: python scripts/attr_locality.py [--size 800] [--pipeline shadow]
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
from tiny_renderer_tpu.pipelines.frame import _GATHER_KEYS, PIPELINES

from gather_locality import seg_stats  # noqa: E402  (same metric)


def covered_ids(cfg, geom, pipeline, light, look_from, look_at, up):
    """Winning triangle ids of covered fragments in strip-shade device
    order (row-major over covered pixels), plus the packed-row lane count
    L and the object-space triangle centroids."""
    spec = PIPELINES[pipeline]
    uniforms = (
        ml.shadow_pass_2_prepare(cfg, light, look_from, look_at, up, np)
        if spec.two_pass
        else ml.default_prepare(cfg, light, look_from, look_at, up, np)
    )
    if spec.two_pass:
        u1 = ml.shadow_pass_1_prepare(cfg, light, look_at, up, np)
        uniforms["shadow_matrix"] = u1["shadow_matrix"]
    setup = triangle_setup(geom, uniforms, cfg, needs=spec.needs, xp=jnp)
    _, idx = rasterize_jnp(setup, cfg.height, cfg.width)
    idx = np.asarray(idx)
    ids = idx[idx >= 0].astype(np.int64)  # row-major covered == device order
    L = 7 + sum(
        int(np.prod(np.asarray(setup[k]).shape[1:])) for k in _GATHER_KEYS[pipeline]
    )
    tri = np.asarray(geom["positions"])[np.asarray(geom["pos_idx"])]  # (T,3,3)
    centroids = tri.mean(axis=1)
    return ids, L, centroids


def morton3(q):
    """30-bit Morton code from (N,3) integer coords in [0, 1024)."""
    code = np.zeros(len(q), np.int64)
    for bit in range(10):
        for axis in range(3):
            code |= ((q[:, axis] >> bit) & 1).astype(np.int64) << (3 * bit + axis)
    return code


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--asset", default="/root/reference/assets/diablo")
    ap.add_argument("--pipeline", default="shadow")
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
    light = np.array([0.35, 0.0, 0.94], np.float32)
    a = np.float32(args.angle)
    look_from = np.array(
        [np.cos(a) * 0.25 + np.sin(a) * 0.97, 0.0,
         -np.sin(a) * 0.25 + np.cos(a) * 0.97], np.float32)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)

    ids, L, centroids = covered_ids(
        cfg, geom, args.pipeline, light, look_from, look_at, up
    )
    bpr = L * 4
    print(
        f"asset={os.path.basename(args.asset)} size={args.size} "
        f"pipeline={args.pipeline} angle={args.angle} "
        f"T={len(centroids)} L={L} ({bpr} B/row) covered={len(ids)}",
        flush=True,
    )
    print(f"attribute rows ({bpr} B/row):", flush=True)
    seg_stats(ids, bpr, "OBJ order")

    # Per-pose ideal: rank by first appearance in the covered stream.
    first = np.full(len(centroids), np.iinfo(np.int64).max, np.int64)
    seen_pos = np.arange(len(ids), dtype=np.int64)
    # reversed so the FIRST occurrence wins the assignment
    first[ids[::-1]] = seen_pos[::-1]
    rank = np.argsort(np.argsort(first, kind="stable"), kind="stable")
    seg_stats(rank[ids], bpr, "first-coverage rank")

    # Static: Morton code of the object-space centroid (load-time reorder).
    lo, hi = centroids.min(axis=0), centroids.max(axis=0)
    q = ((centroids - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.int64)
    morder = np.argsort(morton3(q), kind="stable")
    mrank = np.empty(len(morder), np.int64)
    mrank[morder] = np.arange(len(morder))
    seg_stats(mrank[ids], bpr, "Morton(centroid)")


if __name__ == "__main__":
    main()
