"""Texture-plane LAYOUT study: can anything beat the flat 16x16 tile?

Round 4 flipped tex_tile=16 (the one measured locality win, -0.26..-0.46 ms
across six pipelines) and the round-4 scaling refit attributes the residual
~0.2-0.3 ms locality gap to the texture stream's remaining scatter
(257 uniq 512B segs/window at tile16 vs the ~67 of the at-floor attribute
stream).  The {8,16,32} sweep optimized over FLAT tile sizes only; this
probe prices the remaining layout family on the same CPU metric the
tex_tile/shadow_tile decisions used (unique 512 B segments touched per
8192-row strip-batch window, strip-shade device order), BEFORE any
hardware window:

  * tile16            — shipped tuned default (baseline)
  * tile8 / tile32    — resweep for context (hardware-measured already)
  * tile16>4          — two-level: 4x4 sub-tiles inside 16x16 tiles
  * tile32>8 / >4     — two-level variants
  * morton            — full bit-interleave (the locality limit of this
                        family; index arithmetic is ~10 shift/or pairs,
                        vs 4 div/mod for flat tiles)
  * tile16 morton-out — 16x16 tiles, tile GRID in Morton order

All are pure permutations of [0, h*w) (bit-identical output by the same
argument as tex_tile).  Decision rule from the round-4 hardware record:
locality only pays when a stream is ABOVE the ~7.3 ns/row per-row floor;
tex at 542 segs won (-0.29), shadow-compare at 138 lost (+0.06).  A
candidate needs a LARGE margin over tile16's 257 to justify its extra
index arithmetic (specular's +0.09 loss shows index math is not free).

Usage: python scripts/tex_layout_probe.py [--size 800] [--asset DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from tiny_renderer_tpu import RenderConfig, load_model
from tiny_renderer_tpu.pipelines import shaders

from gather_locality import seg_stats, strip_order_fragments


def _interleave(v, bits, xp):
    """Spread the low `bits` bits of v so bit i lands at position 2i."""
    out = xp.zeros_like(v)
    for i in range(bits):
        out = out | (((v >> i) & 1) << (2 * i))
    return out


def morton_index(cx, cy, w, h, xp=np):
    """Full Morton (Z-order) flat index; requires pow2 dims.  For
    non-square pow2 dims, interleaves min(bits) and prepends the rest."""
    bx, by = int(w).bit_length() - 1, int(h).bit_length() - 1
    b = min(bx, by)
    lo = _interleave(cx & ((1 << b) - 1), b, xp) | (
        _interleave(cy & ((1 << b) - 1), b, xp) << 1
    )
    # Non-square: Morton blocks of 2^b x 2^b, block grid row-major.
    hi = (cy >> b) * (w >> b) + (cx >> b)
    return hi * (1 << (2 * b)) + lo


def two_level_index(cx, cy, w, inner, outer, xp=np):
    """outer x outer tiles whose texels are stored as inner x inner
    sub-tiles (row-major sub-tile grid, row-major inside)."""
    tx, ix = cx // outer, cx % outer
    ty, iy = cy // outer, cy % outer
    sx, jx = ix // inner, ix % inner
    sy, jy = iy // inner, iy % inner
    within = ((sy * (outer // inner) + sx) * inner + jy) * inner + jx
    return (ty * (w // outer) + tx) * (outer * outer) + within


def morton_outer_index(cx, cy, w, h, tile, xp=np):
    """tile x tile row-major tiles, tile GRID in Morton order."""
    tx, ix = cx // tile, cx % tile
    ty, iy = cy // tile, cy % tile
    grid = morton_index(tx, ty, w // tile, h // tile, xp)
    return grid * (tile * tile) + iy * tile + ix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--asset", default="/root/reference/assets/diablo")
    ap.add_argument("--angle", type=float, default=0.0)
    ap.add_argument("--pipeline", default="shadow")
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
          f"tex={tw}x{th} angle={args.angle} pipeline={args.pipeline}",
          flush=True)

    f, _ = strip_order_fragments(
        cfg, geom, args.pipeline, light, look_from, look_at, up
    )
    cx, cy = shaders._tex_coords(f["uv"], tw, th, np)
    cx, cy = cx.astype(np.int64), cy.astype(np.int64)

    print("texture plane (4 B/row), layout family:", flush=True)
    seg_stats(cy * tw + cx, 4, "row-major")
    for t in (8, 16, 32):
        seg_stats(shaders._swizzle_index(cx, cy, tw, t, np), 4, f"tile{t} (flat)")
    for outer, inner in ((16, 4), (32, 8), (32, 4), (64, 8)):
        seg_stats(two_level_index(cx, cy, tw, inner, outer), 4,
                  f"tile{outer}>{inner} (2-level)")
    seg_stats(morton_index(cx, cy, tw, th), 4, "morton (full)")
    for t in (16, 32):
        seg_stats(morton_outer_index(cx, cy, tw, th, t), 4,
                  f"tile{t} morton-outer")

    # Sanity: each candidate is a permutation of [0, h*w) on a dense probe.
    gx, gy = np.meshgrid(np.arange(tw, dtype=np.int64),
                         np.arange(th, dtype=np.int64))
    gx, gy = gx.ravel(), gy.ravel()
    for name, idx in (
        ("morton", morton_index(gx, gy, tw, th)),
        ("tile16>4", two_level_index(gx, gy, tw, 4, 16)),
        ("tile16 morton-outer", morton_outer_index(gx, gy, tw, th, 16)),
    ):
        s = np.sort(idx)
        ok = s[0] == 0 and s[-1] == th * tw - 1 and len(np.unique(s)) == th * tw
        print(f"  permutation check {name}: {'OK' if ok else 'FAILED'}",
              flush=True)


if __name__ == "__main__":
    main()
