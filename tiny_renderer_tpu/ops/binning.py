"""Screen-tile triangle binning for the Pallas raster kernel.

The reference bounds raster work per triangle with a bbox scan
(src/scene.rs:233-241); the TPU analog is tiling: the screen is cut into
(tile_h x tile_w) tiles and each triangle is binned into every tile its
screen-clamped bbox overlaps.  The Pallas kernel then only evaluates
(tile, triangle) pairs that can actually produce coverage — this is the
blockwise decomposition that bounds the O(pixels x triangles) product
(SURVEY.md §5.7).

Compaction is sort-based and fully deterministic: per tile, overlapping
triangle indices are sorted ascending, preserving the reference's
polygon-order tie-break; overflow beyond max_tris_per_tile drops the
*highest* indices (deterministic, reported via the overflow flag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Packed per-triangle record layout (f32 lanes) for the raster kernel.
#   0: a1   1: b1   2: c1   3: a2   4: b2   5: c2
#   6: sgn (sign of cz, +-1)   7: |cz|   8: 1/cz
#   9: z1  10: z2  11: z3  12: global triangle index (exact in f32, T < 2^24)
RECORD_LANES = 16  # padded for clean SMEM/VMEM layout


def pack_triangle_records(setup, xp=jnp):
    """(T, RECORD_LANES) f32 record per triangle from triangle_setup output."""
    czf = setup["cz"].astype(xp.float32)
    safe = xp.where(setup["cz"] == 0, xp.float32(1.0), czf)
    sgn = xp.where(czf < 0, xp.float32(-1.0), xp.float32(1.0))
    T = setup["a1"].shape[0]
    cols = [
        setup["a1"].astype(xp.float32),
        setup["b1"].astype(xp.float32),
        setup["c1"].astype(xp.float32),
        setup["a2"].astype(xp.float32),
        setup["b2"].astype(xp.float32),
        setup["c2"].astype(xp.float32),
        sgn,
        xp.abs(czf),
        xp.float32(1.0) / safe,
        setup["zv"][:, 0],
        setup["zv"][:, 1],
        setup["zv"][:, 2],
        xp.arange(T, dtype=xp.float32) if xp is jnp else xp.arange(T, dtype=np.float32),
    ]
    rec = xp.stack(cols, axis=-1)
    pad = RECORD_LANES - rec.shape[-1]
    return xp.pad(rec, [(0, 0), (0, pad)])


def bin_triangles(setup, config):
    """Bin triangles into screen tiles.

    Returns:
      tile_records: (num_tiles, max_tris_per_tile, RECORD_LANES) f32
      counts: (num_tiles,) i32 — triangles binned per tile (clamped to max)
      overflowed: () bool — any tile exceeded max_tris_per_tile
    """
    th, tw = config.tile_h, config.tile_w
    n_ty, n_tx = config.tiles_y, config.tiles_x
    max_t = config.max_tris_per_tile

    valid = setup["valid"]
    # Tile index ranges covered by the screen-clamped bbox.
    tx0 = setup["x0"] // tw
    tx1 = setup["x1"] // tw
    ty0 = setup["y0"] // th
    ty1 = setup["y1"] // th

    ty_ids = jnp.arange(n_ty, dtype=jnp.int32)
    tx_ids = jnp.arange(n_tx, dtype=jnp.int32)
    row_hit = (ty_ids[None, :] >= ty0[:, None]) & (ty_ids[None, :] <= ty1[:, None])
    col_hit = (tx_ids[None, :] >= tx0[:, None]) & (tx_ids[None, :] <= tx1[:, None])
    # (T, n_ty, n_tx) -> (T, num_tiles)
    hit = (row_hit[:, :, None] & col_hit[:, None, :]) & valid[:, None, None]
    hit = hit.reshape(hit.shape[0], -1)

    T = hit.shape[0]
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    # Per tile: ascending triangle indices first, sentinel T for non-hits.
    keys = jnp.where(hit, tri_ids[:, None], jnp.int32(T)).T  # (num_tiles, T)
    order = jnp.sort(keys, axis=1)[:, :max_t]  # (num_tiles, max_t)

    raw_counts = hit.sum(axis=0, dtype=jnp.int32)
    counts = jnp.minimum(raw_counts, jnp.int32(max_t))
    overflowed = jnp.any(raw_counts > max_t)

    records = pack_triangle_records(setup, jnp)
    gather_ids = jnp.minimum(order, jnp.int32(T - 1))
    tile_records = records[gather_ids]
    return tile_records, counts, overflowed
