"""Screen-tile triangle binning for the Pallas raster kernel.

The reference bounds raster work per triangle with a bbox scan
(src/scene.rs:233-241); the TPU analog is tiling: the screen is cut into
(tile_h x tile_w) tiles and each triangle is binned into every tile its
screen-clamped bbox overlaps.  The Pallas kernel then only evaluates
(tile, triangle) pairs that can actually produce coverage — the blockwise
decomposition that bounds the O(pixels x triangles) product (SURVEY.md §5.7).

Compaction strategy (v2): incidence-key sort.  Each triangle contributes up
to max_span_y * max_span_x (tile, triangle) incidences; the packed keys
`tile_id * K + tri_id` of ALL incidences are sorted in one small
(T * span,) sort, per-tile ranges are recovered with searchsorted, and the
per-tile record lists are plain gathers.  This is ~20x less sort work than
the previous per-tile (num_tiles, T) sort and keeps the critical invariant:
within each tile, triangle indices ascend, preserving the reference's
polygon-order tie-break (shader.rs:169-180).

Coverage caps (both deterministic, both reported via `overflowed`):
* bbox span is clamped to max_span_y x max_span_x tiles (default 8 x 4 =
  128 x 512 px) — triangles larger than that lose coverage beyond the cap;
* per-tile lists are truncated at max_tris_per_tile (highest indices drop).
Both caps are far above anything the reference scenes produce; raise the
config knobs for pathological close-up geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Packed per-triangle base record layout (f32 lanes) for the raster kernel.
#   0: a1   1: b1   2: c1   3: a2   4: b2   5: c2
#   6: sgn (sign of cz, +-1)   7: |cz|   8: 1/cz
#   9: z1  10: z2  11: z3  12: global triangle index (exact in f32, T < 2^24)
# Varying lanes (driven by a pipelines.shaders.VARYING_SPECS entry) follow:
# "interp" varyings contribute 3 lanes per component (v0, v1, v2); "const"
# varyings 1 lane per component; "zfrag" reuses base lanes 9-11.
BASE_LANES = 13


def _round_up(x, m):
    return -(-x // m) * m


def record_lanes(spec) -> int:
    n = BASE_LANES
    for name, comps, mode in spec or ():
        if mode == "interp":
            n += 3 * comps
        elif mode == "const":
            n += comps
        elif mode.startswith("texidx"):
            n += 6  # uv interp lanes; the kernel folds them into one plane
    return _round_up(max(n, 16), 8)


def pack_triangle_records(setup, spec=(), xp=jnp):
    """(T, record_lanes(spec)) f32 record per triangle."""
    from ..pipelines.shaders import _CONST_SOURCES, _INTERP_SOURCES

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
    for name, comps, mode in spec or ():
        if mode == "interp":
            for c in range(comps):
                for v in range(3):
                    cols.append(_INTERP_SOURCES[name](setup, c, v))
        elif mode == "const":
            for c in range(comps):
                cols.append(_CONST_SOURCES[name](setup, c))
        elif mode.startswith("texidx"):
            for c in range(2):
                for v in range(3):
                    cols.append(_INTERP_SOURCES["uv"](setup, c, v))
    rec = xp.stack(cols, axis=-1)
    pad = record_lanes(spec) - rec.shape[-1]
    return xp.pad(rec, [(0, 0), (0, pad)])


def bin_triangles(setup, config, spec=()):
    """Bin triangles into screen tiles.

    Returns:
      tile_records: (num_tiles, max_tris_per_tile, record_lanes(spec)) f32,
        triangle indices ascending within each tile
      counts: (num_tiles,) i32 — triangles binned per tile (clamped to max)
      overflowed: () bool — any coverage cap was hit
    """
    th, tw = config.tile_h, config.tile_w
    n_tx = config.tiles_x
    num_tiles = config.num_tiles
    max_t = config.max_tris_per_tile
    msy, msx = config.max_span_y, config.max_span_x

    T = setup["valid"].shape[0]
    # Key packing: key = tile_id * K + tri_id must fit in i32.
    K = 1 << int(T).bit_length()
    if num_tiles * K >= 2**31:
        raise ValueError(
            f"binning key overflow: {num_tiles} tiles x {T} triangles; "
            "use larger tiles or shard the screen"
        )

    valid = setup["valid"]
    tx0 = setup["x0"] // tw
    tx1 = setup["x1"] // tw
    ty0 = setup["y0"] // th
    ty1 = setup["y1"] // th
    span_x = tx1 - tx0
    span_y = ty1 - ty0
    span_clamped = jnp.any(valid & ((span_x > msx - 1) | (span_y > msy - 1)))

    dy = jnp.arange(msy, dtype=jnp.int32)
    dx = jnp.arange(msx, dtype=jnp.int32)
    # (T, msy, msx) candidate tiles.
    tile = (ty0[:, None, None] + dy[None, :, None]) * n_tx + (
        tx0[:, None, None] + dx[None, None, :]
    )
    ok = (
        valid[:, None, None]
        & (dy[None, :, None] <= span_y[:, None, None])
        & (dx[None, None, :] <= span_x[:, None, None])
    )
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    key = jnp.where(ok, tile * K + tri_ids[:, None, None], jnp.int32(2**31 - 1))
    keys_sorted = jnp.sort(key.reshape(-1))  # (T * msy * msx,)

    # Per-tile ranges: starts[t] = first incidence of tile t.
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) * K
    starts = jnp.searchsorted(keys_sorted, boundaries, side="left").astype(jnp.int32)
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, jnp.int32(max_t))
    overflowed = jnp.any(raw_counts > max_t) | span_clamped

    # Per-tile triangle lists: gather from the sorted incidences.
    slot = starts[:-1, None] + jnp.arange(max_t, dtype=jnp.int32)[None, :]
    slot = jnp.minimum(slot, jnp.int32(keys_sorted.shape[0] - 1))
    tri_of_slot = (keys_sorted[slot] & jnp.int32(K - 1)).astype(jnp.int32)
    in_range = jnp.arange(max_t, dtype=jnp.int32)[None, :] < counts[:, None]
    gather_ids = jnp.where(in_range, jnp.minimum(tri_of_slot, T - 1), jnp.int32(T - 1))

    records = pack_triangle_records(setup, spec, jnp)
    tile_records = records[gather_ids]
    return tile_records, counts, overflowed
