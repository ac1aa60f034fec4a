"""Pallas TPU raster kernel — the performance path.

Grid = screen tiles; each grid step owns one (tile_h x tile_w) tile of the
z/index targets in VMEM and loops over the triangles binned to that tile
(ops/binning.py), evaluating the tile's coverage and depth for one triangle
per iteration as dense VPU ops.

Determinism / reference semantics (SURVEY.md §2.2.3):
* triangles are visited in ascending global index order (binning sorts),
* the depth update is strict (z > best), so equal-z fragments keep the
  earliest triangle — exactly the serial reference's
  `z <= stored -> reject` rule (shader.rs:169-180);
* coverage tests are exact integer sign tests (values < 2^24 held in f32),
  provably equal to the reference's post-division comparisons
  (src/scene.rs:174-197 + :245).

The per-triangle records live in SMEM ((1, max_t, 16) block per tile) so the
inner loop reads scalars; the pixel-space evaluation is a handful of f32
FMA/select ops on the (tile_h, tile_w) block — VPU-shaped work with zero
HBM traffic inside the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mathlib import F32_MIN


def _raster_kernel(counts_ref, rec_ref, z_ref, idx_ref, *, tile_h, tile_w, tiles_x):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    count = counts_ref[ty * tiles_x + tx]

    z_ref[:] = jnp.full((tile_h, tile_w), F32_MIN, jnp.float32)
    idx_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)

    # Pixel coordinates of this tile (f32 holding exact integers).
    pxf = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + tx * tile_w
    ).astype(jnp.float32)
    pyf = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + ty * tile_h
    ).astype(jnp.float32)

    def body(k, _):
        a1 = rec_ref[0, k, 0]
        b1 = rec_ref[0, k, 1]
        c1 = rec_ref[0, k, 2]
        a2 = rec_ref[0, k, 3]
        b2 = rec_ref[0, k, 4]
        c2 = rec_ref[0, k, 5]
        sgn = rec_ref[0, k, 6]
        absz = rec_ref[0, k, 7]
        rcz = rec_ref[0, k, 8]
        z1 = rec_ref[0, k, 9]
        z2 = rec_ref[0, k, 10]
        z3 = rec_ref[0, k, 11]
        gidx = rec_ref[0, k, 12]

        # Exact integer edge functions (scene.rs:174-197).
        cx = a1 * pxf + b1 * pyf + c1
        cy = a2 * pxf + b2 * pyf + c2
        cxs = cx * sgn
        cys = cy * sgn
        zero = jnp.float32(0.0)
        inside = (cxs >= zero) & (cys >= zero) & (absz - cxs - cys >= zero)

        # Barycentric interpolation of z (shader.rs:174: bar . z_values).
        u = cx * rcz
        v = cy * rcz
        w = jnp.float32(1.0) - (cx + cy) * rcz
        zval = (w * z1 + u * z2) + v * z3

        cur = z_ref[:]
        better = inside & (zval > cur)
        z_ref[:] = jnp.where(better, zval, cur)
        idx_ref[:] = jnp.where(better, jnp.int32(gidx), idx_ref[:])
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "tiles_y", "tiles_x", "interpret")
)
def rasterize_pallas(
    tile_records, counts, *, tile_h, tile_w, tiles_y, tiles_x, interpret=False
):
    """Run the raster kernel.

    Args:
      tile_records: (num_tiles, max_t, RECORD_LANES) f32 from bin_triangles,
        triangle indices ascending within each tile.
      counts: (num_tiles,) i32.

    Returns (z, idx) of shape (tiles_y*tile_h, tiles_x*tile_w): winning depth
    (F32_MIN where uncovered) and winning triangle index (-1 where uncovered).
    """
    max_t = tile_records.shape[1]
    lanes = tile_records.shape[2]
    H = tiles_y * tile_h
    W = tiles_x * tile_w

    def record_index_map(ty, tx, counts_ref):
        return (ty * tiles_x + tx, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((1, max_t, lanes), record_index_map, memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c: (ty, tx)),
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c: (ty, tx)),
        ],
    )

    kernel = functools.partial(
        _raster_kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x
    )
    z, idx = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts, tile_records)
    return z, idx
