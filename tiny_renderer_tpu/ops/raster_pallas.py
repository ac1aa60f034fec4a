"""Pallas TPU raster kernel — the performance path.

Grid = screen tiles; each grid step owns one (tile_h x tile_w) tile of the
z / index / varying targets in VMEM and loops over the triangles binned to
that tile (ops/binning.py) in two phases:

* **Phase 1 — depth resolve**: per triangle, exact integer coverage tests
  (src/scene.rs:174-197 over integer raster coords; values < 2^24 held in
  f32) and a strict `z > best` update.  Triangles are visited in ascending
  global index order (binning sorts), so equal-z fragments keep the earliest
  triangle — exactly the serial reference's `z <= stored -> reject` rule
  (shader.rs:169-180).  Deterministic and bit-stable.
* **Phase 2 — varying interpolation**: per triangle, pixels it won
  (idx == tri) get their varyings (uv, diffuse intensity, depth, Darboux
  pieces — see pipelines.shaders.VARYING_SPECS) interpolated with the
  reference's exact-division barycentrics.  This replaces the per-pixel
  attribute *gathers* of classic deferred shading: the triangle's attributes
  are scalars in registers here, so interpolation is a handful of broadcast
  FMAs per plane — measured ~6x cheaper than gathering per pixel on TPU.

The triangle records are a flat CSR array (ops/binning.py) resident in
VMEM for the whole grid; each tile walks its [starts[t], starts[t+1])
slice, so per-tile triangle counts are unbounded.  The pixel-space
evaluation is dense f32 VPU work with zero HBM traffic inside the loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import BASE_LANES
from .mathlib import F32_MIN


def _plane_layout(spec):
    """[(mode, record_lane, plane_index)] for each output plane of `spec`.

    mode "texidx:W:H" consumes 6 record lanes (uv per-vertex values) and
    produces one plane holding the flat texel index (exact integer in f32).
    """
    planes = []
    lane = BASE_LANES
    p = 0
    for name, comps, mode in spec or ():
        if mode.startswith("texidx"):
            planes.append((mode, lane, p))
            lane += 6
            p += 1
            continue
        for _ in range(comps):
            if mode == "interp":
                planes.append(("interp", lane, p))
                lane += 3
            elif mode == "const":
                planes.append(("const", lane, p))
                lane += 1
            else:  # zfrag — interpolates base z lanes 9..11
                planes.append(("zfrag", 9, p))
            p += 1
    return planes


def _raster_kernel(
    starts_ref, row_off_ref, rec_ref, *rest,
    tile_h, tile_w, tiles_x, spec, emit_idx, emit_z, group,
):
    planes = _plane_layout(spec)
    rest = list(rest)
    # Output order: [z if emit_z] [idx if needed] [varys if planes]; when z
    # is not emitted it lives in the trailing VMEM scratch instead (the
    # depth resolve still runs entirely in VMEM — only the HBM write of the
    # z target is skipped, e.g. the camera pass of the strip-compacted
    # shade, which consumes idx only).
    z_ref = rest.pop(0) if emit_z else rest.pop()
    idx_ref = rest.pop(0) if emit_idx or planes else None
    vary_ref = rest.pop(0) if planes else None

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * tiles_x + tx
    start = starts_ref[tile]
    end = starts_ref[tile + 1]
    row_off = row_off_ref[0]  # global tile-row offset of this (row-sharded) grid

    z_ref[:] = jnp.full((tile_h, tile_w), F32_MIN, jnp.float32)
    if idx_ref is not None:
        idx_ref[:] = jnp.full((tile_h, tile_w), -1, idx_ref.dtype)
    if vary_ref is not None:
        vary_ref[:] = jnp.zeros_like(vary_ref)

    # Pixel coordinates of this tile (f32 holding exact integers).
    pxf = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + tx * tile_w
    ).astype(jnp.float32)
    pyf = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        + (ty + row_off) * tile_h
    ).astype(jnp.float32)

    def edge_functions(k):
        a1 = rec_ref[k, 0]
        b1 = rec_ref[k, 1]
        c1 = rec_ref[k, 2]
        a2 = rec_ref[k, 3]
        b2 = rec_ref[k, 4]
        c2 = rec_ref[k, 5]
        cx = a1 * pxf + b1 * pyf + c1
        cy = a2 * pxf + b2 * pyf + c2
        return cx, cy

    n_rec = rec_ref.shape[0]

    def tri_candidate(k):
        """(inside_mask, zval, gidx) of triangle record k over this tile."""
        cx, cy = edge_functions(k)
        sgn = rec_ref[k, 6]
        absz = rec_ref[k, 7]
        rcz = rec_ref[k, 8]
        z1 = rec_ref[k, 9]
        z2 = rec_ref[k, 10]
        z3 = rec_ref[k, 11]
        gidx = rec_ref[k, 12]

        cxs = cx * sgn
        cys = cy * sgn
        zero = jnp.float32(0.0)
        inside = (cxs >= zero) & (cys >= zero) & (absz - cxs - cys >= zero)

        u = cx * rcz
        v = cy * rcz
        w = jnp.float32(1.0) - (cx + cy) * rcz
        zval = (w * z1 + u * z2) + v * z3
        return inside, zval, gidx

    # `group` triangles per iteration: the ~12-cycle VMEM scalar record
    # reads dominate the loop, and grouping lets them pipeline (measured:
    # 2-wide cut the headline raster ~40%; 4-wide squeezed the remainder).
    # The merge below applies candidates strictly in ascending global-index
    # order, so the tie rule (z <= stored -> reject; shader.rs:169-180) is
    # preserved exactly.
    GROUP = group

    def depth_group(i, _):
        k0 = start + GROUP * i
        cands = []
        for j in range(GROUP):
            k = jnp.minimum(k0 + j, n_rec - 1)
            inside, zval, gidx = tri_candidate(k)
            cands.append((inside & (k0 + j < end), zval, gidx))

        z_cur = z_ref[:]
        idx_cur = idx_ref[:] if idx_ref is not None else None
        for inside, zval, gidx in cands:
            win = inside & (zval > z_cur)
            z_cur = jnp.where(win, zval, z_cur)
            if idx_cur is not None:
                idx_cur = jnp.where(
                    win, jnp.int32(gidx).astype(idx_cur.dtype), idx_cur
                )
        z_ref[:] = z_cur
        if idx_ref is not None:
            idx_ref[:] = idx_cur
        return 0

    jax.lax.fori_loop(0, (end - start + GROUP - 1) // GROUP, depth_group, 0)

    if not planes:
        return

    def vary_body(k, _):
        gidx = rec_ref[k, 12]
        mask = idx_ref[:] == jnp.int32(gidx).astype(idx_ref.dtype)
        cx, cy = edge_functions(k)
        sgn = rec_ref[k, 6]
        absz = rec_ref[k, 7]
        # Exact-division barycentrics (scene.rs:192-196): cx/cz computed as
        # (cx*sgn)/|cz| — the sign flip is exact, so the rounding matches the
        # reference's single division by cz bit-for-bit.
        u = (cx * sgn) / absz
        v = (cy * sgn) / absz
        w = jnp.float32(1.0) - ((cx + cy) * sgn) / absz
        for mode, lane, p in planes:
            if mode == "const":
                val = jnp.full((tile_h, tile_w), rec_ref[k, lane])
            elif mode.startswith("texidx"):
                # Fold uv interpolation + the reference's texel addressing
                # ((uv*dim) as u32 then clamp, util.rs:35-40 + our clamp
                # divergence) into one exact-integer-in-f32 index plane.
                _, tw_, th_ = mode.split(":")
                wdim = jnp.float32(int(tw_))
                hdim = jnp.float32(int(th_))
                uu = (rec_ref[k, lane] * w + rec_ref[k, lane + 1] * u) + rec_ref[k, lane + 2] * v
                vv = (rec_ref[k, lane + 3] * w + rec_ref[k, lane + 4] * u) + rec_ref[k, lane + 5] * v
                zero = jnp.float32(0.0)
                xw = uu * wdim
                yw = vv * hdim
                xw = jnp.where(jnp.isnan(xw), zero, xw)
                yw = jnp.where(jnp.isnan(yw), zero, yw)
                cxp = jnp.minimum(jnp.trunc(jnp.maximum(xw, zero)), wdim - 1.0)
                cyp = jnp.minimum(jnp.trunc(jnp.maximum(yw, zero)), hdim - 1.0)
                val = cyp * wdim + cxp
            else:  # interp / zfrag: (a0*w + a1*u) + a2*v
                a0 = rec_ref[k, lane]
                a1 = rec_ref[k, lane + 1]
                a2 = rec_ref[k, lane + 2]
                val = (a0 * w + a1 * u) + a2 * v
            vary_ref[p] = jnp.where(mask, val, vary_ref[p])
        return 0

    jax.lax.fori_loop(start, end, vary_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_h", "tile_w", "tiles_y", "tiles_x", "spec", "emit_idx", "emit_z",
        "group", "idx_dtype", "interpret",
    ),
)
def rasterize_pallas(
    csr_records,
    starts,
    row_tile_offset=None,
    *,
    tile_h,
    tile_w,
    tiles_y,
    tiles_x,
    spec=(),
    emit_idx=True,
    emit_z=True,
    group=4,
    idx_dtype="int32",
    interpret=False,
):
    """Run the raster kernel.

    Args:
      csr_records: (incidence_cap, record_lanes(spec)) f32 from
        bin_triangles — CSR triangle records in (tile, triangle) order,
        resident in VMEM for the whole grid.
      starts: (num_tiles + 1,) i32 CSR offsets (scalar-prefetched to SMEM).
      spec: pipelines.shaders.VARYING_SPECS entry (static).
      emit_idx: write the winning-triangle-index target.  Depth-only passes
        (the shadow map, shader.rs:694-709) need only max z — skipping the
        index output saves its full HBM write.
      emit_z: write the depth target.  The strip-compacted shade consumes
        idx only, so its camera pass skips the z write (the depth resolve
        itself is unchanged — z lives in a VMEM scratch).
      group: triangles per depth-loop iteration (config.raster_group).
      idx_dtype: "int32" or "int16" for the index target.  int16 halves the
        target's HBM bytes and is exact for < 32768 triangles (the caller
        checks; requires tile_h a multiple of 16, the i16 sublane tile).

    Returns (z, idx, varyings) of spatial shape (tiles_y*tile_h,
    tiles_x*tile_w): winning depth (F32_MIN where uncovered; None if not
    emitted), winning triangle index (-1 where uncovered; None if not
    emitted), and the (num_planes, H, W) f32 interpolated varyings (None
    if spec is empty).
    """
    H = tiles_y * tile_h
    W = tiles_x * tile_w
    n_planes = sum(c for (_, c, _) in spec) if spec else 0
    with_idx = emit_idx or n_planes > 0  # phase 2 reads the index target
    assert emit_z or with_idx, "kernel must emit at least one target"

    if row_tile_offset is None:
        row_tile_offset = jnp.zeros((1,), jnp.int32)

    tile_spec = pl.BlockSpec((tile_h, tile_w), lambda ty, tx, s, r: (ty, tx))
    out_specs = []
    out_shape = []
    if emit_z:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((H, W), jnp.float32))
    if with_idx:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((H, W), jnp.dtype(idx_dtype)))
    if n_planes:
        out_specs.append(
            pl.BlockSpec((n_planes, tile_h, tile_w), lambda ty, tx, s, r: (0, ty, tx))
        )
        out_shape.append(jax.ShapeDtypeStruct((n_planes, H, W), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            # Whole CSR array, constant index map -> fetched to VMEM once
            # and kept resident across all grid steps.
            pl.BlockSpec(
                csr_records.shape, lambda ty, tx, s, r: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=(
            [] if emit_z else [pltpu.VMEM((tile_h, tile_w), jnp.float32)]
        ),
    )

    kernel = functools.partial(
        _raster_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        spec=spec,
        emit_idx=with_idx,
        emit_z=emit_z,
        group=group,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, row_tile_offset.astype(jnp.int32), csr_records)
    outs = list(outs)
    z = outs.pop(0) if emit_z else None
    idx = outs.pop(0) if with_idx else None
    varys = outs.pop(0) if n_planes else None
    return z, idx, varys
