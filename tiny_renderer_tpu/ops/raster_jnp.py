"""Pure-jnp rasterizer: the correctness-reference device implementation.

Replaces the reference's serial triangle -> bbox-pixel scan
(src/scene.rs:212-265) with a dense, deterministic resolve:

For every pixel, the winning fragment is the one the serial renderer would
have left in the buffer: the *strictly greatest* interpolated z wins and ties
keep the earliest polygon (process_z_value rejects z <= stored,
shader.rs:169-180 — SURVEY.md §2.2.3).  That is the lexicographic max over
(z, -triangle_index), computed here as a scan over triangle blocks:

* within a block, `argmax` picks the first (lowest-index) maximal z;
* across blocks (ascending index), a strict `z > best` keeps the earlier
  block on ties.

The result is bit-stable: no atomics, no scatter races, pure reductions.

Coverage tests are *exact*: the barycentric cross product of scene.rs:174-197
has all-integer intermediates (|.| < 2^22), so `u >= 0` etc. are evaluated as
integer sign tests, which provably equal the reference's post-division f32
comparisons.  The interpolated z uses the same f32 expression as the
reference: ((w*z1 + u*z2) + v*z3) with u = cx/cz, v = cy/cz,
w = 1 - (cx+cy)/cz.

This path is O(T * H * W) — it is the oracle-grade fallback and the
small-size test backend; the binned Pallas kernel (raster_pallas.py) is the
fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mathlib import F32_MIN

NEG_INF = np.float32(-np.inf)


def rasterize_jnp(setup, height, width, tri_block=64, y_offset=0):
    """Dense raster over all triangles.

    Args:
      setup: triangle_setup output (jnp arrays).
      height, width: frame dims (static).  When row-sharded (parallel/),
        `height` is the local shard height and `y_offset` the first global
        row this shard owns.
      tri_block: triangles per scan step.

    Returns:
      z: (H, W) f32 — winning depth, F32_MIN where uncovered (the reference's
         clear value, scene.rs:131).
      idx: (H, W) i32 — winning triangle index, -1 where uncovered.
    """
    T = setup["a1"].shape[0]
    B = int(tri_block)
    Tp = -(-T // B) * B

    def pad(x, fill=0):
        return jnp.pad(x, [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)

    a1 = pad(setup["a1"]).reshape(-1, B)
    b1 = pad(setup["b1"]).reshape(-1, B)
    c1 = pad(setup["c1"]).reshape(-1, B)
    a2 = pad(setup["a2"]).reshape(-1, B)
    b2 = pad(setup["b2"]).reshape(-1, B)
    c2 = pad(setup["c2"]).reshape(-1, B)
    cz = pad(setup["cz"], fill=1).reshape(-1, B)
    zv = pad(setup["zv"]).reshape(-1, B, 3)
    valid = pad(setup["valid"], fill=False).reshape(-1, B)
    gidx = jnp.arange(Tp, dtype=jnp.int32).reshape(-1, B)

    px = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0) + y_offset

    def body(carry, blk):
        z_cur, i_cur = carry
        ba1, bb1, bc1, ba2, bb2, bc2, bcz, bzv, bvalid, bgidx = blk
        # (B, H, W) integer edge functions — exact.
        cx = ba1[:, None, None] * px + bb1[:, None, None] * py + bc1[:, None, None]
        cy = ba2[:, None, None] * px + bb2[:, None, None] * py + bc2[:, None, None]
        czb = bcz[:, None, None]
        pos = czb > 0
        zero = jnp.int32(0)
        inside = (
            jnp.where(pos, cx >= zero, cx <= zero)
            & jnp.where(pos, cy >= zero, cy <= zero)
            & jnp.where(pos, czb - cx - cy >= zero, czb - cx - cy <= zero)
            & bvalid[:, None, None]
        )
        # Reference f32 interpolation (scene.rs:192-196 + shader.rs:174).
        cxf = cx.astype(jnp.float32)
        cyf = cy.astype(jnp.float32)
        czf = czb.astype(jnp.float32)
        u = cxf / czf
        v = cyf / czf
        w = jnp.float32(1.0) - (cxf + cyf) / czf
        z = (w * bzv[:, None, None, 0] + u * bzv[:, None, None, 1]) + v * bzv[:, None, None, 2]
        z = jnp.where(inside, z, NEG_INF)
        # Within-block winner: first max <=> lowest triangle index.
        k = jnp.argmax(z, axis=0)
        bz = jnp.take_along_axis(z, k[None], axis=0)[0]
        bi = bgidx[k]
        # Across blocks: strict > keeps the earlier block on exact ties.
        better = bz > z_cur
        return (jnp.where(better, bz, z_cur), jnp.where(better, bi, i_cur)), None

    z0 = jnp.full((height, width), F32_MIN, jnp.float32)
    i0 = jnp.full((height, width), -1, jnp.int32)
    (z, idx), _ = jax.lax.scan(
        body, (z0, i0), (a1, b1, c1, a2, b2, c2, cz, zv, valid, gidx)
    )
    return z, idx
