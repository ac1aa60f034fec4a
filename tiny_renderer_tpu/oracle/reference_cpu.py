"""NumPy oracle: the reference renderer's exact serial semantics on CPU.

The reference repo ships no tests and no Rust toolchain is available here
(SURVEY.md §4), so golden images come from this oracle: a NumPy
implementation that follows the Rust renderer's semantics operation by
operation — serial triangle order, strictly-greater depth test with
first-triangle-wins ties (shader.rs:169-180), trunc-toward-zero casts,
f32 arithmetic — while sharing the math (ops/mathlib.py), vertex stage
(ops/vertex.py) and fragment shaders (pipelines/shaders.py) with the device
renderer, so any divergence isolates to the raster loop itself.

The raster here IS the reference algorithm: for each triangle in order,
scan its screen-clamped bbox, barycentric inside test, depth test, record
winner (deferred shading is output-equivalent, SURVEY.md §2.2.4).  Each
triangle's bbox is processed vectorized (identical elementwise IEEE f32),
which keeps the oracle ~seconds per 800x800 frame.
"""

from __future__ import annotations

import numpy as np

from ..ops import mathlib as ml
from ..ops.vertex import triangle_setup
from ..pipelines import shaders
from ..pipelines.frame import PIPELINES, _GATHER_KEYS
from ..pipelines.shaders import (
    VARYING_SPECS,
    compute_varyings,
    plane_tile_effective,
    swizzle_plane,
)


def _raster_serial(setup, height, width, *, shadow_mode=False):
    """Serial-order raster.

    shadow_mode: pass-1 shadow semantics — every covered fragment max-updates
    the buffer with `>=` (shader.rs:694-709); no triangle index tracked.

    Returns (z, idx); idx is all -1 in shadow_mode.
    """
    z_buf = np.full((height, width), ml.F32_MIN, np.float32)
    idx_buf = np.full((height, width), -1, np.int32)

    T = setup["a1"].shape[0]
    valid = np.asarray(setup["valid"])
    x0 = np.asarray(setup["x0"])
    x1 = np.asarray(setup["x1"])
    y0 = np.asarray(setup["y0"])
    y1 = np.asarray(setup["y1"])
    a1 = np.asarray(setup["a1"])
    b1 = np.asarray(setup["b1"])
    c1 = np.asarray(setup["c1"])
    a2 = np.asarray(setup["a2"])
    b2 = np.asarray(setup["b2"])
    c2 = np.asarray(setup["c2"])
    cz = np.asarray(setup["cz"])
    zv = np.asarray(setup["zv"])

    for t in range(T):
        if not valid[t]:
            continue
        xs = np.arange(x0[t], x1[t] + 1, dtype=np.int64)
        ys = np.arange(y0[t], y1[t] + 1, dtype=np.int64)
        px, py = np.meshgrid(xs, ys, indexing="xy")
        cx = a1[t] * px + b1[t] * py + c1[t]
        cy = a2[t] * px + b2[t] * py + c2[t]
        czt = int(cz[t])
        # Reference inside test: all barycentric coords >= 0 (scene.rs:245),
        # evaluated exactly over integers (sign of cx/cz etc).
        if czt > 0:
            inside = (cx >= 0) & (cy >= 0) & (czt - cx - cy >= 0)
        else:
            inside = (cx <= 0) & (cy <= 0) & (czt - cx - cy <= 0)
        if not inside.any():
            continue
        # f32 barycentric exactly as scene.rs:192-196.
        czf = np.float32(czt)
        cxf = cx.astype(np.float32)
        cyf = cy.astype(np.float32)
        u = cxf / czf
        v = cyf / czf
        w = np.float32(1.0) - (cxf + cyf) / czf
        z = (w * zv[t, 0] + u * zv[t, 1]) + v * zv[t, 2]

        sl = (slice(int(y0[t]), int(y1[t]) + 1), slice(int(x0[t]), int(x1[t]) + 1))
        if shadow_mode:
            upd = inside & (z >= z_buf[sl])
        else:
            upd = inside & (z > z_buf[sl])
        z_buf[sl] = np.where(upd, z, z_buf[sl])
        if not shadow_mode:
            idx_buf[sl] = np.where(upd, np.int32(t), idx_buf[sl])
    return z_buf, idx_buf


def _gather_fragments_np(setup, idx, keys):
    H, W = idx.shape
    safe = np.maximum(idx, 0)
    for k in keys:
        if k not in setup:  # custom "attr:" varying not supplied
            raise ValueError(
                f"pipeline requires the custom vertex attribute {k!r}: "
                f"supply geom[{k!r}] with shape (num_triangles, 3, k)"
            )
    frag = {k: np.asarray(setup[k])[safe] for k in keys}
    px = np.broadcast_to(np.arange(W, dtype=np.int64)[None, :], (H, W))
    py = np.broadcast_to(np.arange(H, dtype=np.int64)[:, None], (H, W))
    cx = np.asarray(setup["a1"])[safe] * px + np.asarray(setup["b1"])[safe] * py + np.asarray(setup["c1"])[safe]
    cy = np.asarray(setup["a2"])[safe] * px + np.asarray(setup["b2"])[safe] * py + np.asarray(setup["c2"])[safe]
    czf = np.asarray(setup["cz"])[safe].astype(np.float32)
    cxf = cx.astype(np.float32)
    cyf = cy.astype(np.float32)
    frag["bar"] = np.stack(
        [np.float32(1.0) - (cxf + cyf) / czf, cxf / czf, cyf / czf], axis=-1
    )
    frag["x"] = px.astype(np.int32)
    frag["y"] = py.astype(np.int32)
    return frag


def render_oracle(geom, textures, light_direction, look_from, look_at, up, *, pipeline, config):
    """Render one frame with the oracle. Same outputs as render_frame."""
    config = config.resolve(pipeline)
    spec = PIPELINES[pipeline]
    H, W = config.height, config.width
    light_direction = np.asarray(light_direction, np.float32)
    look_from = np.asarray(look_from, np.float32)
    look_at = np.asarray(look_at, np.float32)
    up = np.asarray(up, np.float32)
    geom = {k: np.asarray(v) for k, v in geom.items()}
    textures = {k: np.asarray(v) for k, v in textures.items()}

    if spec.two_pass:
        u1 = ml.shadow_pass_1_prepare(config, light_direction, look_at, up, np)
        setup1 = triangle_setup(
            geom, u1, config, matrix_key="shadow_matrix", cull=False, needs=(), xp=np
        )
        shadow_z, _ = _raster_serial(setup1, H, W, shadow_mode=True)
        uniforms = ml.shadow_pass_2_prepare(
            config, light_direction, look_from, look_at, up, np
        )
        uniforms["shadow_matrix"] = u1["shadow_matrix"]
    else:
        uniforms = ml.default_prepare(config, light_direction, look_from, look_at, up, np)
        shadow_z = np.full((H, W), ml.F32_MIN, np.float32)

    setup = triangle_setup(geom, uniforms, config, needs=spec.needs, xp=np)
    z, idx = _raster_serial(setup, H, W)

    frag = _gather_fragments_np(setup, idx, _GATHER_KEYS[pipeline])
    varys = compute_varyings(frag, VARYING_SPECS[pipeline], np)
    varys["x"] = frag["x"]
    varys["y"] = frag["y"]
    if spec.two_pass:
        # The shared shade fetches decode config.shadow_tile's swizzled
        # layout (shaders.plane_tile_effective) — mirror the device
        # producer so the oracle stays valid for knobbed configs.
        t = plane_tile_effective(config, shadow_z.shape)
        varys["shadow_buffer"] = (
            swizzle_plane(shadow_z, t, np) if t else shadow_z
        )
    colors = spec.shade(varys, uniforms, textures, config, np)

    covered = (idx >= 0)[..., None]
    frame = np.where(covered, colors, np.uint8(0))
    return {"frame": frame, "z": z, "shadow": shadow_z}
