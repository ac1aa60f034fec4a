"""Jit-compiled frame functions: the entire render as one device program.

The reference renders a frame as serial passes -> polygons -> pixels with
host-side closures (src/scene.rs:199-267).  Here a frame is ONE jit-compiled
function per (pipeline, config): uniforms -> batched vertex stage -> binned
raster -> deferred shading, with two-pass pipelines (shadow, occlusion)
running both raster passes inside the same program — no host round-trips;
the only host<->device traffic is camera/light vectors in, u8 frame out
(SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops import mathlib as ml
from ..ops.binning import bin_triangles
from ..ops.raster_jnp import rasterize_jnp
from ..ops.raster_pallas import rasterize_pallas
from ..ops.vertex import triangle_setup
from . import shaders


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    """Declarative description of one pipeline (reference shader.rs:100-109)."""

    name: str
    needs: tuple  # vertex-stage varyings for the shading pass
    shade: object  # shading function for the final pass
    two_pass: bool = False  # shadow-buffer depth pre-pass (shader.rs:668-963)


PIPELINES = {
    "default": PipelineSpec("default", ("face_intensity",), shaders.shade_default),
    "phong": PipelineSpec("phong", ("vertex_intensity",), shaders.shade_phong),
    "normal_map": PipelineSpec("normal_map", (), shaders.shade_normal_map),
    "specular": PipelineSpec("specular", (), shaders.shade_specular),
    "darboux": PipelineSpec("darboux", ("darboux",), shaders.shade_darboux),
    "shadow": PipelineSpec(
        "shadow", ("vertex_intensity",), shaders.shade_shadow, two_pass=True
    ),
    "occlusion": PipelineSpec("occlusion", (), shaders.shade_occlusion, two_pass=True),
}

# Fragment attribute keys each shading pass gathers from the vertex setup.
_GATHER_KEYS = {
    "default": ("uv", "intensity"),
    "phong": ("uv", "intensity"),
    "normal_map": ("uv",),
    "specular": ("uv",),
    "darboux": ("uv", "t_pos", "t_norm"),
    "shadow": ("uv", "intensity", "zv"),
    "occlusion": ("uv", "zv"),
}


def _rasterize(setup, config, backend):
    """Backend dispatch; returns (z, idx) cropped to (height, width)."""
    if backend == "jnp":
        return rasterize_jnp(setup, config.height, config.width, config.tri_block)
    records, counts, _ = bin_triangles(setup, config)
    z, idx = rasterize_pallas(
        records,
        counts,
        tile_h=config.tile_h,
        tile_w=config.tile_w,
        tiles_y=config.tiles_y,
        tiles_x=config.tiles_x,
        interpret=(backend == "pallas_interpret"),
    )
    return z[: config.height, : config.width], idx[: config.height, : config.width]


def _gather_fragments(setup, idx, keys, config, y_offset=0):
    """Build per-pixel fragment inputs for deferred shading.

    Gathers the winning triangle's varyings per pixel and recomputes its
    barycentric coordinates with the reference's exact f32 expression
    (scene.rs:192-196) — exact divisions, matching the oracle bit-for-bit.
    """
    H, W = idx.shape
    safe = jnp.maximum(idx, 0)
    frag = {k: setup[k][safe] for k in keys}

    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + y_offset
    cx = (setup["a1"][safe] * px + setup["b1"][safe] * py) + setup["c1"][safe]
    cy = (setup["a2"][safe] * px + setup["b2"][safe] * py) + setup["c2"][safe]
    czf = setup["cz"][safe].astype(jnp.float32)
    cxf = cx.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    bar = jnp.stack(
        [jnp.float32(1.0) - (cxf + cyf) / czf, cxf / czf, cyf / czf], axis=-1
    )
    frag["bar"] = bar
    frag["x"] = px
    frag["y"] = py
    return frag


def render_frame(
    geom,
    textures,
    light_direction,
    look_from,
    look_at,
    up,
    *,
    pipeline,
    config,
    backend,
):
    """Render one frame. Returns dict(frame u8 (H,W,3), z f32, shadow f32).

    Row 0 is raster y=0 (bottom of the world — the reference's frame_buffer
    layout before the presentation flip, scene.rs:92-97).
    """
    spec = PIPELINES[pipeline]
    H, W = config.height, config.width

    if spec.two_pass:
        u1 = ml.shadow_pass_1_prepare(config, light_direction, look_at, up, jnp)
        setup1 = triangle_setup(
            geom, u1, config, matrix_key="shadow_matrix", cull=False, needs=(), xp=jnp
        )
        shadow_z, _ = _rasterize(setup1, config, backend)
        uniforms = ml.shadow_pass_2_prepare(
            config, light_direction, look_from, look_at, up, jnp
        )
        uniforms["shadow_matrix"] = u1["shadow_matrix"]
    else:
        uniforms = ml.default_prepare(
            config, light_direction, look_from, look_at, up, jnp
        )
        shadow_z = jnp.full((H, W), ml.F32_MIN, jnp.float32)

    setup = triangle_setup(geom, uniforms, config, needs=spec.needs, xp=jnp)
    z, idx = _rasterize(setup, config, backend)

    frag = _gather_fragments(setup, idx, _GATHER_KEYS[pipeline], config)
    if spec.two_pass:
        frag["shadow_buffer"] = shadow_z
    colors = spec.shade(frag, uniforms, textures, config, jnp)

    covered = (idx >= 0)[..., None]
    frame = jnp.where(covered, colors, jnp.uint8(0))
    return {"frame": frame, "z": z, "shadow": shadow_z}


@functools.partial(jax.jit, static_argnames=("pipeline", "config", "backend"))
def render_frame_jit(
    geom, textures, light_direction, look_from, look_at, up, *, pipeline, config, backend
):
    return render_frame(
        geom,
        textures,
        light_direction,
        look_from,
        look_at,
        up,
        pipeline=pipeline,
        config=config,
        backend=backend,
    )


def make_frame_fn(pipeline, config, backend="auto"):
    """Returns fn(geom, textures, light_direction, look_from, look_at, up)."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    return functools.partial(
        render_frame_jit, pipeline=pipeline, config=config, backend=backend
    )
