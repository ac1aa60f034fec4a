"""Degenerate-input robustness.

The reference panics on several degenerate inputs (unwraps at
shader.rs:224, :277-278, :631, :921).  Inside jit there is no panicking, so
the framework must produce *some* deterministic frame without crashing —
these tests pin that down (divergences documented in docs/DESIGN.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_renderer_tpu import RenderConfig
from tiny_renderer_tpu.models import make_uv_sphere, to_geom
from tiny_renderer_tpu.models.procedural import make_textures
from tiny_renderer_tpu.pipelines.frame import make_frame_fn

CFG = RenderConfig(width=64, height=64, tri_block=32)


def _render(pipeline, light, look_from, up=(0.0, 1.0, 0.0)):
    geom = jax.tree.map(jnp.asarray, to_geom(make_uv_sphere(stacks=8, slices=12)))
    tex = jax.tree.map(jnp.asarray, make_textures(32))
    fn = make_frame_fn(pipeline, CFG, backend="jnp")
    out = fn(
        geom, tex,
        jnp.asarray(np.array(light, np.float32)),
        jnp.asarray(np.array(look_from, np.float32)),
        jnp.zeros(3),
        jnp.asarray(np.array(up, np.float32)),
    )
    return np.asarray(out["frame"])


def test_camera_up_parallel_to_view_does_not_crash():
    """look direction parallel to up -> Gram-Schmidt basis degenerates
    (NaN matrices); the reference would render garbage too. Must not raise."""
    frame = _render("phong", light=[0, 0, 1], look_from=[0, 1, 0], up=[0, 1, 0])
    assert frame.shape == (64, 64, 3)


def test_light_opposite_z_occlusion_does_not_crash():
    """rotation_between((0,0,1), -z) has no unique axis — the reference
    panics (shader.rs:921 unwrap); we substitute a 180-degree rotation."""
    frame = _render("occlusion", light=[0, 0, -1], look_from=[0.3, 0, 0.95])
    assert frame.shape == (64, 64, 3)


def test_zero_light_vector_does_not_crash():
    frame = _render("default", light=[0, 0, 0], look_from=[0, 0, 1])
    assert frame.shape == (64, 64, 3)


def test_darboux_renders_with_degenerate_uv_mapping():
    """All-equal uvs make the Darboux system singular (reference panics at
    shader.rs:631); we produce NaN -> black for those fragments."""
    mesh = make_uv_sphere(stacks=6, slices=8)
    geom = to_geom(mesh)
    geom["tex_coords"] = np.full_like(geom["tex_coords"], 0.5)
    tex = jax.tree.map(jnp.asarray, make_textures(32))
    fn = make_frame_fn("darboux", CFG, backend="jnp")
    out = fn(
        jax.tree.map(jnp.asarray, geom), tex,
        jnp.asarray(np.array([0, 0, 1], np.float32)),
        jnp.asarray(np.array([0, 0, 1], np.float32)),
        jnp.zeros(3),
        jnp.asarray(np.array([0, 1, 0], np.float32)),
    )
    frame = np.asarray(out["frame"])
    assert frame.shape == (64, 64, 3)


def test_empty_scene_renders_black():
    geom = {
        "positions": np.zeros((3, 3), np.float32),
        "tex_coords": np.zeros((3, 2), np.float32),
        "normals": np.tile(np.array([[0, 0, 1]], np.float32), (3, 1)),
        "pos_idx": np.zeros((0, 3), np.int32),
        "tex_idx": np.zeros((0, 3), np.int32),
        "normal_idx": np.zeros((0, 3), np.int32),
    }
    tex = jax.tree.map(jnp.asarray, make_textures(16))
    fn = make_frame_fn("phong", CFG, backend="jnp")
    out = fn(
        jax.tree.map(jnp.asarray, geom), tex,
        jnp.asarray(np.array([0, 0, 1], np.float32)),
        jnp.asarray(np.array([0, 0, 1], np.float32)),
        jnp.zeros(3),
        jnp.asarray(np.array([0, 1, 0], np.float32)),
    )
    assert not np.asarray(out["frame"]).any()


def _overflow_geom():
    """One normal on-screen triangle + one whose vertex projects with
    near-zero homogeneous w (raster coords ~ 2^18, beyond the int32
    exactness envelope EXACT_COORD_MAX)."""
    positions = np.array(
        [
            # normal triangle near the origin
            [-0.3, -0.3, 0.0], [0.3, -0.3, 0.0], [0.0, 0.3, 0.0],
            # triangle with one vertex near the projection singularity
            # (camera at z=1, coef=-0.2 => w=0 at z=6)
            [-0.2, -0.2, 0.0], [0.2, -0.2, 0.0], [0.3, 0.2, 5.9999],
        ],
        np.float32,
    )
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return {
        "positions": positions,
        "tex_coords": np.full((6, 2), 0.5, np.float32),
        "normals": np.tile(np.array([[0, 0, 1]], np.float32), (6, 1)),
        "pos_idx": idx,
        "tex_idx": idx,
        "normal_idx": idx,
    }


def test_coord_overflow_triangle_flagged_and_dropped():
    """Raster coords beyond EXACT_COORD_MAX would wrap the int32 edge
    products (the reference's f32 cross merely loses precision,
    scene.rs:174-197); we drop the triangle and raise coord_overflow."""
    from tiny_renderer_tpu.ops import mathlib as ml
    from tiny_renderer_tpu.ops.vertex import EXACT_COORD_MAX, triangle_setup

    geom = _overflow_geom()
    uni = ml.default_prepare(
        CFG,
        np.array([0, 0, 1], np.float32),
        np.array([0, 0, 1], np.float32),
        np.zeros(3, np.float32),
        np.array([0, 1, 0], np.float32),
        np,
    )
    setup = triangle_setup(geom, uni, CFG, cull=False, xp=np)
    assert np.abs(setup["rx"][1]).max() > EXACT_COORD_MAX
    assert bool(setup["coord_overflow"])
    assert bool(setup["valid"][0]) and not bool(setup["valid"][1])


def test_coord_overflow_int32_min_coords_flagged():
    """Coords at exactly the projection singularity (w'=0 -> inf ->
    INT32_MIN after the saturating cast) must also be caught: abs() of
    INT32_MIN wraps negative, so the envelope uses range compares."""
    from tiny_renderer_tpu.ops import mathlib as ml
    from tiny_renderer_tpu.ops.vertex import triangle_setup

    geom = _overflow_geom()
    geom["positions"][5, 2] = 6.0  # exactly w' = 0 -> raster coords inf
    uni = ml.default_prepare(
        CFG,
        np.array([0, 0, 1], np.float32),
        np.array([0, 0, 1], np.float32),
        np.zeros(3, np.float32),
        np.array([0, 1, 0], np.float32),
        np,
    )
    setup = triangle_setup(geom, uni, CFG, cull=False, xp=np)
    assert bool(setup["coord_overflow"])
    assert not bool(setup["valid"][1])


def test_coord_overflow_surfaced_in_frame_output():
    geom = jax.tree.map(jnp.asarray, _overflow_geom())
    tex = jax.tree.map(jnp.asarray, make_textures(16))
    fn = make_frame_fn("phong", CFG, backend="jnp")
    out = fn(
        geom, tex,
        jnp.asarray(np.array([0, 0, 1], np.float32)),
        jnp.asarray(np.array([0, 0, 1], np.float32)),
        jnp.zeros(3),
        jnp.asarray(np.array([0, 1, 0], np.float32)),
    )
    assert bool(np.asarray(out["overflow"]))
    assert np.asarray(out["frame"]).shape == (64, 64, 3)
