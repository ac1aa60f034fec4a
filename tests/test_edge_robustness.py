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
