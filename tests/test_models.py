"""Procedural model family tests + renders through the full pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from tiny_renderer_tpu import RenderConfig
from tiny_renderer_tpu.models import make_cube, make_plane, make_uv_sphere, to_geom
from tiny_renderer_tpu.models.procedural import make_textures
from tiny_renderer_tpu.oracle import render_oracle
from tiny_renderer_tpu.pipelines.frame import make_frame_fn


def test_mesh_contracts():
    for mesh in (make_plane(), make_cube(), make_uv_sphere(stacks=6, slices=8)):
        assert mesh.positions.dtype == np.float32
        assert mesh.pos_idx.shape == mesh.tex_idx.shape == mesh.normal_idx.shape
        assert mesh.pos_idx.max() < mesh.positions.shape[0]
        assert mesh.tex_idx.max() < mesh.tex_coords.shape[0]
        assert mesh.normal_idx.max() < mesh.normals.shape[0]
        # inside the unit sphere (fits the reference's orbit camera)
        assert np.linalg.norm(mesh.positions, axis=1).max() <= 1.0


def test_sphere_renders_and_matches_oracle(camera):
    light, look_from, look_at, up = camera
    mesh = make_uv_sphere(stacks=10, slices=16)
    geom = to_geom(mesh)
    tex = make_textures(64)
    cfg = RenderConfig(width=96, height=96, tri_block=32)
    o = render_oracle(geom, tex, light, look_from, look_at, up,
                      pipeline="phong", config=cfg)
    fn = make_frame_fn("phong", cfg, backend="jnp")
    r = fn(jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
           jnp.asarray(light), jnp.asarray(look_from), jnp.asarray(look_at),
           jnp.asarray(up))
    frame = np.asarray(r["frame"])
    assert frame.any()
    mismatch = (frame != o["frame"]).any(axis=-1).mean()
    assert mismatch < 0.005


def test_cube_backface_culling(camera):
    """At most half the cube faces can be visible."""
    light, look_from, look_at, up = camera
    geom = to_geom(make_cube())
    tex = make_textures(32)
    cfg = RenderConfig(width=64, height=64, tri_block=16)
    fn = make_frame_fn("default", cfg, backend="jnp")
    r = fn(jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
           jnp.asarray(light), jnp.asarray(look_from), jnp.asarray(look_at),
           jnp.asarray(up))
    assert np.asarray(r["frame"]).any()
