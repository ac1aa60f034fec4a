"""Asset layer: TGA decode (vs PIL + native C++), OBJ parse (vs known counts).

Exit criteria from SURVEY.md §7 step 1: decoded textures/geometry match the
reference asset facts (§2.9): diablo 5022 tris / 2519 verts, african_head
2492 tris / 1258 verts, all maps 1024x1024 RLE TGA at 8/24/32 bpp.
"""

import os

import numpy as np
import pytest

from tiny_renderer_tpu.assets.obj import parse_obj
from tiny_renderer_tpu.assets.tga import read_tga
from tiny_renderer_tpu.assets import native

ASSET_ROOT = "/root/reference/assets"
ALL_TGAS = [
    os.path.join(ASSET_ROOT, model, name + ".tga")
    for model in ("diablo", "african_head")
    for name in ("texture", "normal_map", "normal_map_tangent", "specular_map")
]


@pytest.mark.parametrize("path", ALL_TGAS)
def test_tga_matches_pil(path):
    PIL = pytest.importorskip("PIL.Image")
    ours = read_tga(path)
    theirs = np.asarray(PIL.open(path).convert("RGB"))
    assert ours.shape == theirs.shape == (1024, 1024, 3)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("path", ALL_TGAS)
def test_native_loader_matches_numpy(path):
    if not native.native_available():
        pytest.skip("native loader not built")
    nat = native.read_tga_native(path)
    np.testing.assert_array_equal(nat, read_tga(path))


@pytest.mark.parametrize("asset", ["diablo", "african_head"])
def test_native_obj_matches_numpy(asset):
    if not native.native_available():
        pytest.skip("native loader not built")
    from tiny_renderer_tpu.assets.obj import read_obj

    p = os.path.join(ASSET_ROOT, asset, "model.obj")
    m_py = read_obj(p)
    m_c = native.read_obj_native(p)
    assert m_c is not None
    for field in ("positions", "tex_coords", "normals", "pos_idx", "tex_idx", "normal_idx"):
        np.testing.assert_array_equal(getattr(m_c, field), getattr(m_py, field), err_msg=field)


def test_obj_counts_diablo(diablo_model):
    mesh = diablo_model.mesh
    assert mesh.num_vertices == 2519
    assert mesh.num_triangles == 5022
    assert mesh.tex_coords.shape[0] == 3263
    assert mesh.normals.shape[0] == 2519


def test_obj_counts_head(head_model):
    mesh = head_model.mesh
    assert mesh.num_vertices == 1258
    assert mesh.num_triangles == 2492


def test_obj_parser_small():
    text = """
# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.0
vt 0.1 0.2
vt 0.3 0.4
vt 0.5 0.6
vn 0.0 0.0 1.0
f 1/1/1 2/2/1 3/3/1
"""
    mesh = parse_obj(text)
    assert mesh.num_triangles == 1
    np.testing.assert_array_equal(mesh.pos_idx, [[0, 1, 2]])
    np.testing.assert_array_equal(mesh.tex_idx, [[0, 1, 2]])
    np.testing.assert_array_equal(mesh.normal_idx, [[0, 0, 0]])
    np.testing.assert_allclose(mesh.tex_coords[1], [0.3, 0.4])


def test_obj_parser_rejects_non_ptn():
    # The reference panics on non-PTN polygons (src/scene.rs:218).
    with pytest.raises(ValueError, match="PTN"):
        parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")


def test_obj_quad_uses_first_three_corners():
    # Reference reads only indices[0..3] of each polygon (src/scene.rs:224-226).
    text = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vn 0 0 1
f 1/1/1 2/1/1 3/1/1 4/1/1
"""
    mesh = parse_obj(text)
    assert mesh.num_triangles == 1
    np.testing.assert_array_equal(mesh.pos_idx, [[0, 1, 2]])


def test_load_model_missing_files(tmp_path):
    from tiny_renderer_tpu import load_model

    with pytest.raises(FileNotFoundError, match="missing required files"):
        load_model(str(tmp_path))
