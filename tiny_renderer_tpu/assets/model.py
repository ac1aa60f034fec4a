"""Model bundle: geometry + the four texture maps.

Mirrors the reference's `Model` struct (reference: src/scene/util.rs:16-22),
which bundles the raw OBJ with texture / normal / tangent-normal / specular
RGB images, and the asset-directory layout required by the app
(src/app.rs:87-91, README.md:24-29): model.obj, texture.tga, normal_map.tga,
normal_map_tangent.tga, specular_map.tga.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from .obj import ObjMesh, read_obj
from .tga import read_tga

REQUIRED_FILES = (
    "model.obj",
    "texture.tga",
    "normal_map.tga",
    "normal_map_tangent.tga",
    "specular_map.tga",
)


@dataclasses.dataclass
class Model:
    mesh: ObjMesh
    texture: np.ndarray             # (Ht, Wt, 3) u8
    normal_map: np.ndarray          # (Hn, Wn, 3) u8
    normal_map_tangent: np.ndarray  # (Hnt, Wnt, 3) u8
    specular_map: np.ndarray        # (Hs, Ws, 3) u8

    @property
    def num_triangles(self) -> int:
        return self.mesh.num_triangles


def load_model(asset_path: str, verbose: bool = True) -> Model:
    """Load a model from an asset directory, validating the required file set.

    The reference surfaces missing files as raw io errors out of run()
    (src/app.rs:94-126); here we validate the full set up front with a real
    error message (SURVEY.md §5.3).
    """
    missing = [f for f in REQUIRED_FILES if not os.path.isfile(os.path.join(asset_path, f))]
    if missing:
        raise FileNotFoundError(
            f"asset directory {asset_path!r} is missing required files: {missing}; "
            f"expected the full set {list(REQUIRED_FILES)}"
        )

    # Prefer the native C++ loader when it is built; fall back to NumPy.
    from . import native

    obj_path = os.path.join(asset_path, "model.obj")
    if verbose:
        print(f"loading model from: {obj_path}")
    mesh = native.read_obj_native(obj_path)
    if mesh is None:
        mesh = read_obj(obj_path)
    if verbose:
        print(f"number of vertices in a model: {mesh.num_vertices}")
        print(f"number of polygons in a model: {mesh.num_triangles}")

    maps = {}
    for key in ("texture", "normal_map", "normal_map_tangent", "specular_map"):
        path = os.path.join(asset_path, f"{key}.tga")
        if verbose:
            print(f"loading {key.replace('_', ' ')} from: {path}")
        img = native.read_tga_native(path)
        if img is None:
            img = read_tga(path)
        maps[key] = img
        if verbose:
            h, w = img.shape[:2]
            print(f"dimensions of loaded {key.replace('_', ' ')} are: {w} x {h}")

    return Model(mesh=mesh, **maps)
