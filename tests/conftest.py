"""Test configuration: CPU backend with a virtual 8-device mesh.

Sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count=8); real-TPU behavior is covered by
bench.py and scripts/tpu_smoke.py on hardware.
"""

import os
import tempfile

# CLI tests exercise app.main(), which enables the persistent compilation
# cache by default — point it at a throwaway dir, never the user's real
# cache (even one they configured via this env var: the suite must not
# pollute it with tiny CPU-test entries).
os.environ["TINY_RENDERER_TPU_CACHE"] = tempfile.mkdtemp(
    prefix="trt_xla_cache_"
)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

ASSET_ROOT = "/root/reference/assets"


def geom_dict(mesh):
    return {
        "positions": mesh.positions,
        "tex_coords": mesh.tex_coords,
        "normals": mesh.normals,
        "pos_idx": mesh.pos_idx,
        "tex_idx": mesh.tex_idx,
        "normal_idx": mesh.normal_idx,
    }


def tex_dict(model):
    return {
        "texture": model.texture,
        "normal_map": model.normal_map,
        "normal_map_tangent": model.normal_map_tangent,
        "specular_map": model.specular_map,
    }


@pytest.fixture(scope="session")
def head_model():
    from tiny_renderer_tpu import load_model

    return load_model(os.path.join(ASSET_ROOT, "african_head"), verbose=False)


@pytest.fixture(scope="session")
def diablo_model():
    from tiny_renderer_tpu import load_model

    return load_model(os.path.join(ASSET_ROOT, "diablo"), verbose=False)


@pytest.fixture(scope="session")
def head_scene_data(head_model):
    return geom_dict(head_model.mesh), tex_dict(head_model)


@pytest.fixture(scope="session")
def diablo_scene_data(diablo_model):
    return geom_dict(diablo_model.mesh), tex_dict(diablo_model)


@pytest.fixture(scope="session")
def camera():
    light = np.array([0.35, 0.0, 0.94], np.float32)
    look_from = np.array([0.25, 0.0, 0.97], np.float32)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    return light, look_from, look_at, up


# Orbit-sweep poses (camera_deg, light_deg) for angle-parametrized parity:
# includes oblique/grazing light (the scripts/occlusion_locality.py stress
# angles are the camera values; grazing light exercises shadow-index
# saturation and off-axis occlusion probes).  The reference orbits both on
# the full unit XZ circle (src/app.rs:200-207), so any angle is in-spec.
ORBIT_POSES = (
    (0.0, 70.0),
    (25.0, -60.0),
    (80.0, 15.0),
    (160.0, 85.0),
    (245.0, -80.0),
)


def pose_camera(cam_deg, light_deg):
    """(light, look_from, look_at, up) from orbit angles in degrees
    (src/app.rs:200-207 parameterization)."""
    ca = np.deg2rad(np.float32(cam_deg))
    la = np.deg2rad(np.float32(light_deg))
    light = np.array([np.sin(la), 0.0, np.cos(la)], np.float32)
    look_from = np.array([np.sin(ca), 0.0, np.cos(ca)], np.float32)
    return light, look_from, np.zeros(3, np.float32), np.array([0.0, 1.0, 0.0], np.float32)
