"""Measure the spatial locality of occlusion's 17 shadow-buffer samples.

The planned Pallas stencil-fetch kernel extracts all 17 samples of every
fragment in a 16-px strip from ONE (WIN_H x 128) window of the VMEM-resident
shadow map (64-aligned x0).  That is exact iff per strip:

    rspan = max(r) - min(r) <= WIN_H - 1   and   cspan = max(c) - min(c) <= 64

where (r, c) = divmod(flat, W) of the clamped flat indices the reference
fetch computes (shaders.shadow_flat_indices).  This probe renders real
occlusion frames on CPU and reports the span distribution per strip, so
WIN_H and the fallback rate are measured, not guessed.

Usage: python scripts/occlusion_locality.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tiny_renderer_tpu import RenderConfig, load_model
from tiny_renderer_tpu.ops import mathlib as ml
from tiny_renderer_tpu.pipelines import shaders
from tiny_renderer_tpu.pipelines.frame import make_frame_fn


def orbit(look_from, angle):
    c, s = np.cos(angle, dtype=np.float32), np.sin(angle, dtype=np.float32)
    x, y, z = look_from
    return np.array([c * x + s * z, y, -s * x + c * z], np.float32)


def strip_spans(asset, angle, cfg):
    model = load_model(asset, verbose=False)
    geom = {
        "positions": model.mesh.positions,
        "tex_coords": model.mesh.tex_coords,
        "normals": model.mesh.normals,
        "pos_idx": model.mesh.pos_idx,
        "tex_idx": model.mesh.tex_idx,
        "normal_idx": model.mesh.normal_idx,
    }
    tex = {
        "texture": model.texture,
        "normal_map": model.normal_map,
        "normal_map_tangent": model.normal_map_tangent,
        "specular_map": model.specular_map,
    }
    light = np.array([0.35, 0.0, 0.94], np.float32)
    look_from = orbit(np.array([0.25, 0.0, 0.97], np.float32), angle)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)

    fn = make_frame_fn("occlusion", cfg)
    gj = {k: jnp.asarray(v) for k, v in geom.items()}
    tj = {k: jnp.asarray(v) for k, v in tex.items()}
    out = fn(gj, tj, jnp.asarray(light), jnp.asarray(look_from),
             jnp.asarray(look_at), jnp.asarray(up))
    z = np.asarray(out["z"])

    H, W = cfg.height, cfg.width
    covered = z > ml.F32_MIN
    py, px = np.nonzero(covered)
    zfrag = z[py, px]

    u = ml.shadow_pass_2_prepare(cfg, light, look_from, look_at, up, np)
    u1 = ml.shadow_pass_1_prepare(cfg, light, look_at, up, np)
    u["shadow_matrix"] = u1["shadow_matrix"]
    sxs, sys_ = shaders.occlusion_sample_coords(
        px.astype(np.float32), py.astype(np.float32), zfrag, u, cfg, np
    )
    flat = shaders.shadow_flat_indices(sxs, sys_, (H, W), W, np)  # (17, N)
    r, c = flat // W, flat % W

    sid = (py * W + px) // 16
    nstrips = H * W // 16
    rmin = np.full(nstrips, 10**9); rmax = np.full(nstrips, -1)
    cmin = np.full(nstrips, 10**9); cmax = np.full(nstrips, -1)
    for k in range(r.shape[0]):
        np.minimum.at(rmin, sid, r[k]); np.maximum.at(rmax, sid, r[k])
        np.minimum.at(cmin, sid, c[k]); np.maximum.at(cmax, sid, c[k])
    used = rmax >= 0
    return (rmax - rmin)[used], (cmax - cmin)[used]


def main():
    cfg = RenderConfig(width=800, height=800)
    for asset in ("/root/reference/assets/diablo",
                  "/root/reference/assets/african_head"):
        for deg in (0, 25, 80, 160, 245):
            rs, cs = strip_spans(asset, np.float32(np.deg2rad(deg)), cfg)
            n = len(rs)
            name = os.path.basename(asset)
            print(
                f"{name:13s} {deg:3d}deg strips={n:6d} "
                f"rspan max={rs.max():3d} p99.9={np.percentile(rs, 99.9):5.1f} "
                f"cspan max={cs.max():3d} p99.9={np.percentile(cs, 99.9):5.1f} "
                f"viol(WIN_H=40,c<=64): {np.mean((rs > 39) | (cs > 64)):.5%} "
                f"viol(WIN_H=48,c<=64): {np.mean((rs > 47) | (cs > 64)):.5%}",
                flush=True,
            )


if __name__ == "__main__":
    main()
