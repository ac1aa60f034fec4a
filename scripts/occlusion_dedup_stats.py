"""Dedup-factor measurement for the occlusion 17-sample gather (CPU).

VERDICT r2 #5: the 272 sample coords of a 16-px strip cluster heavily —
deduplicating identical flat shadow-map indices before the gather fetches
equal values and cannot change output.  Whether that pays depends on the
dedup factor (total / unique indices) at the granularity the gather
actually runs: one strip-shade batch (strip_batch strips x strip_len px
x 17 samples).  This script measures it over both assets and several
orbit angles, plus the factor at strip granularity.

Run headless on CPU: python scripts/occlusion_dedup_stats.py
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


def orbit(v, angle):
    c, s = np.cos(angle, dtype=np.float32), np.sin(angle, dtype=np.float32)
    x, y, z = v
    return np.array([c * x + s * z, y, -s * x + c * z], np.float32)


def batch_stats(asset, angle, cfg):
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

    fn = make_frame_fn("occlusion", cfg, backend="jnp")
    gj = {k: jnp.asarray(v) for k, v in geom.items()}
    tj = {k: jnp.asarray(v) for k, v in tex.items()}
    out = fn(gj, tj, jnp.asarray(light), jnp.asarray(look_from),
             jnp.asarray(look_at), jnp.asarray(up))
    z = np.asarray(out["z"])

    H, W = cfg.height, cfg.width
    SL, B = cfg.strip_len, cfg.strip_batch
    covered = z > ml.F32_MIN
    idx = np.where(covered, 1, -1)
    strips = idx.reshape(-1).reshape(-1, SL)
    cov_ids = np.nonzero(strips.max(axis=1) >= 0)[0]

    u = ml.shadow_pass_2_prepare(cfg, light, look_from, look_at, up, np)
    u1 = ml.shadow_pass_1_prepare(cfg, light, look_at, up, np)
    u["shadow_matrix"] = u1["shadow_matrix"]

    # Per covered strip batch (the gather's actual granularity): fraction
    # of unique flat indices among B*SL*17.
    tot, uniq, per_strip_tot, per_strip_uniq = 0, 0, 0, 0
    for b0 in range(0, len(cov_ids), B):
        ids = cov_ids[b0 : b0 + B]
        base = ids[:, None] * SL + np.arange(SL)[None, :]
        py, px = base // W, base % W
        zf = z[py, px]
        # Mirror the strip shade: uncovered pixels inside covered strips
        # still gather (their idx row is the clamped safe row) — count them.
        sxs, sys_ = shaders.occlusion_sample_coords(
            px.astype(np.float32), py.astype(np.float32), zf, u, cfg, np
        )
        flat = shaders.shadow_flat_indices(sxs, sys_, (H, W), W, np)
        tot += flat.size
        uniq += np.unique(flat).size
        for srow in range(flat.shape[1]):
            per_strip_tot += flat[:, srow].size
            per_strip_uniq += np.unique(flat[:, srow]).size
    return tot, uniq, per_strip_tot, per_strip_uniq, len(cov_ids)


def main():
    cfg = RenderConfig(width=800, height=800)
    for asset in ("/root/reference/assets/diablo",
                  "/root/reference/assets/african_head"):
        for deg in (0, 80, 245):
            t, q, pt, pq, ns = batch_stats(
                asset, np.float32(np.deg2rad(deg)), cfg
            )
            name = os.path.basename(asset)
            print(
                f"{name:13s} {deg:3d}deg strips={ns:6d} "
                f"batch-dedup {t}/{q} = {t / max(q,1):.2f}x  "
                f"strip-dedup {pt}/{pq} = {pt / max(pq,1):.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
