"""Strip coverage waste vs strip_len, measured on CPU (no TPU needed).

The compact shade processes covered strip_len-px strips, so fragments =
covered_strips x strip_len >= covered pixels; the excess is pure gather-row
waste.  This measures the camera-pass idx plane (the plane the shade runs
on for every pipeline) at 800x800 diablo over 5 orbit angles and reports
fragments per strip_len — the CPU prediction feeding the SL sweep variants
in scripts/knob_sweep.py (BASELINE.md round-3-continued).

Usage: python scripts/strip_waste.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tiny_renderer_tpu import RenderConfig, load_model
from tiny_renderer_tpu.ops import mathlib as ml
from tiny_renderer_tpu.ops.raster_jnp import rasterize_jnp
from tiny_renderer_tpu.ops.vertex import triangle_setup


def main():
    cfg = RenderConfig()
    model = load_model("/root/reference/assets/diablo", verbose=False)
    geom = {
        "positions": jnp.asarray(model.mesh.positions),
        "tex_coords": jnp.asarray(model.mesh.tex_coords),
        "normals": jnp.asarray(model.mesh.normals),
        "pos_idx": jnp.asarray(model.mesh.pos_idx),
        "tex_idx": jnp.asarray(model.mesh.tex_idx),
        "normal_idx": jnp.asarray(model.mesh.normal_idx),
    }
    look_at = jnp.zeros((3,), jnp.float32)
    up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    light = jnp.asarray([0.2, 0.0, 0.98], jnp.float32)

    H, W = cfg.height, cfg.width
    lens = (4, 8, 16)
    totals = {L: 0 for L in lens}
    covered_total = 0
    angles = [0.0, 0.44, 1.4, 2.8, 4.2]
    for ca in angles:
        look_from = jnp.asarray([np.sin(ca), 0.0, np.cos(ca)], jnp.float32)
        uniforms = ml.shadow_pass_2_prepare(cfg, light, look_from, look_at, up, jnp)
        setup = triangle_setup(geom, uniforms, cfg, needs=(), xp=jnp)
        _, idx = rasterize_jnp(setup, H, W, cfg.tri_block)
        covered = np.asarray(idx) >= 0
        npix = int(covered.sum())
        covered_total += npix
        line = [f"angle {ca:4.2f}: covered {npix/1e3:7.1f}k px"]
        for L in lens:
            strips = covered.reshape(H, W // L, L).any(axis=-1)
            frags = int(strips.sum()) * L
            totals[L] += frags
            line.append(f"SL{L} {frags/1e3:7.1f}k ({frags/npix-1:+6.1%})")
        print("  ".join(line), flush=True)
    print("--- 5-angle totals ---")
    for L in lens:
        print(
            f"SL{L:2d}: fragments {totals[L]/1e3:8.1f}k  "
            f"waste {totals[L]/covered_total-1:+6.1%}"
        )


if __name__ == "__main__":
    main()
