"""Registering a custom shader pipeline.

The built-in 7 pipelines mirror the reference (shader.rs:100-109); this
example adds an 8th — a toon/cel shader that quantizes the Gouraud
intensity into bands — without touching the framework's internals.  The
registered name works with Scene, render_frame/render_burst on every
backend, the sharded multi-device paths, the CLI (when registered before
build_arg_parser), and the CPU oracle, so `python -m pytest` parity
machinery applies to YOUR shader too.

Run:  python examples/custom_pipeline.py [asset_dir] [out.png]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def shade_toon(frag, uniforms, textures, config, xp):
    """Cel shading: texture color scaled by intensity snapped to 4 bands.

    The shared shade signature: frag carries the varyings declared at
    registration ("uv" arrives pre-resolved for sample_frag, "intensity"
    per fragment) plus "x"/"y"; xp is jnp on device and np in the oracle,
    so one function serves both.
    """
    from tiny_renderer_tpu.ops import mathlib as ml
    from tiny_renderer_tpu.pipelines.shaders import BLACK, sample_frag

    color = sample_frag(textures, frag, ("texture",), xp)["texture"]
    bands = xp.float32(4.0)
    t = xp.ceil(xp.clip(frag["intensity"], 0.0, 1.0) * bands) / bands
    return ml.color_blend(color, xp.asarray(BLACK), t, xp)


def main():
    import jax.numpy as jnp

    from tiny_renderer_tpu import Scene, load_model, register_pipeline

    register_pipeline(
        "toon",
        shade_toon,
        varying_spec=(("uv", 2, "interp"), ("intensity", 1, "interp")),
        maps=("texture",),
        needs=("vertex_intensity",),
    )

    asset = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assets/diablo"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/toon.png"
    scene = Scene(load_model(asset), "toon")
    scene.set_light_direction(jnp.asarray([0.35, 0.0, 0.94], jnp.float32))
    scene.render()
    frame = scene.get_frame_buffer()

    from tiny_renderer_tpu.utils.png import write_png

    write_png(out, frame)
    print(f"wrote {out} ({frame.shape[1]}x{frame.shape[0]})")


if __name__ == "__main__":
    main()
