"""Multi-device (sharded) rendering.

Renders one full frame with the screen rows sharded across a
jax.sharding.Mesh — the scale-out path for resolutions/scenes beyond one
chip (docs/API.md "Multi-chip"; the sharded output is bit-identical to
single-device, pinned by tests/test_parallel.py).  On real hardware the
mesh axes map onto the ICI fabric; here the script self-bootstraps 8
virtual CPU devices so it runs anywhere (same technique as the driver's
dryrun — the XLA flag must be set before the backend initializes).

Run:  python examples/sharded_render.py [asset_dir] [out.png] [--replicate-pass1]
      python examples/sharded_render.py [asset_dir] [out.png] --pipelined
        (--pipelined: a 3-frame orbit through render_sequence_pipelined —
         two-pass pipeline parallelism on a ("stage", "rows") mesh; writes
         out.png per frame with a -N suffix)
      --size N renders NxN instead of the reference's 800x800 (the frame
      height must stay divisible by the mesh's row axis).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_DEVICES = 8

os.environ["XLA_FLAGS"] = (
    " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    + f" --xla_force_host_platform_device_count={N_DEVICES}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from tiny_renderer_tpu import RenderConfig, load_model
    from tiny_renderer_tpu.ops.vertex import expand_geometry
    from tiny_renderer_tpu.parallel.sharding import (
        make_row_mesh,
        render_frame_sharded,
    )

    argv = list(sys.argv[1:])
    size = 800
    if "--size" in argv:
        i = argv.index("--size")
        if i + 1 >= len(argv):
            sys.exit("--size needs a value, e.g. --size 400")
        try:
            size = int(argv[i + 1])
        except ValueError:
            sys.exit(f"--size must be an integer, got {argv[i + 1]!r}")
        if size <= 0 or size % N_DEVICES != 0:
            sys.exit(
                f"--size must be a positive multiple of the mesh's row "
                f"axis ({N_DEVICES}), got {size}"
            )
        del argv[i:i + 2]
    # --replicate-pass1: full-height per-device light pass instead of the
    # all_gather'ed shadow map (the ICI-vs-FLOPs knob; output identical).
    replicate = "--replicate-pass1" in argv
    # --pipelined: render a short orbit through the two-pass pipeline-
    # parallel path (("stage", "rows") mesh, ppermute shadow handoff).
    pipelined = "--pipelined" in argv
    if replicate and pipelined:
        sys.exit(
            "--replicate-pass1 and --pipelined are mutually exclusive "
            "(replicate_pass1 is a pass-1 strategy; the pipelined path "
            "splits the passes across mesh stages instead)"
        )
    argv = [a for a in argv if a not in ("--replicate-pass1", "--pipelined")]
    asset = argv[0] if len(argv) > 0 else "/root/reference/assets/diablo"
    out = argv[1] if len(argv) > 1 else "/tmp/sharded.png"

    model = load_model(asset)
    geom = expand_geometry({
        "positions": jnp.asarray(model.mesh.positions),
        "tex_coords": jnp.asarray(model.mesh.tex_coords),
        "normals": jnp.asarray(model.mesh.normals),
        "pos_idx": jnp.asarray(model.mesh.pos_idx),
        "tex_idx": jnp.asarray(model.mesh.tex_idx),
        "normal_idx": jnp.asarray(model.mesh.normal_idx),
    })
    tex = {
        "texture": jnp.asarray(model.texture),
        "normal_map": jnp.asarray(model.normal_map),
        "normal_map_tangent": jnp.asarray(model.normal_map_tangent),
        "specular_map": jnp.asarray(model.specular_map),
    }

    look_at = jnp.zeros(3, jnp.float32)
    up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)

    from tiny_renderer_tpu.utils.png import write_png

    if pipelined:
        from tiny_renderer_tpu.parallel import (
            make_pp_mesh,
            render_sequence_pipelined,
        )

        mesh = make_pp_mesh(jax.devices()[:N_DEVICES])
        print(f"pp mesh: {dict(mesh.shape)} over {N_DEVICES} devices")
        cfg = RenderConfig(width=size, height=size)
        B = 3
        angles = np.linspace(0.0, 0.9, B, dtype=np.float32)
        lights = jnp.asarray(np.stack(
            [[np.sin(a + 0.35), 0.0, np.cos(a + 0.35)] for a in angles],
            dtype=np.float32))
        froms = jnp.asarray(np.stack(
            [[np.sin(a + 0.25), 0.0, np.cos(a + 0.25)] for a in angles],
            dtype=np.float32))
        result = render_sequence_pipelined(
            geom, tex, lights, froms, look_at, up,
            pipeline="shadow", config=cfg, mesh=mesh,
        )
        base, ext = os.path.splitext(out)
        for i in range(B):
            frame = np.asarray(result["frame"][i])[::-1]  # presentation flip
            write_png(f"{base}-{i}{ext}", frame)
            print(f"wrote {base}-{i}{ext}")
        print(f"overflow={np.asarray(result['overflow']).tolist()}")
        return

    mesh = make_row_mesh(jax.devices()[:N_DEVICES], batch=1)
    print(f"mesh: {dict(mesh.shape)} over {N_DEVICES} devices")
    cfg = RenderConfig(width=size, height=size, replicate_pass1=replicate)
    result = render_frame_sharded(
        geom, tex,
        jnp.asarray([0.35, 0.0, 0.94], jnp.float32),   # light
        jnp.asarray([0.25, 0.0, 0.97], jnp.float32),   # look_from
        look_at, up,
        pipeline="shadow", config=cfg, mesh=mesh,
    )
    frame = np.asarray(result["frame"])[::-1]  # presentation flip

    write_png(out, frame)
    print(f"wrote {out} ({frame.shape[1]}x{frame.shape[0]}, "
          f"overflow={bool(np.asarray(result['overflow']).any())})")


if __name__ == "__main__":
    main()
