"""Long-running oracle-parity soak over random knob/scene/pose draws.

Reuses the fuzz suite's draw machinery (tests/test_fuzz_configs.py) but
over an arbitrary seed range — the fixed-seed fast tests sample the draw
space 3 ways; a soak samples it hundreds of ways.  Each iteration draws
a random valid RenderConfig, a random triangle soup, and a random
light/camera pose, renders through the REAL kernel path
(pallas_interpret) and the float64 oracle, and asserts the parity
contract (tie-flips <=1% of covered pixels; flagged-deterministic
coverage drop under tight span caps).

CPU-only (forces the cpu platform before any jax import — safe to run
during a tunnel outage).  On the first failure it prints a one-line
repro (seed + config) and exits 1; a clean run prints a summary line.

Usage: python scripts/fuzz_soak.py [first_seed] [n_seeds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _overflow_reason(geomj, cfg, pipeline, light, look_from, look_at, up):
    """Ground-truth reasons the overflow flag may be set for this draw:
    per-pass worst bbox span (tiles touched) beyond the caps, or a coord
    exactness trip.  Empty list = the flag would be spurious."""
    import jax.numpy as jnp
    import numpy as np

    from tiny_renderer_tpu.ops import mathlib as ml
    from tiny_renderer_tpu.ops.vertex import triangle_setup
    from tiny_renderer_tpu.pipelines.frame import PIPELINES

    spec = PIPELINES[pipeline]
    passes = []
    if spec.two_pass:
        u1 = ml.shadow_pass_1_prepare(cfg, light, look_at, up, jnp)
        u2 = ml.shadow_pass_2_prepare(cfg, light, look_from, look_at, up, jnp)
        u2["shadow_matrix"] = u1["shadow_matrix"]
        passes = [(u1, "shadow_matrix", False), (u2, "vpmv", True)]
    else:
        passes = [(
            ml.default_prepare(cfg, light, look_from, look_at, up, jnp),
            "vpmv", True,
        )]
    reasons = []
    for p, (uni, mk, cull) in enumerate(passes):
        setup = triangle_setup(
            geomj, uni, cfg, matrix_key=mk, cull=cull, needs=(), xp=jnp
        )
        if bool(np.asarray(setup["coord_overflow"])):
            reasons.append(f"pass{p} coord_overflow")
        v = np.asarray(setup["valid"])
        if v.any():
            sy = int(((np.asarray(setup["y1"])[v] // cfg.tile_h)
                      - (np.asarray(setup["y0"])[v] // cfg.tile_h)).max()) + 1
            sx = int(((np.asarray(setup["x1"])[v] // cfg.tile_w)
                      - (np.asarray(setup["x0"])[v] // cfg.tile_w)).max()) + 1
            if sy > cfg.max_span_y or sx > cfg.max_span_x:
                reasons.append(f"pass{p} span {sy}x{sx} tiles "
                               f"> caps {cfg.max_span_y}x{cfg.max_span_x}")
    return reasons


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from test_fuzz_configs import _random_config, _random_scene

    from tiny_renderer_tpu.models.procedural import make_textures
    from tiny_renderer_tpu.oracle import render_oracle
    from tiny_renderer_tpu.pipelines.frame import make_frame_fn

    first = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    pipelines = ["phong", "shadow", "occlusion", "darboux", "specular",
                 "normal_map", "default"]

    t0 = time.time()
    clamped = 0
    for i, seed in enumerate(range(first, first + count)):
        rng = np.random.default_rng(seed)
        pipeline = pipelines[seed % len(pipelines)]
        geom = _random_scene(100, seed)
        tex = make_textures(64)
        a, b = rng.uniform(-np.pi, np.pi, 2)
        light = np.array([np.sin(a), 0, np.cos(a)], np.float32)
        look_from = np.array([np.sin(b), 0, np.cos(b)], np.float32)
        look_at = np.zeros(3, np.float32)
        up = np.array([0, 1, 0], np.float32)
        cfg = _random_config(rng, 96, 96)
        repro = f"seed={seed} pipeline={pipeline} cfg={cfg}"

        try:
            fn = make_frame_fn(pipeline, cfg, backend="pallas_interpret")
            args = (
                jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
                jnp.asarray(light), jnp.asarray(look_from),
                jnp.asarray(look_at), jnp.asarray(up),
            )
            r = fn(*args)
            if bool(np.asarray(r["overflow"])):
                # The flag must have a ground-truth reason: a pass whose
                # worst bbox exceeds the span caps in TILES TOUCHED, or a
                # coord-exactness trip (computed from the actual setups,
                # not a cap heuristic — a cap of 4 at tile_h=8 is only
                # 32 px and can legitimately bind).
                reasons = _overflow_reason(
                    args[0], cfg, pipeline, *args[2:]
                )
                if not reasons:
                    print(f"FAIL spurious overflow (no reason found): {repro}")
                    return 1
                r2 = fn(*args)
                if not np.array_equal(np.asarray(r["frame"]),
                                      np.asarray(r2["frame"])):
                    print(f"FAIL nondeterministic clamped render: {repro}")
                    return 1
                clamped += 1
            else:
                o = render_oracle(geom, tex, light, look_from, look_at, up,
                                  pipeline=pipeline, config=cfg)
                mismatch = (
                    (np.asarray(r["frame"]) != o["frame"]).any(axis=-1).mean()
                )
                if mismatch > 0.01:
                    print(f"FAIL mismatch {mismatch:.3%}: {repro}")
                    return 1
                if seed % 5 == 0:
                    # Every 5th unclamped draw: the STRONGEST contract —
                    # the kernel path must be BIT-identical to the jnp
                    # backend under the same knob draw.  (Clamped draws
                    # are excluded: the jnp backend rasterizes densely
                    # with no binning caps, so a flagged coverage drop
                    # legitimately differs — soak seed 3020.)
                    rj = make_frame_fn(pipeline, cfg, backend="jnp")(*args)
                    if not np.array_equal(np.asarray(r["frame"]),
                                          np.asarray(rj["frame"])):
                        print(f"FAIL kernel!=jnp bit-identity: {repro}")
                        return 1
        except Exception as e:  # noqa: BLE001 — a soak must name its repro
            print(f"FAIL exception {e!r}: {repro}")
            raise

        if (i + 1) % 10 == 0:
            dt = time.time() - t0
            print(f"[soak] {i + 1}/{count} ok ({clamped} clamped) "
                  f"{dt / (i + 1):.1f} s/draw", flush=True)

    print(f"[soak] PASS: {count} draws (seeds {first}..{first + count - 1}), "
          f"{clamped} flagged-clamped, {time.time() - t0:.0f} s total")
    return 0


if __name__ == "__main__":
    sys.exit(main())
