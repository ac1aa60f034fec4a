"""Decompose the occlusion frame cost on the dev TPU.

Measures, via scan-marginals (dispatch latency cancels, inputs jittered):
  1. occlusion_coefficient alone on a 64k-fragment batch (the 17-gather core)
  2. the raw 17x64k gather floor (same rows, no coordinate math — isolates
     gather rows vs coordinate compute)
  3. the full occlusion frame

Usage: scripts/tpu_retry.sh /tmp/occp.log x python scripts/occlusion_probe.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)) * 2)
print("TUNNEL-LIVE", flush=True)

from tiny_renderer_tpu import RenderConfig, load_model
from tiny_renderer_tpu.ops import mathlib as ml
from tiny_renderer_tpu.pipelines import shaders
from tiny_renderer_tpu.pipelines.frame import render_frame


def marginal_ms(make_fn, k_small=4, k_big=16):
    f_small = jax.jit(make_fn(k_small))
    f_big = jax.jit(make_fn(k_big))

    def run(f, eps):
        np.asarray(f(jnp.float32(eps)))

    run(f_small, 0.017)
    run(f_big, 1.013)
    t0 = time.perf_counter(); run(f_small, 2.011); ts = time.perf_counter() - t0
    t0 = time.perf_counter(); run(f_big, 3.007); tb = time.perf_counter() - t0
    return (tb - ts) * 1e3 / (k_big - k_small)


def main():
    cfg = RenderConfig(width=800, height=800)
    model = load_model("/root/reference/assets/diablo", verbose=False)
    geom = {
        "positions": jnp.asarray(model.mesh.positions),
        "tex_coords": jnp.asarray(model.mesh.tex_coords),
        "normals": jnp.asarray(model.mesh.normals),
        "pos_idx": jnp.asarray(model.mesh.pos_idx),
        "tex_idx": jnp.asarray(model.mesh.tex_idx),
        "normal_idx": jnp.asarray(model.mesh.normal_idx),
    }
    tex = {k: jnp.asarray(getattr(model, k)) for k in
           ("texture", "normal_map", "normal_map_tangent", "specular_map")}
    rng = np.random.default_rng(0)
    shadow_buffer = jnp.asarray(
        rng.uniform(0, 255, size=(800, 800)).astype(np.float32)
    )
    CAP = 64_000
    xf0 = jnp.asarray(rng.uniform(0, 799, CAP).astype(np.float32))
    yf0 = jnp.asarray(rng.uniform(0, 799, CAP).astype(np.float32))
    zf0 = jnp.asarray(rng.uniform(0, 255, CAP).astype(np.float32))

    light = np.array([0.35, 0.0, 0.94], np.float32)
    look_from = np.array([0.25, 0.0, 0.97], np.float32)
    look_at = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    u1 = ml.shadow_pass_1_prepare(cfg, jnp.asarray(light), jnp.asarray(look_at), jnp.asarray(up), jnp)
    uniforms = ml.shadow_pass_2_prepare(
        cfg, jnp.asarray(light), jnp.asarray(look_from), jnp.asarray(look_at), jnp.asarray(up), jnp
    )
    uniforms["shadow_matrix"] = u1["shadow_matrix"]

    # 1. occlusion core on a 64k batch
    def core(k):
        def fn(eps):
            def body(acc, i):
                occ = shaders.occlusion_coefficient(
                    xf0 + eps + i.astype(jnp.float32) * 1e-3, yf0, zf0,
                    shadow_buffer, uniforms, cfg, jnp,
                )
                return acc + jnp.sum(occ), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return acc
        return fn

    print(f"occlusion core 64k frags: {marginal_ms(core):7.3f} ms "
          f"(x3 batches/frame typical)", flush=True)

    # 2. plain 17x64k gather (row-count floor for one batch)
    idx17 = jnp.asarray(rng.integers(0, 640_000, size=(17, CAP)).astype(np.int32))
    flatbuf = shadow_buffer.reshape(-1)

    def floor_fn(k):
        def fn(eps):
            def body(acc, i):
                g = flatbuf[(idx17 + i) % 640_000]
                return acc + jnp.sum(g) + eps, 0
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return acc
        return fn

    print(f"17x64k raw gather floor:  {marginal_ms(floor_fn):7.3f} ms", flush=True)

    # 3. full occlusion frame
    def frame_fn(k):
        def fn(eps):
            def body(acc, i):
                la = -0.6 + eps + i.astype(jnp.float32) * 1e-4
                lightv = jnp.stack([jnp.sin(la), jnp.float32(0), jnp.cos(la)])
                out = render_frame(
                    geom, tex, lightv, jnp.asarray(look_from),
                    jnp.asarray(look_at), jnp.asarray(up),
                    pipeline="occlusion", config=cfg, backend="pallas",
                )
                return acc + jnp.sum(out["frame"].astype(jnp.uint32)), 0
            acc, _ = jax.lax.scan(body, jnp.uint32(0), jnp.arange(k))
            return acc
        return fn

    print(f"full occlusion frame:     {marginal_ms(frame_fn, 2, 8):7.3f} ms", flush=True)
    print("PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()
