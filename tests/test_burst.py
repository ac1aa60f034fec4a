"""Burst (multi-frame single-dispatch) rendering API."""

import numpy as np
import jax
import jax.numpy as jnp

from tiny_renderer_tpu import RenderConfig
from tiny_renderer_tpu.pipelines.frame import make_burst_fn, make_frame_fn


def test_burst_matches_per_frame(head_scene_data):
    geom, tex = head_scene_data
    cfg = RenderConfig(width=64, height=64, tri_block=32)
    gj = jax.tree.map(jnp.asarray, geom)
    tj = jax.tree.map(jnp.asarray, tex)

    cams = np.array([0.1, 0.6], np.float32)
    lights = np.array([-0.2, 0.3], np.float32)
    burst = make_burst_fn("phong", cfg, backend="jnp", keep_frames=True)
    out = burst(gj, tj, jnp.asarray(cams), jnp.asarray(lights))
    frames = np.asarray(out["frames"])
    checks = np.asarray(out["checksums"])
    assert frames.shape == (2, 64, 64, 3)

    fn = make_frame_fn("phong", cfg, backend="jnp")
    look_at = jnp.zeros(3)
    up = jnp.asarray([0.0, 1.0, 0.0])
    for i in range(2):
        look_from = jnp.asarray(
            [np.sin(cams[i]), 0.0, np.cos(cams[i])], dtype=jnp.float32
        )
        light = jnp.asarray(
            [np.sin(lights[i]), 0.0, np.cos(lights[i])], dtype=jnp.float32
        )
        single = fn(gj, tj, light, look_from, look_at, up)
        np.testing.assert_array_equal(frames[i], np.asarray(single["frame"]))
        assert checks[i] == np.asarray(single["frame"]).astype(np.uint32).sum()
