"""Full-resolution (800x800) golden parity vs the oracle.

Slow (~1 min per config on CPU): run explicitly with
    python -m pytest tests/test_fullsize_parity.py -m slow -q
Skipped by default; the 160x160 parity suite covers the same code paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tiny_renderer_tpu import RenderConfig
from tiny_renderer_tpu.oracle import render_oracle
from tiny_renderer_tpu.pipelines.frame import make_frame_fn

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("pipeline", ["phong", "shadow"])
def test_fullsize_diablo(diablo_scene_data, camera, pipeline):
    geom, tex = diablo_scene_data
    light, look_from, look_at, up = camera
    cfg = RenderConfig(width=800, height=800, tri_block=64)
    o = render_oracle(geom, tex, light, look_from, look_at, up,
                      pipeline=pipeline, config=cfg)
    fn = make_frame_fn(pipeline, cfg, backend="jnp")
    r = fn(jax.tree.map(jnp.asarray, geom), jax.tree.map(jnp.asarray, tex),
           jnp.asarray(light), jnp.asarray(look_from), jnp.asarray(look_at),
           jnp.asarray(up))
    frame = np.asarray(r["frame"])
    mismatch = (frame != o["frame"]).any(axis=-1).mean()
    assert mismatch <= 0.003, f"{pipeline}: 800x800 mismatch {mismatch:.4%}"
