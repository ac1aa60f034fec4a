"""On-TPU per-stage breakdown for the bench configs (VERDICT r1 item 2/7).

Usage: scripts/tpu_retry.sh /tmp/stages.log x python scripts/stage_probe.py [pipeline ...]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)) * 2)
print("TUNNEL-LIVE", flush=True)

from tiny_renderer_tpu import RenderConfig, Scene, load_model
from tiny_renderer_tpu.pipelines.profile import print_stage_breakdown


def main():
    pipelines = sys.argv[1:] or ["shadow", "occlusion"]
    model = load_model("/root/reference/assets/diablo", verbose=False)
    for pipeline in pipelines:
        config = RenderConfig(width=800, height=800)
        scene = Scene(model, pipeline, config, backend="pallas")
        print(f"=== diablo {pipeline} 800x800 (pallas) ===", flush=True)
        print_stage_breakdown(scene, iters=24)
        sys.stdout.flush()
    print("PROBE-DONE", flush=True)


if __name__ == "__main__":
    main()
