"""Drive the CLI app under the tpu_retry.sh supervisor.

The app itself performs its first device op deep inside the first frame,
long after JAX init — too late for the wrapper's TUNNEL-LIVE watchdog.
This shim does the trivial device op first (the op that wedges on a dead
axon tunnel), prints the sentinel, then hands argv to the real app main.

Usage: scripts/tpu_retry.sh /tmp/drive.log x python scripts/app_drive.py \
           -p /root/reference/assets/diablo -s shadow --frames 10 --orbit \
           --save /tmp/out.png
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((8, 128)) * 2)
    print("TUNNEL-LIVE", flush=True)

    from tiny_renderer_tpu.app import main as app_main

    return app_main(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
