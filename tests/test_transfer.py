"""Chunked device->host transfer helper."""

import numpy as np
import jax.numpy as jnp

from tiny_renderer_tpu.utils.transfer import fetch


def test_fetch_small_passthrough():
    x = jnp.arange(100, dtype=jnp.int32)
    np.testing.assert_array_equal(fetch(x), np.arange(100, dtype=np.int32))


def test_fetch_chunked_equals_direct():
    x = jnp.arange(800 * 800 * 3, dtype=jnp.int32).astype(jnp.uint8).reshape(800, 800, 3)
    np.testing.assert_array_equal(fetch(x, max_chunk_bytes=1 << 17), np.asarray(x))


def test_fetch_chunk_bigger_than_array():
    x = jnp.ones((4, 4), jnp.float32)
    np.testing.assert_array_equal(fetch(x, max_chunk_bytes=1), np.ones((4, 4), np.float32))
