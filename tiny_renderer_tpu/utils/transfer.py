"""Device->host transfer helper.

The only per-frame host<->device traffic in this framework is the final u8
frame (SURVEY.md §5.8).  On a directly-attached TPU a 1.9 MB device_get is
microseconds.  Over the tunneled dev device the best strategy has FLIPPED
between rounds — both regimes measured with scripts/blit_probe.py:

* round 1: a single 1.9 MB transfer collapsed (~1.8 s) while ~128 KB
  chunks ran 42x faster — chunking was made the default;
* round 3: the same probe measures single 42 ms vs 128 KB chunks 889 ms
  (each chunk now pays a full tunnel round-trip; sweep: 16 KB 5105,
  64 KB 1451, 512 KB 552, single 42).

`fetch` therefore defaults to ONE transfer and keeps `max_chunk_bytes`
for environments (or future tunnel states) where bounded chunks win.
"""

from __future__ import annotations

import numpy as np

# None = single transfer (round-3 measurement); pass an int to chunk.
DEFAULT_CHUNK_BYTES = None


def fetch(array, max_chunk_bytes: int | None = DEFAULT_CHUNK_BYTES) -> np.ndarray:
    """Copy a device array to host, optionally chunking along axis 0."""
    if max_chunk_bytes is None:
        return np.asarray(array)
    shape = array.shape
    nbytes = int(np.prod(shape)) * array.dtype.itemsize
    if nbytes <= max_chunk_bytes or len(shape) == 0 or shape[0] <= 1:
        return np.asarray(array)
    row_bytes = max(1, nbytes // shape[0])
    rows = max(1, max_chunk_bytes // row_bytes)
    parts = [np.asarray(array[i : i + rows]) for i in range(0, shape[0], rows)]
    return np.concatenate(parts, axis=0)
