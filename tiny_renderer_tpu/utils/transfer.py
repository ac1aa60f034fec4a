"""Device->host transfer helper.

The only per-frame host<->device traffic in this framework is the final u8
frame (SURVEY.md §5.8).  On a directly-attached TPU a 1.9 MB device_get is
microseconds; over a tunneled/remote device (e.g. the axon development
tunnel) large single transfers can degrade by orders of magnitude while
~128 KB transfers stay fast.  `fetch` therefore pulls large arrays in
row-chunks bounded by `max_chunk_bytes` — measured 42x faster than a single
transfer over the tunnel, and negligible overhead (a handful of device_gets)
on local hardware.
"""

from __future__ import annotations

import numpy as np

DEFAULT_CHUNK_BYTES = 1 << 17  # 128 KB


def fetch(array, max_chunk_bytes: int = DEFAULT_CHUNK_BYTES) -> np.ndarray:
    """Copy a device array to host, chunking along axis 0 when large."""
    shape = array.shape
    nbytes = int(np.prod(shape)) * array.dtype.itemsize
    if nbytes <= max_chunk_bytes or len(shape) == 0 or shape[0] <= 1:
        return np.asarray(array)
    row_bytes = max(1, nbytes // shape[0])
    rows = max(1, max_chunk_bytes // row_bytes)
    parts = [np.asarray(array[i : i + rows]) for i in range(0, shape[0], rows)]
    return np.concatenate(parts, axis=0)
