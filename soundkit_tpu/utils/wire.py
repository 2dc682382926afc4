"""Host->device wire-transfer helpers.

The axon tunnel has a hard bandwidth cliff: single transfers up to
~5 MB run at ~1.3 GB/s, but anything larger collapses to ~60 MB/s
(measured 2026-08-16: 4 MB -> 4.2 ms, 5.46 MB -> 50 ms, 6 MB ->
100 ms).  Packed wire buffers (aac ~10.6 KB/lane, mp3 similar) cross
the cliff around B=480, which is exactly the serving batch size — so
every packed transfer must be split into sub-cliff chunks and
re-assembled on device (one cheap HBM concat, ~us, vs a 10-20x
transfer penalty).

Role-equivalent of the reference's rtrb byte plumbing between pipeline
stages (soundkit-decoder/src/lib.rs:851-869) — the host->device feed
is our thread boundary.
"""
from __future__ import annotations

import os

import numpy as np

# Default stays well under the measured ~5.2 MB cliff so the split is
# robust to tunnel-side variance run to run.
WIRE_CHUNK_BYTES = int(os.environ.get("SKT_WIRE_CHUNK_BYTES", 3_500_000))

# d2h stalls at a lower threshold than h2d (~1-2 MB, CLAUDE.md).
D2H_CHUNK_BYTES = int(os.environ.get("SKT_D2H_CHUNK_BYTES", 1_000_000))


def to_device_chunked(buf: np.ndarray, chunk_bytes: int | None = None):
    """Transfer a 1-D uint8 wire buffer in sub-cliff chunks.

    Returns a single device array equal to ``jnp.asarray(buf)``.  Each
    chunk dispatches as its own async transfer (~90 us issue overhead
    each); the device-side concatenate is HBM-local and negligible.
    """
    import jax.numpy as jnp

    chunk = chunk_bytes or WIRE_CHUNK_BYTES
    n = buf.shape[0]
    if n <= chunk:
        return jnp.asarray(buf)
    k = -(-n // chunk)  # ceil
    # equal-sized chunks keep every transfer the same shape, so the
    # tunnel's per-shape staging buffers are reused across batches
    step = -(-n // k)
    parts = [jnp.asarray(buf[i : i + step]) for i in range(0, n, step)]
    return jnp.concatenate(parts)


def from_device_chunked(arr, chunk_bytes: int | None = None) -> np.ndarray:
    """Fetch a device array in sub-cliff chunks along axis 0.

    The d2h direction stalls even harder than h2d above ~1-2 MB
    (CLAUDE.md tunnel notes), so batched outputs ([B, ...] lanes) are
    sliced into lane-chunks that each stay under the cliff and fetched
    as separate transfers.
    """
    chunk = chunk_bytes or D2H_CHUNK_BYTES
    total = int(np.prod(arr.shape)) * arr.dtype.itemsize
    if total <= chunk or arr.shape[0] <= 1:
        return np.asarray(arr)
    per_row = max(total // arr.shape[0], 1)
    step = max(chunk // per_row, 1)
    parts = [
        np.asarray(arr[i : i + step]) for i in range(0, arr.shape[0], step)
    ]
    return np.concatenate(parts, axis=0)
