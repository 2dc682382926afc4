"""Backend placement helpers.

The single-stream host streaming API (``G726Decoder`` etc.) must NOT
dispatch its small per-chunk scans to the TPU: under the axon tunnel
each dispatch is a network roundtrip, and a 127-byte chunk decode takes
longer than the audio lasts.  The TPU path is the *batched* decoder;
host streaming pins to the in-process CPU backend.
"""
from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def cpu_device():
    import jax

    return jax.devices("cpu")[0]


def host_jit(fn):
    """jit ``fn`` pinned to the host CPU backend."""
    import jax

    jitted = jax.jit(fn)

    def wrapper(*args, **kwargs):
        with jax.default_device(cpu_device()):
            return jitted(*args, **kwargs)

    return wrapper
