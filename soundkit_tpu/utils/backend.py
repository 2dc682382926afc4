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

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        # the image pins the axon TPU plugin (sitecustomize); when the
        # tunnel is down its init failure poisons devices("cpu") too.
        # Force the CPU platform and retry — host codecs must keep
        # working with no TPU at all.
        jax.config.update("jax_platforms", "cpu")
        return jax.devices("cpu")[0]


_JAX_READY = None


def jax_cpu_ready(timeout_s: float = 30.0) -> bool:
    """True once the in-process CPU backend is proven usable.

    jax init first touches the pinned axon TPU plugin, whose connect
    can HANG indefinitely when the shared tunnel is wedged — not just
    fail.  The probe runs on a daemon thread with a deadline; a
    process that can't get a backend in time treats jax as
    unavailable (cached) so jax-optional fast paths fall back to
    pure-numpy code instead of blocking decode for minutes."""
    global _JAX_READY
    if _JAX_READY is not None:
        return _JAX_READY
    import threading

    done: list = []

    def probe():
        try:
            cpu_device()
            done.append(True)
        except Exception:
            done.append(False)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    _JAX_READY = bool(done and done[0])
    return _JAX_READY


def host_jit(fn):
    """jit ``fn`` pinned to the host CPU backend."""
    import jax

    jitted = jax.jit(fn)

    def wrapper(*args, **kwargs):
        with jax.default_device(cpu_device()):
            return jitted(*args, **kwargs)

    return wrapper
