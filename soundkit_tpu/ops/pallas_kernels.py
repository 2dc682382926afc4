"""Pallas TPU kernels for the hot device ops.

Two kernels, each a fused version of a north-star inner loop:

- ``g711_decode_pallas``: branch-free mu/A-law companding decode,
  tiled ``[lanes, samples]`` in VMEM (VPU elementwise).
- ``imdct_window_pallas``: the AAC long-window synthesis hot path —
  ``z = (coef @ M^T) * window`` fused in one VMEM pass per lane tile:
  the [1024 -> 2048] IMDCT matmul hits the MXU and the window multiply
  is fused before writeback (saves one HBM round trip of the
  [lanes, 2048] intermediate vs the XLA pair).

On CPU (tests) the kernels run in interpreter mode; on TPU they
compile via Mosaic.

Measured on v5e (2026-08-16, 50-iter steady state):
  g711  pallas 90us  vs XLA 35us   (1024x8192 codes)
  imdct pallas 1.83ms vs XLA 0.77ms (2048 lanes; 11.2 TFLOP/s XLA)
XLA's automatic fusion + matmul pipelining wins for both (this tiling
does not double-buffer), so ``ops.aac_batch`` keeps the plain-XLA path
as the default; these kernels are the starting point for hand-tuned
variants (pipelined DMA, bf16 MXU) in later rounds.
"""
from __future__ import annotations

import functools

import numpy as np


def _interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# G.711 companding
# ---------------------------------------------------------------------------

def _g711_kernel(codes_ref, is_alaw_ref, out_ref):
    import jax.numpy as jnp

    s_mu = 255 - codes_ref[:]
    mag_mu = ((s_mu & 0x0F) << 3) + 0x84
    mag_mu = mag_mu << ((s_mu & 0x70) >> 4)
    mu = jnp.where((s_mu & 0x80) != 0, 0x84 - mag_mu, mag_mu - 0x84)

    s_al = codes_ref[:] ^ 0x55
    seg = (s_al & 0x70) >> 4
    mag_al = (s_al & 0x0F) << 4
    mag_al = jnp.where(seg == 0, mag_al + 8, (mag_al + 0x108) << jnp.maximum(seg - 1, 0))
    al = jnp.where((s_al & 0x80) != 0, mag_al, -mag_al)

    out_ref[:] = jnp.where(is_alaw_ref[:] != 0, al, mu).astype(jnp.int16)


def g711_decode_pallas(codes, is_alaw, tile_lanes: int = 8, tile_n: int = 512):
    """codes int32 [B, N], is_alaw int32 [B, 1] -> int16 [B, N]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = codes.shape
    grid = (-(-B // tile_lanes), -(-N // tile_n))
    return pl.pallas_call(
        _g711_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_lanes, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lanes, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_lanes, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(codes, is_alaw)


# ---------------------------------------------------------------------------
# fused IMDCT + window
# ---------------------------------------------------------------------------

def _imdct_kernel(coef_ref, m_ref, win_ref, out_ref):
    import jax.numpy as jnp

    z = jnp.dot(coef_ref[:], m_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = z * win_ref[:]


def imdct_window_pallas(coef, m_t, window, tile_lanes: int = 8):
    """coef [L, K] f32, m_t [K, 2K] (IMDCT matrix transposed),
    window [L, 2K] -> windowed z [L, 2K]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, K = coef.shape
    N = m_t.shape[1]
    grid = (-(-L // tile_lanes),)
    return pl.pallas_call(
        _imdct_kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_lanes, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lanes, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_lanes, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(coef, m_t, window)
