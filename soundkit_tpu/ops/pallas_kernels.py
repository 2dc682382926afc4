"""Pallas TPU kernels for the hot device ops.

Three kernels, each a fused version of a north-star inner loop:

- ``g711_decode_pallas``: branch-free mu/A-law companding decode,
  tiled ``[lanes, samples]`` in VMEM (VPU elementwise).
- ``imdct_window_pallas``: ``z = (coef @ M^T) * window`` fused per
  lane tile (round-1 shape, kept for comparison).
- ``aac_dequant_imdct_window_pallas``: the full AAC long-window
  synthesis producer chain — int dequant (sign|q|^4/3 * scale) fused
  into the [1024 -> 2048] IMDCT matmul epilogue plus the window
  multiply, tiled (128 rows x 512 cols) with the IMDCT matrix column
  block resident in VMEM.

On CPU (tests) the kernels run in interpreter mode; on TPU they
compile via Mosaic.

Measured on v5e (see docs/DEVICE_KERNELS.md for the full analysis):
  round 1 (8-row tiles): g711 90us vs XLA 35us; imdct 1.83ms vs 0.77ms
  round 2 (tuned tiles, 2048x1024x2048 fused dequant+IMDCT+window):
    XLA fused          0.029 ms  (291 TFLOP/s -- MXU roofline)
    pallas 128x512     0.030 ms  (288 TFLOP/s -- ties)
    pallas 256x512     1.10  ms  (Mosaic pipelining falls over)
XLA reaches the matmul roofline on this op; the best hand tiling TIES
it and every other loses, so the production paths (ops/aac_batch.py)
formally stay XLA-first (north star re-baselined; docs/DEVICE_KERNELS.md).
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


# ---------------------------------------------------------------------------
# fused dequant + IMDCT + window (round-2 tuned tiling)
# ---------------------------------------------------------------------------

def _dequant_imdct_kernel(q_ref, s_ref, m_ref, w_ref, o_ref):
    import jax.numpy as jnp

    q = q_ref[:].astype(jnp.float32)
    coef = jnp.sign(q) * jnp.abs(q) ** (4.0 / 3.0) * s_ref[:]
    o_ref[:] = (
        jnp.dot(coef, m_ref[:], preferred_element_type=jnp.float32) * w_ref[:]
    )


def aac_dequant_imdct_window_pallas(quant, scale, m_t, window,
                                    tile_l: int = 128, tile_n: int = 512):
    """quant i32 [L, K], scale f32 [L, K], m_t [K, N] (IMDCT matrix
    transposed), window [L, N] -> windowed time frames [L, N].

    The AAC long-window synthesis producer chain in one kernel; ties
    XLA's fused roofline at the default tiling (docs/DEVICE_KERNELS.md)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, K = quant.shape
    N = m_t.shape[1]
    grid = (-(-L // tile_l), -(-N // tile_n))
    return pl.pallas_call(
        _dequant_imdct_kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_l, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_l, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(quant, scale, m_t, window)
