"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from soundkit_tpu.ops import companding
from soundkit_tpu.ops import pallas_kernels as pk
from soundkit_tpu.ops.aac_dsp import half_window, imdct_matrix


def test_g711_pallas_matches_vector_ops():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 256, size=(16, 1024), dtype=np.int32)
    is_alaw = (np.arange(16) % 2).astype(np.int32)[:, None]
    out = np.asarray(pk.g711_decode_pallas(jnp.asarray(codes), jnp.asarray(is_alaw)))
    ref = np.where(
        is_alaw.astype(bool),
        companding.decode_alaw_np(codes.astype(np.uint8)),
        companding.decode_mulaw_np(codes.astype(np.uint8)),
    )
    np.testing.assert_array_equal(out, ref)


def test_imdct_window_pallas_matches_xla():
    rng = np.random.default_rng(1)
    L = 16
    coef = rng.standard_normal((L, 1024)).astype(np.float32)
    M = imdct_matrix(1024).astype(np.float32)
    win = np.tile(
        np.concatenate([half_window(0, 1024), half_window(0, 1024)[::-1]]).astype(np.float32),
        (L, 1),
    )
    z = np.asarray(
        pk.imdct_window_pallas(jnp.asarray(coef), jnp.asarray(M.T.copy()), jnp.asarray(win))
    )
    ref = (coef @ M.T) * win
    np.testing.assert_allclose(z, ref, atol=1e-5)


def test_fused_dequant_imdct_window_matches_xla():
    """Round-2 tuned kernel: numeric equivalence with the XLA chain
    (interpret mode on CPU; on TPU it ties the XLA roofline, see
    docs/DEVICE_KERNELS.md)."""
    import jax.numpy as jnp

    from soundkit_tpu.ops.aac_dsp import imdct_matrix
    from soundkit_tpu.ops.pallas_kernels import aac_dequant_imdct_window_pallas

    rng = np.random.default_rng(1)
    L, K = 16, 128
    M_t = jnp.asarray(imdct_matrix(K).astype(np.float32).T)
    N = M_t.shape[1]
    q = jnp.asarray(rng.integers(-64, 64, (L, K)).astype(np.int32))
    s = jnp.asarray(rng.uniform(0.5, 2.0, (L, K)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (L, N)).astype(np.float32))

    qf = q.astype(jnp.float32)
    coef = jnp.sign(qf) * jnp.abs(qf) ** (4.0 / 3.0) * s
    ref = (coef @ M_t) * w
    got = aac_dequant_imdct_window_pallas(q, s, M_t, w, tile_l=8, tile_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
