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
