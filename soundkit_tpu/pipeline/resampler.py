"""Streaming sinc resampler with carried filter state.

Equivalent of the reference ``StreamingResampler``
(soundkit-decoder/src/lib.rs:95-218): persists sinc history across
arbitrarily-chunked input so that streaming output equals one-shot
output.  Differences from the reference, by design:

- The reference buffers to fixed 4096-frame chunks and pads+trims at
  flush (lib.rs:146-216).  This implementation emits *eagerly*: after
  T total input frames exactly ``ceil(T*L/M)`` outputs have been
  produced, and each output window only reads already-arrived samples,
  so streaming output is byte-identical to the one-shot kernel on any
  chunking (the invariant the reference tests at lib.rs:3084-3134).
- ``flush`` therefore emits nothing further; the trailing ``sinc_len/2``
  input frames of content are not recoverable, matching the reference's
  flush-trim behavior in total count and content window.
"""
from __future__ import annotations

import numpy as np

from soundkit_tpu.ops import resample as rs


class StreamingResampler:
    def __init__(self, input_rate: int, output_rate: int, channels: int):
        if input_rate <= 0 or output_rate <= 0:
            raise ValueError("sample rates must be > 0")
        self.input_rate = input_rate
        self.output_rate = output_rate
        self.channels = channels
        self._taps_rev, self._offsets, self.L, self.M = rs.design_polyphase(
            input_rate, output_rate
        )
        self._S = self._taps_rev.shape[1]
        # buffer holds the conceptual left pad of S-1 zeros at stream start
        self._buf = np.zeros((channels, self._S - 1), dtype=np.float32)
        self._buf_abs0 = -(self._S - 1)  # x-index of buf[:, 0]
        self._in_count = 0
        self._out_count = 0

    def process(self, channels_in) -> np.ndarray:
        """Append planar f32 input [channels, n]; return [channels, m] output."""
        x = np.atleast_2d(np.asarray(channels_in, dtype=np.float32))
        if x.shape[0] != self.channels:
            raise ValueError(
                f"Channel count changed mid-stream: expected {self.channels}, got {x.shape[0]}"
            )
        if self.input_rate == self.output_rate:
            self._in_count += x.shape[1]
            return x.copy()

        self._buf = np.concatenate([self._buf, x], axis=1)
        self._in_count += x.shape[1]

        k_hi = rs.out_len(self._in_count, self.L, self.M)
        ks = np.arange(self._out_count, k_hi, dtype=np.int64)
        if len(ks) == 0:
            return np.zeros((self.channels, 0), dtype=np.float32)

        i0 = (ks * self.M) // self.L
        p = ks % self.L
        starts = (i0 - (self._S - 1) - self._buf_abs0).astype(np.int64)
        wins = np.lib.stride_tricks.sliding_window_view(self._buf, self._S, axis=1)
        out = np.einsum("cks,ks->ck", wins[:, starts, :], self._taps_rev[p])

        self._out_count = k_hi
        # retain history needed by the next output
        next_i0 = (k_hi * self.M) // self.L
        cut = max(0, int(next_i0 - (self._S - 1) - self._buf_abs0))
        if cut:
            self._buf = self._buf[:, cut:]
            self._buf_abs0 += cut
        return out.astype(np.float32)

    def flush(self) -> np.ndarray:
        """No further output (see module docstring for the contract)."""
        return np.zeros((self.channels, 0), dtype=np.float32)
