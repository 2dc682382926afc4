"""Minimal ctypes binding to libswresample for the SILK 8/12/16 kHz ->
48 kHz conversion, configured exactly like the libavcodec opus
decoder's resampler (filter_size 16, defaults otherwise, and the
bandwidth-dependent zero preroll that compensates the FIR delay).

Only the resampling is delegated (commodity DSP — the reference
delegates its resampling to the rubato crate the same way); the SILK
codec math itself is owned (codecs/opus_silk.py).
"""
from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_AV_SAMPLE_FMT_FLT = 3
_LAYOUT_MONO = 4
_LAYOUT_STEREO = 3

# resampler group delay at the SILK rate, per bandwidth (NB/MB/WB),
# matching the oracle's silk_resample_delay table
SILK_RESAMPLE_DELAY = {0: 4, 1: 8, 2: 11}


class _Libs:
    _cached = None

    @classmethod
    def get(cls):
        if cls._cached is None:
            swr = ctypes.CDLL("libswresample.so.4", mode=ctypes.RTLD_GLOBAL)
            util = ctypes.CDLL("libavutil.so", mode=ctypes.RTLD_GLOBAL)
            swr.swr_alloc.restype = ctypes.c_void_p
            swr.swr_init.argtypes = [ctypes.c_void_p]
            swr.swr_convert.restype = ctypes.c_int
            swr.swr_convert.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
            ]
            swr.swr_free.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
            util.av_opt_set_int.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int,
            ]
            cls._cached = (swr, util)
        return cls._cached


class SilkResampler:
    """Streaming FLT resampler: push SILK-rate samples, get 48 kHz."""

    def __init__(self, in_rate: int, bandwidth: int, channels: int = 1):
        swr, util = _Libs.get()
        self._swr = swr
        self._ctx = ctypes.c_void_p(swr.swr_alloc())
        if not self._ctx:
            raise RuntimeError("swr_alloc failed")
        layout = _LAYOUT_MONO if channels == 1 else _LAYOUT_STEREO
        for name, val in (
            (b"in_sample_fmt", _AV_SAMPLE_FMT_FLT),
            (b"out_sample_fmt", _AV_SAMPLE_FMT_FLT),
            (b"in_channel_layout", layout),
            (b"out_channel_layout", layout),
            (b"out_sample_rate", 48000),
            (b"filter_size", 16),
            (b"in_sample_rate", in_rate),
        ):
            util.av_opt_set_int(self._ctx, name, val, 0)
        if swr.swr_init(self._ctx) != 0:
            raise RuntimeError("swr_init failed")
        self.channels = channels
        # zero preroll to compensate the FIR group delay
        delay = SILK_RESAMPLE_DELAY[bandwidth]
        silence = np.zeros(delay * channels, dtype=np.float32)
        self._convert(silence, delay, 0)

    def _convert(self, data: np.ndarray, n_in: int, n_out: int
                 ) -> np.ndarray:
        out = np.zeros(max(n_out, 1) * self.channels, dtype=np.float32)
        inptr = (ctypes.c_void_p * 1)(
            ctypes.cast(
                data.ctypes.data_as(ctypes.c_void_p), ctypes.c_void_p
            )
            if n_in else None
        )
        outptr = (ctypes.c_void_p * 1)(
            ctypes.cast(out.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_void_p)
        )
        got = self._swr.swr_convert(self._ctx, outptr, n_out,
                                    inptr if n_in else None, n_in)
        if got < 0:
            raise RuntimeError("swr_convert failed")
        return out[: got * self.channels]

    def process(self, pcm: np.ndarray, out_samples: int) -> np.ndarray:
        """pcm: [n, ch] float at the SILK rate; returns [m, ch] f32 at
        48 kHz with m <= out_samples (the oracle requests exactly the
        packet duration per superframe; the first NB frame comes up 24
        samples short of it — the oracle's delayed_samples)."""
        flat = np.ascontiguousarray(
            pcm.astype(np.float32).reshape(-1)
        )
        out = self._convert(flat, pcm.shape[0], out_samples)
        return out.reshape(-1, self.channels)

    def drain(self, out_samples: int) -> np.ndarray:
        """Flush up to ``out_samples`` buffered samples (NULL-input
        convert), the oracle's opus_flush_resample on a bandwidth
        switch."""
        if out_samples <= 0:
            return np.zeros((0, self.channels), dtype=np.float32)
        out = self._convert(
            np.zeros(0, dtype=np.float32), 0, out_samples)
        return out.reshape(-1, self.channels)

    def __del__(self):
        try:
            if getattr(self, "_ctx", None):
                self._swr.swr_free(ctypes.byref(self._ctx))
                self._ctx = None
        except Exception:
            pass
