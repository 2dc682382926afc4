"""G.722 sub-band ADPCM codec (64 kbit/s, 16 kHz mono).

API equivalent of ``soundkit-g722/src/lib.rs``: ``G722Decoder`` (1 byte
-> 2 samples, :148-212), ``G722Encoder`` with odd-sample carry
(:9-120), i16/i32/f32 output conversions.

The sub-band ADPCM core is ``soundkit_tpu.ops.g722`` (batched scan,
bit-exact vs the reference golden decode).
"""
from __future__ import annotations

import functools

import numpy as np

from soundkit_tpu.ops import g722 as g722_ops

G722_SAMPLE_RATE = 16000
G722_CHANNELS = 1


@functools.lru_cache(maxsize=2)
def _jit_decode():
    from soundkit_tpu.utils.backend import host_jit

    return host_jit(lambda codes, valid, st: g722_ops.g722_decode_scan(codes, st, valid))


@functools.lru_cache(maxsize=2)
def _jit_encode():
    from soundkit_tpu.utils.backend import host_jit

    return host_jit(lambda samples, valid, st: g722_ops.g722_encode_scan(samples, st, valid))


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class G722Decoder:
    """Streaming decoder; stateless buffering (every byte is a unit)."""

    def __init__(self) -> None:
        self._state = g722_ops.g722_init_state(1)

    sample_rate = property(lambda self: G722_SAMPLE_RATE)
    channels = property(lambda self: G722_CHANNELS)

    @classmethod
    def new_64k(cls) -> "G722Decoder":
        return cls()

    def decode_i16(self, data: bytes) -> np.ndarray:
        if not data:
            return np.zeros(0, dtype=np.int16)
        codes = np.frombuffer(bytes(data), dtype=np.uint8)
        n = len(codes)
        padded = _bucket(n)
        codes_p = np.zeros((1, padded), dtype=np.int32)
        codes_p[0, :n] = codes
        valid = np.zeros((1, padded), dtype=bool)
        valid[0, :n] = True
        pcm, self._state = _jit_decode()(codes_p, valid, self._state)
        return np.asarray(pcm)[0, : n * 2].astype(np.int16)

    def decode_i32(self, data: bytes) -> np.ndarray:
        return self.decode_i16(data).astype(np.int32) << 16

    def decode_f32(self, data: bytes) -> np.ndarray:
        return (self.decode_i16(data).astype(np.float32) / np.float32(32768.0)).astype(
            np.float32
        )

    def reset(self) -> None:
        self._state = g722_ops.g722_init_state(1)


class G722Encoder:
    """Streaming encoder; carries an odd trailing sample (lib.rs:76-108)."""

    def __init__(self) -> None:
        self._state = g722_ops.g722_init_state(1)
        self._pending: np.ndarray = np.zeros(0, dtype=np.int16)

    @classmethod
    def new_64k(cls) -> "G722Encoder":
        return cls()

    def encode_i16(self, samples: np.ndarray) -> bytes:
        samples = np.concatenate([self._pending, np.asarray(samples, dtype=np.int16)])
        complete = len(samples) - (len(samples) % 2)
        self._pending = samples[complete:]
        if complete == 0:
            return b""
        return self._encode_exact(samples[:complete])

    def encode_i32(self, samples: np.ndarray) -> bytes:
        return self.encode_i16((np.asarray(samples, dtype=np.int32) >> 16).astype(np.int16))

    def flush(self) -> bytes:
        """Zero-pad the trailing odd sample and encode it (lib.rs:31-44)."""
        if len(self._pending) == 0:
            return b""
        pair = np.zeros(2, dtype=np.int16)
        pair[0] = self._pending[0]
        self._pending = np.zeros(0, dtype=np.int16)
        return self._encode_exact(pair)

    def _encode_exact(self, samples: np.ndarray) -> bytes:
        n_codes = len(samples) // 2
        padded = _bucket(n_codes)
        s_p = np.zeros((1, padded * 2), dtype=np.int16)
        s_p[0, : len(samples)] = samples
        valid = np.zeros((1, padded), dtype=bool)
        valid[0, :n_codes] = True
        codes, self._state = _jit_encode()(s_p, valid, self._state)
        return np.asarray(codes)[0, :n_codes].astype(np.uint8).tobytes()

    def reset(self) -> None:
        self._state = g722_ops.g722_init_state(1)
        self._pending = np.zeros(0, dtype=np.int16)
