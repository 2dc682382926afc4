"""Batched multi-stream telephony decoder (G.711 / G.722 / G.726).

The stream-batch replacement for thread-per-pipeline on the telephony
formats (BASELINE config 1): N concurrent byte streams decode in one
jitted step per fixed-size chunk.  Unlike the lockstep AAC model,
telephony lanes are fully ragged: each step consumes up to
``chunk_codes`` codes per stream under a validity mask (the ADPCM
scans freeze masked lanes natively), so slow producers never stall the
batch.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from soundkit_tpu.codecs.g726 import G726Packing, G726Rate, unpack_codes
from soundkit_tpu.ops import adpcm, companding
from soundkit_tpu.ops import g722 as g722_ops

CODECS = (
    "g711_mulaw",
    "g711_alaw",
    "g722",
    "g726_16",
    "g726_24",
    "g726_32",
    "g726_40",
)


class BatchedTelephonyDecoder:
    def __init__(self, codec: str, num_streams: int, chunk_codes: int = 2048):
        import jax

        if codec not in CODECS:
            raise ValueError(f"unknown codec {codec!r}; one of {CODECS}")
        self.codec = codec
        self.B = num_streams
        self.chunk = chunk_codes
        self._queues: List[bytearray] = [bytearray() for _ in range(num_streams)]
        self._g726_rate: Optional[G726Rate] = None

        if codec.startswith("g711"):
            is_alaw = codec.endswith("alaw")
            self._state = None
            self._step = jax.jit(
                lambda codes, valid: jax.numpy.where(
                    valid,
                    companding.decode_alaw(codes) if is_alaw else companding.decode_mulaw(codes),
                    0,
                )
            )
            self.samples_per_code = 1
            self.sample_rate = 8000
        elif codec == "g722":
            self._state = g722_ops.g722_init_state(num_streams)
            self._step = jax.jit(
                lambda codes, valid, st: g722_ops.g722_decode_scan(codes, st, valid)
            )
            self.samples_per_code = 2
            self.sample_rate = 16000
        else:
            bits = int(codec.split("_")[1]) // 8
            self._g726_rate = {2: G726Rate.RATE_16000, 3: G726Rate.RATE_24000,
                               4: G726Rate.RATE_32000, 5: G726Rate.RATE_40000}[bits]
            self._state = adpcm.g726_init_state(num_streams)
            self._step = jax.jit(
                lambda codes, valid, st, _b=bits: adpcm.g726_decode_scan(codes, st, _b, valid)
            )
            self.samples_per_code = 1  # one code = one sample
            self.sample_rate = 8000

    def push(self, stream_idx: int, data: bytes) -> None:
        self._queues[stream_idx].extend(data)

    def decode_step(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decode up to chunk codes per stream.

        Returns (pcm [B, chunk*samples_per_code] i16, lengths [B]):
        lengths in produced samples per stream.
        """
        import jax.numpy as jnp

        codes = np.zeros((self.B, self.chunk), dtype=np.int32)
        valid = np.zeros((self.B, self.chunk), dtype=bool)
        lens = np.zeros(self.B, dtype=np.int64)
        for i, q in enumerate(self._queues):
            n = self._prepare_lane(i, q, codes, valid)
            lens[i] = n * self.samples_per_code
        if self.codec.startswith("g711"):
            pcm = self._step(jnp.asarray(codes), jnp.asarray(valid))
        else:
            pcm, self._state = self._step(
                jnp.asarray(codes), jnp.asarray(valid), self._state
            )
        return np.asarray(pcm), lens

    def _prepare_lane(self, i, q, codes, valid) -> int:
        if self.codec.startswith("g711"):
            n = min(len(q), self.chunk)
            codes[i, :n] = np.frombuffer(bytes(q[:n]), dtype=np.uint8)
            valid[i, :n] = True
            del q[:n]
            return n
        if self.codec == "g722":
            n = min(len(q), self.chunk)
            codes[i, :n] = np.frombuffer(bytes(q[:n]), dtype=np.uint8)
            valid[i, :n] = True
            del q[:n]
            return n
        rate = self._g726_rate
        group = rate.bytes_per_group
        avail_groups = len(q) // group
        max_groups = self.chunk // rate.samples_per_byte_group
        g = min(avail_groups, max_groups)
        nbytes = g * group
        if g:
            cs = unpack_codes(bytes(q[:nbytes]), rate.bits_per_sample, G726Packing.LEFT)
            codes[i, : len(cs)] = cs
            valid[i, : len(cs)] = True
            del q[:nbytes]
            return len(cs)
        return 0
