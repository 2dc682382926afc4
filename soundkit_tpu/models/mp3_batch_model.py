"""Batched multi-stream MP3 decoder (second model family).

Mirrors ``BatchedAacLcDecoder``: N concurrent MP3 byte streams are
parsed by the C++ host layer (per-stream bit reservoir state) into
compact granule lanes (int16 quant + quarter-exponents) and decoded in
lockstep granule batches by one jitted device step
(``ops.mp3_batch.mp3_granule_device_compact``).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.mp3_native import NativeMp3Parser
from soundkit_tpu.ops import mp3_batch as mb


class BatchedMp3Decoder:
    def __init__(self, num_streams: int, channels: int = 2):
        import jax

        self.B = num_streams
        self.C = channels
        self._parsers = [NativeMp3Parser() for _ in range(num_streams)]
        self._counts = [0] * num_streams
        overlap, fifo = mb.init_state(num_streams, channels)
        self._overlap = overlap
        self._fifo = fifo
        self._step = jax.jit(mb.mp3_granule_device_compact)
        self.sample_rate: Optional[int] = None

    def push(self, stream_idx: int, data: bytes) -> None:
        self._counts[stream_idx] = self._parsers[stream_idx].push(data)

    @property
    def ready_granules(self) -> int:
        return min(self._counts)

    def decode_ready(self, max_granules: Optional[int] = None) -> np.ndarray:
        """Decode lockstep granule batches -> [granules, B, C, 576] f32."""
        import jax.numpy as jnp

        n = self.ready_granules
        if max_granules is not None:
            n = min(n, max_granules)
        outs = []
        for _ in range(n):
            quant = np.zeros((self.B, self.C, 576), dtype=np.int16)
            expq = np.full((self.B, self.C, 576), -32768, dtype=np.int16)
            ms = np.zeros(self.B, dtype=bool)
            bt = np.zeros((self.B, self.C), dtype=np.int32)
            mixed = np.zeros((self.B, self.C), dtype=bool)
            nal = np.zeros((self.B, self.C), dtype=np.int32)
            valid = np.zeros((self.B, self.C), dtype=bool)
            for b, p in enumerate(self._parsers):
                got = p.pop()
                if got is None:
                    continue
                q, e, meta = got
                self._counts[b] -= 1
                nch = min(meta["nch"], self.C)
                quant[b, :nch] = q[:nch]
                expq[b, :nch] = e[:nch]
                ms[b] = meta["ms"]
                for c in range(nch):
                    bt[b, c] = meta["block_type"][c]
                    mixed[b, c] = meta["mixed"][c]
                    nal[b, c] = meta["n_alias"][c]
                    valid[b, c] = True
                if self.sample_rate is None:
                    self.sample_rate = meta["sample_rate"]
            pcm, self._overlap, self._fifo = self._step(
                jnp.asarray(quant), jnp.asarray(expq), jnp.asarray(ms),
                jnp.asarray(bt), jnp.asarray(mixed), jnp.asarray(nal),
                jnp.asarray(valid), self._overlap, self._fifo,
            )
            outs.append(np.asarray(pcm))
        if not outs:
            return np.zeros((0, self.B, self.C, 576), dtype=np.float32)
        return np.stack(outs)
