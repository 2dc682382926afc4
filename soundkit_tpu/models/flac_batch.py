"""Batched multi-stream FLAC decoder (host entropy / device LPC split).

Mirrors the AAC/MP3 serving models: N concurrent FLAC byte streams are
entropy-decoded by the C++ host layer into residual/coefficient wire
frames and reconstructed in lockstep batches by one jitted device step
(``ops.flac_lpc.flac_frame_device``), bit-exact vs the host decoder.
Reference role: soundkit-flac's libFLAC decode path, re-split for the
stream-batch data-parallel TPU architecture.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from soundkit_tpu.codecs.flac import FlacPartsStream
from soundkit_tpu.ops import flac_lpc


class BatchedFlacDecoder:
    def __init__(self, num_streams: int, stride: int = 4608):
        self.B = num_streams
        self.stride = stride
        self._streams = [FlacPartsStream(stride) for _ in range(num_streams)]
        self._pending: List[List[Tuple[np.ndarray, np.ndarray, np.ndarray]]] = [
            [] for _ in range(num_streams)
        ]

    def push(self, stream_idx: int, data: bytes) -> None:
        st = self._streams[stream_idx]
        st.feed(data)
        while True:
            got = st.next_parts()
            if got is None:
                break
            self._pending[stream_idx].append(got)

    @property
    def ready_frames(self) -> int:
        return min(len(p) for p in self._pending)

    def lane_ready(self, b: int) -> int:
        return len(self._pending[b])

    def lane_sample_rate(self, b: int) -> Optional[int]:
        """Sample rate of lane ``b``'s stream (None until STREAMINFO
        parses); mixed-rate groups report each lane's true rate."""
        import ctypes

        st = self._streams[b]
        ch, bits = ctypes.c_int(), ctypes.c_int()
        rate, total = ctypes.c_long(), ctypes.c_longlong()
        if st._lib.skt_flac_info(st._h, ch, bits, rate, total):
            return int(rate.value)
        return None

    def reset_lane(self, b: int) -> None:
        """Recycle lane ``b``: fresh entropy stream + empty queue (FLAC
        frames are independent; there is no device carry to clear)."""
        self._streams[b] = FlacPartsStream(self.stride)
        self._pending[b] = []

    def decode_ready(self, max_frames: Optional[int] = None):
        """Decode lockstep frame batches (bounded by the least-ready
        lane; use :meth:`decode_batches` for ragged fleets).

        Returns (samples [frames, B, 2, stride] int32, meta list of
        per-frame [B, 12] arrays — block_size/channels/rate live there).
        """
        n = self.ready_frames
        if max_frames is not None:
            n = min(n, max_frames)
        return self.decode_batches(n)

    def decode_batches(self, n: int):
        """Decode exactly ``n`` lockstep batches; lanes with nothing
        pending decode as invalid (silent, meta row zero)."""
        outs, metas = [], []
        for _ in range(n):
            resw = np.zeros((self.B, 2, self.stride), dtype=np.int32)
            coef = np.zeros((self.B, 2, 32), dtype=np.int32)
            order = np.zeros((self.B, 2), dtype=np.int32)
            shift = np.zeros((self.B, 2), dtype=np.int32)
            wasted = np.zeros((self.B, 2), dtype=np.int32)
            assign = np.zeros(self.B, dtype=np.int32)
            bs = np.zeros(self.B, dtype=np.int32)
            valid = np.zeros(self.B, dtype=bool)
            meta_all = np.zeros((self.B, 12), dtype=np.int32)
            for b in range(self.B):
                if not self._pending[b]:
                    continue
                meta, rw, cf = self._pending[b].pop(0)
                meta_all[b] = meta
                resw[b], coef[b] = rw, cf
                bs[b] = meta[0]
                assign[b] = meta[2]
                order[b] = meta[4::3][:2]
                shift[b] = meta[5::3][:2]
                wasted[b] = meta[6::3][:2]
                valid[b] = True
            outs.append(
                flac_lpc.flac_frame_device_x64(
                    resw, coef, order, shift, wasted, assign, bs, valid
                )
            )
            metas.append(meta_all)
        if not outs:
            return np.zeros((0, self.B, 2, self.stride), np.int32), []
        # fetch each round's [B, 2, stride] i32 in sub-cliff chunks:
        # a whole-batch fetch (2.4 MB at B=64) sits in the tunnel's
        # d2h stall zone and was the dominant cost of this model
        from soundkit_tpu.utils.wire import from_device_chunked

        return np.stack([from_device_chunked(o) for o in outs]), metas
