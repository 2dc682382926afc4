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

    def decode_ready(self, max_frames: Optional[int] = None,
                     device_out: bool = False):
        """Decode lockstep frame batches (bounded by the least-ready
        lane; use :meth:`decode_batches` for ragged fleets).

        Returns (samples [frames, B, 2, stride] int32, meta list of
        per-frame [B, 12] arrays — block_size/channels/rate live there).
        """
        n = self.ready_frames
        if max_frames is not None:
            n = min(n, max_frames)
        return self.decode_batches(n, device_out=device_out)

    def decode_batches(self, n: int, device_out: bool = False):
        """Decode exactly ``n`` lockstep batches; lanes with nothing
        pending decode as invalid (silent, meta row zero).

        FLAC frames carry no device state, so every round folds into
        the lane axis of ONE jitted call ([n*B, 2, stride] wire).  The
        round count is padded to the next power of two so the number
        of compiled programs stays logarithmic in serving batch size.
        With ``device_out=True`` the samples stay on device (no d2h).
        """
        if n == 0:
            return np.zeros((0, self.B, 2, self.stride), np.int32), []
        n_pad = 1 << (n - 1).bit_length()
        L = n_pad * self.B
        resw = np.zeros((L, 2, self.stride), dtype=np.int32)
        coef = np.zeros((L, 2, 32), dtype=np.int32)
        order = np.zeros((L, 2), dtype=np.int32)
        shift = np.zeros((L, 2), dtype=np.int32)
        wasted = np.zeros((L, 2), dtype=np.int32)
        assign = np.zeros(L, dtype=np.int32)
        bs = np.zeros(L, dtype=np.int32)
        valid = np.zeros(L, dtype=bool)
        metas = []
        for i in range(n):
            meta_all = np.zeros((self.B, 12), dtype=np.int32)
            for b in range(self.B):
                if not self._pending[b]:
                    continue
                j = i * self.B + b
                meta, rw, cf = self._pending[b].pop(0)
                meta_all[b] = meta
                resw[j], coef[j] = rw, cf
                bs[j] = meta[0]
                assign[j] = meta[2]
                order[j] = meta[4::3][:2]
                shift[j] = meta[5::3][:2]
                wasted[j] = meta[6::3][:2]
                valid[j] = True
            metas.append(meta_all)
        out = flac_lpc.flac_frames_device_batch(
            resw, coef, order, shift, wasted, assign, bs, valid,
            device_out=device_out, n_keep=n * self.B,
        )
        out = out.reshape(n, self.B, 2, self.stride)
        return out, metas
