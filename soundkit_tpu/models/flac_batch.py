"""Batched multi-stream FLAC decoder (host walk / device entropy+LPC).

Mirrors the AAC/MP3 serving models: N concurrent FLAC byte streams are
WALKED by the C++ host layer (frame/subframe headers, coding-span
table; native/src/flac.cpp skt_flac_next_segs) and fully decoded on
device — the Rice/fixed-width residual payloads by the SIMD bitstream
interpreter (``ops.flac_rice``) and the LPC reconstruction by
``ops.flac_lpc.flac_frame_device`` — bit-exact vs the host decoder.
The wire ships the COMPRESSED frame bytes (~0.4-2 B/sample) instead of
the round-3 int32 residual plane (4 B/sample, ~38 MB per 64-stream
fixture batch and far past the tunnel's h2d cliff).

Frames the segment wire cannot carry (>64 KiB, >8192 coding spans,
>32-bit fixed reads) fall back per frame to the residual-plane wire in
a second small dispatch, merged on device.

Reference role: soundkit-flac's libFLAC/claxon decode path, re-split
for the stream-batch data-parallel TPU architecture
(soundkit-flac/src/lib.rs:646-780).
"""
from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np


@functools.lru_cache(maxsize=1)
def _scatter_set():
    import jax

    return jax.jit(lambda a, idx, b: a.at[idx].set(b))

from soundkit_tpu.codecs.flac import FlacSegsStream
from soundkit_tpu.ops import flac_lpc, flac_rice

_EMPTY_SEGS = np.zeros((0, 4), np.int32)


class BatchedFlacDecoder:
    def __init__(self, num_streams: int, stride: int = 4608):
        self.B = num_streams
        self.stride = stride
        self._streams = [FlacSegsStream(stride) for _ in range(num_streams)]
        self._pending: List[List[tuple]] = [[] for _ in range(num_streams)]

    def push(self, stream_idx: int, data: bytes) -> None:
        st = self._streams[stream_idx]
        st.feed(data)
        while True:
            got = st.next()
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
        self._streams[b] = FlacSegsStream(self.stride)
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
        the lane axis of ONE jitted call.  The round count is padded to
        the next power of two so the number of compiled programs stays
        logarithmic in serving batch size; the frame-byte and scan-
        length axes bucket the same way.  With ``device_out=True`` the
        samples stay on device (no d2h).
        """
        if n == 0:
            return np.zeros((0, self.B, 2, self.stride), np.int32), []
        n_pad = 1 << (n - 1).bit_length()
        L = n_pad * self.B
        fbytes: List[bytes] = [b""] * L
        seg_tables: List[np.ndarray] = [_EMPTY_SEGS] * L
        warm = np.zeros((L, 2, 32), dtype=np.int32)
        cflag = np.zeros((L, 2), dtype=np.int32)
        cval = np.zeros((L, 2), dtype=np.int32)
        coef = np.zeros((L, 2, 32), dtype=np.int32)
        order = np.zeros((L, 2), dtype=np.int32)
        shift = np.zeros((L, 2), dtype=np.int32)
        wasted = np.zeros((L, 2), dtype=np.int32)
        assign = np.zeros(L, dtype=np.int32)
        bs = np.zeros(L, dtype=np.int32)
        valid = np.zeros(L, dtype=bool)
        parts_entries = []  # (slot, meta, resw, coef) fallback frames
        steps_max = 48
        bytes_max = 512
        metas = []
        for i in range(n):
            meta_all = np.zeros((self.B, 12), dtype=np.int32)
            for b in range(self.B):
                if not self._pending[b]:
                    continue
                j = i * self.B + b
                entry = self._pending[b].pop(0)
                if entry[0] == "parts":
                    _, meta, resw, cf = entry
                    meta_all[b] = meta
                    parts_entries.append((j, meta, resw, cf))
                    continue
                _, meta, cf, wm, xmeta, segs, fb = entry
                meta_all[b] = meta
                coef[j], warm[j] = cf, wm
                cflag[j] = xmeta[0::2][:2]
                cval[j] = xmeta[1::2][:2]
                seg_tables[j] = segs
                fbytes[j] = fb
                bs[j] = meta[0]
                assign[j] = meta[2]
                order[j] = meta[4::3][:2]
                shift[j] = meta[5::3][:2]
                wasted[j] = meta[6::3][:2]
                valid[j] = True
                steps_max = max(steps_max, int(xmeta[6]))
                bytes_max = max(bytes_max, len(fb))
            metas.append(meta_all)

        steps = (steps_max + 47) // 48 * 48
        maxb = 512
        while maxb < bytes_max:
            maxb *= 2
        words = flac_rice.pack_frame_words(fbytes, maxb)
        out = flac_rice.flac_frames_device_segs(
            words, flac_rice.seg_wire(seg_tables, self.stride),
            warm, cflag, cval, coef, order, shift, wasted, assign, bs,
            valid, steps, L, self.stride,
            device_out=True,
        )
        if parts_entries:
            out = self._merge_parts(out, parts_entries)
        out = out[: n * self.B].reshape(n, self.B, 2, self.stride)
        if device_out:
            return out, metas
        from soundkit_tpu.utils.wire import from_device_chunked

        return from_device_chunked(out), metas

    def _merge_parts(self, out, parts_entries):
        """Second small dispatch for fallback frames (residual-plane
        wire), merged into the segment output on device."""
        import jax
        import jax.numpy as jnp

        Lp = len(parts_entries)
        Lp_pad = 1 << max((Lp - 1).bit_length(), 3)
        resw = np.zeros((Lp_pad, 2, self.stride), dtype=np.int32)
        coef = np.zeros((Lp_pad, 2, 32), dtype=np.int32)
        order = np.zeros((Lp_pad, 2), dtype=np.int32)
        shift = np.zeros((Lp_pad, 2), dtype=np.int32)
        wasted = np.zeros((Lp_pad, 2), dtype=np.int32)
        assign = np.zeros(Lp_pad, dtype=np.int32)
        bs = np.zeros(Lp_pad, dtype=np.int32)
        valid = np.zeros(Lp_pad, dtype=bool)
        slots = np.zeros(Lp, dtype=np.int32)
        for i, (j, meta, rw, cf) in enumerate(parts_entries):
            slots[i] = j
            resw[i], coef[i] = rw, cf
            bs[i] = meta[0]
            assign[i] = meta[2]
            order[i] = meta[4::3][:2]
            shift[i] = meta[5::3][:2]
            wasted[i] = meta[6::3][:2]
            valid[i] = True
        pout = flac_lpc.flac_frames_device_batch(
            resw, coef, order, shift, wasted, assign, bs, valid,
            device_out=True, n_keep=Lp,
        )
        return _scatter_set()(out, jnp.asarray(slots), pout)
