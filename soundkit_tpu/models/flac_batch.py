"""Batched multi-stream FLAC decoder (host walk / device entropy+LPC).

Mirrors the AAC/MP3 serving models: N concurrent FLAC byte streams are
WALKED by the C++ host layer (frame/subframe headers, coding-span
table; native/src/flac.cpp skt_flac_drain) and fully decoded on
device — the Rice/fixed-width residual payloads by the SIMD bitstream
interpreter (``ops.flac_rice``) and the LPC reconstruction by
``ops.flac_lpc.flac_frame_device`` — bit-exact vs the host decoder.
The wire ships the COMPRESSED frame bytes (~0.4-2 B/sample) instead of
the round-3 int32 residual plane (4 B/sample, ~38 MB per 64-stream
fixture batch and far past the tunnel's h2d cliff).

Round-5 host diet (docs/FLEET_PROFILE_r5.md): the walk queues export
records C-side at push time (ONE ctypes call per push instead of one
per frame) and ``skt_flac_export_rounds`` scatters a whole collect's
wire — word planes, dense segment tables, LPC metadata — in ONE call,
replacing the per-(round, lane) Python repack loop.

Frames the segment wire cannot carry (>64 KiB, >8192 coding spans,
>32-bit fixed reads) queue as residual-plane records and merge on
device in a second small dispatch.

Reference role: soundkit-flac's libFLAC/claxon decode path, re-split
for the stream-batch data-parallel TPU architecture
(soundkit-flac/src/lib.rs:646-780).
"""
from __future__ import annotations

import ctypes
import functools
from typing import List, Optional

import numpy as np


@functools.lru_cache(maxsize=1)
def _scatter_set():
    import jax

    return jax.jit(lambda a, idx, b: a.at[idx].set(b))

from soundkit_tpu.codecs.flac import FlacError
from soundkit_tpu.native.loader import load
from soundkit_tpu.ops import flac_lpc, flac_rice

SEG_CAP = 8192
MAX_FRAME_BYTES = 65536


class BatchedFlacDecoder:
    def __init__(self, num_streams: int, stride: int = 4608):
        self.B = num_streams
        self.stride = stride
        self._lib = load()
        self._h = [self._lib.skt_flac_new() for _ in range(num_streams)]
        self._handles = (ctypes.c_void_p * num_streams)(*self._h)
        # per-instance caps so tests can force the parts fallback
        self.seg_cap = SEG_CAP
        self.max_frame_bytes = MAX_FRAME_BYTES

    def __del__(self):
        for i, h in enumerate(getattr(self, "_h", [])):
            if h:
                self._lib.skt_flac_free(h)
                self._h[i] = None

    def push(self, stream_idx: int, data: bytes) -> None:
        h = self._h[stream_idx]
        if self._lib.skt_flac_feed(h, data, len(data)) != 0:
            raise FlacError(self._lib.skt_flac_error(h).decode())
        if self._lib.skt_flac_drain(
            h, self.stride, self.seg_cap, self.max_frame_bytes
        ) < 0:
            raise FlacError(self._lib.skt_flac_error(h).decode())

    @property
    def ready_frames(self) -> int:
        return min(self.lane_ready(b) for b in range(self.B))

    def lane_ready(self, b: int) -> int:
        return int(self._lib.skt_flac_queued(self._h[b]))

    def lane_sample_rate(self, b: int) -> Optional[int]:
        """Sample rate of lane ``b``'s stream (None until STREAMINFO
        parses); mixed-rate groups report each lane's true rate."""
        ch, bits = ctypes.c_int(), ctypes.c_int()
        rate, total = ctypes.c_long(), ctypes.c_longlong()
        if self._lib.skt_flac_info(self._h[b], ch, bits, rate, total):
            return int(rate.value)
        return None

    def reset_lane(self, b: int) -> None:
        """Recycle lane ``b``: fresh entropy stream + empty queue (FLAC
        frames are independent; there is no device carry to clear)."""
        self._lib.skt_flac_free(self._h[b])
        self._h[b] = self._lib.skt_flac_new()
        self._handles[b] = ctypes.c_void_p(self._h[b])

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
        B = self.B
        n_pad = 1 << (n - 1).bit_length()
        L = n_pad * B
        stats = np.zeros(4, np.int64)
        self._lib.skt_flac_queue_stats(self._handles, B, n, stats)
        steps = (max(int(stats[1]), 48) + 47) // 48 * 48
        maxb = 512
        while maxb < int(stats[0]):
            maxb *= 2
        W = maxb // 4
        S = int(stats[2])
        S_pad = 1 << max((S - 1).bit_length() if S else 0, 6)
        n_parts = int(stats[3])

        words = np.zeros((L, W), np.uint32)
        seg = [np.zeros(S_pad, np.int32) for _ in range(5)]
        warm = np.zeros((L, 2, 32), np.int32)
        cflag = np.zeros((L, 2), np.int32)
        cval = np.zeros((L, 2), np.int32)
        coef = np.zeros((L, 2, 32), np.int32)
        order = np.zeros((L, 2), np.int32)
        shift = np.zeros((L, 2), np.int32)
        wasted = np.zeros((L, 2), np.int32)
        assign = np.zeros(L, np.int32)
        bs = np.zeros(L, np.int32)
        valid = np.zeros(L, np.uint8)
        meta_all = np.zeros((n, B, 12), np.int32)
        np1 = max(n_parts, 1)
        p_slot = np.zeros(np1, np.int32)
        p_meta = np.zeros((np1, 12), np.int32)
        p_resw = np.zeros((np1, 2, self.stride), np.int32)
        p_coef = np.zeros((np1, 2, 32), np.int32)
        r = self._lib.skt_flac_export_rounds(
            self._handles, B, n, self.stride, W,
            words.reshape(-1),
            seg[0], seg[1], seg[2], seg[3], seg[4],
            warm.reshape(-1), cflag.reshape(-1), cval.reshape(-1),
            coef.reshape(-1), order.reshape(-1), shift.reshape(-1),
            wasted.reshape(-1), assign, bs, valid,
            meta_all.reshape(-1),
            p_slot, p_meta.reshape(-1), p_resw.reshape(-1),
            p_coef.reshape(-1),
        )
        if r < 0:
            raise FlacError("export_rounds wire overflow")
        metas = [meta_all[i] for i in range(n)]
        out = flac_rice.flac_frames_device_segs(
            words, tuple(seg),
            warm, cflag, cval, coef, order, shift, wasted, assign, bs,
            valid.astype(bool), steps, L, self.stride,
            device_out=True,
        )
        if n_parts:
            out = self._merge_parts(
                out, p_slot[:n_parts], p_meta, p_resw, p_coef, n_parts
            )
        out = out[: n * B].reshape(n, B, 2, self.stride)
        if device_out:
            return out, metas
        from soundkit_tpu.utils.wire import from_device_chunked

        return from_device_chunked(out), metas

    def _merge_parts(self, out, slots, p_meta, p_resw, p_coef, Lp):
        """Second small dispatch for fallback frames (residual-plane
        wire), merged into the segment output on device."""
        import jax.numpy as jnp

        Lp_pad = 1 << max((Lp - 1).bit_length(), 3)
        resw = np.zeros((Lp_pad, 2, self.stride), dtype=np.int32)
        coef = np.zeros((Lp_pad, 2, 32), dtype=np.int32)
        order = np.zeros((Lp_pad, 2), dtype=np.int32)
        shift = np.zeros((Lp_pad, 2), dtype=np.int32)
        wasted = np.zeros((Lp_pad, 2), dtype=np.int32)
        assign = np.zeros(Lp_pad, dtype=np.int32)
        bs = np.zeros(Lp_pad, dtype=np.int32)
        valid = np.zeros(Lp_pad, dtype=bool)
        resw[:Lp] = p_resw[:Lp]
        coef[:Lp] = p_coef[:Lp]
        bs[:Lp] = p_meta[:Lp, 0]
        assign[:Lp] = p_meta[:Lp, 2]
        order[:Lp] = p_meta[:Lp, 4::3][:, :2]
        shift[:Lp] = p_meta[:Lp, 5::3][:, :2]
        wasted[:Lp] = p_meta[:Lp, 6::3][:, :2]
        valid[:Lp] = True
        pout = flac_lpc.flac_frames_device_batch(
            resw, coef, order, shift, wasted, assign, bs, valid,
            device_out=True, n_keep=Lp,
        )
        return _scatter_set()(out, jnp.asarray(slots), pout)
