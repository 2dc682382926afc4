"""Batched multi-stream Opus decoder (host-parallel libavcodec).

Correctness note: the owned RFC 6716 decoder (codecs/opus_core.py)
is the default in the streaming API and conforms at 130-137 dB; this
lockstep serving model keeps the C decoder per lane for throughput
until a batched device CELT path exists.

Opus (CELT/SILK) is a per-sample adaptive entropy/range-coded codec —
there is no host/device split analogous to AAC/MP3/FLAC (the spectral
reconstruction is interleaved with the range decoder state), so the
serving model keeps libopus on the host with one decoder state per
stream and batches the *framing* work: lockstep packet batches, one
fixed-shape [B, C, frame] output per step, ragged lanes padded with
silence.  Reference role: soundkit-opus's per-pipeline decoder
(soundkit-opus/src/lib.rs), rebatched for lockstep serving; device
CELT remains the round-2 research item noted in COVERAGE.md.

Input framing is the soundkit raw-Opus wire: u16-LE length-prefixed
packets (codecs/opus.py OpusStreamDecoder framing).
"""
from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.avdec import AvDecoder


def _default_extradata(channels: int) -> bytes:
    # minimal OpusHead: version 1, channels, preskip 0, 48k, gain 0, mapping 0
    return (
        b"OpusHead" + bytes([1, channels]) + struct.pack("<HIhB", 0, 48000, 0, 0)
    )


class BatchedOpusDecoder:
    FRAME = 960  # 20 ms @ 48 kHz, the dominant packing

    def __init__(self, num_streams: int, channels: int = 2):
        self.B = num_streams
        self.C = channels
        # decoders are created lazily from each lane's OpusHead so
        # avcodec honors the stream's preskip/gain; lanes without a
        # head (bare packet wire) get a minimal default head
        self._dec: List[Optional[AvDecoder]] = [None] * num_streams
        self._extradata = [_default_extradata(channels)] * num_streams
        self._buf = [bytearray() for _ in range(num_streams)]
        self._packets: List[List[bytes]] = [[] for _ in range(num_streams)]
        self._head_done = [False] * num_streams
        self.sample_rate = 48000

    def _decoder(self, b: int) -> AvDecoder:
        if self._dec[b] is None:
            self._dec[b] = AvDecoder("opus", extradata=self._extradata[b])
        return self._dec[b]

    def push(self, stream_idx: int, data: bytes) -> None:
        """Feed the soundkit raw-Opus wire: optional OpusHead(19B),
        then u16-LE length-prefixed packets (soundkit-opus framing)."""
        buf = self._buf[stream_idx]
        buf.extend(data)
        if not self._head_done[stream_idx]:
            if len(buf) < 8:
                return
            if bytes(buf[:8]) == b"OpusHead":
                if len(buf) < 19:
                    return
                self._extradata[stream_idx] = bytes(buf[:19])
                del buf[:19]
            self._head_done[stream_idx] = True
        while len(buf) >= 2:
            (n,) = struct.unpack_from("<H", buf, 0)
            if len(buf) < 2 + n:
                break
            self._packets[stream_idx].append(bytes(buf[2 : 2 + n]))
            del buf[: 2 + n]

    @property
    def ready_packets(self) -> int:
        return min(len(p) for p in self._packets)

    def decode_ready(self, max_packets: Optional[int] = None):
        """Decode lockstep packet batches.

        Returns (pcm [packets, B, C, 960] f32, lengths [packets, B]
        i32).  ``lengths`` is the valid sample count per slot — the
        first packet of a stream is short by the head's preskip, and
        oversized packings are truncated to FRAME (the per-lane
        decoder state stays correct regardless).
        """
        n = self.ready_packets
        if max_packets is not None:
            n = min(n, max_packets)
        out = np.zeros((n, self.B, self.C, self.FRAME), dtype=np.float32)
        lengths = np.zeros((n, self.B), dtype=np.int32)
        for i in range(n):
            for b in range(self.B):
                pkt = self._packets[b].pop(0)
                dec = self._decoder(b)
                pcm = dec.push(pkt)  # interleaved f32
                if len(pcm) == 0:
                    continue
                frames = pcm.reshape(-1, dec.channels or self.C)
                k = min(len(frames), self.FRAME)
                out[i, b, : frames.shape[1], :k] = frames[:k].T
                lengths[i, b] = k
        return out, lengths
