"""Opus decoders: Ogg-encapsulated, and soundkit's raw-Opus framing.

API equivalents of the reference's:
- ``OggOpusDemuxer`` / ``OggOpusDecoder``
  (soundkit-ogg-opus/src/lib.rs:193,275): config + packet events, PCM
  decode with pre-skip handling.
- ``OpusStreamDecoder`` (soundkit-opus/src/lib.rs:295-430): soundkit's
  raw framing — 19-byte OpusHead, then u16-LE length-prefixed packets.

Packet decode is libavcodec's native opus decoder configured with the
OpusHead as extradata (pre-skip and channel mapping honored).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from soundkit_tpu.codecs.avdec import AvDecoder, f32_to_i16
from soundkit_tpu.core.audio_types import AudioData, EncodingFlag, Endianness
from soundkit_tpu.demux.ogg import OggPacketizer

OPUS_SAMPLE_RATE = 48000


@dataclass(frozen=True)
class OpusHead:
    version: int
    channels: int
    pre_skip: int
    input_sample_rate: int
    output_gain: int
    mapping_family: int
    raw: bytes

    @classmethod
    def parse(cls, data: bytes) -> "OpusHead":
        if len(data) < 19 or data[:8] != b"OpusHead":
            raise ValueError("not an OpusHead")
        return cls(
            version=data[8],
            channels=data[9],
            pre_skip=struct.unpack_from("<H", data, 10)[0],
            input_sample_rate=struct.unpack_from("<I", data, 12)[0],
            output_gain=struct.unpack_from("<h", data, 16)[0],
            mapping_family=data[18],
            raw=bytes(data),
        )


class _OpusCore:
    """Shared packet decode with OpusHead config."""

    def __init__(self, head: OpusHead):
        self.head = head
        self._av = AvDecoder("opus", extradata=head.raw)
        self.sample_rate = OPUS_SAMPLE_RATE
        self.channels = head.channels

    def decode_packet_f32(self, packet: bytes) -> np.ndarray:
        return self._av.push(packet)

    def flush_f32(self) -> np.ndarray:
        return self._av.flush()


class OggOpusDemuxer:
    """Config/packet event demuxer (soundkit-ogg-opus/src/lib.rs:193)."""

    def __init__(self) -> None:
        self._pkts = OggPacketizer()
        self.head: Optional[OpusHead] = None
        self._tags_skipped = False

    def push(self, data: bytes) -> List[bytes]:
        """Returns raw Opus packets; populates .head on config."""
        out = []
        for packet, _granule in self._pkts.push(data):
            if self.head is None:
                self.head = OpusHead.parse(packet)
                continue
            if not self._tags_skipped:
                self._tags_skipped = True  # OpusTags
                continue
            out.append(packet)
        return out


class OggOpusDecoder:
    """Ogg-Opus -> PCM (soundkit-ogg-opus/src/lib.rs:275)."""

    def __init__(self) -> None:
        self._demux = OggOpusDemuxer()
        self._core: Optional[_OpusCore] = None

    @property
    def sample_rate(self) -> Optional[int]:
        return OPUS_SAMPLE_RATE if self._core else None

    @property
    def channels(self) -> Optional[int]:
        return self._core.channels if self._core else None

    def decode_f32(self, data: bytes) -> np.ndarray:
        packets = self._demux.push(data)
        if self._core is None and self._demux.head is not None:
            self._core = _OpusCore(self._demux.head)
        if self._core is None or not packets:
            return np.zeros(0, dtype=np.float32)
        out = [self._core.decode_packet_f32(p) for p in packets]
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush(self) -> np.ndarray:
        return self._core.flush_f32() if self._core else np.zeros(0, dtype=np.float32)


class OpusStreamDecoder:
    """soundkit raw-Opus framing: OpusHead(19B) then [u16-LE len][packet]*
    (soundkit-opus/src/lib.rs:295-430)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._core: Optional[_OpusCore] = None

    @property
    def sample_rate(self) -> Optional[int]:
        return OPUS_SAMPLE_RATE if self._core else None

    @property
    def channels(self) -> Optional[int]:
        return self._core.channels if self._core else None

    def decode_f32(self, data: bytes) -> np.ndarray:
        self._buf.extend(data)
        out = []
        if self._core is None:
            if len(self._buf) < 19:
                return np.zeros(0, dtype=np.float32)
            head = OpusHead.parse(bytes(self._buf[:19]))
            self._core = _OpusCore(head)
            del self._buf[:19]
        while len(self._buf) >= 2:
            plen = struct.unpack_from("<H", self._buf, 0)[0]
            if len(self._buf) < 2 + plen:
                break
            packet = bytes(self._buf[2 : 2 + plen])
            del self._buf[: 2 + plen]
            out.append(self._core.decode_packet_f32(packet))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush(self) -> np.ndarray:
        return self._core.flush_f32() if self._core else np.zeros(0, dtype=np.float32)
