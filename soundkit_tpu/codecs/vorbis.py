"""Ogg Vorbis decoder.

API equivalent of the reference's lewton-backed ``VorbisDecoder``
(soundkit-vorbis/src/lib.rs:289): own Ogg packet parsing, three header
packets (identification, comment, setup), then audio packet decode.

Packet decode is libavcodec's native vorbis decoder; the three header
packets are packaged into Xiph-lacing extradata.
"""
from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.avdec import AvDecoder, f32_to_i16
from soundkit_tpu.demux.ogg import OggPacketizer


def xiph_extradata(headers: List[bytes]) -> bytes:
    """Package header packets in Xiph lacing (avcodec vorbis extradata)."""
    out = bytearray([len(headers) - 1])
    for h in headers[:-1]:
        n = len(h)
        while n >= 255:
            out.append(255)
            n -= 255
        out.append(n)
    for h in headers:
        out.extend(h)
    return bytes(out)


class VorbisDecoder:
    def __init__(self) -> None:
        self._pkts = OggPacketizer()
        self._headers: List[bytes] = []
        self._av: Optional[AvDecoder] = None
        self.sample_rate: Optional[int] = None
        self.channels: Optional[int] = None

    def decode_f32(self, data: bytes) -> np.ndarray:
        out = []
        for packet, _g in self._pkts.push(data):
            if self._av is None:
                if len(self._headers) == 0:
                    if len(packet) < 30 or packet[:7] != b"\x01vorbis":
                        raise ValueError("not a Vorbis identification header")
                    self.channels = packet[11]
                    self.sample_rate = struct.unpack_from("<I", packet, 12)[0]
                self._headers.append(packet)
                if len(self._headers) == 3:
                    self._av = AvDecoder(
                        "vorbis", extradata=xiph_extradata(self._headers)
                    )
                continue
            out.append(self._av.push(packet))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush(self) -> np.ndarray:
        return self._av.flush() if self._av else np.zeros(0, dtype=np.float32)
