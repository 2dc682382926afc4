"""Synchronous push/flush streaming API (the WASM-layer analog).

Behavioral equivalent of the reference's browser surface
(``soundkit-wasm`` / ``WASM_API.md``): thread-free push-based decoders
mirroring the same contract — ``push(bytes)`` with arbitrary chunk
sizes returning zero or more frames, one ``flush()`` at EOF, errors as
exceptions, 8 KiB/64 KiB detection window:

- ``MusicDecoder`` (WasmMusicDecoder): full decode to PCM frames, with
  autodetect or ``new_with_format``.
- ``AacDeboxer`` (WasmAacDeboxer): M4A/ADTS -> raw AAC access units.
- ``OpusDeboxer`` (WasmOpusDeboxer): Ogg/WebM/raw-framing -> Opus
  packets.
- ``AacLcStreamDecoder`` (WasmAacLcDecoder): raw AUs -> PCM via the
  framework's own AAC-LC implementation, interleaved or planar.
- ``SoundKitFrameDecoder`` (WasmSoundKitFrameDecoder): v2 frame stream
  -> payloads (with optional decrypt).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from soundkit_tpu.core.audio_types import AudioData
from soundkit_tpu.core.crypto import ChaCha20Poly1305PacketCipher
from soundkit_tpu.core.frame_stream import (
    SoundKitFrame,
    SoundKitFrameStream,
    SoundKitFrameStreamOptions,
)
from soundkit_tpu.demux.detect import AudioType
from soundkit_tpu.pipeline.decode_pipeline import StreamDecoder, _init_decoder
from soundkit_tpu.pipeline.output_options import DecodeError, DecodeOptions

_FORMAT_NAMES = {
    "mp3": AudioType.MP3,
    "aac": AudioType.AAC,
    "m4a": AudioType.M4A,
    "flac": AudioType.FLAC,
    "wav": AudioType.WAV,
    "vorbis": AudioType.OGG_VORBIS,
    "ogg-opus": AudioType.OGG_OPUS,
    "opus": AudioType.OPUS,
    "speex": AudioType.OGG_SPEEX,
    "webm": AudioType.WEBM,
    "alac": AudioType.ALAC,
    "aiff": AudioType.AIFF,
    "ac3": AudioType.AC3,
}


@dataclass
class PcmFrame:
    """The per-frame JS object shape: {pcm, sampleRate, channels, bits}."""

    pcm: bytes
    sample_rate: int
    channels: int
    bits: int

    @classmethod
    def from_audio(cls, audio: AudioData) -> "PcmFrame":
        return cls(audio.data, audio.sampling_rate, audio.channel_count, audio.bits_per_sample)


class MusicDecoder:
    """WasmMusicDecoder mirror: full decode to PCM frames."""

    def __init__(self, options: DecodeOptions = DecodeOptions(), initial_decoder=None):
        self._core = StreamDecoder(options, initial_decoder)

    @classmethod
    def new_with_format(cls, fmt: str, options: DecodeOptions = DecodeOptions()) -> "MusicDecoder":
        try:
            audio_type = _FORMAT_NAMES[fmt]
        except KeyError:
            raise ValueError(f"unknown format {fmt!r}")
        return cls(options, _init_decoder(audio_type))

    def push(self, data: bytes) -> List[PcmFrame]:
        return self._collect(self._core.process(bytes(data)) if data else [])

    def flush(self) -> List[PcmFrame]:
        return self._collect(self._core.process(b""))

    @staticmethod
    def _collect(outputs) -> List[PcmFrame]:
        frames = []
        for o in outputs:
            if isinstance(o, DecodeError):
                raise o
            frames.append(PcmFrame.from_audio(o))
        return frames


class AacDeboxer:
    """WasmAacDeboxer mirror: ADTS or M4A bytes -> raw access units."""

    def __init__(self) -> None:
        from soundkit_tpu.codecs.aac_lc import AdtsStream

        self._adts = AdtsStream()
        self._maybe_mp4 = bytearray()
        self._mode: Optional[str] = None
        self.audio_specific_config: bytes = b""

    def push(self, data: bytes) -> List[bytes]:
        if self._mode is None:
            self._maybe_mp4.extend(data)
            if len(self._maybe_mp4) < 12:
                return []
            if self._maybe_mp4[4:8] == b"ftyp":
                self._mode = "mp4"
                return []  # buffered already; EOF-decoded at flush
            self._mode = "adts"
            data = bytes(self._maybe_mp4)
            self._maybe_mp4.clear()
        if self._mode == "adts":
            aus = self._adts.push(data)
            if self._adts.sr_index is not None and not self.audio_specific_config:
                sr, ch = self._adts.sr_index, self._adts.channel_config
                self.audio_specific_config = bytes(
                    [(2 << 3) | (sr >> 1), ((sr & 1) << 7) | (ch << 3)]
                )
            return aus
        self._maybe_mp4.extend(data)
        return []

    def flush(self) -> List[bytes]:
        if self._mode == "mp4":
            from soundkit_tpu.demux.mp4 import demux_mp4_audio

            track = demux_mp4_audio(bytes(self._maybe_mp4))
            self._maybe_mp4.clear()
            self.audio_specific_config = track.config
            return list(track.samples)
        return []


class OpusDeboxer:
    """WasmOpusDeboxer mirror: Ogg / raw-framing -> Opus packets."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._mode: Optional[str] = None
        self._ogg = None
        self._raw = None
        self.opus_head: bytes = b""

    def push(self, data: bytes) -> List[bytes]:
        if self._mode is None:
            self._buf.extend(data)
            if len(self._buf) < 8:
                return []
            if self._buf[:4] == b"OggS":
                from soundkit_tpu.codecs.opus import OggOpusDemuxer

                self._mode, self._ogg = "ogg", OggOpusDemuxer()
            elif self._buf[:8] == b"OpusHead":
                self._mode = "raw"
            else:
                raise ValueError("not an Opus stream")
            data = bytes(self._buf)
            self._buf.clear()
        if self._mode == "ogg":
            pkts = self._ogg.push(data)
            if self._ogg.head is not None and not self.opus_head:
                self.opus_head = self._ogg.head.raw
            return pkts
        # raw soundkit framing
        import struct

        self._buf.extend(data)
        out = []
        if not self.opus_head:
            if len(self._buf) < 19:
                return []
            self.opus_head = bytes(self._buf[:19])
            del self._buf[:19]
        while len(self._buf) >= 2:
            plen = struct.unpack_from("<H", self._buf, 0)[0]
            if len(self._buf) < 2 + plen:
                break
            out.append(bytes(self._buf[2 : 2 + plen]))
            del self._buf[: 2 + plen]
        return out

    def flush(self) -> List[bytes]:
        return []


class AacLcStreamDecoder:
    """WasmAacLcDecoder mirror: raw AUs -> PCM via our own AAC-LC."""

    def __init__(self, audio_specific_config: bytes):
        from soundkit_tpu.codecs.aac_lc import AacLcDecoder
        from soundkit_tpu.ops.aac_dsp import AacLcSynth

        if len(audio_specific_config) < 2:
            raise ValueError("AudioSpecificConfig too short")
        asc = audio_specific_config
        object_type = asc[0] >> 3
        sr_index = ((asc[0] & 0x7) << 1) | (asc[1] >> 7)
        self.channels = (asc[1] >> 3) & 0xF
        if object_type != 2:
            raise ValueError(f"only AAC-LC supported (object type {object_type})")
        self._dec = AacLcDecoder(sr_index)
        self._synth = AacLcSynth(sr_index)
        from soundkit_tpu.codecs.aac_lc import SAMPLE_RATES

        self.sample_rate = SAMPLE_RATES[sr_index]

    def decode_planar(self, au: bytes) -> np.ndarray:
        frame = self._dec.decode_au(au)
        return self._synth.process_frame(frame)  # [C, 1024]

    def decode_interleaved(self, au: bytes) -> np.ndarray:
        return self.decode_planar(au).T.reshape(-1)

    def decode_interleaved_into(self, au: bytes, out: np.ndarray) -> int:
        pcm = self.decode_interleaved(au)
        out[: len(pcm)] = pcm
        return len(pcm)


class SoundKitFrameDecoder:
    """WasmSoundKitFrameDecoder mirror: v2 frames -> payloads."""

    def __init__(self, decimal_key: Optional[str] = None):
        cipher = (
            ChaCha20Poly1305PacketCipher.new_from_decimal_key(decimal_key)
            if decimal_key
            else None
        )
        self._stream = SoundKitFrameStream(SoundKitFrameStreamOptions(cipher=cipher))

    def push(self, data: bytes) -> List[SoundKitFrame]:
        return self._stream.push(data)

    def flush(self) -> List[SoundKitFrame]:
        self._stream.finish()
        return []
