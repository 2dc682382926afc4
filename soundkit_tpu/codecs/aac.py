"""AAC decoder (host path): ADTS streams and raw access units.

API equivalent of the reference's FDK-backed ``AacDecoder``
(soundkit-aac/src/lib.rs:103-259, ADTS transport) — here backed by
libavcodec's aac decoder.  The from-scratch TPU AAC-LC path (parity
with soundkit-aac-lc) is built separately on extracted spec tables in
``soundkit_tpu.codecs.aac_lc``.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.avdec import AvDecoder, f32_to_i16
from soundkit_tpu.core.audio_types import AudioData, EncodingFlag, Endianness


class AacDecoder:
    """Streaming ADTS decoder."""

    def __init__(self) -> None:
        self._av = AvDecoder("aac", use_parser=True)

    @property
    def sample_rate(self) -> Optional[int]:
        return self._av.rate or None

    @property
    def channels(self) -> Optional[int]:
        return self._av.channels or None

    def decode_f32(self, data: bytes) -> np.ndarray:
        return self._av.push(data)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush_f32(self) -> np.ndarray:
        return self._av.flush()


class AacRawDecoder:
    """Raw access-unit decoder configured from an AudioSpecificConfig
    (the M4A path: extradata from the MP4 esds box)."""

    def __init__(self, audio_specific_config: bytes) -> None:
        self._av = AvDecoder("aac", extradata=audio_specific_config)

    @property
    def sample_rate(self) -> Optional[int]:
        return self._av.rate or None

    @property
    def channels(self) -> Optional[int]:
        return self._av.channels or None

    def decode_access_unit_f32(self, au: bytes) -> np.ndarray:
        return self._av.push(au)

    def flush_f32(self) -> np.ndarray:
        return self._av.flush()


class AacAdtsAdapter:
    """StreamingDecoder for the pipeline (ADTS autodetect path)."""

    def __init__(self) -> None:
        self._dec = AacDecoder()

    def _emit(self, pcm16: np.ndarray) -> List[AudioData]:
        if len(pcm16) == 0 or not self._dec.sample_rate:
            return []
        return [
            AudioData(
                bits_per_sample=16,
                channel_count=self._dec.channels,
                sampling_rate=self._dec.sample_rate,
                data=pcm16.astype("<i2").tobytes(),
                audio_format=EncodingFlag.PCM_SIGNED,
                endianness=Endianness.LITTLE,
            )
        ]

    def process(self, chunk: bytes) -> List[AudioData]:
        return self._emit(self._dec.decode_i16(chunk))

    def flush(self) -> List[AudioData]:
        return self._emit(f32_to_i16(self._dec.flush_f32()))


class AacLatmAdapter:
    """StreamingDecoder for LOAS/LATM AAC elementary streams.

    Beyond reference parity (which only passes LATM packets through,
    soundkit-audio-demux/src/lib.rs:2249): demuxes the LOAS sync layer
    to raw access units (demux/latm.py) and decodes them with a
    raw-AU decoder configured from the in-band StreamMuxConfig's
    AudioSpecificConfig.
    """

    def __init__(self) -> None:
        from soundkit_tpu.demux.latm import LoasDemuxer

        self._loas = LoasDemuxer()
        self._dec: Optional[AacRawDecoder] = None

    def _emit(self, pcm: np.ndarray) -> List[AudioData]:
        if pcm is None or pcm.size == 0 or not self._dec or not self._dec.sample_rate:
            return []
        pcm16 = f32_to_i16(pcm)
        return [
            AudioData(
                bits_per_sample=16,
                channel_count=self._dec.channels,
                sampling_rate=self._dec.sample_rate,
                data=pcm16.astype("<i2").tobytes(),
                audio_format=EncodingFlag.PCM_SIGNED,
                endianness=Endianness.LITTLE,
            )
        ]

    def process(self, chunk: bytes) -> List[AudioData]:
        out: List[AudioData] = []
        for au in self._loas.push(chunk):
            if self._dec is None:
                self._dec = AacRawDecoder(self._loas.config.asc.to_bytes())
            out.extend(self._emit(self._dec.decode_access_unit_f32(au)))
        return out

    def flush(self) -> List[AudioData]:
        if self._dec is None:
            return []
        return self._emit(self._dec._av.flush())
