"""MP3 decoder (host path).

API equivalent of the reference's ``Mp3Decoder``
(soundkit-mp3/src/lib.rs:147-260, a nanomp3/minimp3 wrapper): streaming
byte input with internal frame sync (bit reservoir handled), f32-native
decode, per-frame rate/channel capture, i16 output for the pipeline
(decode_i16_with_drain arm, soundkit-decoder/src/lib.rs:375-387).

The host decode is libavcodec's mp3float; the TPU-side IMDCT +
polyphase synthesis kernels live in ``soundkit_tpu.ops.mdct`` /
``ops.polyphase`` (device path for batched decode).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.avdec import AvDecoder, f32_to_i16
from soundkit_tpu.core.audio_types import AudioData, EncodingFlag, Endianness


class Mp3Decoder:
    def __init__(self) -> None:
        self._av = AvDecoder("mp3float", use_parser=True)

    @property
    def sample_rate(self) -> Optional[int]:
        return self._av.rate or None

    @property
    def channels(self) -> Optional[int]:
        return self._av.channels or None

    def decode_f32(self, data: bytes) -> np.ndarray:
        """Interleaved f32 (nanomp3-native output)."""
        return self._av.push(data)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush_f32(self) -> np.ndarray:
        return self._av.flush()


class Mp3Adapter:
    """StreamingDecoder for the pipeline (emits i16 AudioData)."""

    def __init__(self) -> None:
        self._dec = Mp3Decoder()

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
