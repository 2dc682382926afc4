"""WAV state machine tests mirroring soundkit/src/wav.rs:272-343."""
import struct

import numpy as np
import pytest

from soundkit_tpu.core.audio_types import EncodingFlag, PcmData
from soundkit_tpu.core.raw_pcm import RawPcmFormat, RawPcmStreamProcessor
from soundkit_tpu.core.wav import (
    WavStreamProcessor,
    WavStreamError,
    generate_wav_buffer,
    parse_wav,
)


def test_wav_stream_fixture(testdata):
    path = testdata / "wav_32f" / "A_Tusk_is_used_to_make_costly_gifts.wav"
    proc = WavStreamProcessor()
    packets = []
    data = path.read_bytes()
    for off in range(0, len(data), 128):
        out = proc.add(data[off : off + 128])
        if out is not None:
            packets.append(out)
    assert packets
    assert packets[0].audio_format == EncodingFlag.PCM_FLOAT


def test_wav_stream_24bit_pcm_handbuilt():
    buf = bytearray()
    data_chunk = bytes([0x01, 0x02, 0x03])
    fmt_size = 16
    file_size = 4 + (8 + fmt_size) + (8 + len(data_chunk))
    buf += b"RIFF" + struct.pack("<I", file_size) + b"WAVE"
    buf += b"fmt " + struct.pack("<IHHIIHH", fmt_size, 1, 1, 48000, 48000 * 3, 3, 24)
    buf += b"data" + struct.pack("<I", len(data_chunk)) + data_chunk

    proc = WavStreamProcessor()
    out = proc.add(bytes(buf))
    assert out is not None
    assert out.bits_per_sample == 24
    assert out.channel_count == 1
    assert out.sampling_rate == 48000
    assert out.data == data_chunk
    assert proc.finished


def test_wav_rejects_non_wav():
    proc = WavStreamProcessor()
    with pytest.raises(WavStreamError):
        proc.add(b"OggS" + b"\x00" * 20)


def test_generate_wav_roundtrip():
    channels = [np.arange(-5, 5, dtype=np.int16), np.arange(0, 10, dtype=np.int16)]
    wav = generate_wav_buffer(PcmData.i16(channels), 44100)
    audio = parse_wav(wav)
    assert audio.sampling_rate == 44100
    assert audio.channel_count == 2
    assert audio.bits_per_sample == 16
    interleaved = np.frombuffer(audio.data, dtype="<i2").reshape(-1, 2)
    np.testing.assert_array_equal(interleaved[:, 0], channels[0])
    np.testing.assert_array_equal(interleaved[:, 1], channels[1])


def test_generate_wav_f32_has_float_tag():
    wav = generate_wav_buffer(PcmData.f32([np.zeros(4, np.float32)]), 8000)
    audio = parse_wav(wav)
    assert audio.audio_format == EncodingFlag.PCM_FLOAT
    assert audio.bits_per_sample == 32


def test_chunk_invariance(testdata):
    """Chunked parse == whole-buffer parse, the reference's key property."""
    data = (testdata / "wav_stereo" / "A_Tusk_is_used_to_make_costly_gifts.wav").read_bytes()

    whole = parse_wav(data)

    proc = WavStreamProcessor()
    parts = []
    for off in range(0, len(data), 137):
        out = proc.add(data[off : off + 137])
        if out is not None:
            parts.append(out.data)
    assert b"".join(parts) == whole.data


# --- raw PCM (soundkit/src/raw_pcm.rs:208-266) ---


def test_raw_pcm_buffers_partials():
    proc = RawPcmStreamProcessor(RawPcmFormat.linear16(8000, 1))
    assert proc.add(bytes([0x34])) is None
    assert proc.buffered_len == 1
    audio = proc.add(bytes([0x12, 0x78, 0x56]))
    assert audio.data == bytes([0x34, 0x12, 0x78, 0x56])
    assert proc.buffered_len == 0


def test_raw_pcm_stereo_partial_frames():
    proc = RawPcmStreamProcessor(RawPcmFormat.linear16(16000, 2))
    assert proc.add(bytes([1, 2, 3])) is None
    audio = proc.add(bytes([4, 5, 6, 7, 8, 9]))
    assert audio.data == bytes([1, 2, 3, 4, 5, 6, 7, 8])
    assert proc.buffered_len == 1
    with pytest.raises(ValueError, match="partial-frame"):
        proc.flush()


def test_raw_pcm_linear32_is_float():
    proc = RawPcmStreamProcessor(RawPcmFormat.linear32(48000, 1))
    audio = proc.add(np.float32(0.25).tobytes())
    assert audio.audio_format == EncodingFlag.PCM_FLOAT
    assert audio.bits_per_sample == 32


def test_raw_pcm_rejects_invalid():
    with pytest.raises(ValueError):
        RawPcmFormat.linear16(0, 1)
    with pytest.raises(ValueError):
        RawPcmFormat.linear16(8000, 0)


def test_raw_pcm_fixture_roundtrip(testdata):
    fixture = (testdata / "linear16" / "A_Tusk_is_used_to_make_costly_gifts.s16le").read_bytes()
    proc = RawPcmStreamProcessor(RawPcmFormat.linear16(16000, 1))
    decoded = bytearray()
    for off in range(0, len(fixture), 333):
        out = proc.add(fixture[off : off + 333])
        if out is not None:
            decoded.extend(out.data)
    assert proc.flush() is None
    assert bytes(decoded) == fixture
