"""Encoder tests: round-trip every encoder through our own decoders
(the reference validates encode via decode round-trips the same way)."""
import numpy as np
import pytest

from soundkit_tpu.codecs.encoders import (
    AacEncoder,
    AudioEncoder,
    FlacEncoder,
    Mp3Encoder,
    OpusEncoder,
    adts_header,
)
from soundkit_tpu.core.audio_types import EncodingFlag, PcmData
from soundkit_tpu.core.wav import generate_wav_buffer
from soundkit_tpu.utils.quality import QualityComparison


def _sine_stereo(rate, seconds, freq=440.0):
    t = np.arange(int(rate * seconds)) / rate
    l = np.sin(2 * np.pi * freq * t) * 0.5
    r = np.sin(2 * np.pi * freq * 1.5 * t) * 0.4
    return (np.stack([l, r], axis=1).reshape(-1) * 32767).astype(np.int16)


def test_aac_encode_roundtrip():
    from soundkit_tpu.codecs.aac import AacDecoder

    pcm = _sine_stereo(48000, 1.0)
    enc = AacEncoder(48000, 2, 128000)
    adts = enc.encode_i16(pcm) + enc.flush()
    assert adts[:1] == b"\xff"

    dec = AacDecoder()
    out = dec.decode_f32(adts)
    out = np.concatenate([out, dec.flush_f32()])
    assert dec.sample_rate == 48000 and dec.channels == 2
    qc = QualityComparison.compare_aligned(
        pcm.astype(np.float64) / 32768.0, out.astype(np.float64), 2, 4096
    )
    assert qc.snr_db > 10, f"AAC roundtrip snr {qc.snr_db:.1f}"


def test_aac_roundtrip_through_own_aac_lc():
    """Encode with avcodec, decode with OUR from-scratch AAC-LC."""
    from soundkit_tpu.codecs.aac_lc import AdtsStream
    from soundkit_tpu.ops.aac_dsp import AacLcSynth

    pcm = _sine_stereo(48000, 0.5)
    enc = AacEncoder(48000, 2, 128000)
    adts = enc.encode_i16(pcm) + enc.flush()

    stream = AdtsStream()
    aus = stream.push(adts)
    assert len(aus) > 15
    synth = AacLcSynth(stream.sr_index)
    outs = [synth.process_frame(stream.decoder.decode_au(au)) for au in aus]
    inter = np.concatenate(outs, axis=1).T.reshape(-1)
    qc = QualityComparison.compare_aligned(
        pcm.astype(np.float64) / 32768.0, inter.astype(np.float64), 2, 4096
    )
    assert qc.snr_db > 10, f"own-decoder roundtrip snr {qc.snr_db:.1f}"


def test_flac_encode_lossless_roundtrip():
    from soundkit_tpu.codecs.flac import FlacDecoder

    pcm = _sine_stereo(16000, 0.5)
    enc = FlacEncoder(16000, 16, 2)
    frames = enc.encode_i16(pcm) + enc.flush()
    assert frames[:2] == b"\xff\xf8"  # raw frame stream

    dec = FlacDecoder()
    audio = dec.add(frames)
    got = np.frombuffer(audio.data, "<i2")
    n = min(len(got), len(pcm))
    assert n >= len(pcm) - enc.frame_size * 2
    np.testing.assert_array_equal(got[:n], pcm[:n])


def test_mp3_encode_roundtrip():
    from soundkit_tpu.codecs.mp3 import Mp3Decoder

    pcm = _sine_stereo(44100, 1.0)
    enc = Mp3Encoder(44100, 2, 128000)
    mp3 = enc.encode_i16(pcm) + enc.flush()
    dec = Mp3Decoder()
    out = np.concatenate([dec.decode_f32(mp3), dec.flush_f32()])
    assert dec.sample_rate == 44100
    qc = QualityComparison.compare_aligned(
        pcm.astype(np.float64) / 32768.0, out.astype(np.float64), 2, 2000
    )
    assert qc.snr_db > 10, f"MP3 roundtrip snr {qc.snr_db:.1f}"


def test_opus_soundkit_stream_roundtrip():
    from soundkit_tpu.codecs.opus import OpusStreamDecoder

    pcm = _sine_stereo(48000, 0.5)
    enc = OpusEncoder(48000, 2, 96000)
    stream_bytes = enc.encode_to_soundkit_stream(pcm)
    assert stream_bytes[:8] == b"OpusHead"

    dec = OpusStreamDecoder()
    out = np.concatenate([dec.decode_f32(stream_bytes), dec.flush()])
    assert dec.sample_rate == 48000
    qc = QualityComparison.compare_aligned(
        pcm.astype(np.float64) / 32768.0, out.astype(np.float64), 2, 1000
    )
    assert qc.snr_db > 8, f"Opus roundtrip snr {qc.snr_db:.1f}"


def test_audio_encoder_packet_container():
    """WAV -> FLAC packets with the offset-table flush format
    (audio_pipeline.rs:240-270)."""
    import struct

    pcm = _sine_stereo(16000, 0.3)
    wav = generate_wav_buffer(
        PcmData.i16([pcm[0::2], pcm[1::2]]), 16000
    )
    enc = AudioEncoder(EncodingFlag.FLAC, 4096, FlacEncoder(16000, 16, 2))
    for i in range(0, len(wav), 1000):
        enc.add(wav[i : i + 1000])
    blob = enc.flush()
    count = struct.unpack_from("<I", blob, 0)[0]
    assert count >= 1
    offsets = [struct.unpack_from("<I", blob, 4 + 4 * i)[0] for i in range(count)]
    assert offsets[0] == 0
    payload = blob[4 + 4 * count :]
    # each packet begins with a v1 FLAC header
    from soundkit_tpu.core.frame_header import FrameHeader, get_encoding_flag

    for off in offsets:
        assert get_encoding_flag(payload[off : off + 4]) == EncodingFlag.FLAC
        h = FrameHeader.decode(payload[off:])
        assert h.sample_rate == 16000 and h.channels == 2


def test_adts_header_parses_back():
    from soundkit_tpu.codecs.aac_lc import AacLcDecoder

    h = adts_header(100, 8, 2)
    frame_len, sr_idx, chan, hdr_len = AacLcDecoder.parse_adts_header(h + b"\x00" * 100, 0)
    assert (frame_len, sr_idx, chan, hdr_len) == (107, 8, 2, 7)
