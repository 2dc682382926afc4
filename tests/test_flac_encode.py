"""From-scratch FLAC encoder conformance (VERDICT r2 missing #6).

Round-trips: encode -> own C++ decoder bit-exact (incl. STREAMINFO
MD5), and encode -> libavcodec oracle bit-exact, on real fixture audio
at 16 and 24 bits across all three effort profiles
(frame_codec.rs:42-278 parity)."""
import numpy as np
import pytest

from soundkit_tpu.codecs.flac import FlacDecoder
from soundkit_tpu.codecs.flac_encode import FlacFrameEncoder, FlacStreamEncoder
from soundkit_tpu.core.wav import parse_wav

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _fixture_pcm16(testdata):
    w = parse_wav((testdata / "wav_stereo" / f"{CLIP}.wav").read_bytes())
    pcm = np.frombuffer(w.data, "<i2").astype(np.int64)
    return pcm.reshape(-1, w.channel_count).T, w.sampling_rate


def _fixture_pcm24(testdata):
    w = parse_wav((testdata / "wav_24" / f"{CLIP}.wav").read_bytes())
    raw = np.frombuffer(w.data, np.uint8).reshape(-1, 3)
    v = (
        raw[:, 0].astype(np.int64)
        | (raw[:, 1].astype(np.int64) << 8)
        | (raw[:, 2].astype(np.int64) << 16)
    )
    v = (v ^ 0x800000) - 0x800000
    return v.reshape(-1, w.channel_count).T, w.sampling_rate


def _decode_own(blob, bits, channels):
    dec = FlacDecoder()
    audio = dec.add(blob)
    if bits == 16:
        got = np.frombuffer(audio.data, "<i2").astype(np.int64)
    else:
        raw = np.frombuffer(audio.data, np.uint8).reshape(-1, 3)
        got = (
            raw[:, 0].astype(np.int64)
            | (raw[:, 1].astype(np.int64) << 8)
            | (raw[:, 2].astype(np.int64) << 16)
        )
        got = (got ^ 0x800000) - 0x800000
    return got.reshape(-1, channels).T, dec, audio


@pytest.mark.parametrize("profile", ["realtime", "balanced", "maximum"])
def test_stream_16bit_bit_exact_own_decoder(testdata, profile):
    pcm, rate = _fixture_pcm16(testdata)
    enc = FlacStreamEncoder(rate, 2, 16, profile=profile)
    enc.add(pcm[:, :10000])
    enc.add(pcm[:, 10000:])
    blob = enc.finish()
    assert len(blob) < pcm.size * 2 * 0.5  # actually compresses
    got, dec, audio = _decode_own(blob, 16, 2)
    n = pcm.shape[1]
    assert got.shape[1] >= n
    np.testing.assert_array_equal(got[:, :n], pcm)
    assert dec.verify_md5(audio.data[: n * 2 * 2])


@pytest.mark.parametrize("profile", ["balanced", "maximum"])
def test_stream_24bit_bit_exact_own_decoder(testdata, profile):
    pcm, rate = _fixture_pcm24(testdata)
    C = pcm.shape[0]
    enc = FlacStreamEncoder(rate, C, 24, profile=profile)
    enc.add(pcm)
    blob = enc.finish()
    got, dec, audio = _decode_own(blob, 24, C)
    n = pcm.shape[1]
    assert got.shape[1] >= n
    np.testing.assert_array_equal(got[:, :n], pcm)
    assert dec.verify_md5(audio.data[: n * C * 3])


def test_stream_bit_exact_avcodec_oracle(testdata):
    from soundkit_tpu.codecs.avdec import AvDecoder

    pcm, rate = _fixture_pcm16(testdata)
    enc = FlacStreamEncoder(rate, 2, 16)
    enc.add(pcm)
    blob = enc.finish()
    av = AvDecoder("flac")
    out = np.concatenate([av.push(blob), av.flush()])
    got = np.rint(out.astype(np.float64) * 32768).astype(np.int64)
    got = got.reshape(-1, 2).T
    n = pcm.shape[1]
    assert got.shape[1] >= n
    np.testing.assert_array_equal(got[:, :n], pcm)


def test_frame_encoder_independent_frames():
    """Each frame decodes independently (the frame_codec.rs contract:
    one packet = one raw FLAC frame, decoder configured per track)."""
    rng = np.random.RandomState(7)
    enc = FlacFrameEncoder(48000, 1, 16, profile="realtime")
    blocks = [
        np.clip(np.rint(3000 * rng.randn(1, 1024)), -32768, 32767).astype(np.int64)
        for _ in range(3)
    ]
    frames = [enc.encode_frame(b) for b in blocks]
    for f in frames:
        assert f[:2] == b"\xff\xf8"
    # decode frames 2..0 in isolation through fresh decoders
    for blk, frame in zip(blocks, frames):
        dec = FlacDecoder()
        audio = dec.add(frame)
        got = np.frombuffer(audio.data, "<i2").astype(np.int64)
        np.testing.assert_array_equal(got, blk[0])


def test_mono_constant_and_extreme_blocks():
    enc = FlacFrameEncoder(8000, 1, 16)
    # constant
    frame = enc.encode_frame(np.full((1, 256), -123, np.int64))
    dec = FlacDecoder()
    got = np.frombuffer(dec.add(frame).data, "<i2")
    assert np.all(got == -123)
    # full-scale noise (forces verbatim-or-high-k path)
    rng = np.random.RandomState(0)
    blk = rng.randint(-32768, 32768, size=(1, 256)).astype(np.int64)
    frame = enc.encode_frame(blk)
    dec = FlacDecoder()
    got = np.frombuffer(dec.add(frame).data, "<i2").astype(np.int64)
    np.testing.assert_array_equal(got, blk[0])


def test_profiles_order_compression():
    """maximum <= balanced <= realtime on compressible audio."""
    t = np.arange(16384) / 16000.0
    x = np.rint(9000 * np.sin(2 * np.pi * 330 * t) + 2000 * np.sin(2 * np.pi * 991 * t)
                ).astype(np.int64)[None, :]
    sizes = {}
    for profile in ("realtime", "balanced", "maximum"):
        enc = FlacStreamEncoder(16000, 1, 16, profile=profile)
        enc.add(x)
        sizes[profile] = len(enc.finish())
    assert sizes["maximum"] <= sizes["balanced"] <= sizes["realtime"]
