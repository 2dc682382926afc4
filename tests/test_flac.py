"""FLAC decoder tests: MD5 self-validation (the stream's own oracle),
bit-exactness vs lossless sources, chunk invariance, raw-frame streams
(mirrors soundkit-flac's claxon tests, soundkit-flac/src/lib.rs:1128+)."""
import numpy as np
import pytest

from soundkit_tpu.core import audio_bytes as ab
from soundkit_tpu.core.wav import parse_wav

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def flac_mod():
    from soundkit_tpu.codecs import flac

    try:
        flac.load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")
    return flac


def test_container_decode_md5(flac_mod, testdata):
    data = (testdata / "flac" / "A_Tusk_is_used_to_make_costly_gifts.flac").read_bytes()
    dec = flac_mod.FlacDecoder()
    audio = dec.add(data)
    assert audio is not None
    info = dec.info
    assert info["sample_rate"] == 16000
    assert info["bits_per_sample"] == 16
    assert audio.frame_count == info["total_samples"]
    assert dec.verify_md5(audio.data), "decoded PCM does not match STREAMINFO MD5"


def test_chunk_invariance(flac_mod, testdata):
    data = (testdata / "flac" / "A_Tusk_is_used_to_make_costly_gifts.flac").read_bytes()
    whole = flac_mod.decode_flac(data).data

    dec = flac_mod.FlacDecoder()
    parts = []
    for off in range(0, len(data), 313):
        out = dec.add(data[off : off + 313])
        if out is not None:
            parts.append(out.data)
    assert b"".join(parts) == whole


@pytest.mark.parametrize(
    "name,src_dir,conv,bits",
    [
        ("16bit", "wav_stereo", lambda d: ab.s16le_to_i16(d).astype(np.int32), 16),
        ("24bit", "wav_24", ab.s24le_to_i32, 24),
        ("32float", "wav_32f", ab.f32le_to_s24, 32),
    ],
)
def test_raw_frame_stream_bit_exact_vs_source(flac_mod, testdata, golden, name, src_dir, conv, bits):
    """golden/flac holds headerless frame-packet streams; decode must be
    bit-exact vs the lossless WAV source (up to the encoder's dropped
    trailing partial chunk)."""
    data = (golden / "flac" / f"A_Tusk_is_used_to_make_costly_gifts_{name}.flac").read_bytes()
    audio = flac_mod.decode_flac(data)
    assert audio.bits_per_sample == bits
    wav = parse_wav((testdata / src_dir / "A_Tusk_is_used_to_make_costly_gifts.wav").read_bytes())
    expect = conv(wav.data)
    if bits == 16:
        got = ab.s16le_to_i16(audio.data).astype(np.int32)
    elif bits == 24:
        got = ab.s24le_to_i32(audio.data)
    else:
        got = ab.s32le_to_i32(audio.data)
    n = min(len(got), len(expect))
    assert n > 0.9 * len(expect)
    np.testing.assert_array_equal(got[:n], expect[:n])


def test_rejects_garbage(flac_mod):
    dec = flac_mod.FlacDecoder()
    with pytest.raises(flac_mod.FlacError):
        dec.add(b"\x00" * 64)


def test_streaming_partial_header(flac_mod, testdata):
    data = (testdata / "flac" / "A_Tusk_is_used_to_make_costly_gifts.flac").read_bytes()
    dec = flac_mod.FlacDecoder()
    assert dec.add(data[:3]) is None  # less than magic
    assert dec.info is None
    out = dec.add(data[3:100])  # header but no complete frame yet
    assert dec.info is not None or out is None
