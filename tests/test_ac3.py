"""Owned A/52 (AC-3) decoder vs the libavcodec oracle.

The core (codecs/ac3_core.py) replicates the oracle's integer
fixed-coefficient pipeline exactly (Q24 mantissas >> exp with floor,
LFG dither, fixed-point coupling), so whole-stream SNR is limited only
by the oracle's float32 IMDCT vs our float64 (~139 dB).

Short blocks (blksw) never occur in the fixture or in anything the
system encoder produces, so that path is exercised by bit-patching
blksw flags into real frames -- blksw changes only the transform
choice, not the bitstream layout, and the oracle accepts the patched
frames (no CRC enforcement).
"""
import numpy as np
import pytest

from soundkit_tpu.codecs import ac3_core

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _oracle(data: bytes) -> np.ndarray:
    from soundkit_tpu.codecs.avdec import AvDecoder

    av = AvDecoder("ac3")
    return np.concatenate([av.push(data), av.flush()]).astype(np.float64)


def _snr(ours: np.ndarray, ref: np.ndarray) -> float:
    n = min(len(ours), len(ref))
    assert n > 0
    err = ours[:n].astype(np.float64) - ref[:n]
    return 10 * np.log10(
        max(np.sum(ref[:n] ** 2), 1e-30) / max(np.sum(err**2), 1e-30)
    )


def test_fixture_vs_oracle(testdata):
    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()
    dec = ac3_core.Ac3Decoder()
    ours = dec.decode(data)
    ref = _oracle(data)
    assert len(ours) == len(ref)
    assert dec.sample_rate == 48000
    assert dec.channels == 1
    assert _snr(ours, ref) > 120


def test_chunked_equals_whole(testdata):
    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()[: 384 * 20]
    whole = ac3_core.Ac3Decoder().decode(data)
    dec = ac3_core.Ac3Decoder()
    parts = [dec.decode(data[i : i + 313]) for i in range(0, len(data), 313)]
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_dither_deterministic(testdata):
    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()[: 384 * 4]
    a = ac3_core.Ac3Decoder().decode(data)
    b = ac3_core.Ac3Decoder().decode(data)
    np.testing.assert_array_equal(a, b)


def _encode(chans, sr, bitrate):
    from soundkit_tpu.codecs.encoders import AvEncoder

    inter = np.stack(chans, 1).reshape(-1).astype(np.float32)
    enc = AvEncoder("ac3", sr, len(chans), bitrate)
    return b"".join(enc.push_f32(inter) + enc.flush())


@pytest.mark.slow
def test_stereo_rematrixing_vs_oracle():
    rng = np.random.RandomState(7)
    sr = 48000
    t = np.arange(sr) / sr
    left = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.randn(sr)
    right = 0.3 * np.sin(2 * np.pi * 554 * t) + 0.02 * rng.randn(sr)
    data = _encode([left, right], sr, 384000)
    dec = ac3_core.Ac3Decoder()
    assert _snr(dec.decode(data), _oracle(data)) > 120
    assert dec.channels == 2


@pytest.mark.slow
def test_stereo_coupling_vs_oracle():
    """Low bitrate forces channel coupling in every block (cpl-channel
    dither draws + remove_dithering + fixed coordinate multiply)."""
    rng = np.random.RandomState(7)
    sr = 48000
    t = np.arange(sr) / sr
    left = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.randn(sr)
    right = 0.3 * np.sin(2 * np.pi * 554 * t) + 0.02 * rng.randn(sr)
    data = _encode([left, right], sr, 96000)
    assert _snr(ac3_core.Ac3Decoder().decode(data), _oracle(data)) > 120


@pytest.mark.slow
def test_5_1_lfe_channel_order_vs_oracle():
    rng = np.random.RandomState(3)
    sr = 48000
    t = np.arange(sr) / sr
    chans = [
        0.3 * np.sin(2 * np.pi * f * t) + 0.01 * rng.randn(sr)
        for f in (300, 400, 500, 60, 700, 800)
    ]
    data = _encode(chans, sr, 448000)
    dec = ac3_core.Ac3Decoder()
    assert _snr(dec.decode(data), _oracle(data)) > 120
    assert dec.channels == 6


def _flip_blksw(data: bytes, n_frames: int, blocks) -> bytes:
    t = ac3_core._t()
    fscod = data[4] >> 6
    size = 2 * int(t["frame_size"][data[4] & 0x3F][fscod])
    buf = bytearray(data[: size * n_frames])
    for off in range(0, len(buf), size):
        f = bytearray(buf[off : off + size])
        probe = ac3_core.Ac3Decoder()
        probe.decode_frame(bytes(f))
        for b in blocks:
            p = probe._blk_bitpos[b]
            f[p >> 3] ^= 0x80 >> (p & 7)
        buf[off : off + size] = f
    return bytes(buf)


@pytest.mark.slow
def test_short_blocks_vs_oracle(testdata):
    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()
    patched = _flip_blksw(data, 20, range(6))
    assert _snr(ac3_core.Ac3Decoder().decode(patched), _oracle(patched)) > 120


@pytest.mark.slow
def test_mixed_long_short_boundaries_vs_oracle(testdata):
    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()
    patched = _flip_blksw(data, 20, (1, 4))
    assert _snr(ac3_core.Ac3Decoder().decode(patched), _oracle(patched)) > 120


def test_telephony_wrapper_owned(testdata):
    """The package Ac3Decoder surface runs the owned core."""
    from soundkit_tpu.codecs.telephony import Ac3Decoder

    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()[: 384 * 8]
    dec = Ac3Decoder()
    pcm = dec.decode_f32(data)
    assert dec.sample_rate == 48000 and dec.channels == 1
    assert _snr(pcm, _oracle(data)) > 120
    assert not hasattr(dec, "_av")
