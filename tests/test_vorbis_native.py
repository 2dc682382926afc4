"""Native Vorbis packet parse (native/src/vorbis_parse.cpp) vs the
owned Python decoder: identical spectra, packet by packet.

The C++ stage serves the batched model's per-packet hot path; the
setup export comes from the same parsed VorbisSetup, so any drift is
a port bug.  Parity reference: soundkit-vorbis/src/lib.rs (lewton).
"""
import numpy as np
import pytest

from soundkit_tpu.codecs.vorbis_core import VorbisSetup
from soundkit_tpu.demux.ogg import OggPacketizer

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _native(setup):
    try:
        from soundkit_tpu.codecs.vorbis_native import NativeVorbisParser

        return NativeVorbisParser(setup)
    except Exception as e:
        pytest.skip(f"native vorbis unavailable: {e}")


def _packets(data):
    pk = OggPacketizer()
    return [p for p, _ in pk.push(data)]


def test_native_vorbis_matches_python(testdata):
    pkts = _packets((testdata / "vorbis" / f"{CLIP}.ogg").read_bytes())
    setup = VorbisSetup(pkts[0], pkts[2])
    nat = _native(setup)
    n_audio = 0
    for i, p in enumerate(pkts[3:]):
        ref = setup.decode_packet_spectrum(p)
        got = nat.decode_packet_spectrum(p)
        assert (ref is None) == (got is None), i
        if ref is None:
            continue
        n_audio += 1
        assert (ref.n, ref.prev_flag, ref.next_flag) == (
            got.n, got.prev_flag, got.next_flag), i
        np.testing.assert_array_equal(ref.spectrum, got.spectrum,
                                      err_msg=f"packet {i}")
    assert n_audio > 50


def test_native_vorbis_crafted_stereo():
    """Crafted stereo stream (coupling + both block sizes) through the
    oracle encoder: native parse must equal the Python stage exactly."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from vorbis_craft import ogg_encapsulate

    from soundkit_tpu.codecs.encoders import AvEncoder
    from soundkit_tpu.codecs.vorbis import split_xiph_extradata

    rng = np.random.default_rng(5)
    sr = 44100
    n = sr * 2
    t = np.arange(n) / sr
    left = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=n)
    right = 0.3 * np.sin(2 * np.pi * 660 * t + 0.4) + 0.05 * rng.normal(size=n)
    for k in range(1000, n, 5000):
        left[k : k + 16] += rng.uniform(-0.5, 0.5, 16)
        right[k : k + 16] += rng.uniform(-0.5, 0.5, 16)
    pcm = np.clip(np.stack([left, right], 1), -1, 1).astype(np.float32)
    enc = AvEncoder("vorbis", sr, 2)
    pkts = enc.push_f32(pcm.reshape(-1)) + enc.flush()
    headers = split_xiph_extradata(enc.extradata)
    data = ogg_encapsulate(list(headers) + pkts)
    all_pkts = _packets(data)
    setup = VorbisSetup(all_pkts[0], all_pkts[2])
    nat = _native(setup)
    n_audio = 0
    for i, p in enumerate(all_pkts[3:]):
        ref = setup.decode_packet_spectrum(p)
        got = nat.decode_packet_spectrum(p)
        assert (ref is None) == (got is None), i
        if ref is None:
            continue
        n_audio += 1
        np.testing.assert_array_equal(ref.spectrum, got.spectrum,
                                      err_msg=f"packet {i}")
    assert n_audio > 30
