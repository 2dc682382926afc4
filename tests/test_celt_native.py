"""Native CELT parse stage (native/src/celt_parse.cpp) vs the owned
Python decoder: identical spectra/postfilter output, frame by frame.

The C++ port is the serving-path host stage (~160x the Python parse);
both read the same extracted RFC tables, so any drift is a port bug.
Parity reference: soundkit-opus/src/lib.rs (libopus wrapper).
"""
import numpy as np
import pytest

from soundkit_tpu.codecs.opus import OggOpusDemuxer
from soundkit_tpu.codecs.opus_core import parse_packet
from soundkit_tpu.codecs.opus_rc import RangeDecoder
from soundkit_tpu.codecs.opus_celt import CeltDecoder, tables
from soundkit_tpu.ops.celt_batch import pack_comb_params

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _native():
    try:
        from soundkit_tpu.codecs.celt_native import NativeCeltParser

        return NativeCeltParser
    except Exception as e:  # toolchain missing
        pytest.skip(f"native celt unavailable: {e}")


def test_native_parse_matches_python(testdata):
    NativeCeltParser = _native()
    data = (testdata / "ogg_opus" / f"{CLIP}.ogg").read_bytes()
    dmx = OggOpusDemuxer()
    pkts = dmx.push(data)[:60]
    t = tables()
    band_end = t["celt_band_end"].astype(int)
    taps = t["celt_postfilter_taps"].astype(np.float64)
    py = CeltDecoder(1)
    nat = NativeCeltParser(1)
    n_short = 0
    for i, p in enumerate(pkts):
        toc, frames = parse_packet(p)
        end = int(band_end[toc.bandwidth])
        rc = RangeDecoder(frames[0])
        py.decode_frame(rc, 960, 0, end, 1, parse_only=True)
        lp = py.last_parse
        pc = pack_comb_params(lp["pf_state"], lp["pf_period"],
                              lp["pf_gain"], lp["pf_tapset"], taps)
        nf, nc, ns = nat.parse(frames[0], end, 1)
        scale = np.max(np.abs(lp["freq"])) + 1e-30
        assert np.max(np.abs(lp["freq"] - nf)) / scale < 1e-9, f"frame {i}"
        np.testing.assert_allclose(nc, pc, atol=1e-12, err_msg=f"frame {i}")
        assert ns == int(lp["shortBlocks"]), f"frame {i}"
        n_short += ns
    assert n_short > 0  # corpus must exercise transient frames


@pytest.mark.slow
def test_native_parse_matches_python_stereo():
    """Stereo CELT (theta coupling, dual stereo, intensity) through
    the native parser against the Python decoder, two bitrates."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    NativeCeltParser = _native()
    rng = np.random.default_rng(11)
    sr = 48000
    n = sr * 2
    tt = np.arange(n) / sr
    left = 0.3 * np.sin(2 * np.pi * 330 * tt)
    right = 0.25 * np.sin(2 * np.pi * 440 * tt + 0.7)
    common = 0.15 * np.sin(2 * np.pi * 660 * tt)
    left += common + 0.01 * rng.normal(size=n)
    right += common + 0.01 * rng.normal(size=n)
    for k in range(500, n, 4100):
        left[k : k + 6] += rng.uniform(-0.5, 0.5, 6)
        right[k : k + 6] += rng.uniform(-0.5, 0.5, 6)
    pcm = (np.clip(np.stack([left, right], 1), -1, 1) * 32767).astype(np.int16)
    t = tables()
    band_end = t["celt_band_end"].astype(int)
    taps = t["celt_postfilter_taps"].astype(np.float64)
    for br in (48000, 96000):
        enc = OpusEncoder(sample_rate=48000, channels=2, bit_rate=br, backend="libopus")
        pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
        py = CeltDecoder(2)
        nat = NativeCeltParser(2)
        for i, p in enumerate(pkts):
            toc, frames = parse_packet(p)
            end = int(band_end[toc.bandwidth])
            coded = 2 if toc.stereo else 1
            rc = RangeDecoder(frames[0])
            py.decode_frame(rc, 960, 0, end, coded, parse_only=True)
            lp = py.last_parse
            pc = pack_comb_params(lp["pf_state"], lp["pf_period"],
                                  lp["pf_gain"], lp["pf_tapset"], taps)
            nf, nc, ns = nat.parse(frames[0], end, coded)
            scale = np.max(np.abs(lp["freq"])) + 1e-30
            assert np.max(np.abs(lp["freq"] - nf)) / scale < 1e-9, (br, i)
            np.testing.assert_allclose(nc, pc, atol=1e-12)
            assert ns == int(lp["shortBlocks"])


def test_batch_model_native_vs_python_backend(testdata):
    """BatchedCeltDecoder output is backend-independent (native parse
    vs Python parse), bit-identical through the device synthesis."""
    _native()
    import struct

    from soundkit_tpu.models.opus_batch import BatchedCeltDecoder

    data = (testdata / "ogg_opus" / f"{CLIP}.ogg").read_bytes()
    dmx = OggOpusDemuxer()
    pkts = dmx.push(data)[:20]
    head = dmx.head
    wire = head.raw[:19] + b"".join(
        struct.pack("<H", len(p)) + p for p in pkts
    )
    m_nat = BatchedCeltDecoder(2, channels=head.channels)
    m_py = BatchedCeltDecoder(2, channels=head.channels, native=False)
    assert m_nat._native is not None and m_py._native is None
    for m in (m_nat, m_py):
        m.push(0, wire)
        m.push(1, wire)
    out_n, len_n = m_nat.decode_ready()
    out_p, len_p = m_py.decode_ready()
    np.testing.assert_array_equal(len_n, len_p)
    np.testing.assert_allclose(out_n, out_p, atol=1e-6)
