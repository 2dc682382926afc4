"""Container/Ogg-family decode tests: every remaining autodetect format
end-to-end through the pipeline, compared vs golden where available
(mirrors the reference's per-format test_decode_* matrix)."""
import numpy as np
import pytest

from soundkit_tpu.core.audio_types import AudioData
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.pipeline.decode_pipeline import DecodePipeline
from soundkit_tpu.pipeline.output_options import DecodeError

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _drive(handle, data, chunk=3333):
    drained = []
    for off in range(0, len(data), chunk):
        handle.send_blocking(data[off : off + chunk], drained)
    handle.send_blocking(b"", drained)
    outs = drained + handle.recv_all()
    errs = [o for o in outs if isinstance(o, DecodeError)]
    assert not errs, errs
    return [o for o in outs if isinstance(o, AudioData)]


def _mono(frames):
    pcm = np.concatenate([np.frombuffer(a.data, "<i2") for a in frames])
    ch = frames[0].channel_count
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)
    return pcm.astype(np.float64)


def _align_snr_corr(ref, test):
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    n = min(len(ref), len(test))
    c = np.correlate(test[:n], ref[:n], "full")
    lag = int(np.argmax(np.abs(c))) - (n - 1)
    if lag >= 0:
        a, b = test[lag:n], ref[: n - lag]
    else:
        a, b = test[: n + lag], ref[-lag:n]
    err = a - b
    e = np.mean(err**2)
    snr = 10 * np.log10(np.mean(b**2) / e) if e > 0 else 99.0
    return snr, np.corrcoef(a, b)[0, 1]


@pytest.mark.parametrize(
    "path,expect_rate,min_corr,golden_name",
    [
        ("ogg_opus/{}.ogg", 48000, 0.93, None),
        ("opus/{}.opus", 48000, 0.93, None),
        ("vorbis/{}.ogg", 8000, 0.95, "vorbis/{}.decoded.wav"),
        ("speex/{}.spx", 8000, 0.75, "speex/{}.decoded.wav"),  # ffmpeg vs oxideav speex differ in the perceptual enhancer
        ("mac_aac/{}.m4a", 16000, 0.93, None),
        ("alac/{}.m4a", 8000, 0.999, "alac/{}.decoded.wav"),
        ("aiff/{}.aiff", None, 0.999, "aiff/{}.decoded.wav"),
        ("aifc/{}.aifc", None, 0.999, "aifc/{}.decoded.wav"),
    ],
)
def test_autodetect_format(testdata, golden, path, expect_rate, min_corr, golden_name):
    data = (testdata / path.format(CLIP)).read_bytes()
    frames = _drive(DecodePipeline.spawn(), data)
    assert frames, f"no output for {path}"
    if expect_rate:
        assert frames[0].sampling_rate == expect_rate
    ours = _mono(frames)
    assert len(ours) > 0
    rms = np.sqrt(np.mean(ours**2))
    assert rms > 100, f"near-silence rms={rms}"

    if golden_name:
        gold = parse_wav((golden / golden_name.format(CLIP)).read_bytes())
        ref = np.frombuffer(gold.data, "<i2").astype(np.float64)
        if gold.channel_count > 1:
            ref = ref.reshape(-1, gold.channel_count).mean(axis=1)
        snr, corr = _align_snr_corr(ref, ours)
        assert corr > min_corr, f"{path}: corr {corr:.4f} vs golden (snr {snr:.1f})"


def test_webm_vorbis_decodes(testdata):
    data = (testdata / "itag171" / "yt_itag_171_vorbis.webm").read_bytes()
    frames = _drive(DecodePipeline.spawn(), data)
    assert frames[0].sampling_rate == 44100
    assert frames[0].channel_count == 2
    pcm = _mono(frames)
    assert len(pcm) / 44100 > 1.0


def test_itag139_m4a_aac(testdata):
    data = (testdata / "itag139" / "yt_itag_139_he_aac.mp4").read_bytes()
    frames = _drive(DecodePipeline.spawn(), data)
    assert frames
    pcm = _mono(frames)
    assert np.sqrt(np.mean(pcm**2)) > 100


def test_alac_lossless_vs_source(testdata):
    """ALAC is lossless: decode must match the 8k source exactly
    (modulo container trimming)."""
    data = (testdata / "alac" / f"{CLIP}.m4a").read_bytes()
    frames = _drive(DecodePipeline.spawn_alac(), data)
    ours = np.concatenate([np.frombuffer(a.data, "<i2") for a in frames])
    src = np.frombuffer(
        (testdata / "linear16_8" / f"{CLIP}.s16le").read_bytes(), "<i2"
    )
    n = min(len(ours), len(src))
    assert n > 0.95 * len(src)
    assert np.array_equal(ours[:n], src[:n]), "ALAC decode not bit-exact vs source"


def test_ogg_chunk_invariance(testdata):
    data = (testdata / "vorbis" / f"{CLIP}.ogg").read_bytes()

    def run(chunk):
        frames = _drive(DecodePipeline.spawn_vorbis(), data, chunk=chunk)
        return b"".join(a.data for a in frames)

    assert run(100) == run(4096) == run(len(data))


def test_ogg_page_parser_resync():
    from soundkit_tpu.demux.ogg import OggPageParser

    p = OggPageParser()
    assert p.push(b"garbage" * 10) == []
    # minimal empty page
    page = b"OggS" + bytes([0, 2]) + b"\x00" * 8 + b"\x01\x00\x00\x00" + b"\x00" * 4 + b"\x00" * 4 + bytes([1, 0])
    pages = p.push(page)
    assert len(pages) == 1 and pages[0].serial == 1


def test_alac_caf_container(testdata):
    """ALAC-in-CAF (reference soundkit-alac/src/lib.rs:6): CAF built
    from the M4A fixture's packets decodes bit-exactly to the M4A path,
    across all three kuki layouts and chunked feed."""
    import struct

    from soundkit_tpu.codecs.containers import AlacAdapter
    from soundkit_tpu.demux.caf import demux_caf_audio, mux_caf_alac
    from soundkit_tpu.demux.mp4 import demux_mp4_audio

    m4a = (testdata / "alac" / f"{CLIP}.m4a").read_bytes()
    tr = demux_mp4_audio(m4a)
    caf = mux_caf_alac(tr.samples, tr.config, tr.sample_rate, tr.channels, 16)

    t2 = demux_caf_audio(caf)
    assert t2.codec == "alac" and t2.packets == tr.samples
    assert t2.config == tr.config  # 24-byte kuki normalised to 36-byte atom

    a1 = AlacAdapter(); a1.process(m4a)
    ref = a1.flush()[0]
    a2 = AlacAdapter(); a2.process(caf)
    out = a2.flush()[0]
    assert out.data == ref.data and out.sampling_rate == ref.sampling_rate

    # chunked feed
    a3 = AlacAdapter()
    for i in range(0, len(caf), 777):
        a3.process(caf[i : i + 777])
    assert a3.flush()[0].data == ref.data

    # frma-preamble kuki layout
    atom = tr.config
    frma = struct.pack(">I", 12) + b"frma" + b"alac" + atom
    from soundkit_tpu.demux.caf import _normalise_alac_cookie

    assert _normalise_alac_cookie(frma) == atom
    assert _normalise_alac_cookie(atom) == atom


def test_caf_errors():
    import pytest as _pytest

    from soundkit_tpu.demux.caf import CafError, demux_caf_audio

    with _pytest.raises(CafError, match="not a CAF"):
        demux_caf_audio(b"RIFF1234")
    with _pytest.raises(CafError, match="desc"):
        demux_caf_audio(b"caff\x00\x01\x00\x00")


def test_alac_native_bitexact_vs_golden(testdata):
    """From-scratch ALAC packet decode (codecs/alac.py +
    native/src/alac.cpp) must be BIT-EXACT with golden/alac."""
    from soundkit_tpu.codecs.alac import AlacPacketDecoder
    from soundkit_tpu.core.wav import parse_wav
    from soundkit_tpu.demux.mp4 import demux_mp4_audio

    data = (testdata / "alac" / f"{CLIP}.m4a").read_bytes()
    track = demux_mp4_audio(data)
    dec = AlacPacketDecoder(track.config)
    pcm = dec.decode_packets_i16(track.samples)

    golden = parse_wav(
        (testdata.parent / "golden" / "alac" / f"{CLIP}.decoded.wav").read_bytes()
    )
    ref = np.frombuffer(golden.data, dtype=np.int16)
    assert len(pcm) == len(ref)
    np.testing.assert_array_equal(pcm, ref)


def test_alac_native_stereo_bitexact_vs_avcodec():
    """Stereo decorrelation + 24-bit shifted-extra-bits path: encode a
    correlated stereo signal with the avcodec ALAC encoder, decode with
    the from-scratch decoder, compare bit-exactly (24-bit domain)
    against the avcodec decoder oracle."""
    from soundkit_tpu.codecs.alac import AlacPacketDecoder
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.encoders import AvEncoder

    rng = np.random.default_rng(7)
    n = 3 * 4096
    t = np.arange(n) / 44100.0
    left = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(n)
    right = (
        0.45 * np.sin(2 * np.pi * 554 * t)
        + 0.7 * left
        + 0.01 * rng.standard_normal(n)
    )
    inter = np.clip(np.stack([left, right], -1).reshape(-1), -1, 1).astype(
        np.float32
    )

    enc = AvEncoder("alac", 44100, 2)
    pkts = enc.push_f32(inter) + enc.flush()
    cookie = enc.extradata

    dec = AlacPacketDecoder(cookie)
    ours = np.concatenate([dec.decode_packet(p) for p in pkts])

    av = AvDecoder("alac", extradata=cookie)
    outs = [av.push(p) for p in pkts]
    outs.append(av.flush())
    ref = np.concatenate(outs)
    scale = float(1 << (dec.bits_per_sample - 1))
    ref_int = np.round(ref * scale).astype(np.int64)
    m = min(len(ours), len(ref_int))
    assert m >= 2 * 2 * 4096  # at least two full stereo packets compared
    np.testing.assert_array_equal(ours[:m].astype(np.int64), ref_int[:m])
