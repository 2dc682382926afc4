"""Owned Opus (RFC 6716) decoder conformance.

Parity reference: soundkit-opus/src/lib.rs:295-430 decodes with the
pure-Rust libopus-rs; here the CELT layer is owned from scratch
(opus_rc.py / opus_celt.py / opus_core.py) and is validated against the
libavcodec opus oracle on the fixture corpus and on crafted
transient-heavy streams.
"""
import struct

import numpy as np
import pytest

from soundkit_tpu.codecs.avdec import AvDecoder
from soundkit_tpu.codecs.opus import OggOpusDemuxer, OpusHead, _OpusCore
from soundkit_tpu.codecs.opus_core import OpusDecoder, parse_packet
from pathlib import Path

CLIP = "A_Tusk_is_used_to_make_costly_gifts"
TESTDATA = Path("/root/reference/testdata")


def _fixture_packets():
    data = (TESTDATA / "ogg_opus" / f"{CLIP}.ogg").read_bytes()
    dmx = OggOpusDemuxer()
    pkts = dmx.push(data)
    return dmx.head, pkts


def _snr(ref, ours):
    n = min(len(ref), len(ours))
    e = ref[:n] - ours[:n]
    return 10 * np.log10(np.mean(ref[:n] ** 2) / (np.mean(e**2) + 1e-300))


def test_fixture_corpus_vs_oracle():
    """Owned CELT decode of the Ogg Opus fixture: >90 dB vs libopus."""
    head, pkts = _fixture_packets()
    av = AvDecoder("opus", extradata=head.raw)
    own = OpusDecoder(head.channels)
    ref = np.concatenate(
        [np.asarray(av.push(p), dtype=np.float64) for p in pkts]
        + [np.asarray(av.flush(), dtype=np.float64)]
    )
    ours = np.concatenate([own.decode_packet(p).reshape(-1) for p in pkts])
    ours = ours[head.pre_skip :]
    assert len(ref) == len(ours)
    assert _snr(ref, ours) > 90.0


def test_packet_modes_parse():
    head, pkts = _fixture_packets()
    for p in pkts:
        toc, frames = parse_packet(p)
        assert toc.mode == "celt"
        assert frames and all(isinstance(f, bytes) for f in frames)


def test_opus_core_serving_path_is_owned():
    """_OpusCore must not delegate CELT mono streams to avcodec."""
    head, pkts = _fixture_packets()
    core = _OpusCore(head)
    assert core._own is not None
    out = np.concatenate([core.decode_packet_f32(p) for p in pkts])
    assert core._av is None  # never fell back
    av = AvDecoder("opus", extradata=head.raw)
    ref = np.concatenate(
        [np.asarray(av.push(p), dtype=np.float64) for p in pkts]
        + [np.asarray(av.flush(), dtype=np.float64)]
    )
    assert _snr(ref, out.astype(np.float64)) > 90.0


def test_silk_stream_decodes_owned():
    """The raw-framing fixture is SILK-WB: the owned LP-layer decoder
    (opus_silk.py) must handle it without the avcodec delegate and
    match the oracle >90 dB."""
    data = (TESTDATA / "opus" / f"{CLIP}.opus").read_bytes()
    head = OpusHead.parse(data[:19])
    body = data[19:]
    pkts = []
    pos = 0
    while pos + 2 <= len(body):
        (n,) = struct.unpack_from("<H", body, pos)
        pkts.append(body[pos + 2 : pos + 2 + n])
        pos += 2 + n
    core = _OpusCore(head)
    out = np.concatenate([core.decode_packet_f32(p) for p in pkts])
    out = np.concatenate([out, core.flush_f32()])
    assert core._own is not None and core._av is None  # never fell back
    av = AvDecoder("opus", extradata=head.raw)
    ref = np.concatenate([av.push(p) for p in pkts] + [av.flush()])
    assert out.shape == ref.shape
    assert _snr(ref.astype(np.float64), out.astype(np.float64)) > 90.0


def test_silk_packet_modes():
    data = (TESTDATA / "opus" / f"{CLIP}.opus").read_bytes()
    body = data[19:]
    pos = 0
    while pos + 2 <= len(body):
        (n,) = struct.unpack_from("<H", body, pos)
        toc, frames = parse_packet(body[pos + 2 : pos + 2 + n])
        assert toc.mode == "silk" and toc.bandwidth == 2
        pos += 2 + n


def test_silk_trailing_redundancy_vs_oracle():
    """Spare bytes after a SILK payload are a 5 ms CELT redundancy
    frame (RFC 6716 §4.5); the oracle decodes and crossfades it at
    the frame start (pos=1 here). Padding a packet with k>=3 bytes
    must reproduce the oracle's faded output; k<=2 must not fade."""
    data = (TESTDATA / "opus" / f"{CLIP}.opus").read_bytes()
    head = data[:19]
    body = data[19:]
    pkts = []
    pos = 0
    while pos + 2 <= len(body):
        (n,) = struct.unpack_from("<H", body, pos)
        pkts.append(body[pos + 2 : pos + 2 + n])
        pos += 2 + n
    for k in (0, 2, 3, 6):
        av = AvDecoder("opus", extradata=head)
        own = OpusDecoder(1)
        ref, ours = [], []
        for i, p in enumerate(pkts[:40]):
            q = p + bytes([0x5A] * k) if i == 30 else p
            ref.append(np.asarray(av.push(q), dtype=np.float64))
            ours.append(own.decode_packet(q).reshape(-1))
        assert _snr(np.concatenate(ref), np.concatenate(ours)) > 90, k


@pytest.mark.slow
def test_mode_transitions_vs_oracle():
    """Real encoder mode switches (hybrid->silk->celt at 24 kbps on
    alternating speech/music content): the redundancy frames must be
    decoded through the CELT state (seeding the post-transition
    energy predictors) and crossfaded exactly as the oracle does."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    rng = np.random.default_rng(3)
    sr = 48000
    secs = 8
    n = sr * secs
    t = np.arange(n) / sr
    sig = np.zeros(n)
    for s in range(secs):
        seg = slice(s * sr, (s + 1) * sr)
        ts = t[seg]
        if (s // 2) % 2 == 0:
            f0 = 120 + 20 * np.sin(2 * np.pi * 2.5 * ts)
            phs = np.cumsum(2 * np.pi * f0 / sr)
            sig[seg] = (0.4 * np.sin(phs) + 0.2 * np.sin(2 * phs)) * (
                0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * ts)))
        else:
            x = 0.0
            for f in (523, 659, 784, 1047, 1319, 2093, 3136, 5274,
                      8000, 11000):
                x = x + 0.08 * np.sin(2 * np.pi * f * ts + rng.uniform(0, 6))
            sig[seg] = x + 0.05 * rng.normal(size=sr)
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16).reshape(-1, 1)
    enc = OpusEncoder(sample_rate=48000, channels=1, bit_rate=24000, backend="libopus")
    pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 1, 0, 48000, 0, 0)
    av = AvDecoder("opus", extradata=head)
    own = OpusDecoder(1)
    modes = [parse_packet(p)[0].mode for p in pkts]
    n_trans = sum(1 for a, b in zip(modes, modes[1:]) if a != b)
    assert n_trans >= 2, "stream must actually switch modes"
    snrs = []
    for i, p in enumerate(pkts):
        ref = np.asarray(av.push(p), dtype=np.float64).reshape(-1)
        ours = own.decode_packet(p).reshape(-1)
        m = min(len(ref), len(ours))
        if m and np.mean(ref[:m] ** 2) > 1e-12:
            snrs.append((_snr(ref[:m], ours[:m]), i))
    worst = min(snrs)
    assert worst[0] > 60.0, f"frame {worst[1]}: {worst[0]:.1f} dB"
    assert np.median([s for s, _ in snrs]) > 100.0


@pytest.mark.slow
def test_stereo_silk_vs_oracle():
    """Stereo SILK (mid/side weights, midonly, LBRR, unmix) and
    mono-coded packets inside stereo streams."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    rng = np.random.default_rng(4)
    sr = 48000
    n = sr * 2
    t = np.arange(n) / sr
    f0 = 120 + 20 * np.sin(2 * np.pi * 2.5 * t)
    phs = np.cumsum(2 * np.pi * f0 / sr)
    base = 0.4 * np.sin(phs) + 0.2 * np.sin(2 * phs)
    base *= 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * t))
    left = base + 0.02 * rng.normal(size=n)
    right = 0.8 * base + 0.05 * np.sin(2 * np.pi * 350 * t) + 0.02 * rng.normal(size=n)
    pcm = (np.clip(np.stack([left, right], 1), -1, 1) * 32767).astype(np.int16)
    enc = OpusEncoder(sample_rate=48000, channels=2, bit_rate=12000, backend="libopus")
    pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 2, 0, 48000, 0, 0)
    av = AvDecoder("opus", extradata=head)
    own = OpusDecoder(2)
    snrs = []
    for p in pkts:
        toc, _ = parse_packet(p)
        assert toc.mode == "silk"
        ref = np.asarray(av.push(p), dtype=np.float64).reshape(-1, 2)
        ours = np.asarray(own.decode_packet(p), dtype=np.float64)
        m = min(len(ref), len(ours))
        if m and np.mean(ref[:m] ** 2) > 1e-14:
            snrs.append(_snr(ref[:m].ravel(), ours[:m].ravel()))
    assert np.median(snrs) > 100.0
    assert min(snrs) > 60.0


@pytest.mark.slow
def test_hybrid_vs_oracle():
    """Hybrid packets (SILK-WB + CELT start band 17 on one coder):
    median >100 dB vs the oracle on a crafted speech-like stream."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    rng = np.random.default_rng(1)
    sr = 48000
    n = sr * 2
    t = np.arange(n) / sr
    f0 = 120 + 20 * np.sin(2 * np.pi * 2.5 * t)
    phs = np.cumsum(2 * np.pi * f0 / sr)
    sig = 0.4 * np.sin(phs) + 0.2 * np.sin(2 * phs) + 0.1 * np.sin(3 * phs)
    sig *= 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * t))
    sig += 0.02 * rng.normal(size=n)
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16).reshape(-1, 1)
    enc = OpusEncoder(sample_rate=48000, channels=1, bit_rate=32000, backend="libopus")
    pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 1, 0, 48000, 0, 0)
    av = AvDecoder("opus", extradata=head)
    own = OpusDecoder(1)
    snrs = []
    n_hybrid = 0
    for p in pkts:
        toc, _ = parse_packet(p)
        n_hybrid += toc.mode == "hybrid"
        ref = np.asarray(av.push(p), dtype=np.float64).reshape(-1)
        ours = own.decode_packet(p).reshape(-1)
        m = min(len(ref), len(ours))
        if m and np.mean(ref[:m] ** 2) > 1e-14:
            snrs.append(_snr(ref[:m], ours[:m]))
    assert n_hybrid > 50
    assert np.median(snrs) > 100.0
    assert min(snrs) > 60.0


@pytest.mark.slow
def test_stereo_celt_vs_oracle():
    """Owned stereo CELT (theta coupling, dual stereo, intensity,
    anti-collapse): every frame >60 dB, median >100 dB at three rates."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    rng = np.random.default_rng(11)
    sr = 48000
    n = sr * 2
    t = np.arange(n) / sr
    left = 0.3 * np.sin(2 * np.pi * 330 * t) + 0.1 * np.sin(2 * np.pi * 1237 * t)
    right = 0.25 * np.sin(2 * np.pi * 440 * t + 0.7) + 0.1 * np.sin(2 * np.pi * 979 * t)
    common = 0.15 * np.sin(2 * np.pi * 660 * t)
    left += common
    right += common
    for k in range(500, n, 4100):
        left[k : k + 6] += rng.uniform(-0.5, 0.5, 6)
        right[k : k + 6] += rng.uniform(-0.5, 0.5, 6)
    left += 0.01 * rng.normal(size=n)
    right += 0.01 * rng.normal(size=n)
    pcm = (np.clip(np.stack([left, right], 1), -1, 1) * 32767).astype(np.int16)
    for br in (48000, 96000):
        enc = OpusEncoder(sample_rate=48000, channels=2, bit_rate=br, backend="libopus")
        pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
        head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 2, 0, 48000, 0, 0)
        av = AvDecoder("opus", extradata=head)
        own = OpusDecoder(2)
        snrs = []
        for p in pkts:
            toc, _ = parse_packet(p)
            assert toc.mode == "celt"
            ref = np.asarray(av.push(p), dtype=np.float64).reshape(-1, 2)
            ours = np.asarray(own.decode_packet(p), dtype=np.float64)
            m = min(len(ref), len(ours))
            if m and np.mean(ref[:m] ** 2) > 1e-14:
                snrs.append(_snr(ref[:m].ravel(), ours[:m].ravel()))
        assert len(snrs) > 40
        assert min(snrs) > 60.0, (br, min(snrs))
        assert np.median(snrs) > 100.0, (br, np.median(snrs))


@pytest.mark.slow
def test_transient_click_train_vs_oracle():
    """Crafted click train forces short-block (transient) CELT frames;
    every frame must clear 60 dB and the stream 85 dB overall."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    rng = np.random.default_rng(7)
    sr = 48000
    n = sr * 2
    sig = np.zeros(n)
    for t in range(200, n, 1900):
        sig[t : t + 8] = rng.uniform(-0.9, 0.9, 8)
    sig += 0.02 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)
    pcm = (sig * 32767).astype(np.int16).reshape(-1, 1)
    enc = OpusEncoder(sample_rate=48000, channels=1, bit_rate=96000, backend="libopus")
    pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 1, 0, 48000, 0, 0)
    av = AvDecoder("opus", extradata=head)
    own = OpusDecoder(1)
    n_trans = 0
    frame_snrs = []
    for p in pkts:
        toc, _ = parse_packet(p)
        assert toc.mode == "celt"
        ref = np.asarray(av.push(p), dtype=np.float64)
        ours = own.decode_packet(p).reshape(-1)
        if np.mean(ref**2) > 1e-14:
            frame_snrs.append(_snr(ref, ours))
    assert len(frame_snrs) > 50
    assert min(frame_snrs) > 60.0
    assert np.median(frame_snrs) > 85.0


def test_fast_path_replay_on_mode_switch(testdata):
    """A stream that starts CELT (native fast path) and switches to
    SILK must replay its history through the Python decoder: output
    after the switch is exactly what an all-Python decode produces,
    output before it agrees to fast-path synthesis precision."""
    import struct

    from soundkit_tpu.codecs.opus import OggOpusDemuxer, OpusStreamDecoder
    from soundkit_tpu.simple import OpusDeboxer

    CLIP = "A_Tusk_is_used_to_make_costly_gifts"
    ogg = (testdata / "ogg_opus" / f"{CLIP}.ogg").read_bytes()
    dm = OggOpusDemuxer()
    celt_pkts = dm.push(ogg)[:30]  # CELT 20 ms mono
    raw = (testdata / "opus" / f"{CLIP}.opus").read_bytes()
    box = OpusDeboxer()
    silk_pkts = (box.push(raw) + box.flush())[:30]
    assert celt_pkts and silk_pkts

    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
            + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00")
    pkts = celt_pkts + silk_pkts
    wire = head + b"".join(
        struct.pack("<H", len(p)) + p for p in pkts
    )

    fast = OpusStreamDecoder()
    out_fast = fast.decode_f32(wire)
    assert fast._core is not None and fast._core._fast is False, (
        "fast path should have engaged then bailed at the SILK packet"
    )

    ref = OpusStreamDecoder()
    ref.decode_f32(head)  # core creation, then disable the fast path
    ref._core._fast = False
    out_ref = np.concatenate([
        ref._core.decode_packet_f32(p) for p in pkts
    ])

    n = min(len(out_fast), len(out_ref))
    assert n > 30 * 960
    celt_n = 30 * 960  # mono samples in the CELT span
    # pre-switch: f32 device-style synthesis vs f64 python
    np.testing.assert_allclose(
        out_fast[:celt_n], out_ref[:celt_n], atol=5e-3
    )
    # post-switch: the replay rebuilt exact python state
    np.testing.assert_array_equal(
        out_fast[celt_n:n], out_ref[celt_n:n]
    )


def _libopus_fec_packets(channels: int, bit_rate: int,
                         seconds: float = 1.5):
    """Encode speech-like audio with libopus inband FEC on (20%
    expected loss) so SILK frames carry LBRR data."""
    import ctypes

    op = ctypes.CDLL("libopus.so.0")
    op.opus_encoder_create.restype = ctypes.c_void_p
    op.opus_encoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    op.opus_encode_float.restype = ctypes.c_int
    op.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    err = ctypes.c_int(0)
    enc = op.opus_encoder_create(48000, channels, 2048,  # VOIP app
                                 ctypes.byref(err))
    assert enc and err.value == 0
    h = ctypes.c_void_p(enc)
    assert op.opus_encoder_ctl(h, 4012, 1) == 0      # inband FEC
    assert op.opus_encoder_ctl(h, 4014, 20) == 0     # 20% loss
    assert op.opus_encoder_ctl(h, 4002, bit_rate) == 0
    assert op.opus_encoder_ctl(h, 4004, 1103) == 0   # max bw WB (SILK)
    rng = np.random.default_rng(7)
    n = int(48000 * seconds)
    t = np.arange(n) / 48000.0
    base = (0.4 * np.sin(2 * np.pi * 180 * t)
            * (1 + 0.6 * np.sin(2 * np.pi * 2.5 * t))
            + 0.02 * rng.standard_normal(n))
    if channels == 2:
        x = np.stack([base, 0.7 * base], 1).astype(np.float32)
    else:
        x = base.astype(np.float32).reshape(-1, 1)
    pkts = []
    for i in range(0, len(x) - 960, 960):
        buf = ctypes.create_string_buffer(1500)
        frame = np.ascontiguousarray(x[i:i + 960])
        r = op.opus_encode_float(
            h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            960, buf, 1500)
        assert r > 0
        pkts.append(buf.raw[:r])
    op.opus_encoder_destroy(h)
    return pkts


def test_silk_lbrr_fec_mono_vs_oracle():
    """Real libopus inband-FEC stream: mono LBRR frames must parse
    (they used to IndexError on the absent side-channel flag — the
    oracle reads a zero-initialized array there) and the regular
    frames must still match the oracle."""
    pkts = _libopus_fec_packets(1, 24000)
    assert any(len(p) > 1 for p in pkts)
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 1, 0, 48000, 0, 0)
    av = AvDecoder("opus", extradata=head)
    own = OpusDecoder(1)
    num = den = 0.0
    for p in pkts:
        toc, _ = parse_packet(p)
        assert toc.mode == "silk"
        ref = np.asarray(av.push(p), dtype=np.float64).reshape(-1, 1)
        ours = np.asarray(own.decode_packet(p), dtype=np.float64)
        m = min(len(ref), len(ours))
        den += float(np.sum(ref[:m] ** 2))
        num += float(np.sum((ref[:m] - ours[:m]) ** 2))
    snr = 10 * np.log10(den / max(num, 1e-30))
    assert snr > 100.0, f"FEC stream decode {snr:.1f} dB"


def test_silk_lbrr_fec_stereo_vs_libopus():
    """Stereo inband-FEC: the avcodec native opus decoder desyncs on
    mid-only LBRR packets (measured: its output collapses to ~0 dB
    vs libopus from the first such packet), so the normative libopus
    decoder is the oracle here.  Our float decode tracks fixed-point
    libopus at the usual ~28-30 dB float-vs-fixed gap; the per-packet
    floor proves the LBRR parse never desyncs the range coder."""
    import ctypes

    pkts = _libopus_fec_packets(2, 48000)
    op = ctypes.CDLL("libopus.so.0")
    op.opus_decoder_create.restype = ctypes.c_void_p
    op.opus_decoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    op.opus_decode_float.restype = ctypes.c_int
    op.opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    err = ctypes.c_int(0)
    dec = ctypes.c_void_p(
        op.opus_decoder_create(48000, 2, ctypes.byref(err)))
    assert dec and err.value == 0
    own = OpusDecoder(2)
    n_lbrr = 0
    per_pkt = []
    for p in pkts:
        rc = __import__(
            "soundkit_tpu.codecs.opus_rc", fromlist=["RangeDecoder"]
        ).RangeDecoder(parse_packet(p)[1][0])
        rc.dec_bit_logp(1)
        n_lbrr += rc.dec_bit_logp(1)
        buf = np.zeros(5760 * 2, dtype=np.float32)
        n = op.opus_decode_float(
            dec, p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            5760, 0)
        assert n > 0
        ref = buf[:n * 2].reshape(-1, 2).astype(np.float64)
        ours = np.asarray(own.decode_packet(p), dtype=np.float64)
        m = min(len(ref), len(ours))
        sig = float(np.sum(ref[:m] ** 2))
        e = float(np.sum((ref[:m] - ours[:m]) ** 2))
        if sig > 1e-10:
            per_pkt.append(10 * np.log10(sig / max(e, 1e-30)))
    assert n_lbrr >= 3, "stream must actually carry LBRR data"
    assert np.median(per_pkt) > 25.0
    assert min(per_pkt) > 15.0, f"desync: {min(per_pkt):.1f} dB"


def test_silk_multiframe_lbrr_fec_vs_libopus():
    """60 ms FEC request -> 40 ms NB/MB superframes (2 SILK frames per
    packet) with consecutive LBRR frames, exercising the libopus
    condCoding rule (delta gains / relative pitch / no LTP-scale read
    when the previous frame in the packet also carried LBRR) and the
    1-based lbrr_flags pattern.  ffmpeg's native decoder mis-parses
    these packets (measured ~0 dB vs libopus over the FEC-dense span),
    so fixed-point libopus is the oracle; the bar is the float-vs-
    fixed gap with no range-coder desync."""
    import ctypes

    op = ctypes.CDLL("libopus.so.0")
    op.opus_encoder_create.restype = ctypes.c_void_p
    op.opus_encoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    op.opus_encode_float.restype = ctypes.c_int
    op.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    op.opus_decoder_create.restype = ctypes.c_void_p
    op.opus_decoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    op.opus_decode_float.restype = ctypes.c_int
    op.opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(op.opus_encoder_create(48000, 1, 2048,
                                                 ctypes.byref(err)))
    for req, v in ((4012, 1), (4014, 30), (4002, 16000), (4004, 1103),
                   (4040, 5005)):  # FEC, 30% loss, 16k, WB cap, 60 ms
        assert op.opus_encoder_ctl(enc, req, v) == 0
    rng = np.random.default_rng(3)
    n = 48000 * 3
    t = np.arange(n) / 48000.0
    x = (0.4 * np.sin(2 * np.pi * 200 * t)
         * (1 + 0.6 * np.sin(2 * np.pi * 2 * t))
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    FR = 2880
    pkts = []
    for i in range(0, n - FR, FR):
        buf = ctypes.create_string_buffer(4000)
        r = op.opus_encode_float(
            enc, x[i:i + FR].ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)), FR, buf, 4000)
        pkts.append(buf.raw[:r])
    # the stream must contain multi-frame superframes
    assert any(parse_packet(p)[0].frame_duration > 20 for p in pkts)
    lod = ctypes.c_void_p(op.opus_decoder_create(48000, 1,
                                                 ctypes.byref(err)))
    own = OpusDecoder(1)
    L, O = [], []
    for p in pkts:
        buf = np.zeros(5760, dtype=np.float32)
        m = op.opus_decode_float(
            lod, p, len(p),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            5760, 0)
        L.append(buf[:m].astype(np.float64))
        O.append(np.asarray(own.decode_packet(p),
                            dtype=np.float64).reshape(-1))
    L = np.concatenate(L)
    O = np.concatenate(O)

    def snr_at(lag, n0, n1):
        a = L[max(0, lag):]
        b = O[max(0, -lag):]
        m = min(len(a), len(b))
        a, b = a[n0:min(n1, m)], b[n0:min(n1, m)]
        sig = float(np.sum(a ** 2))
        return 10 * np.log10(sig / max(float(np.sum((a - b) ** 2)),
                                       1e-30))

    # small constant lag from the delayed-samples grids
    best_head = max(snr_at(l, 0, 9600) for l in range(-4, 5))
    best_tail = max(snr_at(l, len(L) - 48000, len(L))
                    for l in range(-4, 5))
    assert best_head > 20.0, f"FEC-dense span {best_head:.1f} dB"
    assert best_tail > 20.0, f"tail {best_tail:.1f} dB"


def test_silk_bandwidth_switch_vs_oracle():
    """NB->MB->WB switching voice stream: the encoder attaches CELT
    redundancy at SILK bandwidth switches; the decoder must drain the
    old resampler's delayed_samples into the output (opusdec
    opus_flush_resample), offset the pos=0 fade by delayed_samples,
    and continue a clipped fade onto the next packet's first samples
    (redundancy_idx)."""
    import ctypes

    op = ctypes.CDLL("libopus.so.0")
    op.opus_encoder_create.restype = ctypes.c_void_p
    op.opus_encoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    op.opus_encode_float.restype = ctypes.c_int
    op.opus_encode_float.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(op.opus_encoder_create(48000, 1, 2048,
                                                 ctypes.byref(err)))
    assert op.opus_encoder_ctl(enc, 4002, 14000) == 0
    rng = np.random.default_rng(3)
    n = 48000 * 3
    t = np.arange(n) / 48000.0
    x = (0.4 * np.sin(2 * np.pi * 200 * t)
         * (1 + 0.6 * np.sin(2 * np.pi * 2 * t))
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    pkts = []
    for k, i in enumerate(range(0, n - 960, 960)):
        bw = (1101, 1102, 1103)[(k // 25) % 3]
        op.opus_encoder_ctl(enc, 4004, bw)
        buf = ctypes.create_string_buffer(4000)
        r = op.opus_encode_float(
            enc, x[i:i + 960].ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)), 960, buf, 4000)
        pkts.append(buf.raw[:r])
    cfgs = [parse_packet(p)[0].config for p in pkts]
    assert len(set(cfgs)) >= 2, "stream must switch bandwidths"
    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 1, 0, 48000, 0, 0)
    av = AvDecoder("opus", extradata=head)
    own = OpusDecoder(1)
    worst = 1e9
    num = den = 0.0
    for p in pkts:
        ref = np.asarray(av.push(p), dtype=np.float64).reshape(-1)
        ours = np.asarray(own.decode_packet(p),
                          dtype=np.float64).reshape(-1)
        assert len(ref) == len(ours)  # incl. the 24 drained samples
        sig = float(np.sum(ref ** 2))
        e = float(np.sum((ref - ours) ** 2))
        den += sig
        num += e
        if sig > 1e-12:
            worst = min(worst, 10 * np.log10(sig / max(e, 1e-30)))
    assert worst > 80.0, f"worst packet {worst:.1f} dB"
    assert 10 * np.log10(den / max(num, 1e-30)) > 100.0


@pytest.mark.slow
def test_history_trim_bounded_memory_and_replay():
    """The replay history is O(1) per stream: a long CELT stream on
    the native fast path keeps at most _HISTORY_CAP packets buffered,
    and a forced transition to the Python decoder after the cap still
    reconstructs converged state from the retained tail (the >=2 s
    warmup dwarfs CELT's state memory: one overlap frame, two energy
    frames, ~1 postfilter period)."""
    from soundkit_tpu.codecs.opus import (
        _HISTORY_CAP,
        _HISTORY_KEEP,
        _OpusCore,
    )
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder

    rng = np.random.default_rng(3)
    n = 48000 * 9  # 9 s = 450 packets of 20 ms > _HISTORY_CAP
    t = np.arange(n) / 48000.0
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t)
           * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
           + 0.03 * rng.standard_normal(n)).astype(np.float32)
    enc = OpusCeltEncoder(channels=1, bit_rate=64000)
    pkts = []
    for i in range(0, n, 960):
        pkts.extend(enc.push(pcm[i:i + 960]))
    assert len(pkts) > _HISTORY_CAP + 60

    head = OpusHead.parse(
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00"
    )
    split = len(pkts) - 40  # transition happens late, after trimming

    core = _OpusCore(head)
    max_hist = 0
    outs = []
    for p in pkts[:split]:
        outs.append(core.decode_packet_f32(p))
        max_hist = max(max_hist, len(core._history))
    assert core._fast not in (None, False), "fast path must be engaged"
    assert max_hist <= _HISTORY_CAP, f"history grew to {max_hist}"
    assert len(core._history) <= _HISTORY_CAP
    assert core._dropped > 0, "prefix must have been trimmed"

    # force the fast path to bail exactly at `split`, like a packet
    # the native CELT stream cannot serve would
    def bail(pkt, _core=core):
        _core._fast = False
        return None

    core._try_fast = bail
    for p in pkts[split:]:
        outs.append(core.decode_packet_f32(p))
    got = np.concatenate(outs)

    ref_dec = OpusDecoder(1)
    ref = np.concatenate(
        [np.asarray(ref_dec.decode_packet(p), np.float32).reshape(-1)
         for p in pkts]
    )
    assert got.shape == ref.shape
    # post-transition samples: converged-from-tail replay vs the
    # uncapped all-Python decode
    tail_got = got[split * 960:].astype(np.float64)
    tail_ref = ref[split * 960:].astype(np.float64)
    err = tail_got - tail_ref
    snr = 10 * np.log10(
        np.sum(tail_ref ** 2) / max(np.sum(err ** 2), 1e-30)
    )
    assert snr > 40.0, f"trimmed replay convergence {snr:.1f} dB"
