"""Owned Opus encode path: range encoder round trips, PVQ index
round trips, and CELT frame encode -> owned/oracle decode quality.

The encoder (opus_enc_rc.py / opus_celt_enc.py) is the mirror of the
owned decoder; these tests drive randomized symbol programs and real
audio through both directions.
"""
import numpy as np
import pytest

from soundkit_tpu.codecs.opus_rc import RangeDecoder, laplace_decode
from soundkit_tpu.codecs.opus_enc_rc import (
    RangeEncoder,
    laplace_encode,
    laplace_interval,
)


def _run_program(program, size):
    """Encode a symbol program, then decode it back; returns the
    decoded symbols and asserts tell() parity at every step."""
    enc = RangeEncoder(size)
    for op in program:
        kind = op[0]
        if kind == "bit":
            enc.enc_bit_logp(op[1], op[2])
        elif kind == "enc":
            enc.encode(op[1], op[2], op[3])
        elif kind == "uint":
            enc.enc_uint(op[1], op[2])
        elif kind == "tri":
            enc.enc_uint_tri(op[1], op[2])
        elif kind == "step":
            enc.enc_uint_step(op[1], op[2])
        elif kind == "raw":
            enc.rawbits(op[1], op[2])
        elif kind == "laplace":
            coded = laplace_encode(enc, op[1], op[2], op[3])
            assert coded == op[1]  # in-range values must not clamp
    enc_tell = enc.tell()
    data = enc.finalize()
    assert len(data) == size

    dec = RangeDecoder(data)
    out = []
    for op in program:
        kind = op[0]
        if kind == "bit":
            out.append(("bit", dec.dec_bit_logp(op[2])))
        elif kind == "enc":
            fs = dec.decode(op[3])
            # recover the symbol whose [fl, fh) contains fs
            dec.update(op[1], op[2], op[3])
            out.append(("enc", op[1] <= fs < op[2]))
        elif kind == "uint":
            out.append(("uint", dec.dec_uint(op[2])))
        elif kind == "tri":
            out.append(("tri", dec.dec_uint_tri(op[2])))
        elif kind == "step":
            out.append(("step", dec.dec_uint_step(op[2])))
        elif kind == "raw":
            out.append(("raw", dec.rawbits(op[2])))
        elif kind == "laplace":
            out.append(("laplace",
                        laplace_decode(dec, op[2] << 0, op[3] << 0)))
    assert dec.tell() == enc_tell
    return out


def test_rc_roundtrip_bits_and_uints():
    rng = np.random.default_rng(0)
    for trial in range(40):
        program = []
        expect = []
        bits_used = 0.0
        size = int(rng.integers(8, 200))
        while bits_used < size * 8 - 64:
            k = int(rng.integers(0, 5))
            if k == 0:
                b = int(rng.integers(0, 2))
                logp = int(rng.integers(1, 13))
                program.append(("bit", b, logp))
                expect.append(("bit", b))
                bits_used += logp if b else 1
            elif k == 1:
                ft = int(rng.integers(2, 1 << 16))
                t = int(rng.integers(0, ft))
                program.append(("uint", t, ft))
                expect.append(("uint", t))
                bits_used += np.log2(ft) + 1
            elif k == 2:
                qn = 2 * int(rng.integers(1, 64))
                it = int(rng.integers(0, qn + 1))
                program.append(("tri", it, qn))
                expect.append(("tri", it))
                bits_used += np.log2(qn + 1) + 1
            elif k == 3:
                k0 = int(rng.integers(1, 32))
                kv = int(rng.integers(0, 2 * k0 + 1))
                program.append(("step", kv, k0))
                expect.append(("step", kv))
                bits_used += np.log2(2 * k0 + 1) + 1
            else:
                nb = int(rng.integers(1, 17))
                v = int(rng.integers(0, 1 << nb))
                program.append(("raw", v, nb))
                expect.append(("raw", v))
                bits_used += nb
        got = _run_program(program, size)
        for e, g in zip(expect, got):
            if g[0] == "enc":
                assert g[1] is True
            else:
                assert e == g, f"trial {trial}: {e} != {g}"


def test_rc_roundtrip_cdf_symbols():
    """encode(fl, fh, ft) with arbitrary model intervals."""
    rng = np.random.default_rng(1)
    for _ in range(30):
        size = int(rng.integers(16, 64))
        program = []
        bits = 0.0
        while bits < size * 8 - 64:
            ft = int(rng.integers(4, 1 << 15))
            fl = int(rng.integers(0, ft - 1))
            fh = int(rng.integers(fl + 1, ft + 1))
            program.append(("enc", fl, fh, ft))
            bits += max(1.0, np.log2(ft / (fh - fl)))
        for res in _run_program(program, size):
            assert res[1] is True


def test_laplace_roundtrip_table_range():
    """Every (fs, decay) pair the CELT coarse-energy model uses, over
    the full practical qi range, encodes and decodes exactly."""
    from soundkit_tpu.codecs.opus_tables import tables

    prob = tables()["celt_coarse_energy_dist"].astype(int)
    pairs = set()
    for lm in range(prob.shape[0]):
        for intra in range(prob.shape[1]):
            row = prob[lm][intra]
            for i in range(0, len(row), 2):
                pairs.add((int(row[i]) << 7, int(row[i + 1]) << 6))
    assert pairs
    for fs0, decay in sorted(pairs):
        for val in list(range(-24, 25)):
            enc = RangeEncoder(8)
            coded = laplace_encode(enc, val, fs0, decay)
            data = enc.finalize()
            dec = RangeDecoder(data)
            got = laplace_decode(dec, fs0, decay)
            assert got == coded
            if abs(val) <= 8:
                assert coded == val, (fs0, decay, val, coded)


def test_laplace_clamps_saturating_values():
    fs0, decay = 10 << 7, 6 << 6
    enc = RangeEncoder(8)
    coded = laplace_encode(enc, 4000, fs0, decay)
    assert 0 < coded <= 4000
    data = enc.finalize()
    assert laplace_decode(RangeDecoder(data), fs0, decay) == coded
    fl, fs, _ = laplace_interval(fs0, decay, 4000)
    assert fl + fs <= 32768


def test_rc_tell_matches_decoder_during_encode():
    """tell()/tell_frac() parity at every step of a mixed program."""
    rng = np.random.default_rng(2)
    program = []
    for _ in range(60):
        k = int(rng.integers(0, 3))
        if k == 0:
            program.append(("bit", int(rng.integers(0, 2)),
                            int(rng.integers(1, 8))))
        elif k == 1:
            ft = int(rng.integers(2, 256))
            program.append(("uint", int(rng.integers(0, ft)), ft))
        else:
            program.append(("raw", int(rng.integers(0, 256)), 8))
    size = 256
    enc = RangeEncoder(size)
    enc_tells = []
    for op in program:
        if op[0] == "bit":
            enc.enc_bit_logp(op[1], op[2])
        elif op[0] == "uint":
            enc.enc_uint(op[1], op[2])
        else:
            enc.rawbits(op[1], op[2])
        enc_tells.append((enc.tell(), enc.tell_frac()))
    data = enc.finalize()
    dec = RangeDecoder(data)
    for op, (t, tf) in zip(program, enc_tells):
        if op[0] == "bit":
            assert dec.dec_bit_logp(op[2]) == op[1]
        elif op[0] == "uint":
            assert dec.dec_uint(op[2]) == op[1]
        else:
            assert dec.rawbits(op[2]) == op[1]
        assert dec.tell() == t
        assert dec.tell_frac() == tf


# ---------------------------------------------------------------------------
# CELT frame encoder (opus_celt_enc.py)
# ---------------------------------------------------------------------------

def _opus_head_raw(ch: int, pre_skip: int = 0) -> bytes:
    import struct

    return (
        b"OpusHead" + bytes([1, ch]) + struct.pack("<H", pre_skip)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0])
    )


def _tone(seconds: float, ch: int) -> np.ndarray:
    t = np.arange(int(48000 * seconds)) / 48000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    return np.repeat(tone[:, None], ch, axis=1)


def _aligned_snr(ref: np.ndarray, out: np.ndarray, maxoff: int = 1500) -> float:
    n = min(len(out), len(ref)) - maxoff - 10
    best = -1.0
    for off in range(maxoff):
        a = ref[:n, 0]
        b = out[off : off + n, 0]
        e = a - b
        best = max(best, 10 * np.log10(np.sum(a * a) / max(np.sum(e * e), 1e-12)))
    return best


def test_celt_encode_own_decode_tone():
    """Owned encode -> owned decode on a tone, mono and stereo."""
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder

    for ch in (1, 2):
        pcm = _tone(0.5, ch)
        enc = OpusCeltEncoder(channels=ch, bit_rate=96000)
        pkts = enc.push(pcm) + enc.flush()
        assert len(pkts) >= 25
        # CBR: every packet is TOC + bytes_per_frame payload
        assert all(len(p) == 1 + enc.bytes_per_frame for p in pkts)
        dec = OpusDecoder(channels=ch)
        out = np.concatenate([dec.decode_packet(p) for p in pkts], axis=0)
        snr = _aligned_snr(pcm, out)
        assert snr > 20.0, f"ch={ch}: own-decode snr {snr:.1f}"


def test_celt_encode_independent_oracle_accepts_packets():
    """libopus (an independent conformant decoder) must accept our
    packets, and its output must match our own decoder's to >120 dB —
    the bitstream-conformance check."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder

    for ch in (1, 2):
        pcm = _tone(0.4, ch)
        enc = OpusCeltEncoder(channels=ch, bit_rate=96000)
        pkts = enc.push(pcm) + enc.flush()
        av = AvDecoder("opus", extradata=_opus_head_raw(ch))
        outs = [np.asarray(av.push(p), dtype=np.float64) for p in pkts]
        outs.append(np.asarray(av.flush(), dtype=np.float64))
        ref = np.concatenate([o for o in outs if o.size]).reshape(-1, ch)
        own = OpusDecoder(channels=ch)
        ours = np.concatenate([own.decode_packet(p) for p in pkts], axis=0)
        n = min(len(ref), len(ours))
        e = ref[:n] - ours[:n]
        snr = 10 * np.log10(np.sum(ref[:n] ** 2) / max(np.sum(e * e), 1e-30))
        assert snr > 120.0, f"ch={ch}: own-vs-oracle decode {snr:.1f} dB"


@pytest.mark.slow
def test_celt_encode_frame_size_matrix():
    """Every CELT frame size (2.5/5/10/20 ms) produces a conformant
    stream the oracle decodes to the same audio as our decoder."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder

    pcm = _tone(0.2, 2)
    for fs in (120, 240, 480, 960):
        enc = OpusCeltEncoder(channels=2, bit_rate=96000, frame_size=fs)
        pkts = enc.push(pcm) + enc.flush()
        av = AvDecoder("opus", extradata=_opus_head_raw(2))
        outs = [np.asarray(av.push(p), dtype=np.float64) for p in pkts]
        outs.append(np.asarray(av.flush(), dtype=np.float64))
        ref = np.concatenate([o for o in outs if o.size]).reshape(-1, 2)
        own = OpusDecoder(channels=2)
        ours = np.concatenate([own.decode_packet(p) for p in pkts], axis=0)
        n = min(len(ref), len(ours))
        e = ref[:n] - ours[:n]
        snr = 10 * np.log10(np.sum(ref[:n] ** 2) / max(np.sum(e * e), 1e-30))
        assert snr > 120.0, f"fs={fs}: own-vs-oracle decode {snr:.1f} dB"


@pytest.mark.slow
def test_celt_encode_music_fixture_quality():
    """Real music through the owned encoder: >=12 dB at 96 kbps CBR
    (libopus VBR scores ~18 dB on the same clip; the owned encoder
    takes no transient/dynalloc decisions yet)."""
    from pathlib import Path

    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder

    raw = Path(
        "/root/reference/testdata/linear16_48/"
        "A_Tusk_is_used_to_make_costly_gifts.s16le"
    )
    if not raw.is_file():
        pytest.skip("reference testdata not available")
    pcm = np.frombuffer(raw.read_bytes(), dtype="<i2").astype(np.float64)
    pcm = pcm.reshape(-1, 2) / 32768.0
    enc = OpusCeltEncoder(channels=2, bit_rate=96000)
    pkts = enc.push(pcm) + enc.flush()
    av = AvDecoder("opus", extradata=_opus_head_raw(2))
    outs = [np.asarray(av.push(p), dtype=np.float64) for p in pkts]
    outs.append(np.asarray(av.flush(), dtype=np.float64))
    out = np.concatenate([o for o in outs if o.size]).reshape(-1, 2)
    snr = _aligned_snr(pcm, out, maxoff=4)
    assert snr > 12.0, f"music snr {snr:.1f} dB"


def test_opus_encoder_routing():
    """encoders.OpusEncoder: owned backend at 48 kHz by default,
    libopus shim at other rates or on request."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    own = OpusEncoder(48000, 2, 96000)
    assert own.backend == "owned" and own.pre_skip == 0
    assert own.frame_size == 960
    tone = (
        32767 * 0.4 * np.sin(2 * np.pi * 440 * np.arange(9600 * 2) / 48000.0)
    ).astype(np.int16)
    pkts = own.encode_i16_packets(tone) + own.flush_packets()
    assert len(pkts) >= 9

    shim = OpusEncoder(16000, 1, 32000)
    assert shim.backend == "libopus"
    forced = OpusEncoder(48000, 2, 96000, backend="libopus")
    assert forced.backend == "libopus" and forced.pre_skip == 312


def test_native_celt_encoder_matches_python():
    """The C++ encoder (skt_celt_enc_frame) must emit byte-identical
    packets to the Python CeltEncoder across signals, bitrates, and
    both channel counts (same double-precision math end to end)."""
    pytest.importorskip("scipy")
    try:
        from soundkit_tpu.codecs.celt_native import NativeCeltEncoder  # noqa: F401
    except Exception:
        pytest.skip("native host library unavailable")
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder

    rng = np.random.default_rng(5)
    n = 48000
    t = np.arange(n)
    for C in (1, 2):
        for bitrate in (48000, 128000):
            sig = (0.4 * np.sin(0.03 * t)
                   + 0.1 * np.sin(0.31 * t)
                   + 0.02 * rng.standard_normal(n))
            x = np.stack([sig, 0.8 * sig], axis=1)[:, :C]
            e_nat = OpusCeltEncoder(channels=C, bit_rate=bitrate)
            e_py = OpusCeltEncoder(channels=C, bit_rate=bitrate,
                                   native=False)
            assert e_nat._native is not None, "native backend not built"
            p_nat = e_nat.push(x) + e_nat.flush()
            p_py = e_py.push(x) + e_py.flush()
            assert len(p_nat) == len(p_py)
            assert p_nat == p_py, (
                f"C={C} {bitrate}bps: packets diverge from python"
            )


def test_transient_frames_oracle_and_backends():
    """Attack-heavy input triggers short-block (transient) frames;
    packets must stay byte-identical across backends and decode
    through the independent libopus oracle at sane quality."""
    import struct

    import soundkit_tpu.codecs.opus_celt_enc as oce
    from soundkit_tpu.codecs.avdec import AvDecoder

    n = 48000 * 2
    t = np.arange(n)
    x = 0.02 * np.sin(0.01 * t)
    for k in range(8):
        p = 6000 + k * 11000
        burst = 0.5 * np.sin(0.3 * np.arange(2000)) * np.exp(
            -np.arange(2000) / 300.0)
        x[p : p + 2000] += burst
    x2 = np.stack([x, 0.8 * x], axis=1)

    # the detector must fire on this material
    enc_probe = oce.OpusCeltEncoder(channels=2, bit_rate=96000)
    pre = enc_probe._preemph(x2)
    hits = sum(
        oce.detect_transient(pre[:, f * 960 : f * 960 + 1080], 960, 8)
        for f in range(60)
        if pre[:, f * 960 : f * 960 + 1080].shape[1] >= 1080
    )
    assert hits >= 1, "transient detector never fired"

    e_nat = oce.OpusCeltEncoder(channels=2, bit_rate=96000)
    e_py = oce.OpusCeltEncoder(channels=2, bit_rate=96000, native=False)
    p_nat = e_nat.push(x2) + e_nat.flush()
    p_py = e_py.push(x2) + e_py.flush()
    assert p_nat == p_py, "native/python diverge on transient frames"

    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
            + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00")
    av = AvDecoder("opus", extradata=head)
    parts = [av.push(p) for p in p_nat] + [av.flush()]
    parts = [p for p in parts if p is not None and p.size]
    out = np.concatenate(parts, axis=-1).reshape(-1, 2)
    m = min(len(out), len(x2))
    assert m > 48000
    e = out[:m] - x2[:m]
    snr = 10 * np.log10((x2[:m] ** 2).mean() / max((e ** 2).mean(), 1e-20))
    assert snr > 15.0, f"oracle decode SNR {snr:.1f} dB"


def test_ogg_opus_writer_roundtrip():
    """Owned encode -> OggOpusWriter mux -> own Ogg-Opus decode, plus
    the libavcodec oracle demuxing the same file."""
    from soundkit_tpu.codecs.opus import OggOpusDecoder
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder
    from soundkit_tpu.demux.ogg import OggOpusWriter

    rng = np.random.default_rng(2)
    n = 48000
    t = np.arange(n)
    x = np.stack([
        0.3 * np.sin(0.02 * t) + 0.02 * rng.standard_normal(n),
        0.25 * np.sin(0.018 * t),
    ], axis=1)
    enc = OpusCeltEncoder(channels=2, bit_rate=96000)
    w = OggOpusWriter(channels=2)
    chunks = []
    for i in range(0, n, 9600):  # streamed in 200 ms slabs
        for pkt in enc.push(x[i : i + 9600]):
            w.write_packet(pkt)
        chunks.append(w.take())
    for pkt in enc.flush():
        w.write_packet(pkt)
    chunks.append(w.close())
    wire = b"".join(chunks)
    assert wire[:4] == b"OggS"

    dec = OggOpusDecoder()
    out = dec.decode_f32(wire).reshape(-1, 2)
    m = min(len(out), n)
    assert m > 40000
    e = out[:m] - x[:m]
    snr = 10 * np.log10((x[:m] ** 2).mean() / max((e ** 2).mean(), 1e-20))
    assert snr > 12.0, f"own round-trip SNR {snr:.1f}"

    # independent oracle: the autodetect pipeline reads the same file
    from soundkit_tpu.pipeline.decode_pipeline import StreamDecoder
    from soundkit_tpu.core.audio_types import AudioData

    sd = StreamDecoder()
    outs = sd.process(wire) + sd.process(b"")
    audio = [o for o in outs if isinstance(o, AudioData)]
    assert audio and audio[0].sampling_rate == 48000


def test_ogg_opus_writer_edge_cases():
    """Empty-close emits a packet-free EOS page; granule positions
    come from each packet's TOC (10 ms frames advance 480, not 960)."""
    import struct

    from soundkit_tpu.codecs.opus import OggOpusDecoder
    from soundkit_tpu.codecs.opus_celt_enc import OpusCeltEncoder
    from soundkit_tpu.demux.ogg import OggOpusWriter

    # empty stream: headers + EOS, decodable as zero samples
    w = OggOpusWriter(channels=1)
    wire = w.close()
    dec = OggOpusDecoder()
    out = dec.decode_f32(wire)
    assert out.size == 0
    # EOS page carries no packet: its segment count is zero
    last = wire.rfind(b"OggS")
    assert wire[last + 5] & 4  # EOS flag
    assert wire[last + 26] == 0  # zero lacing segments

    # 10 ms frames: the final granule equals the true sample count
    n = 48000 // 2
    t = np.arange(n)
    x = np.stack([0.3 * np.sin(0.02 * t), 0.2 * np.sin(0.03 * t)], axis=1)
    enc = OpusCeltEncoder(channels=2, bit_rate=96000, frame_size=480)
    w = OggOpusWriter(channels=2)
    pkts = enc.push(x) + enc.flush()
    for p in pkts:
        w.write_packet(p)
    wire = w.close()
    # walk pages, read the last granule
    pos, granule = 0, 0
    while True:
        pos = wire.find(b"OggS", pos)
        if pos < 0:
            break
        granule = struct.unpack_from("<q", wire, pos + 6)[0]
        pos += 4
    assert granule == len(pkts) * 480, (granule, len(pkts))


# ---------------------------------------------------------------------------
# SILK frame encoder (opus_silk_enc.py)
# ---------------------------------------------------------------------------

def _speech_48k(seconds: float) -> np.ndarray:
    from pathlib import Path

    raw = Path(
        "/root/reference/testdata/linear16_48/"
        "A_Tusk_is_used_to_make_costly_gifts.s16le"
    )
    if not raw.is_file():
        pytest.skip("reference testdata not available")
    pcm = np.frombuffer(raw.read_bytes(), dtype="<i2").astype(np.float64)
    return (pcm / 32768.0)[: int(48000 * seconds)]


def _mono_snr(ref: np.ndarray, out: np.ndarray, maxoff: int = 600) -> float:
    """Best gain-compensated SNR over decoder/FIR delay candidates."""
    n = min(len(ref), len(out))
    best = -1.0
    for off in range(maxoff):
        b = out[off:n]
        a = ref[: n - off]
        g = float(np.dot(a, b)) / (float(np.dot(b, b)) + 1e-12)
        e = a - g * b
        best = max(
            best,
            10 * np.log10(float(np.mean(a * a)) / (float(np.mean(e * e)) + 1e-12)),
        )
    return best


def test_silk_encode_own_decode_speech():
    """Owned SILK encode -> owned decode on real speech (WB, 1 s)."""
    from soundkit_tpu.codecs.opus_core import OpusDecoder
    from soundkit_tpu.codecs.opus_silk_enc import OpusSilkEncoder

    pcm = _speech_48k(1.0)
    enc = OpusSilkEncoder(bandwidth="wb", bit_rate=28000)
    pkts = enc.push(pcm) + enc.flush()
    assert len(pkts) >= 48
    assert all(1 <= len(p) <= 1275 for p in pkts)
    # TOC: config 9 (SILK WB 20 ms), mono, code 0
    assert all(p[0] == (9 << 3) for p in pkts)
    dec = OpusDecoder(channels=1)
    out = np.concatenate([dec.decode_packet(p) for p in pkts]).reshape(-1)
    snr = _mono_snr(pcm, out)
    assert snr > 10.0, f"own-decode snr {snr:.1f} dB"


def test_silk_encode_independent_oracle_accepts_packets():
    """libopus must accept our SILK packets and match our decoder to
    >120 dB — bitstream conformance for the voice layer (NB fast path;
    the full bandwidth matrix is the slow test below)."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder
    from soundkit_tpu.codecs.opus_silk_enc import OpusSilkEncoder

    pcm = _speech_48k(1.0)
    enc = OpusSilkEncoder(bandwidth="nb", bit_rate=20000)
    pkts = enc.push(pcm) + enc.flush()
    av = AvDecoder("opus", extradata=_opus_head_raw(1))
    outs = [np.asarray(av.push(p), dtype=np.float64).reshape(-1) for p in pkts]
    ref = np.concatenate([o for o in outs if o.size])
    own = OpusDecoder(channels=1)
    ours = np.concatenate([own.decode_packet(p) for p in pkts]).reshape(-1)
    n = min(len(ref), len(ours))
    e = ref[:n] - ours[:n]
    snr = 10 * np.log10(np.sum(ref[:n] ** 2) / max(np.sum(e * e), 1e-30))
    assert snr > 120.0, f"own-vs-oracle decode {snr:.1f} dB"


@pytest.mark.slow
def test_silk_encode_bandwidth_matrix():
    """All three SILK bandwidths on the full speech fixture: VBR rate
    lands near target, oracle agreement >120 dB, speech SNR per band."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder
    from soundkit_tpu.codecs.opus_silk_enc import OpusSilkEncoder

    pcm = _speech_48k(3.0)
    # measured 11.7/12.5/20.7 with the Chebyshev-bisection LSF
    # converter (better spectral tracking at lower bitrate than the
    # original eigen-root targets; wb gains +5 dB)
    bars = {"nb": 9.0, "mb": 10.0, "wb": 16.0}
    for bw, br in (("nb", 20000), ("mb", 24000), ("wb", 28000)):
        enc = OpusSilkEncoder(bandwidth=bw, bit_rate=br)
        pkts = enc.push(pcm) + enc.flush()
        kbps = np.mean([len(p) for p in pkts]) * 8 / 0.02 / 1000
        assert kbps < br / 1000 * 1.6, f"{bw}: VBR landed at {kbps:.1f} kbps"
        own = OpusDecoder(channels=1)
        a = np.concatenate([own.decode_packet(p) for p in pkts]).reshape(-1)
        av = AvDecoder("opus", extradata=_opus_head_raw(1))
        outs = [np.asarray(av.push(p), dtype=np.float64).reshape(-1)
                for p in pkts]
        b = np.concatenate([o for o in outs if o.size])
        n = min(len(a), len(b))
        agree = 10 * np.log10(
            np.sum(b[:n] ** 2) / max(np.sum((a[:n] - b[:n]) ** 2), 1e-30))
        # sharper quantized filters leave poles nearer the unit
        # circle, so decoder-vs-decoder float agreement sits ~110-130
        assert agree > 100.0, f"{bw}: oracle agreement {agree:.1f} dB"
        snr = _mono_snr(pcm, b)
        assert snr > bars[bw], f"{bw}: speech snr {snr:.1f} dB"


def test_opus_encoder_voice_routing():
    """encoders.OpusEncoder(mode='voice'): owned SILK backend for mono
    48 kHz, packets decode on the owned decoder."""
    from soundkit_tpu.codecs.encoders import OpusEncoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder

    enc = OpusEncoder(48000, 1, 24000, mode="voice", voice_bandwidth="wb")
    assert enc.backend == "owned-silk" and enc.pre_skip == 0
    assert enc.frame_size == 960
    t = np.arange(48000 // 2)
    tone = (32767 * 0.3 * np.sin(2 * np.pi * 220 * t / 48000.0)).astype(
        np.int16)
    pkts = enc.encode_i16_packets(tone) + enc.flush_packets()
    assert len(pkts) >= 24
    dec = OpusDecoder(channels=1)
    out = np.concatenate([dec.decode_packet(p) for p in pkts])
    assert out.shape[0] >= 24 * 960
    stereo = OpusEncoder(48000, 2, 40000, mode="voice")
    assert stereo.backend == "owned-silk"


def test_silk_encode_stereo_oracle_and_quality():
    """Stereo (mid/side) SILK encode: libopus accepts the packets and
    matches our decoder; per-channel quality on correlated stereo."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder
    from soundkit_tpu.codecs.opus_silk_enc import OpusSilkEncoder

    mono = _speech_48k(1.0)
    # correlated stereo: right = attenuated, 1 ms delayed left
    R = np.concatenate([np.zeros(48), 0.7 * mono[:-48]])
    pcm = np.stack([mono, R], axis=1)
    enc = OpusSilkEncoder(bandwidth="wb", bit_rate=40000, channels=2)
    pkts = enc.push(pcm) + enc.flush()
    # TOC: config 9, stereo flag, code 0
    assert all(p[0] == (9 << 3) | 4 for p in pkts)
    own = OpusDecoder(channels=2)
    a = np.concatenate([own.decode_packet(p) for p in pkts], axis=0)
    av = AvDecoder("opus", extradata=_opus_head_raw(2))
    outs = [np.asarray(av.push(p), dtype=np.float64).reshape(-1, 2)
            for p in pkts]
    b = np.concatenate([o for o in outs if o.size], axis=0)
    n = min(len(a), len(b))
    e = a[:n] - b[:n]
    agree = 10 * np.log10(np.sum(b[:n] ** 2) / max(np.sum(e * e), 1e-30))
    assert agree > 100.0, f"stereo oracle agreement {agree:.1f} dB"
    snr_l = _mono_snr(mono, b[:, 0])
    snr_r = _mono_snr(R, b[:, 1])
    assert snr_l > 8.0 and snr_r > 8.0, (snr_l, snr_r)


def test_hybrid_encode_swb_fb():
    """Owned hybrid encode (SILK-WB + CELT start band 17 on one
    coder): CBR packets with hybrid TOCs, decodable by the oracle and
    our own decoder, with quality above the WB-only SILK ceiling."""
    import ctypes

    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.opus_core import OpusDecoder, parse_packet
    from soundkit_tpu.codecs.opus_hybrid_enc import OpusHybridEncoder

    pcm = _speech_48k(2.0)
    # add a strong 9 kHz component SILK-WB cannot represent
    t = np.arange(len(pcm)) / 48000.0
    hi = 0.08 * np.sin(2 * np.pi * 9000 * t) * np.abs(
        np.sin(2 * np.pi * 3 * t))
    x = np.clip(pcm + hi, -1, 1)

    op = ctypes.CDLL("libopus.so.0")
    op.opus_decoder_create.restype = ctypes.c_void_p
    op.opus_decoder_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    op.opus_decode_float.restype = ctypes.c_int
    op.opus_decode_float.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]

    for bw, br, cfg in (("swb", 32000, 13), ("fb", 40000, 15)):
        enc = OpusHybridEncoder(bandwidth=bw, bit_rate=br)
        pkts = enc.push(x.reshape(-1, 1)) + enc.flush()
        kbps = np.mean([len(p) for p in pkts]) * 8 / 0.02 / 1000
        # near-CBR: the SILK pulse floor can push hot content up to
        # ~30% above target (opus_hybrid_enc docstring)
        assert br / 1000 * 0.8 < kbps < br / 1000 * 1.4, \
            f"{bw}: rate at {kbps:.1f}"
        for p in pkts:
            toc, _ = parse_packet(p)
            assert toc.mode == "hybrid" and toc.config == cfg

        # libopus (normative) accepts and decodes the stream
        err = ctypes.c_int(0)
        lod = ctypes.c_void_p(
            op.opus_decoder_create(48000, 1, ctypes.byref(err)))
        lib_out = []
        for p in pkts:
            buf = np.zeros(5760, dtype=np.float32)
            n = op.opus_decode_float(
                lod, p, len(p),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                5760, 0)
            assert n == 960
            lib_out.append(buf[:n].astype(np.float64))
        b = np.concatenate(lib_out)

        # our own decoder agrees with the oracle (median frame)
        own = OpusDecoder(1)
        av = AvDecoder("opus", extradata=_opus_head_raw(1))
        per = []
        for p in pkts:
            a = own.decode_packet(p).reshape(-1)
            r = np.asarray(av.push(p), dtype=np.float64).reshape(-1)
            m = min(len(a), len(r))
            sig = float(np.sum(r[:m] ** 2))
            if sig > 1e-12:
                e = float(np.sum((a[:m] - r[:m]) ** 2))
                per.append(10 * np.log10(sig / max(e, 1e-30)))
        # decoder-vs-decoder float spread widens on hot hybrid
        # frames (sharp quantized filters); three-way arbitration vs
        # fixed-point libopus shows all decoders agree within the
        # usual float/fixed tolerance on the outliers
        assert np.median(per) > 50.0
        assert min(per) > 15.0

        snr = _mono_snr(x, b)
        assert snr > 10.0, f"{bw}: speech snr {snr:.1f} dB"


def test_opus_encoder_hybrid_routing():
    from soundkit_tpu.codecs.encoders import OpusEncoder
    from soundkit_tpu.codecs.opus_core import parse_packet

    enc = OpusEncoder(48000, 1, 32000, mode="voice",
                      voice_bandwidth="swb")
    assert enc.backend == "owned-hybrid"
    pcm = _speech_48k(0.5)
    pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
    assert pkts and all(
        parse_packet(p)[0].mode == "hybrid" for p in pkts)
    # stereo hybrid: valid packets with the stereo TOC flag
    enc2 = OpusEncoder(48000, 2, 48000, mode="voice",
                       voice_bandwidth="fb")
    assert enc2.backend == "owned-hybrid"
    st = np.stack([pcm, 0.7 * pcm], 1).reshape(-1)
    pkts2 = enc2.encode_i16_packets(st) + enc2.flush_packets()
    tocs = [parse_packet(p)[0] for p in pkts2]
    assert all(t.mode == "hybrid" and t.stereo for t in tocs)
