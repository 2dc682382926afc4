"""Host-path codec tests (libavcodec-backed): MP3, AAC ADTS, GSM,
AMR-NB, G.729, AC-3 — decode real fixtures, compare against the
reference golden WAVs with PSNR (the reference used different C
backends, so bit-exactness is not expected; quality parity is)."""
from pathlib import Path

import numpy as np
import pytest

from soundkit_tpu.core.audio_types import AudioData
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.pipeline.decode_pipeline import DecodePipeline
from soundkit_tpu.pipeline.output_options import DecodeError

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _drive(handle, data, chunk=4096):
    drained = []
    for off in range(0, len(data), chunk):
        handle.send_blocking(data[off : off + chunk], drained)
    handle.send_blocking(b"", drained)
    outs = drained + handle.recv_all()
    errs = [o for o in outs if isinstance(o, DecodeError)]
    assert not errs, errs
    return [o for o in outs if isinstance(o, AudioData)]


def _align(ref: np.ndarray, test: np.ndarray):
    """Cross-correlation alignment (aac-wasm-bench compare_unaligned
    offset search, exact-lag version)."""
    ref = ref.astype(np.float64)
    test = test.astype(np.float64)
    n = min(len(ref), len(test))
    c = np.correlate(test[:n], ref[:n], "full")
    lag = int(np.argmax(np.abs(c))) - (n - 1)
    if lag >= 0:
        a, b = test[lag:n], ref[: n - lag]
    else:
        a, b = test[: n + lag], ref[-lag:n]
    return b, a  # (ref_aligned, test_aligned)


def _best_aligned_snr(ref: np.ndarray, test: np.ndarray, max_lag=None):
    r, t = _align(ref, test)
    err = r - t
    e = np.mean(err * err)
    return 10 * np.log10(np.mean(r * r) / e) if e > 0 else 99.0


def _aligned_corr(ref: np.ndarray, test: np.ndarray):
    r, t = _align(ref, test)
    return np.corrcoef(r, t)[0, 1]


def _decoded_mono_i16(audio_frames):
    pcm = np.concatenate([np.frombuffer(a.data, "<i2") for a in audio_frames])
    ch = audio_frames[0].channel_count
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return pcm


@pytest.mark.parametrize(
    "spawn,fixture,golden_name,rate,min_snr,min_corr",
    [
        # GSM: ffmpeg's decoder vs libgsm — near-identical waveforms
        ("spawn_gsm", "gsm/{}.gsm", "gsm/{}.decoded.wav", 8000, 20.0, 0.99),
        # AMR/G.729 are parametric vocoders: different conformant
        # implementations differ at waveform level; require high corr
        ("spawn_amr_nb", "amr_nb/{}.amr", "amr_nb/{}.decoded.wav", 8000, 8.0, 0.95),
        ("spawn_g729", "g729/{}.g729", "g729/{}.decoded.wav", 8000, 8.0, 0.95),
    ],
)
def test_telephony_vs_golden(testdata, golden, spawn, fixture, golden_name, rate, min_snr, min_corr):
    data = (testdata / fixture.format(CLIP)).read_bytes()
    gold = parse_wav((golden / golden_name.format(CLIP)).read_bytes())
    frames = _drive(getattr(DecodePipeline, spawn)(), data, chunk=127)
    assert frames[0].sampling_rate == rate
    ours = _decoded_mono_i16(frames)
    ref = np.frombuffer(gold.data, "<i2")
    assert abs(len(ours) - len(ref)) < rate  # within 1s (codec delay diffs)
    snr = _best_aligned_snr(ref, ours)
    corr = _aligned_corr(ref, ours)
    assert snr > min_snr, f"SNR {snr:.1f} dB vs golden"
    assert corr > min_corr, f"corr {corr:.4f} vs golden"


def test_ac3_autodetect_vs_golden(testdata, golden):
    data = (testdata / "ac3" / f"{CLIP}.ac3").read_bytes()
    gold = parse_wav((golden / "ac3" / f"{CLIP}.decoded.wav").read_bytes())
    frames = _drive(DecodePipeline.spawn(), data)  # autodetect
    ours = _decoded_mono_i16(frames)
    ref = np.frombuffer(gold.data, "<i2")
    if gold.channel_count > 1:
        ref = ref.reshape(-1, gold.channel_count).mean(axis=1).astype(np.int16)
    n = min(len(ours), len(ref))
    snr = _best_aligned_snr(ref[:n], ours[:n], max_lag=4000)
    assert snr > 20, f"AC-3 SNR {snr:.1f} dB vs golden"


def test_mp3_autodetect_decodes_clip(testdata):
    data = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    frames = _drive(DecodePipeline.spawn(), data, chunk=1000)
    assert frames[0].sampling_rate == 16000
    pcm = _decoded_mono_i16(frames)
    seconds = len(pcm) / 16000
    assert 2.8 < seconds < 3.3  # 2.96s clip + codec delay
    rms = np.sqrt(np.mean(pcm.astype(np.float64) ** 2))
    assert 150 < rms < 600


def test_mp3_vs_source_snr(testdata):
    """Decode mp3 and compare against the original 16k mono source."""
    data = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    src = np.frombuffer((testdata / "linear16" / f"{CLIP}.s16le").read_bytes(), "<i2")
    frames = _drive(DecodePipeline.spawn_mp3(), data)
    ours = _decoded_mono_i16(frames)
    snr = _best_aligned_snr(src, ours, max_lag=2200)
    assert snr > 14, f"MP3-vs-source SNR {snr:.1f} dB"


def test_mp3_chunk_invariance(testdata):
    """soundkit-decoder/src/lib.rs:3235 test_mp3_pipeline_chunk_invariance."""
    data = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()

    def run(chunk):
        frames = _drive(DecodePipeline.spawn_mp3(), data, chunk=chunk)
        return b"".join(a.data for a in frames)

    assert run(313) == run(8192) == run(len(data))


def test_aac_adts_golden_stream(golden):
    """golden/aac holds an encoded ADTS stream; decode through autodetect."""
    data = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    frames = _drive(DecodePipeline.spawn(), data, chunk=1000)
    assert frames, "no AAC output"
    pcm = _decoded_mono_i16(frames)
    assert frames[0].sampling_rate in (16000, 32000, 44100, 48000)
    rms = np.sqrt(np.mean(pcm.astype(np.float64) ** 2))
    assert rms > 100, f"AAC decoded to near-silence rms={rms}"


def test_gsm_microsoft_variant_rejects_short_frames():
    from soundkit_tpu.codecs.telephony import GsmDecoder, GsmVariant

    dec = GsmDecoder(GsmVariant.MICROSOFT)
    assert dec.frame_bytes == 65
    out = dec.decode_i16(b"\x00" * 64)  # less than one frame: buffered
    assert len(out) == 0


def test_gsm_0610_bitexact_vs_golden():
    """From-scratch GSM 06.10 decode must be BIT-EXACT with the libgsm
    output the reference checked into golden/gsm (the previous avcodec
    wrapper was only waveform-close)."""
    from soundkit_tpu.codecs.telephony import GsmDecoder
    from soundkit_tpu.core.wav import parse_wav

    data = open(
        "/root/reference/testdata/gsm/A_Tusk_is_used_to_make_costly_gifts.gsm",
        "rb",
    ).read()
    golden = parse_wav(
        open(
            "/root/reference/golden/gsm/A_Tusk_is_used_to_make_costly_gifts.decoded.wav",
            "rb",
        ).read()
    )
    ref = np.frombuffer(golden.data, dtype=np.int16)

    dec = GsmDecoder()
    # feed in awkward chunks to exercise frame buffering
    outs = [dec.decode_i16(data[i : i + 100]) for i in range(0, len(data), 100)]
    out = np.concatenate(outs)
    assert len(out) == len(ref)
    np.testing.assert_array_equal(out, ref)


def test_gsm_wav49_bitexact_vs_avcodec():
    """WAV49 (Microsoft 65-byte two-frame blocks, fields LSB-first) must
    bit-match the avcodec gsm_ms oracle on blocks re-packed from the
    standard-framing fixture."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.telephony import GsmDecoder, GsmVariant

    data = open(
        "/root/reference/testdata/gsm/A_Tusk_is_used_to_make_costly_gifts.gsm",
        "rb",
    ).read()
    widths = [6, 6, 5, 5, 4, 4, 3, 3] + ([7, 2, 2, 6] + [3] * 13) * 4

    def read_frame_msb(b):
        bit = 4  # skip the 0xD signature nibble
        vals = []
        for w in widths:
            v = 0
            for _ in range(w):
                v = (v << 1) | ((b[bit >> 3] >> (7 - (bit & 7))) & 1)
                bit += 1
            vals.append(v)
        return vals

    def pack_wav49(f1, f2):
        out = bytearray(65)
        bit = 0
        for vals in (f1, f2):
            for w, v in zip(widths, vals):
                for i in range(w):
                    if (v >> i) & 1:
                        out[bit >> 3] |= 1 << (bit & 7)
                    bit += 1
        return bytes(out)

    frames = [data[i : i + 33] for i in range(0, len(data) - 33, 33)]
    blocks = b"".join(
        pack_wav49(read_frame_msb(frames[2 * k]), read_frame_msb(frames[2 * k + 1]))
        for k in range(min(len(frames) // 2, 20))
    )

    dec = GsmDecoder(GsmVariant.MICROSOFT)
    out = dec.decode_i16(blocks)

    av = AvDecoder("gsm_ms", sample_rate=8000, channels=1)
    chunks = [av.push(blocks[i : i + 65]) for i in range(0, len(blocks), 65)]
    chunks.append(av.flush())
    ref = np.concatenate(chunks)
    ref_i16 = np.clip(np.round(ref * 32768), -32768, 32767).astype(np.int16)
    m = min(len(ref_i16), len(out))
    assert m >= 320
    np.testing.assert_array_equal(out[:m], ref_i16[:m])


def test_speex_nb_own_decode_vs_oracle():
    """From-scratch Speex NB CELP decode (codecs/speex_core.py) vs the
    avcodec oracle, SAMPLE-ALIGNED (the decoder now implements the
    oracle's one-subframe output delay, the multicomb enhancer, DF2T
    synthesis and the delay-shifted LSP interpolation — round-3 work,
    semantics recovered from the speexdec object code).  Round-3
    differential debugging against the extracted speexdec.o closed the
    two real semantic gaps — pitch_unquant_3tap's two-segment history
    reads (never the in-subframe recursion) and the three-clause
    enhancer pitch selection (0.6x submultiple / 0.67x multiple
    acceptance) — lifting the corpus SNR from 18.3 to ~77 dB; the
    remaining residual is f32-vs-f64 arithmetic noise."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.speex_core import SpeexNbDecoder
    from soundkit_tpu.demux.ogg import OggPacketizer

    data = open(
        "/root/reference/testdata/speex/A_Tusk_is_used_to_make_costly_gifts.spx",
        "rb",
    ).read()
    packets = [p for p, _ in OggPacketizer().push(data)]
    av = AvDecoder("speex", extradata=packets[0])
    outs = [av.push(p) for p in packets[2:]]
    outs.append(av.flush())
    ref = np.concatenate(outs).astype(np.float64)

    dec = SpeexNbDecoder()
    mine = np.concatenate(
        [dec.decode_packet(p, 1) for p in packets[2:]]
    ).astype(np.float64)
    assert len(mine) == len(ref)

    m = min(len(mine), len(ref))
    a, b = mine[:m], ref[:m]
    err = a - b
    snr = 10 * np.log10(np.dot(b, b) / max(np.dot(err, err), 1e-18))
    assert snr > 70.0, f"speex NB decode SNR {snr:.1f} dB vs enhanced oracle"
    # per-frame median is materially higher than the worst transitions
    per = []
    for f in range(m // 160):
        sl = slice(f * 160, (f + 1) * 160)
        e = a[sl] - b[sl]
        per.append(10 * np.log10(np.dot(b[sl], b[sl]) / max(np.dot(e, e), 1e-18)))
    assert float(np.median(per)) > 90.0


def test_speex_stream_decoder_uses_own_core():
    """The streaming SpeexDecoder must route NB mono through the owned
    core (no avcodec) and still satisfy the corpus duration/level."""
    from soundkit_tpu.codecs.speex import SpeexDecoder

    data = open(
        "/root/reference/testdata/speex/A_Tusk_is_used_to_make_costly_gifts.spx",
        "rb",
    ).read()
    dec = SpeexDecoder()
    pcm = np.concatenate(
        [dec.decode_f32(data[i : i + 997]) for i in range(0, len(data), 997)]
    )
    assert dec._dec is not None and dec._av is None, "avcodec fallback taken"
    assert dec.sample_rate == 8000 and dec.mode == 0
    assert len(pcm) == 23680
    rms = np.sqrt(np.mean(pcm**2))
    assert rms > 1e-3, f"decoded to near-silence rms={rms}"


def test_speex_inband_stereo_owned_vs_oracle():
    """In-band intensity stereo (request id 9): crafted 2-channel
    streams with parameter sweeps and mid-stream changes decode OWNED
    (no avcodec) and match the libavcodec oracle's L/R reconstruction
    including its per-sample reversed-loop gain smoothing."""
    import struct

    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.speex import SpeexDecoder
    from soundkit_tpu.demux.ogg import OggPacketizer, build_ogg_page

    data = open(
        "/root/reference/testdata/speex/A_Tusk_is_used_to_make_costly_gifts.spx",
        "rb",
    ).read()
    pk = OggPacketizer()
    pkts = [p for p, _ in pk.push(data)]
    hdr, comment, frames = pkts[0], pkts[1], pkts[2:]
    hdr2 = bytearray(hdr)
    struct.pack_into("<I", hdr2, 48, 2)  # channels = 2
    hdr2 = bytes(hdr2)

    def inject(pkt, sign, mag, er):
        bits = []

        def w(v, n):
            for k in range(n - 1, -1, -1):
                bits.append((v >> k) & 1)

        w(0, 1)
        w(14, 4)   # in-band signalling
        w(9, 4)    # SPEEX_INBAND_STEREO
        w(sign, 1)
        w(mag, 5)
        w(er, 2)
        for byte in pkt:
            w(byte, 8)
        w(0, 1)
        w(15, 4)   # terminator guards the bit-shifted padding
        bits += [0] * ((-len(bits)) % 8)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )

    cases = [(0, 4, 0), (1, 8, 1), (0, 12, 2), (0, 0, 3), (1, 20, 0)]
    inj = [inject(f, *cases[(i // 8) % len(cases)])
           for i, f in enumerate(frames[:40])]
    serial = 0x5557
    pages = [build_ogg_page([hdr2], serial, 0, 0, 2),
             build_ogg_page([comment], serial, 1, 0)]
    for i, p in enumerate(inj):
        pages.append(build_ogg_page(
            [p], serial, 2 + i, 160 * (i + 1),
            4 if i == len(inj) - 1 else 0))
    wire = b"".join(pages)

    dec = SpeexDecoder()
    own = dec.decode_f32(wire).reshape(-1, 2)
    assert dec._dec is not None and dec._av is None
    assert dec.channels == 2 and dec._stereo is not None

    av = AvDecoder("speex", sample_rate=8000, channels=2,
                   extradata=hdr2)
    orc = np.concatenate([av.push(p) for p in inj]).reshape(-1, 2)
    n = min(len(own), len(orc))
    assert n == 40 * 160
    e = own[:n] - orc[:n]
    snr = 10 * np.log10(float((orc[:n] ** 2).sum())
                        / max(float((e ** 2).sum()), 1e-300))
    assert snr > 60.0, f"stereo reconstruction SNR {snr:.1f} dB"
    # the intensity weights actually separate the channels
    assert np.abs(own[:n, 0] - own[:n, 1]).max() > 0.01 * np.abs(
        own[:n]).max()


@pytest.mark.slow
def test_speex_wideband_owned():
    """The SB-CELP wideband layer decodes owned (no avcodec): crafted
    WB stream vs the native speex oracle; NB fixture unaffected."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from vorbis_craft import ogg_encapsulate

    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.encoders import AvEncoder
    from soundkit_tpu.codecs.speex import SpeexDecoder

    rng = np.random.default_rng(2)
    sr = 16000
    n = sr * 2
    t = np.arange(n) / sr
    f0 = 120 + 20 * np.sin(2 * np.pi * 2.5 * t)
    ph = np.cumsum(2 * np.pi * f0 / sr)
    sig = (0.4 * np.sin(ph) + 0.2 * np.sin(2 * ph) + 0.1 * np.sin(5 * ph)
           + 0.05 * np.sin(2 * np.pi * 5000 * t))
    sig *= 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * t))
    sig += 0.02 * rng.normal(size=n)
    enc = AvEncoder("libspeex", 16000, 1)
    pkts = enc.push_f32(np.clip(sig, -1, 1).astype(np.float32)) + enc.flush()
    extradata = enc.extradata
    comment = b"\x10\x00\x00\x00soundkit-tpu-tst" + b"\x00" * 4
    stream = ogg_encapsulate([extradata, comment] + pkts)

    dec = SpeexDecoder()
    out = np.concatenate([dec.decode_f32(stream), dec.flush()])
    assert dec._dec is not None and dec._av is None  # owned path
    av = AvDecoder("speex", sample_rate=16000, channels=1,
                   extradata=extradata)
    ref = np.concatenate([av.push(p) for p in pkts] + [av.flush()])
    m = min(len(ref), len(out))
    e = ref[:m].astype(np.float64) - out[:m].astype(np.float64)
    snr = 10 * np.log10(np.mean(ref[:m].astype(np.float64) ** 2)
                        / (np.mean(e ** 2) + 1e-300))
    # the NB low band now conforms at ~77 dB (round-3 pitch fixes);
    # the residual is the owned SB high-band layer's f32 noise
    assert snr > 40.0
    # the high band itself conforms much closer
    from numpy.fft import rfft

    E = np.abs(rfft(e[:16000])) ** 2
    R = np.abs(rfft(ref[:16000].astype(np.float64))) ** 2
    half = len(R) // 2
    hi = 10 * np.log10(R[half:].sum() / (E[half:].sum() + 1e-30))
    assert hi > 24.0


@pytest.mark.slow
def test_speex_ultrawideband_owned():
    """Mode-2 (32 kHz) streams decode through the stacked fold-only
    SB layer, owned end to end."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.encoders import AvEncoder
    from soundkit_tpu.codecs.speex_core import SpeexSbDecoder

    rng = np.random.default_rng(3)
    sr = 32000
    n = sr * 2
    t = np.arange(n) / sr
    ph = np.cumsum(2 * np.pi * (120 + 20 * np.sin(2 * np.pi * 2.5 * t)) / sr)
    sig = (0.4 * np.sin(ph) + 0.2 * np.sin(2 * ph)
           + 0.05 * np.sin(2 * np.pi * 9000 * t)
           + 0.02 * rng.normal(size=n))
    enc = AvEncoder("libspeex", 32000, 1)
    pkts = enc.push_f32(np.clip(sig, -1, 1).astype(np.float32)) + enc.flush()
    av = AvDecoder("speex", sample_rate=32000, channels=1,
                   extradata=enc.extradata)
    ref = np.concatenate([av.push(p) for p in pkts] + [av.flush()])
    dec = SpeexSbDecoder(uwb=True)
    ours = np.concatenate([dec.decode_packet(p, 1) for p in pkts])
    m = min(len(ref), len(ours))
    e = ref[:m].astype(np.float64) - ours[:m].astype(np.float64)
    snr = 10 * np.log10(np.mean(ref[:m].astype(np.float64) ** 2)
                        / (np.mean(e ** 2) + 1e-300))
    assert snr > 45.0  # NB core conforms at ~77 dB after round-3 fixes
