"""Native SILK decode stage (native/src/silk_parse.cpp) parity.

The C++ port must be differentially pinned to the owned Python decoder
(codecs/opus_silk.py) — same tables, same parse, same synthesis — and
its exported range-coder state must let the hybrid CELT layer continue
exactly where the Python rc would be.
Parity reference: soundkit-opus/src/lib.rs (libopus wrapper).
"""
import struct
from pathlib import Path

import numpy as np
import pytest

from soundkit_tpu.codecs.opus_core import OpusDecoder, parse_packet
from soundkit_tpu.codecs.opus_rc import RangeDecoder
from soundkit_tpu.codecs.opus_silk import SilkDecoder

CLIP = "A_Tusk_is_used_to_make_costly_gifts"
TESTDATA = Path("/root/reference/testdata")


def _silk_fixture_frames():
    data = (TESTDATA / "opus" / f"{CLIP}.opus").read_bytes()
    body = data[19:]
    out = []
    pos = 0
    while pos + 2 <= len(body):
        (n,) = struct.unpack_from("<H", body, pos)
        toc, frames = parse_packet(body[pos + 2 : pos + 2 + n])
        out.extend((toc, f) for f in frames)
        pos += 2 + n
    return out


def test_native_silk_differential_fixture():
    """Superframe-by-superframe: native output equals the Python
    decoder to float rounding, and the exported rc state equals the
    Python rc field-for-field (the hybrid continuation contract)."""
    from soundkit_tpu.codecs.silk_native import NativeSilkDecoder

    py = SilkDecoder()
    nat = NativeSilkDecoder()
    n_frames = 0
    for toc, f in _silk_fixture_frames():
        rc = RangeDecoder(f)
        a = py.decode_superframe(rc, toc.bandwidth, 1,
                                 int(toc.frame_duration))
        b, red, st = nat.decode_superframe(
            f, toc.bandwidth, 1, int(toc.frame_duration), False)
        assert a.shape == b.shape
        assert float(np.max(np.abs(a - b))) < 1e-12
        assert st == (rc.offs, rc.rem, rc.end_offs, rc.end_window,
                      rc.nend_bits, rc.nbits_total, rc.rng, rc.val,
                      int(rc.error))
        n_frames += 1
    assert n_frames > 100


def test_native_silk_redundancy_info_matches_python_rule():
    """The native trailing-redundancy detection must equal the Python
    _silk_transition guard (tell+17 slack, pos bit, size split)."""
    from soundkit_tpu.codecs.silk_native import NativeSilkDecoder

    py = SilkDecoder()
    nat = NativeSilkDecoder()
    n_red = 0
    for toc, f in _silk_fixture_frames():
        # pad some frames so redundancy triggers
        q = f + bytes([0x5A] * 6)
        rc = RangeDecoder(q)
        py.decode_superframe(rc, toc.bandwidth, 1,
                             int(toc.frame_duration))
        _, red, _ = nat.decode_superframe(
            q, toc.bandwidth, 1, int(toc.frame_duration), True)
        tell = rc.tell()
        total = rc.total_bits
        if tell + 17 <= total:
            pos = rc.dec_bit_logp(1)
            red_size = len(q) - ((tell + 7) >> 3)
            if red_size >= 1:
                assert red is not None
                assert red["pos"] == pos
                assert red["size"] == red_size
                assert red["offset"] == len(q) - red_size
                n_red += 1
                continue
        assert red is None
    assert n_red > 50


def test_opus_decoder_native_equals_python():
    """Full OpusDecoder outputs (incl. resampler, redundancy fades,
    transitions) must be identical with the native and Python SILK
    stages on SILK and hybrid content."""
    from soundkit_tpu.codecs.encoders import OpusEncoder

    rng = np.random.default_rng(5)
    sr = 48000
    n = sr * 3
    t = np.arange(n) / sr
    f0 = 140 + 25 * np.sin(2 * np.pi * 2 * t)
    phs = np.cumsum(2 * np.pi * f0 / sr)
    sig = (0.4 * np.sin(phs) + 0.2 * np.sin(2 * phs)) * (
        0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3 * t)))
    sig = sig + 0.02 * rng.normal(size=n)
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16).reshape(-1, 1)
    for br in (16000, 32000):  # SILK-WB and hybrid operating points
        enc = OpusEncoder(sample_rate=48000, channels=1, bit_rate=br,
                          backend="libopus")
        pkts = enc.encode_i16_packets(pcm) + enc.flush_packets()
        d_nat = OpusDecoder(1)
        assert d_nat.use_native_silk
        d_py = OpusDecoder(1)
        d_py.use_native_silk = False
        for p in pkts:
            a = d_nat.decode_packet(p)
            b = d_py.decode_packet(p)
            assert a.shape == b.shape
            assert float(np.max(np.abs(a - b))) < 1e-9


@pytest.mark.slow
def test_opus_decoder_native_equals_python_stereo_fec():
    """Stereo + LBRR + bandwidth-switch content through the full
    decoder: native and Python stages must agree."""
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
    enc = ctypes.c_void_p(op.opus_encoder_create(48000, 2, 2048,
                                                 ctypes.byref(err)))
    for req, v in ((4012, 1), (4014, 20), (4002, 40000)):
        assert op.opus_encoder_ctl(enc, req, v) == 0
    rng = np.random.default_rng(6)
    n = 48000 * 2
    t = np.arange(n) / 48000.0
    base = (0.4 * np.sin(2 * np.pi * 200 * t)
            * (1 + 0.6 * np.sin(2 * np.pi * 2.5 * t)))
    x = np.stack([base, 0.7 * base + 0.02 * rng.standard_normal(n)],
                 1).astype(np.float32)
    pkts = []
    for k, i in enumerate(range(0, n - 960, 960)):
        op.opus_encoder_ctl(enc, 4004, (1101, 1102, 1103)[(k // 20) % 3])
        buf = ctypes.create_string_buffer(4000)
        r = op.opus_encode_float(
            enc, np.ascontiguousarray(x[i:i + 960]).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)), 960, buf, 4000)
        pkts.append(buf.raw[:r])
    d_nat = OpusDecoder(2)
    d_py = OpusDecoder(2)
    d_py.use_native_silk = False
    for p in pkts:
        a = d_nat.decode_packet(p)
        b = d_py.decode_packet(p)
        assert a.shape == b.shape
        assert float(np.max(np.abs(a - b))) < 1e-9


def test_native_silk_batch_matches_single():
    """decode_many over B lanes equals per-lane decode_superframe."""
    from soundkit_tpu.codecs.silk_native import (NativeSilkBatch,
                                                 NativeSilkDecoder)

    items = _silk_fixture_frames()[:24]
    B = 8
    batch = NativeSilkBatch(B, channels=1)
    singles = [NativeSilkDecoder() for _ in range(B)]
    for step in range(3):
        frames = []
        bws, durs = [], []
        for b in range(B):
            toc, f = items[(step * B + b) % len(items)]
            frames.append(f)
            bws.append(toc.bandwidth)
            durs.append(int(toc.frame_duration))
        valid = [1] * B
        valid[3] = 0  # one idle lane
        out, n, info = batch.decode_many(
            frames, bws, [1] * B, durs, valid)
        for b in range(B):
            if not valid[b]:
                assert n[b] == -1
                continue
            ref, _, st = singles[b].decode_superframe(
                frames[b], bws[b], 1, durs[b], False)
            assert n[b] == ref.shape[0]
            assert float(np.max(np.abs(out[b, :n[b], 0]
                                       - ref[:, 0]))) < 1e-12
            assert tuple(int(x) for x in info[b, 4:13]) == st


def test_native_silk_encoder_byte_identical():
    """The C++ SILK frame encoder must produce byte-identical payloads
    to the Python encoder across bandwidths (mono) and for stereo
    mid/side, frame after frame (carried state included)."""
    import ctypes

    from soundkit_tpu.codecs.opus_enc_rc import RangeEncoder
    from soundkit_tpu.codecs.opus_silk_enc import (SilkEncoder,
                                                   SilkStereoEncoder)
    from soundkit_tpu.codecs.silk_native import NativeSilkEncoder

    rng = np.random.default_rng(1)
    for bw in (0, 1, 2):
        rate = (8000, 12000, 16000)[bw]
        flen = 20 * (bw + 2) * 4
        t = np.arange(rate * 2) / rate
        x = (0.4 * np.sin(2 * np.pi * 170 * t)
             * (1 + 0.6 * np.sin(2 * np.pi * 2.6 * t))
             + 0.015 * rng.standard_normal(len(t)))
        py = SilkEncoder(bw)
        nat = NativeSilkEncoder(bw, 1)
        for i in range(0, len(x) - flen, flen):
            frame = np.ascontiguousarray(x[i:i + flen])
            rc = RangeEncoder(1275)
            py.target_pulse = 3.0
            py.encode_superframe(rc, frame)
            rc.finalize()
            a = bytes(rc.buf[:rc.offs])
            b = nat.encode_frame(frame.reshape(-1, 1), 3.0)
            assert a == b, f"bw={bw} frame {i // flen}"
    # stereo
    rate, flen = 16000, 320
    t = np.arange(rate * 2) / rate
    base = (0.4 * np.sin(2 * np.pi * 170 * t)
            * (1 + 0.6 * np.sin(2 * np.pi * 2.6 * t))
            + 0.015 * rng.standard_normal(len(t)))
    R = np.concatenate([np.zeros(8), 0.7 * base[:-8]])
    py = SilkStereoEncoder(2)
    nat = NativeSilkEncoder(2, 2)
    for i in range(0, len(base) - flen, flen):
        xl = np.ascontiguousarray(base[i:i + flen])
        xr = np.ascontiguousarray(R[i:i + flen])
        rc = RangeEncoder(1275)
        py.target_pulse = 3.0
        py.encode_superframe(rc, xl, xr)
        rc.finalize()
        a = bytes(rc.buf[:rc.offs])
        b = nat.encode_frame(np.stack([xl, xr], 1), 3.0)
        assert a == b, f"stereo frame {i // flen}"


def test_opus_silk_encoder_native_end_to_end():
    """The full 48 kHz packetizer with the native frame encoder must
    emit byte-identical packets to the Python path (VBR rate loop
    included) and be an order of magnitude faster."""
    from soundkit_tpu.codecs.opus_silk_enc import OpusSilkEncoder

    rng = np.random.default_rng(0)
    t = np.arange(48000 * 2) / 48000.0
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.01 * rng.standard_normal(len(t)))
    for ch in (1, 2):
        pcm = (x.reshape(-1, 1) if ch == 1
               else np.stack([x, 0.7 * x], 1))
        nat = OpusSilkEncoder(bandwidth="wb", bit_rate=32000 * ch,
                              channels=ch)
        assert nat._native is not None
        py = OpusSilkEncoder(bandwidth="wb", bit_rate=32000 * ch,
                             channels=ch)
        py._native = None
        assert nat.push(pcm) == py.push(pcm)
        assert nat.flush() == py.flush()
