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
