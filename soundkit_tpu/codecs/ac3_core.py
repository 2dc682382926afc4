"""From-scratch AC-3 (ATSC A/52) decoder — host entropy/bit-allocation
layer.

Replaces the avcodec delegation in codecs/telephony.py for AC-3
(round-2 VERDICT missing #4).  Role-equivalent of the reference's
pure-Rust ``oxideav-ac3`` (soundkit-ac3/src/lib.rs:22,
Cargo.toml:11).

Architecture mirrors the AAC/MP3/Vorbis split: this host layer owns
the syncframe/BSI/audio-block parse, exponent decode, the A/52 §7.2.2
bit-allocation pipeline (PSD -> banded log-add -> excitation with
fast/slow leak decay -> hearing-threshold floor -> bap), mantissa
ungrouping/dequantization, coupling reconstruction, rematrixing and
dynamic-range compression, and emits per-block frequency coefficients;
the IMDCT + window + overlap-add run as batched device math
(ops/ac3_batch.py) or the numpy reference path here.

Spec constant tables (band structure, hearing thresholds, decay/gain
tables, bap lookup, grouped-mantissa ungrouping) are extracted from
the system libavcodec archive like the AAC/MP3/Vorbis/Speex tables
(native/tools/extract_tables.py -> native/generated/ac3_tables.npz).

Scope: AC-3 (bsid <= 8), all acmods, LFE, coupling, rematrixing,
dither (decoder-generated noise per A/52 §7.3.4 — any conformant
sequence; ours differs from the oracle's PRNG).  E-AC-3 is out of
scope (parity: the reference decodes plain AC-3 syncframes only).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np


class Ac3Error(ValueError):
    pass


@functools.lru_cache(maxsize=1)
def _t():
    path = (
        Path(__file__).resolve().parent.parent
        / "native"
        / "generated"
        / "ac3_tables.npz"
    )
    return dict(np.load(path))


N_BLOCKS = 6
BLOCK_SAMPLES = 256
LEVEL_M3DB = float(np.sqrt(0.5))

# two's-complement mantissa sizes for bap >= 6 (A/52 table 7.23)
_QNTZTAB_BITS = {6: 7, 7: 8, 8: 9, 9: 10, 10: 11, 11: 12, 12: 14, 13: 16,
                 14: 16, 15: 16}
# (A/52: bap 14 -> 16? canonical: {5:4-level...}); bap>=6 uses
# qntztab = [5,6,7,8,9,10,11,12,14,16] for bap 6..15
_BAP_BITS = [0, 0, 0, 3, 0, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16]


class Bits:
    """AC-3 bit packing: MSB-first."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos + n
        if p > self.nbits:
            raise Ac3Error("bitstream overrun")
        v = 0
        q = self.pos
        while q < p:
            byte = self.data[q >> 3]
            avail = 8 - (q & 7)
            take = min(avail, p - q)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            q += take
        self.pos = p
        return v

    def sget(self, n: int) -> int:
        v = self.get(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v


@dataclass
class BlockState:
    """Everything one audio block needs that can be reused from the
    previous block within a frame."""

    bap: np.ndarray = None
    exps: np.ndarray = None


def _ungroup3(v: int):
    return v // 9, (v // 3) % 3, v % 3


def _ungroup5(v: int):
    return v // 25, (v // 5) % 5, v % 5


def _ungroup11(v: int):
    return v // 11, v % 11


# per-acmod AV channel masks of the fbw channels in BITSTREAM order
# (FL=1 FR=2 FC=4 LFE=8 BC=0x100 SL=0x200 SR=0x400); layouts match
# ff_ac3_channel_layout_tab = [3,4,3,7,0x103,0x107,0x603,0x607]
_ACMOD_CH_MASKS = {
    0: [1, 2],
    1: [4],
    2: [1, 2],
    3: [1, 4, 2],
    4: [1, 2, 0x100],
    5: [1, 4, 2, 0x100],
    6: [1, 2, 0x200, 0x400],
    7: [1, 4, 2, 0x200, 0x400],
}


def _sym_quant(m: int, levels: int) -> int:
    """Symmetric dequant to a Q24 integer mantissa with one bit of
    headroom (±0.5 of full scale), matching avcodec's fixed_coeffs
    convention: ``((code - levels/2) * 2^24) / levels`` with C
    truncation toward zero.  The decoder compensates the halved
    mantissa scale with a 2x gain in the IMDCT."""
    a = (m - (levels >> 1)) << 24
    return -((-a) // levels) if a < 0 else a // levels


class Ac3Decoder:
    """One AC-3 stream of raw syncframes (bsid <= 8)."""

    def __init__(self, dither: bool = True):
        t = _t()
        self.t = t
        self._buf = bytearray()
        self.sample_rate: Optional[int] = None
        self.channels: Optional[int] = None
        self._delay = None  # [ch, 256] overlap halves
        self._dither_on = dither
        self._mant_trace = None  # test hook: (bin, bitpos, nbits) log
        self._lfg_init(0)
        self.lfe_on = False

    # -- dither PRNG --------------------------------------------------------
    # A/52 7.3.4 permits any conformant noise; this replicates the
    # oracle's generator bit-exactly (recovered from the object code:
    # a 55/24 lagged-Fibonacci PRNG seeded via chained MD5, dither
    # value = (((u >> 8) * 181) >> 8) - 0x5A8000 in Q23) so the decode
    # can be compared at full precision.
    def _lfg_init(self, seed: int = 0) -> None:
        import hashlib

        state = np.zeros(64, dtype=np.uint64)
        tmp = bytearray(16)
        # verified against libavutil av_lfg_init: state[0..7] stay 0,
        # each 4-word group is a CHAINED md5 (the previous digest's
        # tail bytes remain in the buffer)
        for i in range(8, 64, 4):
            tmp[0:4] = int(seed).to_bytes(4, "little")
            tmp[4] = i
            tmp[:] = hashlib.md5(bytes(tmp)).digest()
            for j in range(4):
                state[i + j] = int.from_bytes(
                    tmp[4 * j : 4 * j + 4], "little"
                )
        self._lfg_state = state
        self._lfg_index = 0

    def _lfg_get(self) -> int:
        i = self._lfg_index
        v = (
            int(self._lfg_state[(i - 24) & 63])
            + int(self._lfg_state[(i - 55) & 63])
        ) & 0xFFFFFFFF
        self._lfg_state[i & 63] = v
        self._lfg_index = i + 1
        return v

    def _dither1(self) -> int:
        """One dither mantissa in Q24 headroom units (range ~±0.35,
        i.e. ±0.707 of the half-scale mantissa range), exactly the
        avcodec form ``(((lfg>>8)*181)>>8) - 0x5A8000``."""
        u = self._lfg_get()
        return (((u >> 8) * 181) >> 8) - 0x5A8000

    # -- exponents ----------------------------------------------------------
    @staticmethod
    def _decode_exps(br: Bits, absexp: int, ngrps: int, grpsize: int):
        """Grouped exponents -> per-mantissa exponent array (excluding
        the leading absolute exponent for fbw/cpl semantics handled by
        the caller)."""
        exps = []
        pre = absexp
        for _ in range(ngrps):
            v = br.get(7)
            for d in (v // 25, (v // 5) % 5, v % 5):
                if d >= 5:
                    raise Ac3Error("exponent group out of range")
                pre += d - 2
                if pre < 0 or pre > 24:
                    raise Ac3Error("exponent out of range")
                exps.extend([pre] * grpsize)
        return exps

    # -- bit allocation (A/52 7.2.2) ----------------------------------------
    def _bit_alloc(self, exps, strtmant, endmant, fgain, sgain, sdecay,
                   fdecay, dbknee, floor_v, snroffset, fscod,
                   deltba=None, fastleak0=0, slowleak0=0, is_cpl=False):
        t = self.t
        masktab = t["bin_to_band"]
        bndtab = t["band_start"]
        latab = t["log_add"].astype(np.int64)
        hth = t["hth"].astype(np.int64)

        psd = np.zeros(endmant, dtype=np.int64)
        psd[strtmant:endmant] = 3072 - (
            np.asarray(exps[: endmant - strtmant], dtype=np.int64) << 7
        )

        bndstrt = int(masktab[strtmant])
        bndend = int(masktab[endmant - 1]) + 1

        # banded psd via log-add
        bndpsd = np.zeros(50, dtype=np.int64)
        j = strtmant
        for band in range(bndstrt, bndend):
            lastbin = min(int(bndtab[band + 1]) if band + 1 < 51 else 253,
                          endmant)
            v = psd[j]
            j += 1
            while j < lastbin:
                adr = min(abs(int(v) - int(psd[j])) >> 1, 255)
                v = max(int(v), int(psd[j])) + int(latab[adr])
                j += 1
            bndpsd[band] = v

        # excitation
        excite = np.zeros(50, dtype=np.int64)
        if bndstrt == 0:  # fbw or lfe channel
            lowcomp = 0
            lowcomp = self._calc_lowcomp(lowcomp, bndpsd[0], bndpsd[1], 0)
            excite[0] = bndpsd[0] - fgain - lowcomp
            lowcomp = self._calc_lowcomp(lowcomp, bndpsd[1], bndpsd[2], 1)
            excite[1] = bndpsd[1] - fgain - lowcomp
            begin = 7
            fastleak = slowleak = 0
            for bin_ in range(2, 7):
                if not (bndend == bin_ + 3 and bin_ == bndend - 3):
                    pass
                lastbin = bndend == bin_ + 1
                if not lastbin:
                    lowcomp = self._calc_lowcomp(
                        lowcomp, bndpsd[bin_], bndpsd[bin_ + 1], bin_)
                fastleak = int(bndpsd[bin_]) - fgain
                slowleak = int(bndpsd[bin_]) - sgain
                excite[bin_] = fastleak - lowcomp
                if not lastbin and bndpsd[bin_] <= bndpsd[bin_ + 1]:
                    begin = bin_ + 1
                    break
            for bin_ in range(begin, min(bndend, 22)):
                lastbin = bndend == bin_ + 1
                if not lastbin:
                    lowcomp = self._calc_lowcomp(
                        lowcomp, bndpsd[bin_], bndpsd[bin_ + 1], bin_)
                fastleak = max(fastleak - fdecay, int(bndpsd[bin_]) - fgain)
                slowleak = max(slowleak - sdecay, int(bndpsd[bin_]) - sgain)
                excite[bin_] = max(fastleak - lowcomp, slowleak)
            begin = 22
        else:  # coupling channel: seeded leaks
            begin = bndstrt
            fastleak, slowleak = fastleak0, slowleak0
        for bin_ in range(begin, bndend):
            fastleak = max(fastleak - fdecay, int(bndpsd[bin_]) - fgain)
            slowleak = max(slowleak - sdecay, int(bndpsd[bin_]) - sgain)
            excite[bin_] = max(fastleak, slowleak)

        # masking curve
        mask = np.zeros(50, dtype=np.int64)
        for bin_ in range(bndstrt, bndend):
            e = int(excite[bin_])
            if bndpsd[bin_] < dbknee:
                e += (dbknee - int(bndpsd[bin_])) >> 2
            mask[bin_] = max(e, int(hth[bin_, fscod]))

        # delta bit allocation adjustments
        if deltba is not None:
            band = 0
            for (offset, length, delta) in deltba:
                band += offset
                if delta >= 4:
                    d = (delta - 3) << 7
                else:
                    d = (delta - 4) << 7
                for _ in range(length):
                    if band < 50:
                        mask[band] += d
                    band += 1

        # bap assignment
        bap = np.zeros(endmant, dtype=np.int32)
        baptab = t["bap_tab"].astype(np.int64)
        i = strtmant
        for band in range(bndstrt, bndend):
            m = int(mask[band]) - snroffset - int(floor_v)
            if m < 0:
                m = 0
            m = (m & 0x1FE0) + int(floor_v)
            lastbin = min(int(bndtab[band + 1]) if band + 1 < 51 else 253,
                          endmant)
            while i < lastbin:
                address = (int(psd[i]) - m) >> 5
                address = min(63, max(0, address))
                bap[i] = baptab[address]
                i += 1
        return bap, int(fastleak), int(slowleak)

    @staticmethod
    def _calc_lowcomp(a, b0, b1, bin_):
        a = int(a)
        b0 = int(b0)
        b1 = int(b1)
        if bin_ < 7:
            if b0 + 256 == b1:
                return 384
            if b0 > b1:
                return max(0, a - 64)
        elif bin_ < 20:
            if b0 + 256 == b1:
                return 320
            if b0 > b1:
                return max(0, a - 64)
        else:
            return max(0, a - 128)
        return a

    # -- mantissas ----------------------------------------------------------
    def _read_mantissas(self, br: Bits, bap, exps, strtmant, endmant,
                        dithflag: bool, groups):
        """Quantized mantissas -> INTEGER fixed coefficients.

        avcodec's AC-3 decoders (float and fixed alike) decode every
        mantissa to a Q24 integer with one bit of headroom and apply
        the exponent as an ARITHMETIC RIGHT SHIFT (floor), so the
        coefficient grid is exactly ``(m_q24 >> exp)``; the float
        decoder only converts these integers afterwards.  Reproducing
        that floor is required for bit-parity: at exp 24 a dither
        mantissa collapses to {-1, 0} and coded mantissas land on the
        Q24 lattice, both observable in the oracle output.

        ``groups`` carries the shared b1/b2/b4 group state across
        channels within the block (A/52 7.3.3)."""
        fixed = np.zeros(endmant, dtype=np.int64)
        for i in range(strtmant, endmant):
            b = int(bap[i])
            if b == 0:
                if dithflag:
                    d = self._dither1()
                    if self._dither_on:
                        fixed[i] = d >> exps[i - strtmant]
                continue
            if b == 1:
                if groups["b1"] is None:
                    m1, m2, m3 = _ungroup3(br.get(5))
                    groups["b1"] = [m2, m3]
                    m = m1
                else:
                    m = groups["b1"].pop(0)
                    if not groups["b1"]:
                        groups["b1"] = None
                q = _sym_quant(m, 3)
            elif b == 2:
                if groups["b2"] is None:
                    m1, m2, m3 = _ungroup5(br.get(7))
                    groups["b2"] = [m2, m3]
                    m = m1
                else:
                    m = groups["b2"].pop(0)
                    if not groups["b2"]:
                        groups["b2"] = None
                q = _sym_quant(m, 5)
            elif b == 3:
                q = _sym_quant(br.get(3), 7)
            elif b == 4:
                if groups["b4"] is None:
                    m1, m2 = _ungroup11(br.get(7))
                    groups["b4"] = [m2]
                    m = m1
                else:
                    m = groups["b4"].pop(0)
                    groups["b4"] = None
                q = _sym_quant(m, 11)
            elif b == 5:
                q = _sym_quant(br.get(4), 15)
            else:
                bits = _BAP_BITS[b]
                if self._mant_trace is not None:
                    self._mant_trace.append((i, br.pos, bits))
                q = br.sget(bits) << (24 - bits)
            fixed[i] = q >> exps[i - strtmant]
        return fixed

    # -- frame decode ---------------------------------------------------
    def decode_frame(self, frame: bytes) -> np.ndarray:
        """One syncframe -> PCM [channels, 1536] f64 (full-scale 1.0)."""
        t = self.t
        br = Bits(frame)
        if br.get(16) != 0x0B77:
            raise Ac3Error("bad syncword")
        br.get(16)  # crc1
        fscod = br.get(2)
        if fscod == 3:
            raise Ac3Error("reserved fscod")
        frmsizecod = br.get(6)
        self.sample_rate = int(t["sample_rate"][fscod])

        bsid = br.get(5)
        if bsid > 8:
            raise Ac3Error(f"unsupported bsid {bsid}")
        br.get(3)  # bsmod
        acmod = br.get(3)
        if acmod != 1 and (acmod & 1):
            br.get(2)  # cmixlev
        if acmod & 4:
            br.get(2)  # surmixlev
        if acmod == 2:
            br.get(2)  # dsurmod
        lfeon = br.get(1)
        self.lfe_on = bool(lfeon)
        nfchans = int(t["channels"][acmod])
        nch = nfchans + lfeon
        self.channels = nch
        br.get(5)  # dialnorm
        if br.get(1):
            br.get(8)  # compr
        if br.get(1):
            br.get(8)  # langcod
        if br.get(1):
            br.get(7)  # mixlevel + roomtyp
        if acmod == 0:
            br.get(5)
            if br.get(1):
                br.get(8)
            if br.get(1):
                br.get(8)
            if br.get(1):
                br.get(7)
        br.get(2)  # copyrightb + origbs
        if br.get(1):
            br.get(14)  # timecod1
        if br.get(1):
            br.get(14)  # timecod2
        if br.get(1):
            n = br.get(6)
            br.get((n + 1) * 8)

        if self._delay is None:
            self._delay = np.zeros((nch, BLOCK_SAMPLES), dtype=np.float64)

        # persistent-per-frame state
        exps = [None] * nch
        bap = [None] * nch
        cpl_exps = None
        cpl_bap = None
        bap_dirty = [True] * nch
        cpl_bap_dirty = True
        chincpl = [0] * nfchans
        cplinu = 0
        phsflginu = 0
        cplbegf = cplendf = 0
        ncplbnd = 0
        cplbndstrc = []
        cpl_coords = np.zeros((nfchans, 18), dtype=np.int64)  # Q26
        phase_flags = [0] * 18
        rematflg = [0] * 4
        sdecay = fdecay = sgain = dbknee = floor_v = None
        csnroffst = 0
        fsnroffst = [0] * nch
        fgaincod = [0] * nch
        cpl_fsnroffst = 0
        cpl_fgaincod = 0
        cplfleak = cplsleak = 0
        deltba = [None] * nfchans
        cpl_deltba = None
        deltbae = [2] * nfchans  # 0=reuse,1=new,2=none
        cpl_deltbae = 2
        dynrng = 1.0
        chbwcod = [0] * nfchans
        endmant = [0] * nfchans

        pcm = np.zeros((nch, N_BLOCKS * BLOCK_SAMPLES), dtype=np.float64)

        self._blk_bitpos = []  # debug/test hook: audblk start offsets
        for blk in range(N_BLOCKS):
            self._blk_bitpos.append(br.pos)
            blksw = [br.get(1) for _ in range(nfchans)]
            dithflag = [br.get(1) for _ in range(nfchans)]
            if br.get(1):
                v = br.get(8)
                # A/52 7.7.1: top 3 bits = signed exponent (int8 >> 5),
                # low 5 bits with an implied leading 1: (32+Y)/64
                e = (v >> 5) - 8 if v >= 128 else (v >> 5)
                dynrng = (2.0 ** e) * ((v & 31) + 32) / 64.0
            if acmod == 0 and br.get(1):
                br.get(8)  # dynrng2 (channel 2 of dual mono; unused)

            if br.get(1):  # cplstre
                cplinu = br.get(1)
                if cplinu:
                    chincpl = [br.get(1) for _ in range(nfchans)]
                    if acmod == 2:
                        phsflginu = br.get(1)
                    cplbegf = br.get(4)
                    cplendf = br.get(4)
                    if 3 + cplendf - cplbegf < 1:
                        raise Ac3Error("bad coupling range")
                    ncplsubnd = 3 + cplendf - cplbegf
                    cplbndstrc = [0] + [br.get(1) for _ in range(ncplsubnd - 1)]
                    ncplbnd = ncplsubnd - sum(cplbndstrc)
                else:
                    chincpl = [0] * nfchans
            cplstrtmant = cplbegf * 12 + 37
            cplendmant = ((cplendf + 3) * 12) + 37

            if cplinu:
                cplcoe = [0] * nfchans
                for ch in range(nfchans):
                    if not chincpl[ch]:
                        continue
                    cplcoe[ch] = br.get(1)
                    if cplcoe[ch]:
                        mstrcplco = 3 * br.get(2)
                        for bnd in range(ncplbnd):
                            cplcoexp = br.get(4)
                            cplcomant = br.get(4)
                            # Q26 integer coordinate, exactly the
                            # oracle's fixed form: mant<<22 (exp 15) or
                            # (mant+16)<<21, then >> (exp + 3*mstr)
                            if cplcoexp == 15:
                                c = cplcomant << 22
                            else:
                                c = (cplcomant + 16) << 21
                            cpl_coords[ch, bnd] = c >> (cplcoexp + mstrcplco)
                if acmod == 2 and phsflginu and (cplcoe[0] or cplcoe[1]):
                    phase_flags = [br.get(1) for _ in range(ncplbnd)]

            if acmod == 2 and br.get(1):  # rematstr
                if not cplinu:
                    nrematbd = 4
                elif cplbegf > 2:
                    nrematbd = 4
                elif cplbegf > 0:
                    nrematbd = 3
                else:
                    nrematbd = 2
                rematflg = [br.get(1) for _ in range(nrematbd)] + [0] * (
                    4 - nrematbd
                )

            cplexpstr = 0
            if cplinu:
                cplexpstr = br.get(2)
            chexpstr = [br.get(2) for _ in range(nfchans)]
            lfeexpstr = br.get(1) if lfeon else 0

            for ch in range(nfchans):
                if chexpstr[ch] != 0 and not chincpl[ch]:
                    chbwcod[ch] = br.get(6)
                    if chbwcod[ch] > 60:
                        raise Ac3Error("chbwcod out of range")
            for ch in range(nfchans):
                endmant[ch] = (
                    cplstrtmant if chincpl[ch]
                    else ((chbwcod[ch] + 12) * 3) + 37
                )

            # exponent decode
            if cplinu and cplexpstr != 0:
                grpsize = 3 << (cplexpstr - 1)
                absexp = br.get(4) << 1
                ngrps = (cplendmant - cplstrtmant) // grpsize
                cpl_exps = self._decode_exps(
                    br, absexp, ngrps, grpsize // 3
                )[: cplendmant - cplstrtmant]
                cpl_bap_dirty = True
            for ch in range(nfchans):
                if chexpstr[ch] != 0:
                    grpsize = 3 << (chexpstr[ch] - 1)
                    absexp = br.get(4)
                    nmant = endmant[ch]
                    ngrps = (nmant + grpsize - 4) // grpsize
                    rest = self._decode_exps(br, absexp, ngrps, grpsize // 3)
                    exps[ch] = [absexp] + rest[: nmant - 1]
                    br.get(2)  # gainrng
                    bap_dirty[ch] = True
            if lfeon and lfeexpstr != 0:
                absexp = br.get(4)
                rest = self._decode_exps(br, absexp, 2, 1)
                exps[nfchans] = [absexp] + rest[:6]
                bap_dirty[nfchans] = True

            # bit allocation parameters
            if br.get(1):  # baie
                sdecay = int(t["slow_decay"][br.get(2)])
                fdecay = int(t["fast_decay"][br.get(2)])
                sgain = int(t["slow_gain"][br.get(2)])
                dbknee = int(t["db_per_bit"][br.get(2)])
                floor_v = int(t["floor"][br.get(3)])
                for ch in range(nch):
                    bap_dirty[ch] = True
                cpl_bap_dirty = True
            if sdecay is None:
                raise Ac3Error("bit allocation info never sent")
            if br.get(1):  # snroffste
                csnroffst = br.get(6)
                if cplinu:
                    cpl_fsnroffst = br.get(4)
                    cpl_fgaincod = br.get(3)
                for ch in range(nfchans):
                    fsnroffst[ch] = br.get(4)
                    fgaincod[ch] = br.get(3)
                if lfeon:
                    fsnroffst[nfchans] = br.get(4)
                    fgaincod[nfchans] = br.get(3)
                for ch in range(nch):
                    bap_dirty[ch] = True
                cpl_bap_dirty = True
            if cplinu and br.get(1):  # cplleake
                cplfleak = (br.get(3) << 8) + 768
                cplsleak = (br.get(3) << 8) + 768
                cpl_bap_dirty = True

            if br.get(1):  # deltbaie
                if cplinu:
                    cpl_deltbae = br.get(2)
                new_deltbae = [br.get(2) for _ in range(nfchans)]
                if cplinu and cpl_deltbae == 1:
                    segs = []
                    for _ in range(br.get(3) + 1):
                        segs.append((br.get(5), br.get(4), br.get(3)))
                    cpl_deltba = segs
                for ch in range(nfchans):
                    deltbae[ch] = new_deltbae[ch]
                    if new_deltbae[ch] == 1:
                        segs = []
                        for _ in range(br.get(3) + 1):
                            segs.append((br.get(5), br.get(4), br.get(3)))
                        deltba[ch] = segs
                cpl_bap_dirty = True
                for ch in range(nfchans):
                    bap_dirty[ch] = True

            if br.get(1):  # skiple
                br.get(br.get(9) * 8)

            # bit allocation
            snr = lambda fs: (((csnroffst - 15) << 4) + fs) << 2
            if cplinu and (cpl_bap_dirty or cpl_exps is None):
                if cpl_exps is None:
                    raise Ac3Error("coupling exponents never sent")
                cpl_bap, _, _ = self._bit_alloc(
                    cpl_exps, cplstrtmant, cplendmant,
                    int(t["fast_gain"][cpl_fgaincod]), sgain, sdecay, fdecay,
                    dbknee, floor_v, snr(cpl_fsnroffst), fscod,
                    deltba=cpl_deltba if cpl_deltbae in (0, 1) else None,
                    fastleak0=cplfleak, slowleak0=cplsleak, is_cpl=True,
                )
                cpl_bap_dirty = False
            for ch in range(nch):
                is_lfe = ch == nfchans
                if exps[ch] is None:
                    raise Ac3Error("exponents never sent")
                if not bap_dirty[ch]:
                    continue
                end = 7 if is_lfe else endmant[ch if ch < nfchans else 0]
                dba = None
                if not is_lfe and deltbae[ch] in (0, 1):
                    dba = deltba[ch]
                bap[ch], _, _ = self._bit_alloc(
                    exps[ch], 0, end,
                    int(t["fast_gain"][fgaincod[ch]]), sgain, sdecay, fdecay,
                    dbknee, floor_v, snr(fsnroffst[ch]), fscod,
                    deltba=dba,
                )
                bap_dirty[ch] = False

            # mantissas (integer fixed coefficients, Q24 >> exp)
            groups = {"b1": None, "b2": None, "b4": None}
            coeffs = np.zeros((nch, BLOCK_SAMPLES), dtype=np.int64)
            cpl_coeffs = None
            cpl_read = False
            for ch in range(nfchans):
                c = self._read_mantissas(
                    br, bap[ch], exps[ch], 0, endmant[ch],
                    bool(dithflag[ch]), groups,
                )
                coeffs[ch, : endmant[ch]] = c
                if cplinu and chincpl[ch] and not cpl_read:
                    # the coupling channel ALWAYS dithers (one LFG draw
                    # per bap-0 bin); channels with dithflag off get
                    # those bins zeroed after reconstruction instead
                    # (the oracle's remove_dithering behavior) -- both
                    # halves are required to keep the LFG stream in sync
                    cpl_c = self._read_mantissas(
                        br, np.concatenate([
                            np.zeros(cplstrtmant, np.int32),
                            np.asarray(cpl_bap[cplstrtmant:cplendmant]),
                        ]) if len(cpl_bap) < cplendmant else cpl_bap,
                        cpl_exps, cplstrtmant, cplendmant, True, groups,
                    )
                    cpl_coeffs = cpl_c
                    cpl_read = True
            if lfeon:
                c = self._read_mantissas(
                    br, bap[nfchans], exps[nfchans], 0, 7, False, groups,
                )
                coeffs[nfchans, :7] = c

            # coupling reconstruction
            if cplinu and cpl_coeffs is not None:
                # sub-band -> band mapping via cplbndstrc
                bnd = -1
                for sbnd in range(3 + cplendf - cplbegf):
                    if not cplbndstrc[sbnd]:
                        bnd += 1
                    lo = cplstrtmant + sbnd * 12
                    for ch in range(nfchans):
                        if chincpl[ch]:
                            # fixed reconstruction, oracle-exact:
                            # (cpl<<4) * (coord_q26<<5) >> 32 (floor)
                            prod = (cpl_coeffs[lo : lo + 12] << 4) * (
                                int(cpl_coords[ch, bnd]) << 5
                            )
                            rec = prod >> 32
                            if ch == 1 and phase_flags[bnd]:
                                rec = -rec
                            coeffs[ch, lo : lo + 12] = rec
                # remove_dithering: coupled channels with dithflag off
                # must not carry the cpl channel's dither
                cpl_zero = np.asarray(
                    cpl_bap[cplstrtmant:cplendmant]
                    if len(cpl_bap) >= cplendmant
                    else cpl_bap[: cplendmant - cplstrtmant]
                ) == 0
                for ch in range(nfchans):
                    if chincpl[ch] and not dithflag[ch]:
                        seg = coeffs[ch, cplstrtmant:cplendmant]
                        seg[cpl_zero] = 0
                        coeffs[ch, cplstrtmant:cplendmant] = seg

            # rematrixing (2/0 only)
            if acmod == 2:
                bnd_edges = [13, 25, 37, 61, 253]
                start = 13
                for b in range(4):
                    end_b = bnd_edges[b + 1]
                    if cplinu:
                        end_b = min(end_b, cplstrtmant)
                    if rematflg[b]:
                        sl = slice(start, min(end_b, 253))
                        a = coeffs[0, sl].copy()
                        bco = coeffs[1, sl].copy()
                        coeffs[0, sl] = a + bco
                        coeffs[1, sl] = a - bco
                    start = end_b
                    if cplinu and end_b >= cplstrtmant:
                        break

            # int -> float conversion + dynamic range (avcodec converts
            # fixed_coeffs with a per-channel scale = dynrng * 2^-23
            # AFTER rematrixing/coupling, which run on the integers)
            fcoeffs = coeffs.astype(np.float64) * (dynrng / float(1 << 23))

            # synthesis: IMDCT + window + overlap-add
            for ch in range(nch):
                short = blksw[ch] if ch < nfchans else 0
                x = self._imdct(fcoeffs[ch], short)
                w = kbd_window()
                n = BLOCK_SAMPLES
                out = x[:n] * w + self._delay[ch]
                self._delay[ch] = x[n:] * w[::-1]
                pcm[ch, blk * n : (blk + 1) * n] = out

        # output channel order: bitstream order (L,C,R,Ls,Rs,LFE) ->
        # canonical mask order (ff_ac3_channel_layout_tab: acmod 7 =
        # 0x607 i.e. FL FR FC LFE SL SR), so multichannel interleave
        # matches the oracle/WAV convention
        masks = _ACMOD_CH_MASKS[acmod] + ([8] if lfeon else [])
        order = sorted(range(nch), key=lambda c: masks[c])
        return -512.0 * pcm[order]

    def _imdct(self, coeffs: np.ndarray, short: int) -> np.ndarray:
        if not short:
            return coeffs @ imdct_matrix(512).T / 512.0 * 2.0
        # block-switch (A/52 7.9.4.2): two 256-point transforms; even
        # coefficients drive the first 256 samples through a -cos
        # basis and odd coefficients the second 256 through a +sin
        # basis, both with (n+0.5)(k+0.5) phase at scale 1/256 (basis
        # recovered from the oracle by single-coefficient probing of
        # blksw-patched frames; see tests/test_ac3.py)
        c, s = imdct_short_bases()
        out = np.empty(512, dtype=np.float64)
        out[:256] = coeffs[0::2] @ c
        out[256:] = coeffs[1::2] @ s
        return out

    # -- streaming ----------------------------------------------------------
    def decode(self, data: bytes) -> np.ndarray:
        """Feed bytes; returns interleaved f32 of completed frames."""
        t = self.t
        self._buf.extend(data)
        outs = []
        while True:
            i = bytes(self._buf).find(b"\x0b\x77")
            if i < 0 or len(self._buf) - i < 5:
                break
            del self._buf[:i]
            fscod = self._buf[4] >> 6
            frmsizecod = self._buf[4] & 0x3F
            if fscod == 3 or frmsizecod > 37:
                del self._buf[:2]
                continue
            size = 2 * int(t["frame_size"][frmsizecod][fscod])
            if len(self._buf) < size:
                break
            frame = bytes(self._buf[:size])
            del self._buf[:size]
            pcm = self.decode_frame(frame)
            outs.append(pcm.T.reshape(-1).astype(np.float32))
        if not outs:
            return np.zeros(0, dtype=np.float32)
        return np.concatenate(outs)


@functools.lru_cache(maxsize=4)
def imdct_matrix(n: int) -> np.ndarray:
    """[n, n/2] oddly-stacked inverse MDCT basis (A/52 §7.9.4):
    x[i] = sum_k X[k] cos(2pi/n (i + 0.5 + n/4)(k + 0.5)) (sign/scale
    calibrated against the oracle in the decode path)."""
    i = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(n // 2, dtype=np.float64)[None, :]
    return np.cos(2.0 * np.pi / n * (i + 0.5 + n / 4.0) * (k + 0.5))


@functools.lru_cache(maxsize=1)
def imdct_short_bases():
    """[128, 256] bases of the two 256-point short transforms: plain
    oddly-stacked IMDCTs with time offsets 0 (even coefficients ->
    first half) and 128 (odd -> second half):

      x1[n] = 1/256 sum X[2k]   cos(2pi/256 (n +   0.5)(k + 0.5))
      x2[n] = 1/256 sum X[2k+1] cos(2pi/256 (n + 128.5)(k + 0.5))
    """
    n = np.arange(256, dtype=np.float64)[None, :]
    k = np.arange(128, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi / 256.0 * (k + 0.5)
    return (
        np.cos(ang * (n + 0.5)) / 256.0,
        np.cos(ang * (n + 128.5)) / 256.0,
    )


@functools.lru_cache(maxsize=1)
def kbd_window() -> np.ndarray:
    """256-point Kaiser-Bessel-derived window, alpha = 5 (A/52 §7.9.3;
    identical construction to the oracle's kbd init: I0 series over
    i(n-i)(alpha*pi/n)^2, cumulative, normalized by sum+1)."""
    n = 256
    alpha = 5.0
    alpha2 = (alpha * np.pi / n) ** 2
    i = np.arange(n, dtype=np.float64)
    tmp = i * (n - i) * alpha2
    bessel = np.ones(n)
    for j in range(50, 0, -1):
        bessel = bessel * tmp / (j * j) + 1.0
    csum = np.cumsum(bessel)
    return np.sqrt(csum / (csum[-1] + 1.0))
