"""From-scratch MP3 (MPEG-1/2/2.5 Layer III) host syntax layer.

Parity target: the decode behavior of the reference's nanomp3/minimp3
backend (soundkit-mp3/src/lib.rs) — the north star names its IMDCT +
polyphase synthesis filterbank as the batched device kernels
(BASELINE.json); this module is the host half: frame sync, side info,
bit reservoir, scalefactors, Huffman spectral decode producing integer
spectra + per-line scale exponents.  The numeric synthesis lives in
``soundkit_tpu.ops.mp3_dsp``.

Huffman/band tables are the ISO data extracted from the system
libavcodec archive (native/generated/mp3_tables.npz, canonical
from-lengths code assignment).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

TABLES_PATH = Path(__file__).resolve().parent.parent / "native" / "generated" / "mp3_tables.npz"


class Mp3Error(ValueError):
    pass


class BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = int.from_bytes(data, "big")
        self.nbits = len(data) * 8
        self.pos = 0

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos + n
        if p > self.nbits:
            raise Mp3Error("bitstream overrun")
        v = (self.data >> (self.nbits - p)) & ((1 << n) - 1)
        self.pos = p
        return v

    def peek(self, n: int) -> int:
        p = min(self.pos + n, self.nbits)
        got = p - self.pos
        v = (self.data >> (self.nbits - p)) & ((1 << got) - 1) if got else 0
        return v << (n - got)

    def skip(self, n: int) -> None:
        self.pos += n

    @property
    def bits_left(self) -> int:
        return self.nbits - self.pos


class Vlc:
    """from-lengths canonical decoder: codes assigned sequentially
    left-aligned (ffmpeg ff_init_vlc_from_lengths semantics)."""

    def __init__(self, lens: np.ndarray, symbols: np.ndarray):
        entries = [(int(l), int(s)) for l, s in zip(lens, symbols) if l > 0]
        self.max_len = max(l for l, _ in entries)
        size = 1 << self.max_len
        self.lut_sym = np.full(size, -1, dtype=np.int32)
        self.lut_len = np.zeros(size, dtype=np.int8)
        code = 0  # left-aligned 32-bit
        for l, sym in entries:
            cw = code >> (32 - l)
            base = cw << (self.max_len - l)
            span = 1 << (self.max_len - l)
            self.lut_sym[base : base + span] = sym
            self.lut_len[base : base + span] = l
            code += 1 << (32 - l)
        if code > 1 << 32:
            raise Mp3Error("over-full Huffman table")

    def read(self, br: BitReader) -> int:
        w = br.peek(self.max_len)
        sym = int(self.lut_sym[w])
        if sym < 0:
            raise Mp3Error("invalid Huffman code")
        br.skip(int(self.lut_len[w]))
        return sym


class QuadVlc:
    """count1 quad tables from explicit (bits, codes)."""

    def __init__(self, bits: np.ndarray, codes: np.ndarray):
        self.max_len = int(bits.max())
        size = 1 << self.max_len
        self.lut_sym = np.full(size, -1, dtype=np.int32)
        self.lut_len = np.zeros(size, dtype=np.int8)
        for sym, (l, c) in enumerate(zip(bits.tolist(), codes.tolist())):
            if l == 0:
                continue
            base = c << (self.max_len - l)
            span = 1 << (self.max_len - l)
            self.lut_sym[base : base + span] = sym
            self.lut_len[base : base + span] = l

    def read(self, br: BitReader) -> int:
        w = br.peek(self.max_len)
        sym = int(self.lut_sym[w])
        if sym < 0:
            raise Mp3Error("invalid count1 code")
        br.skip(int(self.lut_len[w]))
        return sym


@functools.lru_cache(maxsize=1)
def _tables():
    t = np.load(TABLES_PATH)
    sizes = t["huff_sizes_minus_one"][:15].astype(int) + 1
    lens = t["hufflens"]
    syms = t["huffsymbols"]
    vlcs = [None]  # table index 0 = all zeros
    off = 0
    for n in sizes:
        vlcs.append(Vlc(lens[off : off + n], syms[off : off + n]))
        off += n
    quads = [QuadVlc(t["quad_bits"][i], t["quad_codes"][i]) for i in range(2)]
    return {
        "vlcs": vlcs,
        "quads": quads,
        "huff_data": t["huff_data"].astype(int),  # [32][2] = (vlc idx, linbits)
        "band_size_long": t["band_size_long"].astype(int),
        "band_size_short": t["band_size_short"].astype(int),
        "pretab": t["pretab"].astype(int),
        "slen": t["slen_table"].astype(int),
        "lsf_nsf": t["lsf_nsf_table"].astype(int),
        "freq": t["freq_tab"].astype(int),
        "bitrate": t["bitrate_tab"].astype(int),
        "enwindow": t["enwindow"].astype(np.int64),
    }


@dataclass
class Mp3Header:
    version: int  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    lsf: bool
    sample_rate: int
    sr_index: int  # 0..8 (freq idx + 3 per version tier)
    bitrate: int
    padding: int
    mode: int  # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext: int
    nb_channels: int
    frame_size: int
    samples: int


def parse_header(b: bytes, pos: int = 0) -> Mp3Header:
    t = _tables()
    if len(b) - pos < 4:
        raise Mp3Error("short header")
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3Error("bad sync")
    version = (h >> 19) & 3
    if version == 1:
        raise Mp3Error("reserved version")
    layer = (h >> 17) & 3
    if layer != 1:
        raise Mp3Error("not layer III")
    bitrate_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if bitrate_idx in (0, 15) or sr_idx == 3:
        raise Mp3Error("bad bitrate/rate index")
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    mode_ext = (h >> 4) & 3
    lsf = version != 3
    rate = int(t["freq"][sr_idx])
    if version == 2:
        rate //= 2
        tier = 1
    elif version == 0:
        rate //= 4
        tier = 2
    else:
        tier = 0
    bitrate = int(t["bitrate"][1 if lsf else 0][2][bitrate_idx]) * 1000
    samples = 576 if lsf else 1152
    frame_size = (samples // 8 * bitrate) // rate + padding
    return Mp3Header(
        version=version,
        lsf=lsf,
        sample_rate=rate,
        sr_index=sr_idx + 3 * tier,
        bitrate=bitrate,
        padding=padding,
        mode=mode,
        mode_ext=mode_ext,
        nb_channels=1 if mode == 3 else 2,
        frame_size=frame_size,
        samples=samples,
    )


@dataclass
class Granule:
    part2_3_length: int = 0
    big_values: int = 0
    global_gain: int = 0
    scalefac_compress: int = 0
    block_type: int = 0
    switch_point: int = 0
    table_select: Tuple[int, int, int] = (0, 0, 0)
    subblock_gain: Tuple[int, int, int] = (0, 0, 0)
    region0_count: int = 0
    region1_count: int = 0
    preflag: int = 0
    scalefac_scale: int = 0
    count1table_select: int = 0
    scale_factors: np.ndarray = None  # [40] int
    spectrum: np.ndarray = None  # [576] int32 quantized
    exponents: np.ndarray = None  # [576] f64 linear scale


@dataclass
class Mp3Frame:
    header: Mp3Header
    granules: List[List[Granule]]  # [ngr][nch]


def _band_index_long(sr_index: int) -> np.ndarray:
    sizes = _tables()["band_size_long"][sr_index]
    return np.concatenate([[0], np.cumsum(sizes)])


class Mp3NativeDecoder:
    """Streaming frame parser with bit reservoir."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._reservoir = bytearray()
        self.header: Optional[Mp3Header] = None
        self.t = _tables()

    def push(self, data: bytes) -> List[Mp3Frame]:
        self._buf.extend(data)
        frames = []
        while True:
            i = self._sync()
            if i is None:
                break
            try:
                hdr = parse_header(bytes(self._buf), 0)
            except Mp3Error:
                del self._buf[:1]
                continue
            if len(self._buf) < hdr.frame_size:
                break
            frame_bytes = bytes(self._buf[: hdr.frame_size])
            del self._buf[: hdr.frame_size]
            try:
                frame = self._decode_frame(hdr, frame_bytes)
                if frame is not None:
                    frames.append(frame)
                    # reference: trace! per MP3 frame, mp3 lib.rs:203
                    from soundkit_tpu.utils.tracing import trace_frame

                    trace_frame(
                        "mp3", rate=hdr.sample_rate, ch=hdr.nb_channels,
                        size=hdr.frame_size,
                    )
            except Mp3Error:
                continue  # tolerate bad frames (resync)
        return frames

    def _sync(self) -> Optional[int]:
        while True:
            # skip ID3v2
            if len(self._buf) >= 10 and self._buf[:3] == b"ID3":
                size = (
                    (self._buf[6] << 21) | (self._buf[7] << 14)
                    | (self._buf[8] << 7) | self._buf[9]
                )
                if len(self._buf) < 10 + size:
                    return None
                del self._buf[: 10 + size]
                continue
            idx = 0
            while idx + 1 < len(self._buf) and not (
                self._buf[idx] == 0xFF and (self._buf[idx + 1] & 0xE0) == 0xE0
            ):
                idx += 1
            if idx:
                del self._buf[:idx]
            if len(self._buf) < 4:
                return None
            return 0

    # -- frame decode --

    def _decode_frame(self, hdr: Mp3Header, frame: bytes) -> Optional[Mp3Frame]:
        self.header = hdr
        crc_skip = 0 if (frame[1] & 1) else 2
        pos = 4 + crc_skip
        nch = hdr.nb_channels
        ngr = 1 if hdr.lsf else 2

        si = BitReader(frame[pos:])
        main_data_begin = si.get(8 if hdr.lsf else 9)
        if hdr.lsf:
            si.get(2 if nch == 2 else 1)
        else:
            si.get(3 if nch == 2 else 5)
        scfsi = [[0] * 4 for _ in range(nch)]
        if not hdr.lsf:
            for c in range(nch):
                for b in range(4):
                    scfsi[c][b] = si.get(1)

        granules = [[Granule() for _ in range(nch)] for _ in range(ngr)]
        for g in range(ngr):
            for c in range(nch):
                gr = granules[g][c]
                gr.part2_3_length = si.get(12)
                gr.big_values = si.get(9)
                if gr.big_values > 288:
                    raise Mp3Error("big_values too large")
                gr.global_gain = si.get(8)
                gr.scalefac_compress = si.get(9 if hdr.lsf else 4)
                if si.get(1):  # window switching
                    gr.block_type = si.get(2)
                    if gr.block_type == 0:
                        raise Mp3Error("invalid block type")
                    gr.switch_point = si.get(1)
                    ts = [si.get(5), si.get(5), 0]
                    gr.table_select = tuple(ts)
                    gr.subblock_gain = (si.get(3), si.get(3), si.get(3))
                    gr.region0_count = 7
                    gr.region1_count = 36
                else:
                    gr.block_type = 0
                    gr.table_select = (si.get(5), si.get(5), si.get(5))
                    gr.region0_count = si.get(4)
                    gr.region1_count = si.get(3)
                if not hdr.lsf:
                    gr.preflag = si.get(1)
                gr.scalefac_scale = si.get(1)
                gr.count1table_select = si.get(1)

        side_bytes = (si.pos + 7) // 8
        main_data = frame[pos + side_bytes :]

        # bit reservoir
        if main_data_begin > len(self._reservoir):
            # not enough reservoir yet: stash and skip this frame
            self._reservoir.extend(main_data)
            self._trim_reservoir()
            return None
        data = bytes(
            self._reservoir[len(self._reservoir) - main_data_begin :]
        ) + main_data if main_data_begin else bytes(main_data)
        self._reservoir.extend(main_data)
        self._trim_reservoir()

        br = BitReader(data)
        for g in range(ngr):
            for c in range(nch):
                gr = granules[g][c]
                start = br.pos
                if hdr.lsf:
                    self._read_scalefactors_lsf(br, gr, hdr, c)
                else:
                    self._read_scalefactors(br, gr, scfsi[c], granules[0][c], g)
                self._read_huffman(br, gr, hdr, start)
        return Mp3Frame(hdr, granules)

    def _trim_reservoir(self) -> None:
        if len(self._reservoir) > 511 + 2048:
            del self._reservoir[: len(self._reservoir) - (511 + 2048)]

    # -- scalefactors --

    def _read_scalefactors(self, br, gr: Granule, scfsi, gr0: Granule, gnum: int):
        slen1 = int(self.t["slen"][0][gr.scalefac_compress])
        slen2 = int(self.t["slen"][1][gr.scalefac_compress])
        sf = np.zeros(40, dtype=np.int32)
        if gr.block_type == 2:
            if gr.switch_point:
                for i in range(8):
                    sf[i] = br.get(slen1)
                for i in range(3, 6):
                    for w in range(3):
                        sf[8 + (i - 3) * 3 + w] = br.get(slen1)
                for i in range(6, 12):
                    for w in range(3):
                        sf[8 + (i - 3) * 3 + w] = br.get(slen1 if i < 6 else slen2)
            else:
                for i in range(6):
                    for w in range(3):
                        sf[i * 3 + w] = br.get(slen1)
                for i in range(6, 12):
                    for w in range(3):
                        sf[i * 3 + w] = br.get(slen2)
        else:
            groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
            for b, (lo, hi, slen) in enumerate(groups):
                if gnum == 1 and scfsi[b]:
                    sf[lo:hi] = gr0.scale_factors[lo:hi]
                else:
                    for i in range(lo, hi):
                        sf[i] = br.get(slen)
        gr.scale_factors = sf

    def _read_scalefactors_lsf(self, br, gr: Granule, hdr: Mp3Header, ch: int):
        is_mode = hdr.mode == 1 and (hdr.mode_ext & 1) and ch == 1
        sc = gr.scalefac_compress
        slen = [0, 0, 0, 0]
        if not is_mode:
            if sc < 400:
                slen = [(sc >> 4) // 5, (sc >> 4) % 5, (sc >> 2) & 3, sc & 3]
                tindex2 = 0
            elif sc < 500:
                sc -= 400
                slen = [(sc >> 2) // 5, (sc >> 2) % 5, sc & 3, 0]
                tindex2 = 1
            else:
                sc -= 500
                slen = [sc // 3, sc % 3, 0, 0]
                tindex2 = 2
                gr.preflag = 1
        else:
            sc >>= 1
            if sc < 180:
                slen = [sc // 36, (sc % 36) // 6, sc % 6, 0]
                tindex2 = 3
            elif sc < 244:
                sc -= 180
                slen = [(sc % 64) >> 4, (sc % 16) >> 2, sc & 3, 0]
                tindex2 = 4
            else:
                sc -= 244
                slen = [sc // 3, sc % 3, 0, 0]
                tindex2 = 5
        tindex = 2 if (gr.block_type == 2 and gr.switch_point) else (
            1 if gr.block_type == 2 else 0
        )
        counts = self.t["lsf_nsf"][tindex2][tindex]
        sf = np.zeros(40, dtype=np.int32)
        j = 0
        for k in range(4):
            for _ in range(int(counts[k])):
                if j < 40:
                    sf[j] = br.get(slen[k]) if slen[k] else 0
                    j += 1
        gr.scale_factors = sf

    # -- huffman spectrum --

    def _read_huffman(self, br, gr: Granule, hdr: Mp3Header, part_start: int):
        t = self.t
        spectrum = np.zeros(576, dtype=np.int32)
        band_index = _band_index_long(hdr.sr_index)

        if gr.block_type == 2:
            # 8 kHz MPEG-2.5 (sr_index 8) has double-width bands: the
            # short-block big-values boundary is 72 lines, not 36.
            region1 = 72 if hdr.sr_index == 8 else 36
            region2 = 576
        else:
            r0 = min(gr.region0_count + 1, 22)
            r1 = min(gr.region0_count + 1 + gr.region1_count + 1, 22)
            region1 = int(band_index[r0])
            region2 = int(band_index[r1])

        big = min(gr.big_values * 2, 576)
        regions = [
            (0, min(region1, big), gr.table_select[0]),
            (min(region1, big), min(region2, big), gr.table_select[1]),
            (min(region2, big), big, gr.table_select[2]),
        ]
        for lo, hi, table in regions:
            if hi <= lo:
                continue
            vlc_idx, linbits = int(t["huff_data"][table][0]), int(t["huff_data"][table][1])
            if vlc_idx == 0:
                continue  # silent region
            vlc = t["vlcs"][vlc_idx]
            i = lo
            while i < hi:
                sym = vlc.read(br)
                x, y = sym >> 4, sym & 0xF
                if x:
                    if x == 15 and linbits:
                        x += br.get(linbits)
                    if br.get(1):
                        x = -x
                if y:
                    if y == 15 and linbits:
                        y += br.get(linbits)
                    if br.get(1):
                        y = -y
                spectrum[i] = x
                spectrum[i + 1] = y
                i += 2

        # count1 quads until bits exhausted
        limit = part_start + gr.part2_3_length
        quad = t["quads"][gr.count1table_select]
        i = big
        while br.pos < limit and i <= 572:
            sym = quad.read(br)
            for k in range(4):
                v = (sym >> (3 - k)) & 1
                if v and br.pos < limit:
                    if br.get(1):
                        v = -v
                spectrum[i + k] = v
            i += 4
        if br.pos > limit:
            # overread: the last quad was bit-stuffing; drop it
            spectrum[i - 4 : i] = 0
        br.pos = limit

        gr.spectrum = spectrum
        gr.exponents = self._exponents(gr, hdr, band_index)

    def _exponents(self, gr: Granule, hdr: Mp3Header, band_index) -> np.ndarray:
        """Per-line linear scale 2^(e/4)."""
        t = self.t
        exp = np.zeros(576, dtype=np.float64)
        gain = gr.global_gain - 210
        shift = gr.scalefac_scale + 1
        if gr.block_type == 2:
            sizes_s = t["band_size_short"][hdr.sr_index]
            pos = 0
            if gr.switch_point:
                # long bands 0..7 then short from band 3
                for b in range(8):
                    lo, hi = int(band_index[b]), int(band_index[b + 1])
                    pre = t["pretab"][gr.preflag][b] if gr.preflag else 0
                    e = gain - ((int(gr.scale_factors[b]) + pre) << shift)
                    exp[lo:hi] = 2.0 ** (0.25 * e)
                pos = int(band_index[8])
                first_short = 3
                sf_off = 8
            else:
                first_short = 0
                sf_off = 0
            sfi = sf_off
            for b in range(first_short, 13):
                size = int(sizes_s[b])
                for w in range(3):
                    sf = int(gr.scale_factors[sfi]) if sfi < 40 else 0
                    e = gain - 8 * gr.subblock_gain[w] - (sf << shift)
                    exp[pos : pos + size] = 2.0 ** (0.25 * e)
                    pos += size
                    sfi += 1
                if pos >= 576:
                    break
        else:
            for b in range(22):
                lo, hi = int(band_index[b]), int(band_index[b + 1])
                sf = int(gr.scale_factors[b]) if b < 21 else 0
                pre = int(t["pretab"][1][b]) if gr.preflag else 0
                e = gain - ((sf + pre) << shift)
                exp[lo:hi] = 2.0 ** (0.25 * e)
        return exp


class NativeMp3Parser:
    """C++ MP3 parser wrapper: bytes -> compact granule lanes
    (int16 quant + int16 quarter-exponents, short-reordered)."""

    def __init__(self) -> None:
        from soundkit_tpu.native.loader import load

        self._lib = load()
        self._h = self._lib.skt_mp3_new()
        self._quant = np.zeros((2, 576), dtype=np.int16)
        self._expq = np.zeros((2, 576), dtype=np.int16)
        self._meta = np.zeros(10, dtype=np.int32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.skt_mp3_free(self._h)
            self._h = None

    def push(self, data: bytes) -> int:
        """Returns number of granules now buffered."""
        return int(self._lib.skt_mp3_push(self._h, bytes(data), len(data)))

    def pop(self):
        """Returns (quant [2,576] i16, expq [2,576] i16, meta dict) or None."""
        if not self._lib.skt_mp3_pop(self._h, self._quant.reshape(-1),
                                     self._expq.reshape(-1), self._meta):
            return None
        m = self._meta
        meta = dict(
            block_type=(int(m[0]), int(m[3])),
            mixed=(bool(m[1]), bool(m[4])),
            n_alias=(int(m[2]), int(m[5])),
            ms=bool(m[6]),
            nch=int(m[7]),
            sample_rate=int(m[8]),
        )
        return self._quant.copy(), self._expq.copy(), meta
