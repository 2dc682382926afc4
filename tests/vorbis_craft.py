"""Hand-crafted Vorbis streams for conformance tests.

No modern encoder emits floor type 0 (the ancient LSP floor, used only
by year-2000 Xiph beta encoders), so the floor0 path is validated the
way the reference validates odd AAC syntax — by assembling bitstreams
by hand (soundkit-aac-lc/src/decoder.rs:431-705 builds silent
SCE/CPE/FIL AUs with a build_bits helper) and decoding them against
the libavcodec oracle.

Produces a fully valid mono Vorbis stream: id/comment/setup headers
(two codebook-backed floor0 + one residue type 1) and audio packets
with chosen LSP/residue codeword indices.
"""
from __future__ import annotations

import math
import struct
import zlib
from typing import List, Sequence


class BitWriter:
    """Vorbis bit packing: LSB-first within bytes."""

    def __init__(self) -> None:
        self._bits: List[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self._bits.append((value >> i) & 1)

    def write_huff(self, code: int, length: int) -> None:
        """Huffman codewords transmit MSB-of-codeword first."""
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def float32_pack(x: float) -> int:
    """Inverse of vorbis_core.float32_unpack."""
    if x == 0.0:
        return 0
    sign = 0
    if x < 0:
        sign = 0x80000000
        x = -x
    e = math.frexp(x)[1]  # x = m * 2^e with 0.5 <= m < 1
    exp = e - 21 + 788
    mant = int(round(x * 2.0 ** -(exp - 788)))
    if mant >= 1 << 21:
        mant >>= 1
        exp += 1
    assert 0 <= exp < 1024 and 0 < mant < (1 << 21)
    return sign | (exp << 21) | mant


# -- stream parameters -------------------------------------------------------

RATE = 8000
BLOCKSIZE = 256  # single block size (blockflag-0 mode only)
N2 = BLOCKSIZE // 2
ORDER = 8  # floor0 LSP order (two dim-4 VQ words per channel)

# book 0: floor0 LSP coefficients.  dim 4, 16 entries, equal 4-bit
# codewords (canonical assignment: entry i <-> codeword i), lookup
# type 1 (libavcodec's vorbis decoder — the oracle — implements only
# lookup 1; quantvals = lookup1_values(16, 4) = 2, so entry bit d
# picks mults[0]/mults[1] for dim d), sequence_p=1 so coefficients are
# monotonically increasing with gaps >= 0.168 rad (keeps the LSP
# resonances off the bark grid and the exp() curve finite).
LSP_DIM = 4
LSP_ENTRIES = 16
LSP_VALUE_BITS = 3
LSP_MIN = 0.14
LSP_DELTA = 0.028
LSP_MULTS = (1, 7)  # increments 0.168 / 0.336

# book 1: residue classbook. dim 2, 4 entries, equal 2-bit codewords,
# scalar context.
CLS_DIM = 2

# book 2: residue values. dim 4, 16 entries, equal 4-bit codewords,
# lookup type 1, sequence_p=0: entry bits pick -0.8 / +0.8 per dim.
RES_DIM = 4
RES_ENTRIES = 16
RES_VALUE_BITS = 1
RES_MIN = -0.8
RES_DELTA = 1.6
RES_MULTS = (0, 1)

PARTITION_SIZE = 32  # residue partition size; 4 partitions cover 128


def _write_codebook_lsp(w: BitWriter) -> None:
    w.write(0x564342, 24)
    w.write(LSP_DIM, 16)
    w.write(LSP_ENTRIES, 24)
    w.write(0, 1)  # unordered
    w.write(0, 1)  # not sparse
    for _ in range(LSP_ENTRIES):
        w.write(4 - 1, 5)  # all length 4
    w.write(1, 4)  # lookup type 1
    w.write(float32_pack(LSP_MIN), 32)
    w.write(float32_pack(LSP_DELTA), 32)
    w.write(LSP_VALUE_BITS - 1, 4)
    w.write(1, 1)  # sequence_p
    for m in LSP_MULTS:  # quantvals = lookup1_values(16, 4) = 2
        w.write(m, LSP_VALUE_BITS)


def _write_codebook_class(w: BitWriter) -> None:
    w.write(0x564342, 24)
    w.write(CLS_DIM, 16)
    w.write(4, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(4):
        w.write(2 - 1, 5)  # all length 2
    w.write(0, 4)  # no lookup (scalar context)


def _write_codebook_res(w: BitWriter) -> None:
    w.write(0x564342, 24)
    w.write(RES_DIM, 16)
    w.write(RES_ENTRIES, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(RES_ENTRIES):
        w.write(4 - 1, 5)
    w.write(1, 4)  # lookup type 1
    w.write(float32_pack(RES_MIN), 32)
    w.write(float32_pack(RES_DELTA), 32)
    w.write(RES_VALUE_BITS - 1, 4)
    w.write(0, 1)  # sequence_p = 0
    for m in RES_MULTS:  # quantvals = 2
        w.write(m, RES_VALUE_BITS)


def build_headers(order: int = ORDER) -> List[bytes]:
    """(identification, comment, setup) for the crafted mono stream."""
    ident = bytearray(b"\x01vorbis")
    ident += struct.pack("<I", 0)  # version
    ident += bytes([1])  # channels
    ident += struct.pack("<I", RATE)
    ident += struct.pack("<iii", 0, 0, 0)  # bitrates
    bs_exp = BLOCKSIZE.bit_length() - 1
    ident += bytes([bs_exp | (bs_exp << 4)])  # blocksize0 | blocksize1
    ident += bytes([1])  # framing

    comment = bytearray(b"\x03vorbis")
    vendor = b"soundkit-tpu crafted fixture"
    comment += struct.pack("<I", len(vendor)) + vendor
    comment += struct.pack("<I", 0)  # no user comments
    comment += bytes([1])

    w = BitWriter()
    w.write(3 - 1, 8)  # codebook count
    _write_codebook_lsp(w)
    _write_codebook_class(w)
    _write_codebook_res(w)
    w.write(0, 6)  # time count - 1
    w.write(0, 16)  # time type 0
    # floors
    w.write(0, 6)  # floor count - 1
    w.write(0, 16)  # floor type 0
    w.write(order, 8)
    w.write(RATE, 16)
    w.write(64, 16)  # bark_map_size
    w.write(6, 6)  # amplitude_bits
    w.write(8, 8)  # amplitude_offset (small: keeps the
    # exp() envelope finite at the LSP resonances, see test notes)
    w.write(0, 4)  # number_of_books - 1
    w.write(0, 8)  # book 0
    # residues
    w.write(0, 6)  # residue count - 1
    w.write(1, 16)  # residue type 1
    w.write(0, 24)  # begin
    w.write(128, 24)  # end
    w.write(PARTITION_SIZE - 1, 24)
    w.write(2 - 1, 6)  # classifications
    w.write(1, 8)  # classbook = book 1
    # cascades: class 0 -> 0 (silent), class 1 -> pass 0 has a book
    w.write(0, 3)
    w.write(0, 1)
    w.write(1, 3)
    w.write(0, 1)
    w.write(2, 8)  # class 1 pass 0 book = book 2
    # mappings
    w.write(0, 6)  # mapping count - 1
    w.write(0, 16)  # mapping type 0
    w.write(0, 1)  # one submap
    w.write(0, 1)  # no coupling
    w.write(0, 2)  # reserved
    w.write(0, 8)  # time config (unused)
    w.write(0, 8)  # floor 0
    w.write(0, 8)  # residue 0
    # modes
    w.write(0, 6)  # mode count - 1
    w.write(0, 1)  # blockflag 0
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)  # mapping 0
    w.write(1, 1)  # framing
    setup = b"\x05vorbis" + w.bytes()
    return [bytes(ident), bytes(comment), setup]


def build_audio_packet(
    amplitude: int,
    lsp_entries: Sequence[int],
    res_entries: Sequence[int],
    order: int = ORDER,
) -> bytes:
    """One audio packet: floor0 channel data + residue type 1 data.

    lsp_entries: ceil(order/LSP_DIM) book-0 entry indices.
    res_entries: 32 book-2 entry indices (4 partitions x 8 words), or
    fewer for a truncated (end-of-packet) spectrum.
    """
    w = BitWriter()
    w.write(0, 1)  # audio packet
    # mode number: ilog(mode_count - 1) = ilog(0) = 0 bits
    # blockflag 0 mode: no window flags
    w.write(amplitude, 6)
    w.write(0, 1)  # booknumber (ilog(1) = 1 bit)
    need = -(-order // LSP_DIM)
    assert len(lsp_entries) == need
    for e in lsp_entries:
        w.write_huff(e, 4)
    # residue: classwords first (pass 0): 4 partitions / dim-2 classbook
    # entry 3 = classes (1, 1)
    w.write_huff(3, 2)
    # decode order (vorbis_core._decode_loop): classword for partitions
    # 0-1, then partition 0 values, partition 1 values, classword for
    # partitions 2-3, partition 2 values, partition 3 values.  A
    # truncated packet (fewer than 32 values) stops writing cold —
    # end-of-packet truncation per spec 1.1.3; do NOT emit trailing
    # classwords, real encoders end the packet mid-sequence.  For a
    # deterministic tail across decoders, truncate at a partition
    # boundary (multiples of 8 values).
    idx = 0
    per_part = PARTITION_SIZE // RES_DIM  # 8 words per partition
    for pc in range(4):
        if idx >= len(res_entries):
            break
        if pc == 2:
            w.write_huff(3, 2)
        for _ in range(per_part):
            if idx < len(res_entries):
                w.write_huff(res_entries[idx], 4)
                idx += 1
    return w.bytes()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def ogg_encapsulate(packets: List[bytes], serial: int = 0xC0DE) -> bytes:
    """Minimal Ogg writer: one packet per page (valid, verifiable)."""
    out = bytearray()
    granule = 0
    for i, pkt in enumerate(packets):
        segs = []
        n = len(pkt)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        if i >= 3:
            granule += N2  # close enough for a fixture; parsers only
            # need monotonic granules
        header_type = 2 if i == 0 else (4 if i == len(packets) - 1 else 0)
        hdr = bytearray(b"OggS")
        hdr += bytes([0, header_type])
        hdr += struct.pack("<q", granule if i >= 3 else 0)
        hdr += struct.pack("<I", serial)
        hdr += struct.pack("<I", i)  # page sequence
        hdr += b"\x00\x00\x00\x00"  # crc placeholder
        hdr += bytes([len(segs)]) + bytes(segs)
        page = bytes(hdr) + pkt
        crc = _ogg_crc(page)
        page = page[:22] + struct.pack("<I", crc) + page[26:]
        out += page
    return bytes(out)
