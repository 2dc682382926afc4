"""FLAC device-LPC split: host entropy decode + batched device
reconstruction must be bit-exact vs the host C++ decoder."""
import numpy as np
import pytest

from soundkit_tpu.codecs.flac import FlacDecoder, FlacError, FlacPartsStream
from soundkit_tpu.models.flac_batch import BatchedFlacDecoder

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _host_decode(data: bytes) -> np.ndarray:
    d = FlacDecoder()
    out = d.add(data)
    return np.frombuffer(out.data, "<i2") if out else np.zeros(0, np.int16)


def _device_decode_lane0(data: bytes, channels: int, stride: int = 8192) -> np.ndarray:
    m = BatchedFlacDecoder(2, stride=stride)
    m.push(0, data)
    m.push(1, data)
    samples, metas = m.decode_ready()
    parts = [samples[f, 0, :channels, : metas[f][0][0]] for f in range(samples.shape[0])]
    np.testing.assert_array_equal(samples[:, 0], samples[:, 1])
    return np.concatenate(parts, axis=1).T.reshape(-1)


def test_fixture_bit_exact(testdata):
    """Container fixture (mono 16k): device LPC == host decoder."""
    flac = (testdata / "flac" / f"{CLIP}.flac").read_bytes()
    ref = _host_decode(flac)
    dev = _device_decode_lane0(flac, channels=1, stride=4608)
    n = min(len(dev), len(ref))
    assert n == len(ref)
    np.testing.assert_array_equal(dev[:n].astype(np.int16), ref[:n])


def test_stereo_midside_lpc_bit_exact():
    """Encoder-generated stereo stream (mid/side, order-8 LPC)."""
    from soundkit_tpu.codecs.encoders import FlacEncoder

    rng = np.random.default_rng(11)
    t = np.arange(44100) / 44100.0
    l = np.sin(2 * np.pi * 440 * t) * 0.6 + rng.standard_normal(44100) * 0.02
    r = 0.9 * l + rng.standard_normal(44100) * 0.01
    pcm = (np.stack([l, r], 1).reshape(-1) * 20000).clip(-32768, 32767).astype(np.int16)
    e = FlacEncoder(44100, 16, 2)
    raw = e.encode_i16(pcm) + e.flush()

    ps = FlacPartsStream(8192)
    ps.feed(raw)
    assigns, orders = set(), set()
    while True:
        got = ps.next_parts()
        if got is None:
            break
        meta = got[0]
        assigns.add(int(meta[2]))
        orders.update(int(x) for x in meta[4::3][:2])
    assert 10 in assigns, f"need mid/side coverage, got {assigns}"
    assert any(o >= 4 for o in orders), f"need real LPC orders, got {orders}"

    ref = _host_decode(raw)
    dev = _device_decode_lane0(raw, channels=2)
    np.testing.assert_array_equal(dev[: len(ref)].astype(np.int16), ref)


def test_ragged_streams_and_chunked_feed(testdata):
    flac = (testdata / "flac" / f"{CLIP}.flac").read_bytes()
    m = BatchedFlacDecoder(2, stride=4608)
    for i in range(0, len(flac), 999):
        m.push(0, flac[i : i + 999])
    m.push(1, flac[: len(flac) // 2])
    k = m.ready_frames
    assert 0 < k < 42
    samples, metas = m.decode_ready()
    assert samples.shape[0] == k
    m.push(1, flac[len(flac) // 2 :])
    samples2, _ = m.decode_ready()
    assert samples.shape[0] + samples2.shape[0] == 42
    full = np.concatenate([samples, samples2])
    np.testing.assert_array_equal(full[:, 0], full[:, 1])


def test_parts_stride_too_small(testdata):
    flac = (testdata / "flac" / f"{CLIP}.flac").read_bytes()
    ps = FlacPartsStream(stride=64)
    ps.feed(flac)
    with pytest.raises(FlacError, match="stride"):
        ps.next_parts()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def bytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        return bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def test_right_side_and_wasted_bits_synthetic():
    """Hand-crafted frame: assignment 9 (right/side) with wasted bits on
    the right subframe — the decorrelation mode and wasted-shift paths
    no encoder in this environment emits.  Host and device must agree
    with the arithmetic computed in numpy."""
    bs = 16
    rng = np.random.default_rng(2)
    right = (rng.integers(-2000, 2000, bs) // 4 * 4).astype(np.int64)  # wasted=2
    left = rng.integers(-3000, 3000, bs).astype(np.int64)
    side = left - right  # spec: side = left - right; left = right + side

    w = _BitWriter()
    w.write(0x3FFE, 14)  # sync
    w.write(0, 1)        # reserved
    w.write(0, 1)        # fixed blocksize strategy
    w.write(6, 4)        # bs code: 8-bit bs-1 follows
    w.write(9, 4)        # 44.1 kHz
    w.write(9, 4)        # right/side
    w.write(4, 3)        # 16-bit
    w.write(0, 1)        # reserved
    w.write(0, 8)        # frame number 0 (utf8)
    w.write(bs - 1, 8)
    hdr = w.bytes()
    w.write(_crc8(hdr), 8)

    # subframe 0: side, bps 17, VERBATIM, no wasted
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in side:
        w.write_signed(int(v), 17)
    # subframe 1: right, bps 16, VERBATIM, wasted=2 (unary "01")
    w.write(0, 1)
    w.write(1, 6)
    w.write(1, 1)
    w.write(0, 1)  # unary 1 -> wasted = 2
    w.write(1, 1)
    for v in right:
        w.write_signed(int(v) >> 2, 14)
    while len(w.bits) % 8:
        w.bits.append(0)
    body = w.bytes()
    frame = body + _crc16(body).to_bytes(2, "big")

    # host path
    d = FlacDecoder()
    out = d.add(frame)
    got = np.frombuffer(out.data, "<i2").reshape(-1, 2)
    np.testing.assert_array_equal(got[:, 0], left.astype(np.int16))
    np.testing.assert_array_equal(got[:, 1], right.astype(np.int16))

    # device path
    m = BatchedFlacDecoder(1, stride=64)
    m.push(0, frame)
    samples, metas = m.decode_ready()
    assert metas[0][0][2] == 9 and metas[0][0][0] == bs
    np.testing.assert_array_equal(samples[0, 0, 0, :bs], left.astype(np.int32))
    np.testing.assert_array_equal(samples[0, 0, 1, :bs], right.astype(np.int32))


def _mono_frame_header(bs: int, frame_no: int = 0) -> "_BitWriter":
    w = _BitWriter()
    w.write(0x3FFE, 14)  # sync
    w.write(0, 1)        # reserved
    w.write(0, 1)        # fixed blocksize strategy
    w.write(6, 4)        # bs code: 8-bit bs-1 follows
    w.write(9, 4)        # 44.1 kHz
    w.write(0, 4)        # mono
    w.write(4, 3)        # 16-bit
    w.write(0, 1)        # reserved
    w.write(frame_no, 8)
    w.write(bs - 1, 8)
    w.write(_crc8(w.bytes()), 8)
    return w


def _finish_frame(w: "_BitWriter") -> bytes:
    while len(w.bits) % 8:
        w.bits.append(0)
    body = w.bytes()
    return body + _crc16(body).to_bytes(2, "big")


def _rice(w: "_BitWriter", v: int, k: int) -> None:
    zz = (v << 1) if v >= 0 else (-(v << 1) - 1)
    q = zz >> k
    for _ in range(q):
        w.write(0, 1)
    w.write(1, 1)
    if k:
        w.write(zz & ((1 << k) - 1), k)


def test_segment_wire_edge_codes():
    """Hand-crafted mono frame hitting every segment-wire shape no
    encoder in this environment emits: escape partitions (incl. the
    0-bit raw width), a >24-zero unary quotient (the device scan's
    window-skip path), and partition order 2.  Device == host,
    sample-exact.  claxon residual grammar:
    soundkit-flac/src/lib.rs:646-780."""
    bs = 64
    rng = np.random.default_rng(7)
    p1 = np.full(16, 0, np.int64)
    p1[0] = 50           # k=0 -> zz=100 -> 100-zero unary run
    p1[1] = -13
    p2 = rng.integers(-200, 200, 16)   # escape raw=9 (9-bit signed)
    p3 = rng.integers(-400, 400, 16)   # rice k=7
    p4 = np.zeros(16, np.int64)        # escape raw=0 (0-bit reads)
    vals = np.concatenate([p1, p2, p3, p4])

    w = _mono_frame_header(bs)
    w.write(0, 1)        # subframe pad
    w.write(8, 6)        # FIXED order 0
    w.write(0, 1)        # no wasted bits
    w.write(0, 2)        # residual method 0 (4-bit params)
    w.write(2, 4)        # partition order 2 -> 4 partitions of 16
    w.write(0, 4)        # p1: rice k=0
    for v in p1:
        _rice(w, int(v), 0)
    w.write(15, 4)       # p2: escape
    w.write(9, 5)        #     9-bit raw
    for v in p2:
        w.write_signed(int(v), 9)
    w.write(7, 4)        # p3: rice k=7
    for v in p3:
        _rice(w, int(v), 7)
    w.write(15, 4)       # p4: escape
    w.write(0, 5)        #     0-bit raw (all zeros, no payload)
    frame = _finish_frame(w)

    d = FlacDecoder()
    out = d.add(frame)
    host = np.frombuffer(out.data, "<i2")
    np.testing.assert_array_equal(host, vals.astype(np.int16))

    from soundkit_tpu.codecs.flac import FlacSegsStream

    ss = FlacSegsStream(stride=64)
    ss.feed(frame)
    got = ss.next()
    assert got[0] == "segs", "edge frame must ride the segment wire"
    ks = set(int(k) for k in got[5][:, 1])
    assert {-10, -1, 0, 7} <= ks, f"expected escape/rice mix, got {ks}"

    m = BatchedFlacDecoder(1, stride=64)
    m.push(0, frame)
    samples, metas = m.decode_ready()
    assert metas[0][0][0] == bs
    np.testing.assert_array_equal(samples[0, 0, 0, :bs], vals.astype(np.int32))


def test_segment_wire_constant_and_high_porder():
    """CONSTANT subframes ride xmeta (no segments); partition order 4
    stresses the per-partition segment table.  Device == host."""
    bs = 64
    w = _mono_frame_header(bs, frame_no=0)
    w.write(0, 1)
    w.write(0, 6)        # CONSTANT
    w.write(0, 1)
    w.write_signed(-777, 16)
    f_const = _finish_frame(w)

    rng = np.random.default_rng(8)
    vals = rng.integers(-60, 60, bs)
    w = _mono_frame_header(bs, frame_no=1)
    w.write(0, 1)
    w.write(8, 6)        # FIXED order 0
    w.write(0, 1)
    w.write(0, 2)
    w.write(4, 4)        # partition order 4 -> 16 partitions of 4
    for p in range(16):
        k = p % 5 + 1
        w.write(k, 4)
        for v in vals[p * 4 : p * 4 + 4]:
            _rice(w, int(v), k)
    f_rice = _finish_frame(w)

    data = f_const + f_rice
    d = FlacDecoder()
    out = d.add(data)
    host = np.frombuffer(out.data, "<i2")
    expect = np.concatenate([np.full(bs, -777, np.int64), vals])
    np.testing.assert_array_equal(host, expect.astype(np.int16))

    from soundkit_tpu.codecs.flac import FlacSegsStream

    ss = FlacSegsStream(stride=64)
    ss.feed(data)
    got = ss.next()
    assert got[0] == "segs" and got[4][0] == 1 and got[4][1] == -777
    assert got[5].shape[0] == 0, "constant frame must carry no segments"
    got2 = ss.next()
    assert got2[0] == "segs" and got2[5].shape[0] == 16

    m = BatchedFlacDecoder(1, stride=64)
    m.push(0, data)
    samples, metas = m.decode_ready()
    assert samples.shape[0] == 2
    np.testing.assert_array_equal(samples[0, 0, 0, :bs], np.full(bs, -777, np.int32))
    np.testing.assert_array_equal(samples[1, 0, 0, :bs], vals.astype(np.int32))


def test_segment_wire_parts_fallback_mix():
    """A frame the segment wire rejects (>32-bit fixed read via a
    33-bit escape... not constructible at 16 bps; instead force the
    seg-cap overflow) must fall back to the residual-plane wire and
    merge with segment frames in the same decode_ready round."""
    bs = 64
    rng = np.random.default_rng(9)
    vals = rng.integers(-60, 60, bs)
    w = _mono_frame_header(bs)
    w.write(0, 1)
    w.write(8, 6)
    w.write(0, 1)
    w.write(0, 2)
    w.write(4, 4)
    for p in range(16):
        w.write(2, 4)
        for v in vals[p * 4 : p * 4 + 4]:
            _rice(w, int(v), 2)
    frame = _finish_frame(w)

    from soundkit_tpu.codecs.flac import FlacSegsStream

    ss = FlacSegsStream(stride=64)
    ss.SEG_CAP = 8  # 16 partitions -> 16 segs > 8 -> parts fallback
    ss.feed(frame)
    got = ss.next()
    assert got[0] == "parts", "seg-cap overflow must export parts"

    m = BatchedFlacDecoder(2, stride=64)
    m.seg_cap = 8  # 16 partitions -> 16 segs > 8 -> parts fallback
    m.push(0, frame)  # parts-fallback lane
    m.seg_cap = 8192
    m.push(1, frame)  # segment lane
    samples, metas = m.decode_ready()
    np.testing.assert_array_equal(samples[0, 0, 0, :bs], vals.astype(np.int32))
    np.testing.assert_array_equal(samples[0, 1, 0, :bs], vals.astype(np.int32))


@pytest.mark.parametrize("variant,channels", [("16bit", 2), ("24bit", 1), ("32float", 1)])
def test_golden_bitdepth_variants(testdata, variant, channels):
    """The golden 16/24/32f FLAC variants (SURVEY §4 corpus): host path
    MD5-validates, device split bit-exact.  The 24-bit file carries
    wasted_bits=8 on every frame — live coverage for the wasted-shift
    path the generated streams never exercise."""
    golden = testdata.parent / "golden" / "flac"
    data = (golden / f"{CLIP}_{variant}.flac").read_bytes()

    d = FlacDecoder()
    out = d.add(data)
    assert d.verify_md5(out.data)
    bits = d.info["bits_per_sample"]
    if bits == 16:
        host = np.frombuffer(out.data, "<i2").astype(np.int32)
    elif bits == 24:
        raw = np.frombuffer(out.data, np.uint8).reshape(-1, 3).astype(np.int32)
        host = ((raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)) << 8) >> 8
    else:
        host = np.frombuffer(out.data, "<i4")

    if variant == "24bit":
        from soundkit_tpu.codecs.flac import FlacPartsStream

        ps = FlacPartsStream(4608)
        ps.feed(data)
        meta = ps.next_parts()[0]
        assert meta[6] == 8, "24-bit fixture must exercise wasted bits"

    m = BatchedFlacDecoder(1, stride=4608)
    m.push(0, data)
    samples, metas = m.decode_ready()
    parts = [samples[f, 0, :channels, : metas[f][0][0]] for f in range(samples.shape[0])]
    dev = np.concatenate(parts, axis=1).T.reshape(-1)
    n = min(len(dev), len(host))
    assert n == len(host)
    np.testing.assert_array_equal(dev[:n], host[:n])
