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
