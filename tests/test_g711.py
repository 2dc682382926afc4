"""G.711 companding tests.

Mirrors soundkit-g711/src/lib.rs:324-531 plus exhaustive equivalence
between the branch-free vector ops and a direct scalar transcription of
the reference algorithm, and batched/sharded device-path equivalence.
"""
import numpy as np
import pytest

from soundkit_tpu.codecs.g711 import (
    G711Decoder,
    G711Encoder,
    G711Law,
    decode_sample,
    encode_sample,
)
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.ops import companding as comp

SAMPLES = np.array(
    [-32768, -30000, -20000, -12000, -4096, -1024, -32, -1, 0, 1, 32, 1024, 4096,
     12000, 20000, 30000, 32767],
    dtype=np.int16,
)


# --- scalar reference transcriptions (ground truth for exhaustive checks) ---

def _ref_decode_mulaw(code: int) -> int:
    s = (~code) & 0xFF
    magnitude = ((s & 0x0F) << 3) + 0x84
    magnitude <<= (s & 0x70) >> 4
    return (0x84 - magnitude) if (s & 0x80) else (magnitude - 0x84)


def _ref_decode_alaw(code: int) -> int:
    s = code ^ 0x55
    segment = (s & 0x70) >> 4
    magnitude = (s & 0x0F) << 4
    if segment == 0:
        magnitude += 8
    elif segment == 1:
        magnitude += 0x108
    else:
        magnitude = (magnitude + 0x108) << (segment - 1)
    return magnitude if (s & 0x80) else -magnitude


def _ref_segment(pcm: int) -> int:
    ends = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]
    for i, e in enumerate(ends):
        if pcm <= e:
            return i
    return 8


def _ref_encode_mulaw(sample: int) -> int:
    pcm = int(sample)
    if pcm < 0:
        pcm = 0x84 - pcm
        mask = 0x7F
    else:
        pcm += 0x84
        mask = 0xFF
    pcm = min(pcm, 32635)
    seg = _ref_segment(pcm)
    enc = 0x7F if seg >= 8 else ((seg << 4) | ((pcm >> (seg + 3)) & 0x0F))
    return enc ^ mask


def _ref_encode_alaw(sample: int) -> int:
    pcm = int(sample)
    if pcm >= 0:
        mask = 0xD5
    else:
        pcm = -pcm - 1
        mask = 0x55
    seg = _ref_segment(pcm)
    if seg >= 8:
        enc = 0x7F
    else:
        enc = seg << 4
        enc |= ((pcm >> 4) if seg < 2 else (pcm >> (seg + 3))) & 0x0F
    return enc ^ mask


def test_decode_exhaustive_all_codes():
    codes = np.arange(256, dtype=np.uint8)
    mu = comp.decode_mulaw_np(codes)
    al = comp.decode_alaw_np(codes)
    for c in range(256):
        assert mu[c] == _ref_decode_mulaw(c), f"mulaw code {c}"
        assert al[c] == _ref_decode_alaw(c), f"alaw code {c}"


def test_encode_exhaustive_all_i16():
    samples = np.arange(-32768, 32768, dtype=np.int16)
    mu = comp.encode_mulaw_np(samples)
    al = comp.encode_alaw_np(samples)
    # spot-check full range at stride plus edges against scalar reference
    idx = list(range(0, 65536, 257)) + [0, 1, 32767, 32768, 65535]
    for i in idx:
        s = int(samples[i])
        assert mu[i] == _ref_encode_mulaw(s), f"mulaw sample {s}"
        assert al[i] == _ref_encode_alaw(s), f"alaw sample {s}"


def test_known_codes():
    # lib.rs:402-414
    assert decode_sample(G711Law.MU_LAW, 0xFF) == 0
    assert decode_sample(G711Law.MU_LAW, 0x7F) == 0
    assert encode_sample(G711Law.MU_LAW, 0) == 0xFF
    assert decode_sample(G711Law.A_LAW, 0xD5) == 8
    assert decode_sample(G711Law.A_LAW, 0x55) == -8
    assert encode_sample(G711Law.A_LAW, 0) == 0xD5


def test_roundtrip_stable_after_quantization():
    for law in (G711Law.MU_LAW, G711Law.A_LAW):
        for s in SAMPLES:
            decoded = decode_sample(law, encode_sample(law, int(s)))
            redecoded = decode_sample(law, encode_sample(law, decoded))
            assert redecoded == decoded


def test_decoder_i16_i32_f32_consistency():
    encoded = bytes([0xFF, 0xD7, 0xB7, 0x37, 0x17, 0x7F])
    dec = G711Decoder.new_mulaw()
    i16 = dec.decode_i16(encoded)
    i32 = dec.decode_i32(encoded)
    f32 = dec.decode_f32(encoded)
    np.testing.assert_array_equal(i32, i16.astype(np.int32) << 16)
    np.testing.assert_allclose(f32, i16.astype(np.float32) / 32768.0)


def test_chunked_encode_matches_whole():
    enc = G711Encoder.new_mulaw()
    whole = enc.encode_i16(SAMPLES)
    chunked = b"".join(enc.encode_i16(SAMPLES[i : i + 3]) for i in range(0, len(SAMPLES), 3))
    assert chunked == whole


@pytest.mark.parametrize(
    "law,fixture_dir",
    [(G711Law.MU_LAW, "g711_ulaw"), (G711Law.A_LAW, "g711_alaw")],
)
def test_golden_bit_exact(law, fixture_dir, testdata, golden):
    ext = "ulaw" if law is G711Law.MU_LAW else "alaw"
    fixture = (testdata / fixture_dir / f"A_Tusk_is_used_to_make_costly_gifts.{ext}").read_bytes()
    gold = parse_wav(
        (golden / fixture_dir / "A_Tusk_is_used_to_make_costly_gifts.decoded.wav").read_bytes()
    )
    assert gold.bits_per_sample == 16 and gold.channel_count == 1

    dec = G711Decoder(law, 8000, 1)
    # decode in streaming chunks like the reference test (137-byte chunks)
    out = np.concatenate(
        [dec.decode_i16(fixture[i : i + 137]) for i in range(0, len(fixture), 137)]
    )
    expected = np.frombuffer(gold.data, dtype="<i2")
    np.testing.assert_array_equal(out, expected)


def test_batched_device_decode_matches_host():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 256, size=(16, 160), dtype=np.uint8)
    is_alaw = np.arange(16) % 2 == 0

    batched = jax.jit(comp.decode_g711)(jnp.asarray(codes), jnp.asarray(is_alaw))
    out = np.asarray(batched)
    for s in range(16):
        host = comp.decode_alaw_np(codes[s]) if is_alaw[s] else comp.decode_mulaw_np(codes[s])
        np.testing.assert_array_equal(out[s], host)


def test_sharded_batch_decode_8_devices():
    import jax
    import jax.numpy as jnp

    from soundkit_tpu.parallel.mesh import shard_batch, stream_mesh

    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"
    mesh = stream_mesh()
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 256, size=(64, 320), dtype=np.uint8)
    sharded = shard_batch(mesh, codes)
    out = np.asarray(jax.jit(comp.decode_mulaw)(sharded))
    np.testing.assert_array_equal(out, comp.decode_mulaw_np(codes))
