"""G.726 tests mirroring soundkit-g726/src/lib.rs:914-1268 plus
scalar-vs-scan and batched-vs-single equivalence."""
import numpy as np
import pytest

from soundkit_tpu.codecs.g726 import (
    G726Decoder,
    G726Encoder,
    G726Packing,
    G726Rate,
    pack_codes,
    unpack_codes,
)
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.ops import adpcm

RATES = [G726Rate.RATE_16000, G726Rate.RATE_24000, G726Rate.RATE_32000, G726Rate.RATE_40000]
SUFFIX = {G726Rate.RATE_16000: "16", G726Rate.RATE_24000: "24",
          G726Rate.RATE_32000: "32", G726Rate.RATE_40000: "40"}


def _samples():
    idx = np.arange(397)
    return (np.sin(idx / 80.0 * 2 * np.pi) * 10000.0).astype(np.int16)


def test_pack_unpack_roundtrip_all_rates_and_packings():
    rng = np.random.default_rng(0)
    for rate in RATES:
        bits = rate.bits_per_sample
        n = rate.samples_per_byte_group * 5
        codes = rng.integers(0, 1 << bits, size=n, dtype=np.uint8)
        for packing in (G726Packing.LEFT, G726Packing.RIGHT):
            packed = pack_codes(codes, bits, packing)
            assert len(packed) == rate.bytes_per_group * 5
            back = unpack_codes(packed, bits, packing)
            np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("rate", RATES)
def test_golden_bit_exact(rate, testdata, golden):
    sfx = SUFFIX[rate]
    fixture = (testdata / "g726" / f"A_Tusk_is_used_to_make_costly_gifts_{sfx}.g726").read_bytes()
    gold = parse_wav(
        (golden / "g726" / f"A_Tusk_is_used_to_make_costly_gifts_{sfx}.decoded.wav").read_bytes()
    )
    dec = G726Decoder(rate, G726Packing.LEFT)
    out = np.concatenate(
        [dec.decode_i16(fixture[i : i + 127]) for i in range(0, len(fixture), 127)]
    )
    dec.flush()
    expected = np.frombuffer(gold.data, dtype="<i2")
    assert len(out) == len(expected)
    np.testing.assert_array_equal(out, expected)


def test_streaming_decoder_matches_whole():
    for rate in RATES:
        enc = G726Encoder(rate, G726Packing.LEFT)
        encoded = enc.encode_i16(_samples()) + enc.flush()

        whole = G726Decoder(rate, G726Packing.LEFT).decode_i16(encoded)
        stream_dec = G726Decoder(rate, G726Packing.LEFT)
        chunked = np.concatenate(
            [stream_dec.decode_i16(encoded[i : i + 1]) for i in range(len(encoded))]
        )
        stream_dec.flush()
        np.testing.assert_array_equal(chunked, whole, err_msg=f"rate {rate}")


def test_streaming_encoder_matches_padded_whole():
    input_ = _samples()
    for rate in RATES:
        g = rate.samples_per_byte_group
        padded = np.zeros(((len(input_) + g - 1) // g) * g, dtype=np.int16)
        padded[: len(input_)] = input_

        whole = G726Encoder(rate, G726Packing.LEFT).encode_i16(padded)

        enc = G726Encoder(rate, G726Packing.LEFT)
        chunked = b"".join(
            enc.encode_i16(input_[i : i + 37]) for i in range(0, len(input_), 37)
        ) + enc.flush()
        assert chunked == whole, f"rate {rate}"


def test_right_packing_roundtrip():
    enc = G726Encoder(G726Rate.RATE_32000, G726Packing.RIGHT)
    encoded = enc.encode_i16(_samples()) + enc.flush()
    dec = G726Decoder(G726Rate.RATE_32000, G726Packing.RIGHT)
    out = dec.decode_i16(encoded)
    assert len(out) == len(encoded) * 2
    assert np.any(out != 0)


def test_decoder_i16_i32_f32_consistency():
    enc = G726Encoder(G726Rate.RATE_32000, G726Packing.LEFT)
    encoded = enc.encode_i16(_samples()) + enc.flush()
    i16 = G726Decoder(G726Rate.RATE_32000).decode_i16(encoded)
    i32 = G726Decoder(G726Rate.RATE_32000).decode_i32(encoded)
    f32 = G726Decoder(G726Rate.RATE_32000).decode_f32(encoded)
    np.testing.assert_array_equal(i32, i16.astype(np.int32) << 16)
    np.testing.assert_allclose(f32, i16.astype(np.float32) / 32768.0)


def test_numpy_step_matches_jax_scan():
    """The generic core must agree exactly between numpy and lax.scan."""
    rng = np.random.default_rng(7)
    for bits in (2, 3, 4, 5):
        codes = rng.integers(0, 1 << bits, size=(3, 50), dtype=np.uint8)
        st_np = adpcm.g726_init_state(3, np)
        outs = []
        for t in range(50):
            st_np, pcm = adpcm.g726_decode_step(np, st_np, codes[:, t].astype(np.int32), bits)
            outs.append(pcm)
        expected = np.stack(outs, axis=1)

        import jax.numpy as jnp

        pcm_jax, st_jax = adpcm.g726_decode_scan(
            jnp.asarray(codes.astype(np.int32)), adpcm.g726_init_state(3, np), bits
        )
        np.testing.assert_array_equal(np.asarray(pcm_jax), expected, err_msg=f"bits={bits}")
        for a, b in zip(st_np, st_jax):
            np.testing.assert_array_equal(np.asarray(b), a)


def test_batched_ragged_decode_matches_single(testdata):
    """1024-lane batch with ragged lengths == per-stream decode (lane 0/1 checked)."""
    import jax.numpy as jnp

    fixture = (testdata / "g726" / "A_Tusk_is_used_to_make_costly_gifts_32.g726").read_bytes()
    codes_full = unpack_codes(fixture[:200], 4, G726Packing.LEFT)

    B, N = 8, len(codes_full)
    lens = [N, N // 2, N, N // 3, 10, N, 1, 0]
    codes = np.zeros((B, N), dtype=np.int32)
    valid = np.zeros((B, N), dtype=bool)
    for s, ln in enumerate(lens):
        codes[s, :ln] = codes_full[:ln]
        valid[s, :ln] = True

    pcm, _ = adpcm.g726_decode_scan(
        jnp.asarray(codes), adpcm.g726_init_state(B, np), 4, jnp.asarray(valid)
    )
    pcm = np.asarray(pcm)

    for s, ln in enumerate(lens):
        single, _ = adpcm.g726_decode_scan(
            jnp.asarray(codes_full[None, :ln].astype(np.int32)),
            adpcm.g726_init_state(1, np),
            4,
        )
        np.testing.assert_array_equal(pcm[s, :ln], np.asarray(single)[0], err_msg=f"lane {s}")
        assert np.all(pcm[s, ln:] == 0)
