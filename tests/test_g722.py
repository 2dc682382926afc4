"""G.722 tests mirroring soundkit-g722/src/lib.rs:218-360 plus golden
bit-exactness and batched equivalence."""
import numpy as np
import pytest

from soundkit_tpu.codecs.g722 import G722Decoder, G722Encoder
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.ops import g722 as g722_ops


def _samples():
    idx = np.arange(161)
    return (np.sin(idx / 160.0 * 2 * np.pi * 3.0) * 12000.0).astype(np.int16)


def test_golden_bit_exact(testdata, golden):
    fixture = (testdata / "g722" / "A_Tusk_is_used_to_make_costly_gifts.g722").read_bytes()
    gold = parse_wav(
        (golden / "g722" / "A_Tusk_is_used_to_make_costly_gifts.decoded.wav").read_bytes()
    )
    dec = G722Decoder.new_64k()
    out = np.concatenate(
        [dec.decode_i16(fixture[i : i + 127]) for i in range(0, len(fixture), 127)]
    )
    expected = np.frombuffer(gold.data, dtype="<i2")
    assert len(out) == len(fixture) * 2
    np.testing.assert_array_equal(out, expected)


def test_streaming_decoder_matches_whole():
    enc = G722Encoder.new_64k()
    encoded = enc.encode_i16(_samples()) + enc.flush()

    whole = G722Decoder.new_64k().decode_i16(encoded)
    dec = G722Decoder.new_64k()
    chunked = np.concatenate(
        [dec.decode_i16(encoded[i : i + 3]) for i in range(0, len(encoded), 3)]
    )
    np.testing.assert_array_equal(chunked, whole)


def test_streaming_encoder_matches_padded_whole():
    input_ = _samples()
    padded = np.concatenate([input_, np.zeros(1, np.int16)])

    whole = G722Encoder.new_64k().encode_i16(padded)

    enc = G722Encoder.new_64k()
    chunked = b"".join(
        enc.encode_i16(input_[i : i + 5]) for i in range(0, len(input_), 5)
    ) + enc.flush()
    assert chunked == whole


def test_decoder_i16_i32_f32_consistency():
    enc = G722Encoder.new_64k()
    encoded = enc.encode_i16(_samples()) + enc.flush()
    i16 = G722Decoder.new_64k().decode_i16(encoded)
    i32 = G722Decoder.new_64k().decode_i32(encoded)
    f32 = G722Decoder.new_64k().decode_f32(encoded)
    np.testing.assert_array_equal(i32, i16.astype(np.int32) << 16)
    np.testing.assert_allclose(f32, i16.astype(np.float32) / 32768.0)


def test_roundtrip_quality():
    """Encode+decode a sine; output must track input (sub-band ADPCM ~4 bits)."""
    t = np.arange(3200)
    x = (np.sin(2 * np.pi * 440.0 * t / 16000.0) * 12000.0).astype(np.int16)
    enc = G722Encoder.new_64k()
    encoded = enc.encode_i16(x) + enc.flush()
    y = G722Decoder.new_64k().decode_i16(encoded).astype(np.float64)
    # G.722 QMF has ~22-sample latency; compare with offset search
    best = max(
        np.corrcoef(x[: len(x) - lag].astype(np.float64), y[lag : len(x)])[0, 1]
        for lag in range(16, 32)
    )
    assert best > 0.97, f"roundtrip correlation {best:.3f}"


def test_numpy_step_matches_jax_scan():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 256, size=(3, 40), dtype=np.uint8)
    st_np = g722_ops.g722_init_state(3, np)
    outs = []
    for t in range(40):
        st_np, pcm = g722_ops.g722_decode_step(np, st_np, codes[:, t].astype(np.int32))
        outs.append(pcm)
    expected = np.concatenate(outs, axis=1)

    import jax.numpy as jnp

    pcm_jax, st_jax = g722_ops.g722_decode_scan(
        jnp.asarray(codes.astype(np.int32)), g722_ops.g722_init_state(3, np)
    )
    np.testing.assert_array_equal(np.asarray(pcm_jax), expected)
    for a, b in zip(st_np, st_jax):
        np.testing.assert_array_equal(np.asarray(b), a)


def test_batched_ragged_matches_single(testdata):
    import jax.numpy as jnp

    fixture = (testdata / "g722" / "A_Tusk_is_used_to_make_costly_gifts.g722").read_bytes()
    codes_full = np.frombuffer(fixture[:120], dtype=np.uint8).astype(np.int32)

    B, N = 4, len(codes_full)
    lens = [N, N // 2, 3, 0]
    codes = np.zeros((B, N), dtype=np.int32)
    valid = np.zeros((B, N), dtype=bool)
    for s, ln in enumerate(lens):
        codes[s, :ln] = codes_full[:ln]
        valid[s, :ln] = True

    pcm, _ = g722_ops.g722_decode_scan(
        jnp.asarray(codes), g722_ops.g722_init_state(B, np), jnp.asarray(valid)
    )
    pcm = np.asarray(pcm)
    for s, ln in enumerate(lens):
        if ln == 0:
            assert np.all(pcm[s] == 0)
            continue
        single, _ = g722_ops.g722_decode_scan(
            jnp.asarray(codes_full[None, :ln]), g722_ops.g722_init_state(1, np)
        )
        np.testing.assert_array_equal(pcm[s, : ln * 2], np.asarray(single)[0])
        assert np.all(pcm[s, ln * 2 :] == 0)
