"""Conversion-kernel tests mirroring soundkit/src/audio_bytes.rs:375-469."""
import numpy as np
import pytest

from soundkit_tpu.core import audio_bytes as ab


def test_deinterleave_vecs_i16():
    data = bytes([1, 0, 2, 0, 3, 0, 4, 0, 5, 0, 6, 0])
    result = ab.deinterleave_vecs_i16(data, 2)
    assert [list(c) for c in result] == [[1, 3, 5], [2, 4, 6]]


def test_interleave_vecs_i16():
    result = ab.interleave_vecs_i16([np.array([1, 3, 5]), np.array([2, 4, 6])])
    assert result == bytes([1, 0, 2, 0, 3, 0, 4, 0, 5, 0, 6, 0])


def test_deinterleave_vecs_s24():
    data = bytes([1, 0, 0, 2, 0, 0, 3, 0, 0, 4, 0, 0, 5, 0, 0, 6, 0, 0])
    result = ab.deinterleave_vecs_s24(data, 2)
    assert [list(c) for c in result] == [[1, 3, 5], [2, 4, 6]]


def test_deinterleave_vecs_f32():
    data = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], dtype="<f4").tobytes()
    result = ab.deinterleave_vecs_f32(data, 2)
    assert [list(c) for c in result] == [[1.0, 3.0, 5.0], [2.0, 4.0, 6.0]]


def test_i16le_to_f32():
    data = np.array([0, 16384, 32767, -16384, -32768], dtype="<i2").tobytes()
    expected = [0.0, 0.5, 0.9999694, -0.5, -1.0]
    result = ab.i16le_to_f32(data)
    np.testing.assert_allclose(result, expected, atol=1e-4)


def test_s24_sign_extension():
    # -1 as 24-bit LE = ff ff ff ; 0x7fffff = max positive
    data = bytes([0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x7F])
    result = ab.s24le_to_i32(data)
    assert list(result) == [-1, 8388607]


def test_s24le_to_i16_shifts():
    data = bytes([0x00, 0x00, 0x40])  # 0x400000 -> >>8 = 0x4000
    assert list(ab.s24le_to_i16(data)) == [0x4000]


def test_s24be_to_i16():
    data = bytes([0x40, 0x00, 0x00])
    assert list(ab.s24be_to_i16(data)) == [0x4000]


def test_s32_to_s24_masks_without_sign_extension():
    # Reference quirk: -1 i32 -> 0x00FFFFFF (positive) (audio_bytes.rs:106)
    data = np.array([-1, 0x01000000], dtype="<i4").tobytes()
    assert list(ab.s32le_to_s24(data)) == [0x00FFFFFF, 0]


def test_s32le_to_i16_shifts_16():
    data = np.array([0x7FFF0000, -0x80000000], dtype="<i4").tobytes()
    assert list(ab.s32le_to_i16(data)) == [0x7FFF, -0x8000]


def test_f32_to_i16_truncates_and_clamps():
    data = np.array([0.5, -0.5, 2.0, -2.0, 0.99999], dtype="<f4").tobytes()
    result = ab.f32le_to_i16(data)
    assert list(result) == [16383, -16383, 32767, -32767, 32766]


def test_f32_to_i32_saturates():
    data = np.array([1.0, -1.0, 0.5], dtype="<f4").tobytes()
    result = ab.f32le_to_i32(data)
    assert list(result) == [2147483647, -2147483648, 1073741824]


def test_f32_to_s24_asymmetric_scale():
    data = np.array([1.0, -1.0], dtype="<f4").tobytes()
    result = ab.f32le_to_s24(data)
    assert list(result) == [8388607, -8388608]


def test_s32le_to_f32_divides_by_2p31():
    data = np.array([-2147483648, 1073741824], dtype="<i4").tobytes()
    result = ab.s32le_to_f32(data)
    np.testing.assert_allclose(result, [-1.0, 0.5])


def test_stereo_to_mono_take_left():
    assert list(ab.stereo_to_mono_take_left(np.array([10, 20, -30, -40, 50, 60]))) == [
        10,
        -30,
        50,
    ]


def test_stereo_to_mono_avg():
    assert list(ab.stereo_to_mono_avg(np.array([100, -100, 50, 150, -200, 200]))) == [
        0,
        100,
        0,
    ]
    # truncation toward zero like Rust integer division
    assert list(ab.stereo_to_mono_avg(np.array([-1, -2]))) == [-1]


def test_vec_scalers_roundtrip_asymmetry():
    x = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    f = ab.vec_i16_to_f32(x)
    np.testing.assert_allclose(f, x.astype(np.float32) / 32768.0)
    back = ab.vec_f32_to_i16(f)
    # -32768/32768 = -1.0 -> *32767 -> -32767 (reference asymmetry)
    assert list(back) == [-32767, 0, 0, 0, 32766]


def test_f32s_le_bytes_roundtrip():
    x = np.array([0.0, 0.25, -0.5, 1.0], dtype=np.float32)
    assert list(ab.f32s_from_le_bytes(ab.f32s_to_le_bytes(x))) == list(x)
    with pytest.raises(ValueError):
        ab.f32s_from_le_bytes(b"\x00\x01\x02")
