"""Time-stretch tests: duration contract, pitch behavior (spectral
peak tracking), API parity with soundkit-rubberband."""
import numpy as np
import pytest

from soundkit_tpu.core.audio_types import AudioData, EncodingFlag, Endianness, PcmData
from soundkit_tpu.stretch import (
    OfflineStretchConfig,
    StretchError,
    recommended_config_for_audio,
    stretch_audio_data,
    stretch_audio_data_preserve_format,
    stretch_audio_data_to_pcm,
    stretch_deinterleaved,
    stretch_interleaved,
)


def _sine(rate, freq, seconds):
    t = np.arange(int(rate * seconds)) / rate
    return (np.sin(2 * np.pi * freq * t) * 0.5).astype(np.float32)


def _dominant_freq(x, rate):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * rate / len(x)


def test_time_stretch_duration_and_pitch_preserved():
    rate = 16000
    x = _sine(rate, 440, 1.0)
    cfg = OfflineStretchConfig.recommended_for_music(rate, 1).with_time_ratio(1.5)
    out = stretch_deinterleaved([x], cfg)[0]
    assert abs(len(out) - 24000) <= 2
    # pitch unchanged
    f = _dominant_freq(out[2000:-2000], rate)
    assert abs(f - 440) < 8, f"pitch drifted to {f:.1f} Hz"
    # energy preserved roughly
    assert abs(np.sqrt(np.mean(out[2000:-2000] ** 2)) - 0.5 / np.sqrt(2)) < 0.05


def test_compress_duration():
    rate = 16000
    x = _sine(rate, 330, 1.0)
    cfg = OfflineStretchConfig.recommended_for_music(rate, 1).with_time_ratio(0.5)
    out = stretch_deinterleaved([x], cfg)[0]
    assert abs(len(out) - 8000) <= 2
    f = _dominant_freq(out[1000:-1000], rate)
    assert abs(f - 330) < 10


def test_pitch_shift_changes_frequency_not_duration():
    rate = 16000
    x = _sine(rate, 440, 1.0)
    cfg = OfflineStretchConfig.recommended_for_music(rate, 1).with_pitch_scale(1.5)
    out = stretch_deinterleaved([x], cfg)[0]
    assert abs(len(out) - len(x)) <= 2
    f = _dominant_freq(out[2000:-2000], rate)
    assert abs(f - 660) < 15, f"expected ~660 Hz, got {f:.1f}"


def test_stereo_and_interleaved():
    rate = 16000
    l = _sine(rate, 440, 0.5)
    r = _sine(rate, 550, 0.5)
    cfg = OfflineStretchConfig.recommended_for_music(rate, 2).with_time_ratio(2.0)
    outs = stretch_deinterleaved([l, r], cfg)
    assert len(outs) == 2 and abs(len(outs[0]) - 16000) <= 2

    inter = np.stack([l, r], axis=1).reshape(-1)
    out_i = stretch_interleaved(inter, cfg)
    assert abs(len(out_i) - 32000) <= 4


def test_audio_data_paths():
    rate = 16000
    x = (_sine(rate, 440, 0.5) * 32767).astype(np.int16)
    audio = AudioData(16, 1, rate, x.astype("<i2").tobytes(),
                      EncodingFlag.PCM_SIGNED, Endianness.LITTLE)
    cfg = recommended_config_for_audio(audio).with_time_ratio(1.25)

    out = stretch_audio_data(audio, cfg)
    assert out.audio_format == EncodingFlag.PCM_FLOAT
    assert abs(out.frame_count - 10000) <= 2

    pcm = stretch_audio_data_to_pcm(audio, cfg)
    assert pcm.sample_count == out.frame_count

    pres = stretch_audio_data_preserve_format(audio, cfg)
    assert pres.bits_per_sample == 16
    assert pres.audio_format == EncodingFlag.PCM_SIGNED


def test_validation():
    cfg = OfflineStretchConfig.recommended_for_music(16000, 1).with_time_ratio(500.0)
    with pytest.raises(StretchError):
        stretch_deinterleaved([np.zeros(100, np.float32)], cfg)
    cfg2 = OfflineStretchConfig.recommended_for_music(16000, 2)
    with pytest.raises(StretchError, match="channels"):
        stretch_deinterleaved([np.zeros(100, np.float32)], cfg2)
