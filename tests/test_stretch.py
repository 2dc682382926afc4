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


def _vowel(rate, f0, n):
    """Harmonic source shaped by resonances at ~700 and ~1800 Hz."""
    t = np.arange(n) / rate
    sig = np.zeros(n)
    for k in range(1, int(5000 / f0)):
        f = k * f0
        g = (np.exp(-((f - 700) ** 2) / (2 * 120**2))
             + 0.8 * np.exp(-((f - 1800) ** 2) / (2 * 180**2)) + 0.01)
        sig += g * np.sin(2 * np.pi * f * t + 0.7 * k)
    return (sig / np.max(np.abs(sig)) * 0.8).astype(np.float32)


def _formants(x, rate):
    from soundkit_tpu.ops.stretch import FRAME, HOP_A, _spectral_envelope

    T = (len(x) - FRAME) // HOP_A
    idx = np.arange(FRAME)[None, :] + HOP_A * np.arange(T)[:, None]
    mag = np.abs(np.fft.rfft(np.hanning(FRAME) * x[idx], axis=-1))
    env = _spectral_envelope(mag).mean(axis=0)
    freqs = np.arange(len(env)) * rate / FRAME
    sel = freqs < 3000
    e, f = env[sel], freqs[sel]
    peaks = [i for i in range(1, len(e) - 1) if e[i] > e[i - 1] and e[i] >= e[i + 1]]
    peaks.sort(key=lambda i: -e[i])
    return sorted(f[i] for i in peaks[:2])


def test_formant_preservation():
    """Pitch x1.5: default shifts formants with pitch; formant_preserved
    pins them; explicit formant_scale lands at scale x original."""
    rate = 44100
    sig = _vowel(rate, 110.0, rate)
    f_in = _formants(sig, rate)
    base = OfflineStretchConfig(sample_rate=rate, channels=1, pitch_scale=1.5)

    follow = stretch_deinterleaved([sig], base)[0]
    f_follow = _formants(follow, rate)
    assert all(abs(a / b - 1.5) < 0.15 for a, b in zip(f_follow, f_in))

    pres = stretch_deinterleaved([sig], base.with_formant_preserved())[0]
    f_pres = _formants(pres, rate)
    assert all(abs(a / b - 1.0) < 0.1 for a, b in zip(f_pres, f_in))
    assert len(pres) == len(follow)

    shifted = stretch_deinterleaved(
        [sig], OfflineStretchConfig(sample_rate=rate, channels=1).with_formant_scale(1.3)
    )[0]
    f_shift = _formants(shifted, rate)
    assert all(abs(a / b - 1.3) < 0.1 for a, b in zip(f_shift, f_in))


def test_formant_scale_validation():
    cfg = OfflineStretchConfig.recommended_for_music(16000, 1).with_formant_scale(-1.0)
    with pytest.raises(StretchError, match="formant_scale"):
        stretch_deinterleaved([np.zeros(100, np.float32)], cfg)


def test_batched_device_vocoder_matches_host():
    """jnp phase vocoder == numpy path (f32 vs f64 tolerance)."""
    import jax

    from soundkit_tpu.ops.stretch import stretch_batch_device, stretch_channels

    rate = 16000
    t = np.arange(rate) / rate
    sig = np.stack(
        [np.sin(2 * np.pi * (180 + 60 * b) * t).astype(np.float32) * 0.5 for b in range(3)]
    )
    ratio = 1.25
    ref = np.stack([stretch_channels(sig[b : b + 1], ratio)[0] for b in range(3)])
    f = jax.jit(stretch_batch_device, static_argnums=(1,))
    dev = np.asarray(f(sig, ratio))
    assert dev.shape == ref.shape == (3, 20000)
    err = ref - dev
    snr = 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-30))
    assert snr > 50, f"device vocoder {snr:.1f} dB vs host"


def test_batched_device_vocoder_formant_warp():
    """Device envelope warp shifts formants like the host primitive."""
    import jax

    from soundkit_tpu.ops.stretch import stretch_batch_device, stretch_channels

    rate = 44100
    sig = _vowel(rate, 110.0, rate)
    f = jax.jit(stretch_batch_device, static_argnums=(1, 2))

    # numeric agreement with the host path (f32 vs f64 chain)
    warp = 1.5
    ref = stretch_channels(sig[None], 1.2, envelope_warp=warp)[0]
    dev = np.asarray(f(sig[None], 1.2, warp))[0]
    err = ref - dev
    snr = 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-30))
    assert snr > 25, f"device warp path {snr:.1f} dB vs host"

    # acoustic: formants divided by the warp factor
    f_in = _formants(sig, rate)
    f_out = _formants(dev, rate)
    for a, b in zip(f_out, f_in):
        assert abs(a / (b / warp) - 1.0) < 0.12, (f_in, f_out)


def test_batched_device_pitch_shift():
    """Fully on-device pitch shift (vocoder + conv resampler)."""
    import jax

    from soundkit_tpu.ops.stretch import pitch_shift_batch_device, stretch_pitch

    rate = 16000
    t = np.arange(rate) / rate
    sig = np.stack(
        [np.sin(2 * np.pi * (200 + 50 * b) * t).astype(np.float32) * 0.5 for b in range(3)]
    )
    f = jax.jit(pitch_shift_batch_device, static_argnums=(1, 2, 3))
    ref = np.stack([stretch_pitch(sig[b : b + 1], 1.0, 1.5)[0] for b in range(3)])
    dev = np.asarray(f(sig, 1.0, 1.5, None))
    assert dev.shape == (3, rate)
    n = min(ref.shape[1], dev.shape[1])
    err = ref[:, :n] - dev[:, :n]
    snr = 10 * np.log10(np.mean(ref[:, :n] ** 2) / max(np.mean(err**2), 1e-30))
    assert snr > 40, f"device pitch shift {snr:.1f} dB vs host"
    # pitch actually moved on the device output itself
    spec = np.abs(np.fft.rfft(dev[0] * np.hanning(rate)))
    peak = np.argmax(spec) * rate / rate
    assert abs(peak - 300) < 5, peak
