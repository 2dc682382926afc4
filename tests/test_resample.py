"""Resampler tests: quality (SNR), length contract, chunk invariance,
device/host equivalence (mirrors soundkit-decoder/src/lib.rs:2999-3134
plus stronger sample-level checks)."""
import numpy as np
import pytest

from soundkit_tpu.core.audio_pipeline import downsample_audio
from soundkit_tpu.core.audio_types import AudioData, EncodingFlag, Endianness
from soundkit_tpu.ops import resample as rs
from soundkit_tpu.pipeline.resampler import StreamingResampler


def _sine(rate, freq, seconds, amp=0.5):
    t = np.arange(int(rate * seconds), dtype=np.float64) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _snr_db(ref, test):
    err = ref.astype(np.float64) - test.astype(np.float64)
    p_sig = np.mean(ref.astype(np.float64) ** 2)
    p_err = np.mean(err**2)
    return 10 * np.log10(p_sig / max(p_err, 1e-30))


@pytest.mark.parametrize("in_rate,out_rate", [(48000, 16000), (44100, 16000), (16000, 48000), (48000, 44100)])
def test_sine_fidelity(in_rate, out_rate):
    """Resampled sine must match the ideal sine at >60 dB after the
    filter transient (sinc_len taps at each edge)."""
    freq = 1000.0
    x = _sine(in_rate, freq, 0.5)
    y = rs.resample_np(x[None, :], in_rate, out_rate)[0]

    L, M = rs.design_polyphase(in_rate, out_rate)[2:4]
    assert len(y) == rs.out_len(len(x), L, M)

    # ideal: sine delayed by sinc_len/2 input frames
    delay = rs.SINC_LEN / 2 / in_rate
    t = np.arange(len(y), dtype=np.float64) * M / L / in_rate - delay
    ideal = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    guard = rs.SINC_LEN * 2
    snr = _snr_db(ideal[guard:-guard], y[guard:-guard])
    assert snr > 60, f"SNR {snr:.1f} dB too low for {in_rate}->{out_rate}"


def test_alias_rejection():
    """A 7 kHz tone downsampled 48k->16k (Nyquist 8k) must survive;
    a 10 kHz tone must be strongly attenuated (anti-alias filter)."""
    keep = rs.resample_np(_sine(48000, 7000, 0.5)[None], 48000, 16000)[0]
    kill = rs.resample_np(_sine(48000, 10000, 0.5)[None], 48000, 16000)[0]
    g = rs.SINC_LEN
    rms_keep = np.sqrt(np.mean(keep[g:-g] ** 2))
    rms_kill = np.sqrt(np.mean(kill[g:-g] ** 2))
    assert rms_keep > 0.3
    assert rms_kill < rms_keep / 100, f"alias leak: {rms_kill} vs {rms_keep}"


def test_streaming_equals_one_shot_any_chunking():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12000)).astype(np.float32) * 0.3
    one_shot = rs.resample_np(x, 48000, 16000)

    for chunks in [[12000], [4096, 4096, 3808], [1, 2, 3, 11994], [7, 9999, 1994]]:
        sr = StreamingResampler(48000, 16000, 2)
        outs = []
        off = 0
        for c in chunks:
            outs.append(sr.process(x[:, off : off + c]))
            off += c
        streamed = np.concatenate(outs + [sr.flush()], axis=1)
        assert streamed.shape == one_shot.shape
        np.testing.assert_allclose(streamed, one_shot, atol=2e-6)


def test_streaming_length_contract():
    """Cumulative output count == ceil(T*L/M) at every step
    (the reference's streaming-vs-single-pass length test)."""
    sr = StreamingResampler(44100, 16000, 1)
    total_out = 0
    total_in = 0
    rng = np.random.default_rng(3)
    for c in [100, 441, 1, 999, 4096, 13]:
        out = sr.process(rng.standard_normal((1, c)).astype(np.float32))
        total_in += c
        total_out += out.shape[1]
        assert total_out == rs.out_len(total_in, sr.L, sr.M)


def test_device_matches_host():
    import jax

    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 4096)).astype(np.float32) * 0.5
    host = rs.resample_np(x, 48000, 16000)
    dev = np.asarray(jax.jit(lambda a: rs.resample(a, 48000, 16000))(x))
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_device_fractional_ratio_matches_host():
    import jax

    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 4410)).astype(np.float32) * 0.5
    host = rs.resample_np(x, 44100, 48000)
    dev = np.asarray(jax.jit(lambda a: rs.resample(a, 44100, 48000))(x))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_downsample_audio_validation_and_output(testdata):
    from soundkit_tpu.core.wav import WavStreamProcessor

    data = (testdata / "wav_32f" / "A_Tusk_is_used_to_make_costly_gifts.wav").read_bytes()
    proc = WavStreamProcessor()
    audio = proc.add(data)
    assert audio is not None

    out = downsample_audio(audio, 8000)
    assert len(out) == audio.channel_count
    L, M = rs.design_polyphase(audio.sampling_rate, 8000)[2:4]
    expect = rs.out_len(len(audio.data) // (4 * audio.channel_count), L, M)
    assert len(out[0]) == expect

    bad = AudioData(16, 1, 11025, b"\x00\x00", EncodingFlag.PCM_SIGNED, Endianness.LITTLE)
    with pytest.raises(ValueError, match="Unsupported input sample_rate"):
        downsample_audio(bad, 8000)
    with pytest.raises(ValueError, match="Unsupported output sample_rate"):
        downsample_audio(audio, 12345)


def test_audio_to_mono_f32_averages_channels():
    from soundkit_tpu.core import audio_bytes as ab
    from soundkit_tpu.core.audio_pipeline import audio_to_mono_f32

    data = ab.interleave_vecs_i16([np.array([32767, -32768], np.int16),
                                   np.array([-32768, 32767], np.int16)])
    audio = AudioData(16, 2, 48000, data, EncodingFlag.PCM_SIGNED, Endianness.LITTLE)
    mono = audio_to_mono_f32(audio)
    assert len(mono) == 2
    assert abs(mono[0]) < 0.01 and abs(mono[1]) < 0.01


def test_audio_to_f32_channels_s32_path():
    from soundkit_tpu.core.audio_pipeline import audio_to_f32_channels

    samples = np.array([2147483647, -2147483648, 0, 1073741824], dtype="<i4")
    audio = AudioData(32, 2, 48000, samples.tobytes(), EncodingFlag.PCM_SIGNED,
                      Endianness.LITTLE)
    chans = audio_to_f32_channels(audio)
    np.testing.assert_allclose(chans[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(chans[1], [-1.0, 0.5], atol=1e-6)


def test_stateful_chunked_matches_one_shot():
    """Carried-state device resample: chunked == one-shot bit-exact
    when the chunk keeps the polyphase phase aligned (n*L % M == 0)."""
    import jax
    import jax.numpy as jnp

    from soundkit_tpu.ops import resample as rs

    rng = np.random.default_rng(1)
    B, CH = 2, 441 * 16
    x = (rng.standard_normal((B, CH * 3)) * 0.5).astype(np.float32)
    one = np.asarray(rs.resample(jnp.asarray(x), 44100, 8000))

    f = jax.jit(rs.resample_stateful, static_argnums=(2, 3))
    hist = jnp.asarray(rs.resample_init_state(B))
    outs = []
    for k in range(3):
        o, hist = f(jnp.asarray(x[:, k * CH : (k + 1) * CH]), hist, 44100, 8000)
        outs.append(np.asarray(o))
    chunked = np.concatenate(outs, axis=1)
    n = min(one.shape[1], chunked.shape[1])
    np.testing.assert_array_equal(chunked[:, :n], one[:, :n])

    with pytest.raises(ValueError, match="must satisfy"):
        rs.resample_stateful(jnp.asarray(x[:, :1000]), hist, 44100, 8000)
