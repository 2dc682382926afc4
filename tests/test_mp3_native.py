"""From-scratch MP3 decoder tests: float-exactness vs the libavcodec
oracle (MPEG-1 + MPEG-2 LSF), batched device equivalence, streaming."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundkit_tpu.codecs.mp3_native import Mp3NativeDecoder, parse_header
from soundkit_tpu.ops import mp3_batch as mb
from soundkit_tpu.ops.mp3_dsp import Mp3Synth

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _decode_ours(mp3: bytes) -> np.ndarray:
    frames = Mp3NativeDecoder().push(mp3)
    synth = Mp3Synth()
    return np.concatenate([synth.process_frame(f) for f in frames], axis=1)


def _oracle(mp3: bytes) -> np.ndarray:
    from soundkit_tpu.codecs.avdec import AvDecoder

    o = AvDecoder("mp3float", use_parser=True)
    return np.concatenate([o.push(mp3), o.flush()])


def _snr(ref, test):
    n = min(len(ref), len(test))
    err = ref[:n] - test[:n]
    return 10 * np.log10(np.mean(ref[:n] ** 2) / max(np.mean(err**2), 1e-30))


def _lame(pcm, rate, ch, kbps):
    from soundkit_tpu.codecs.encoders import Mp3Encoder

    e = Mp3Encoder(rate, ch, kbps)
    return e.encode_i16(pcm) + e.flush()


def test_fixture_lsf_float_exact(testdata):
    """MPEG-2 LSF 16 kHz fixture: float-exact vs oracle (ours emits one
    extra leading frame for the oracle's reservoir priming)."""
    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    ours = _decode_ours(mp3)[0]
    ref = _oracle(mp3)
    snr = _snr(ref, ours[576:])
    assert snr > 90, f"LSF SNR {snr:.1f} dB"


@pytest.mark.parametrize("kbps", [64000, 256000])
def test_mpeg1_stereo_float_exact(kbps):
    t = np.arange(44100) / 44100.0
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 660 * t)], axis=1)
           .reshape(-1) * 12000).astype(np.int16)
    mp3 = _lame(pcm, 44100, 2, kbps)
    ours = _decode_ours(mp3)
    inter = ours.T.reshape(-1)
    ref = _oracle(mp3)
    snr = _snr(ref, inter)
    assert snr > 90, f"MPEG1 stereo {kbps}: {snr:.1f} dB"


def test_mpeg1_noise_all_block_types():
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(44100) * 6000).astype(np.int16)
    mp3 = _lame(pcm, 44100, 1, 256000)
    frames = Mp3NativeDecoder().push(mp3)
    bts = {g[0].block_type for f in frames for g in f.granules}
    assert bts >= {0, 2}, f"need long+short coverage, got {bts}"
    ours = _decode_ours(mp3)[0]
    snr = _snr(_oracle(mp3), ours)
    assert snr > 90, f"noise SNR {snr:.1f} dB"


def test_header_parse(testdata):
    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    # skip ID3 to first frame
    dec = Mp3NativeDecoder()
    dec.push(mp3[:5000])
    hdr = dec.header
    assert hdr.sample_rate == 16000
    assert hdr.lsf and hdr.nb_channels == 1
    assert hdr.samples == 576


def test_chunked_push_invariance(testdata):
    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()

    def run(chunk):
        dec = Mp3NativeDecoder()
        frames = []
        for i in range(0, len(mp3), chunk):
            frames.extend(dec.push(mp3[i : i + chunk]))
        synth = Mp3Synth()
        return np.concatenate([synth.process_frame(f) for f in frames], axis=1)

    a, b = run(313), run(len(mp3))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_batched_device_matches_reference():
    t = np.arange(22050) / 44100.0
    pcm = (np.stack([np.sin(2 * np.pi * 330 * t), np.sin(2 * np.pi * 550 * t)], axis=1)
           .reshape(-1) * 12000).astype(np.int16)
    mp3 = _lame(pcm, 44100, 2, 128000)
    frames = Mp3NativeDecoder().push(mp3)

    synth = Mp3Synth()
    ref = np.concatenate([synth.process_frame(f) for f in frames], axis=1)

    B = 2
    overlap, fifo = mb.init_state(B)
    step = jax.jit(mb.mp3_granule_device)
    outs = []
    for f in frames:
        for granules in f.granules:
            gb = mb.prepare_granule_batch([granules] * B, [f.header] * B)
            pcm_d, overlap, fifo = step(
                jnp.asarray(gb.quant), jnp.asarray(gb.scale), jnp.asarray(gb.ms),
                jnp.asarray(gb.block_type), jnp.asarray(gb.mixed),
                jnp.asarray(gb.n_alias_sb), jnp.asarray(gb.lane_valid), overlap, fifo,
            )
            outs.append(np.asarray(pcm_d))
    dev = np.concatenate(outs, axis=2)
    for b in range(B):
        snr = _snr(ref.reshape(-1), dev[b].reshape(-1))
        assert snr > 90, f"lane {b}: {snr:.1f} dB"


def test_ragged_lane_freezes():
    t = np.arange(11025) / 44100.0
    pcm = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    mp3 = _lame(pcm, 44100, 1, 128000)
    frames = Mp3NativeDecoder().push(mp3)
    g0 = frames[0].granules[0]
    B = 2
    overlap, fifo = mb.init_state(B)
    step = jax.jit(mb.mp3_granule_device)
    gb = mb.prepare_granule_batch([g0, None], [frames[0].header, None])
    pcm_d, overlap2, _ = step(
        jnp.asarray(gb.quant), jnp.asarray(gb.scale), jnp.asarray(gb.ms),
        jnp.asarray(gb.block_type), jnp.asarray(gb.mixed),
        jnp.asarray(gb.n_alias_sb), jnp.asarray(gb.lane_valid), overlap, fifo,
    )
    assert np.all(np.asarray(pcm_d)[1] == 0)
    np.testing.assert_array_equal(np.asarray(overlap2)[1], overlap[1])


def test_native_parser_matches_python(testdata):
    """C++ parser granule lanes must match the python spec exactly."""
    from soundkit_tpu.codecs.mp3_native import NativeMp3Parser
    from soundkit_tpu.ops import mp3_dsp

    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    frames = Mp3NativeDecoder().push(mp3)
    py = []
    for f in frames:
        for granules in f.granules:
            g = granules[0]
            q, e = g.spectrum, g.exponents
            if g.block_type == 2:
                q = mp3_dsp.reorder_short(g, f.header, q.astype(np.float64)).astype(np.int32)
                e = mp3_dsp.reorder_short(g, f.header, g.exponents)
            py.append((q, e))

    nat = NativeMp3Parser()
    n = nat.push(mp3)
    assert n == len(py)
    for i in range(n):
        q, e, meta = nat.pop()
        pq, pe = py[i]
        np.testing.assert_array_equal(q[0], np.clip(pq, -32768, 32767).astype(np.int16))
        scale = np.where(e[0] == -32768, 0.0, np.exp2(0.25 * e[0].astype(np.float64)))
        nz = pq != 0
        np.testing.assert_allclose(scale[nz], pe[nz], rtol=1e-6)


def test_batched_mp3_model(testdata):
    """Serving model: lockstep granule batches over the native parser +
    compact device step, vs the numpy reference decode."""
    from soundkit_tpu.models.mp3_batch_model import BatchedMp3Decoder
    from soundkit_tpu.ops.mp3_dsp import Mp3Synth

    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    frames = Mp3NativeDecoder().push(mp3)
    synth = Mp3Synth()
    ref = np.concatenate([synth.process_frame(f) for f in frames], axis=1)[0]

    B = 3
    model = BatchedMp3Decoder(B, channels=1)
    for i in range(B):
        model.push(i, mp3)
    out = model.decode_ready()
    assert out.shape[0] == 86 and model.sample_rate == 16000
    got = out[:, 0, 0].reshape(-1)
    n = min(len(got), len(ref))
    err = ref[:n] - got[:n]
    snr = 10 * np.log10(np.mean(ref[:n] ** 2) / max(np.mean(err**2), 1e-30))
    assert snr > 90, f"batched model {snr:.1f} dB vs reference"
    np.testing.assert_allclose(out[:, 0], out[:, 2], atol=1e-6)


def test_mpeg25_8khz_short_block_regions():
    """8 kHz MPEG-2.5 (sr_index 8): short-block big-values boundary is
    72 lines (double-width bands), not 36 — both parsers."""
    rng = np.random.default_rng(3)
    t = np.arange(16000) / 8000.0
    sig = rng.standard_normal(16000) * 0.05
    for k in range(10):
        sig[k * 1600 : k * 1600 + 200] += np.sin(2 * np.pi * 800 * t[:200]) * 0.8
    pcm = (sig * 24000).clip(-32768, 32767).astype(np.int16)
    mp3 = _lame(pcm, 8000, 1, 32000)

    frames = Mp3NativeDecoder().push(mp3)
    assert frames[0].header.sr_index == 8
    bts = {g[0].block_type for f in frames for g in f.granules}
    assert 2 in bts, "fixture must exercise short blocks"
    ours = _decode_ours(mp3)[0]
    snr = _snr(_oracle(mp3), ours)
    assert snr > 90, f"8 kHz MPEG-2.5 SNR {snr:.1f} dB"

    # C++ parser + batched model end-to-end at 8 kHz
    from soundkit_tpu.models.mp3_batch_model import BatchedMp3Decoder

    m = BatchedMp3Decoder(1, channels=1)
    m.push(0, mp3)
    out = m.decode_ready()
    assert m.sample_rate == 8000
    got = out[:, 0, 0].reshape(-1)
    snr2 = _snr(ours, got)
    assert snr2 > 90, f"batched 8 kHz {snr2:.1f} dB"


@pytest.mark.parametrize("rate,kbps", [(44100, 128000), (22050, 64000), (12000, 40000)])
def test_rate_sweep_batched_matches_host(rate, kbps):
    """MPEG-1/2/2.5 sr_index sweep: the batched serving model must
    match the numpy reference decode (>90 dB) on encoder content."""
    from soundkit_tpu.models.mp3_batch_model import BatchedMp3Decoder

    rng = np.random.default_rng(5)
    n = rate
    t = np.arange(n) / rate
    sig = np.sin(2 * np.pi * 400 * t) * 0.4 + rng.standard_normal(n) * 0.05
    step = n // 8
    for k in range(8):
        sig[k * step : k * step + 200] += np.sin(2 * np.pi * 900 * t[:200]) * 0.6
    pcm = (sig * 24000).clip(-32768, 32767).astype(np.int16)
    mp3 = _lame(pcm, rate, 1, kbps)

    frames = Mp3NativeDecoder().push(mp3)
    synth = Mp3Synth()
    ref = np.concatenate([synth.process_frame(f) for f in frames], axis=1)[0]

    m = BatchedMp3Decoder(1, channels=1)
    m.push(0, mp3)
    got = m.decode_ready()[:, 0, 0].reshape(-1)
    assert m.sample_rate == rate
    snr = _snr(ref, got)
    assert snr > 90, f"{rate}Hz batched vs host: {snr:.1f} dB"


def test_decode_multi_matches_per_granule(testdata):
    """One-dispatch lax.scan path == per-granule path exactly."""
    from soundkit_tpu.models.mp3_batch_model import BatchedMp3Decoder

    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    m1 = BatchedMp3Decoder(2, channels=1)
    m1.push(0, mp3)
    m1.push(1, mp3[: len(mp3) // 2])  # ragged
    ref = m1.decode_batches(40)
    m2 = BatchedMp3Decoder(2, channels=1)
    m2.push(0, mp3)
    m2.push(1, mp3[: len(mp3) // 2])
    got = m2.decode_multi(40)
    np.testing.assert_allclose(got, ref, atol=1e-6)
