"""Batched multi-stream model tests: telephony raggedness + golden
parity, AAC flagship sharded over the 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.models.telephony_batch import BatchedTelephonyDecoder

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def test_batched_g711_ragged_golden(testdata, golden):
    fixture = (testdata / "g711_ulaw" / f"{CLIP}.ulaw").read_bytes()
    gold = np.frombuffer(
        parse_wav((golden / "g711_ulaw" / f"{CLIP}.decoded.wav").read_bytes()).data, "<i2"
    )
    B = 8
    model = BatchedTelephonyDecoder("g711_mulaw", B, chunk_codes=4096)
    # ragged feeds
    feeds = [len(fixture), len(fixture) // 2, 100, len(fixture), 0, 5000, 1, len(fixture)]
    for i, n in enumerate(feeds):
        model.push(i, fixture[:n])
    got = [np.zeros(0, np.int16)] * B
    while True:
        pcm, lens = model.decode_step()
        if lens.sum() == 0:
            break
        for i in range(B):
            got[i] = np.concatenate([got[i], pcm[i, : lens[i]].astype(np.int16)])
    for i, n in enumerate(feeds):
        np.testing.assert_array_equal(got[i], gold[:n], err_msg=f"lane {i}")


def test_batched_g726_vs_streaming(testdata, golden):
    fixture = (testdata / "g726" / f"{CLIP}_32.g726").read_bytes()
    gold = np.frombuffer(
        parse_wav((golden / "g726" / f"{CLIP}_32.decoded.wav").read_bytes()).data, "<i2"
    )
    B = 4
    model = BatchedTelephonyDecoder("g726_32", B, chunk_codes=2048)
    for i in range(B):
        model.push(i, fixture)
    got = [np.zeros(0, np.int16)] * B
    while True:
        pcm, lens = model.decode_step()
        if lens.sum() == 0:
            break
        for i in range(B):
            got[i] = np.concatenate([got[i], pcm[i, : lens[i]].astype(np.int16)])
    for i in range(B):
        np.testing.assert_array_equal(got[i], gold, err_msg=f"lane {i}")


def test_batched_g722_golden(testdata, golden):
    fixture = (testdata / "g722" / f"{CLIP}.g722").read_bytes()
    gold = np.frombuffer(
        parse_wav((golden / "g722" / f"{CLIP}.decoded.wav").read_bytes()).data, "<i2"
    )
    model = BatchedTelephonyDecoder("g722", 2, chunk_codes=4096)
    model.push(0, fixture)
    model.push(1, fixture[: len(fixture) // 3])
    got = [np.zeros(0, np.int16)] * 2
    while True:
        pcm, lens = model.decode_step()
        if lens.sum() == 0:
            break
        for i in range(2):
            got[i] = np.concatenate([got[i], pcm[i, : lens[i]].astype(np.int16)])
    np.testing.assert_array_equal(got[0], gold)
    np.testing.assert_array_equal(got[1], gold[: len(got[1])])


def test_aac_flagship_sharded_8dev(golden):
    """The flagship step under stream-axis sharding must equal the
    unsharded result exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from soundkit_tpu.codecs.aac_lc import AdtsStream
    from soundkit_tpu.ops import aac_batch as ab

    assert len(jax.devices()) == 8
    data = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    stream = AdtsStream()
    aus = stream.push(data)
    frame = stream.decoder.decode_au(aus[8])

    B = 16
    fb = ab.prepare_frame_batch([frame] * B)
    saved, prev = ab.init_state(B)
    args = (fb.quant, fb.scale, fb.ms_mask, fb.int_factor, fb.perm, fb.filt_id,
            fb.lpc, fb.seq, fb.shape, prev, fb.chan_valid, saved)

    plain = jax.jit(ab.aac_decode_frame_device)(*[jnp.asarray(a) for a in args])

    mesh = Mesh(np.array(jax.devices()), ("streams",))
    def shard(a):
        return jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P("streams", *([None] * (np.ndim(a) - 1))))
        )
    sharded = jax.jit(ab.aac_decode_frame_device)(*[shard(a) for a in args])

    np.testing.assert_allclose(np.asarray(plain[0]), np.asarray(sharded[0]), atol=1e-6)
    # output really is sharded across devices
    assert len(sharded[0].sharding.device_set) == 8


def test_batched_opus_decoder():
    """Host-parallel lockstep Opus serving model vs OpusStreamDecoder
    (float-identical; first slot short by the head's preskip)."""
    from soundkit_tpu.codecs.encoders import OpusEncoder
    from soundkit_tpu.codecs.opus import OpusStreamDecoder
    from soundkit_tpu.models.opus_batch import BatchedOpusDecoder

    t = np.arange(48000) / 48000.0
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 660 * t)], 1)
           .reshape(-1) * 12000).astype(np.int16)
    enc = OpusEncoder(48000, 2, 96000)
    stream = enc.encode_to_soundkit_stream(pcm)
    ref = OpusStreamDecoder().decode_f32(stream)

    B = 3
    m = BatchedOpusDecoder(B, channels=2)
    m.push(0, stream)
    for i in range(0, len(stream), 501):  # chunked lane
        m.push(1, stream[i : i + 501])
    m.push(2, stream)
    out, lens = m.decode_ready()
    assert out.shape[2:] == (2, 960)
    assert lens[0, 0] < 960 <= lens[1, 0]  # preskip shortens slot 0
    parts = [out[i, 0, :, : lens[i, 0]] for i in range(out.shape[0])]
    got = np.concatenate(parts, axis=1).T.reshape(-1)
    n = min(len(got), len(ref))
    err = ref[:n] - got[:n]
    snr = 10 * np.log10(np.mean(ref[:n] ** 2) / max(np.mean(err**2), 1e-30))
    assert snr > 90, f"batched opus {snr:.1f} dB"
    assert np.array_equal(out[:, 0], out[:, 1])
    # drained
    out2, lens2 = m.decode_ready()
    assert out2.shape[0] == 0
