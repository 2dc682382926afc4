"""Batched FLAC encode: device analysis + host Rice pack.

The encode-direction batched model (models/flac_encode_batch.py over
ops/flac_enc_batch.py): every lane must produce a standard stream
that round-trips bit-exactly through the framework's own decoder and
the libavcodec oracle, at a compressed size competitive with the
host planner (codecs/flac_encode.py)."""
import numpy as np
import pytest

from soundkit_tpu.codecs.flac import FlacDecoder
from soundkit_tpu.codecs.flac_encode import FlacStreamEncoder
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.models.flac_encode_batch import BatchedFlacEncoder

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


@pytest.fixture(scope="module")
def stereo_pcm(testdata):
    wav = parse_wav((testdata / "wav_stereo" / f"{CLIP}.wav").read_bytes())
    return (
        np.frombuffer(wav.data, "<i2")
        .reshape(-1, wav.channel_count)
        .T.astype(np.int64),
        wav.sampling_rate,
    )


def _own_decode_i16(stream: bytes) -> np.ndarray:
    dec = FlacDecoder()
    outs = []
    a = dec.add(stream)
    if a is not None:
        outs.append(a)
    data = b"".join(o.data for o in outs)
    return np.frombuffer(data, "<i2").reshape(-1, 2).T.astype(np.int64)


def test_batched_flac_encode_roundtrip_and_size(stereo_pcm):
    pcm, rate = stereo_pcm
    rng = np.random.default_rng(0)
    true_stereo = pcm.copy()
    true_stereo[1] = np.clip(
        true_stereo[1] + rng.normal(0, 60, pcm.shape[1]).astype(np.int64),
        -32768, 32767,
    )
    variants = [
        pcm,                                    # mono-in-stereo (zero side)
        true_stereo,                            # decorrelated stereo
        np.clip(pcm // 2, -32768, 32767),       # quieter copy
        pcm[:, : pcm.shape[1] // 2],            # ragged: half length
    ]
    m = BatchedFlacEncoder(len(variants), rate, 2, 16)
    for i, v in enumerate(variants):
        m.push(i, v)
    while m.encode_step():
        pass
    streams = [m.finish(i) for i in range(len(variants))]

    for i, s in enumerate(streams):
        got = _own_decode_i16(s)
        want = variants[i]
        n = want.shape[1]
        assert got.shape[1] >= n
        np.testing.assert_array_equal(got[:, :n], want, err_msg=f"lane {i}")

    # size parity vs the host balanced planner on the same content
    for i in (0, 1):
        hs = FlacStreamEncoder(rate, 2, 16)
        hs.add(variants[i])
        host = hs.finish()
        assert len(streams[i]) <= int(len(host) * 1.05), (
            i, len(streams[i]), len(host))


def test_finish_all_batched_tails_roundtrip(stereo_pcm):
    """finish_all routes tail frames through the device analysis (one
    batched call per distinct tail length) instead of finish()'s
    per-lane host planner; every lane must still round-trip
    bit-exactly and verify its STREAMINFO MD5."""
    pcm, rate = stereo_pcm
    variants = [
        pcm,                                     # 4096k + big tail
        pcm[:, : 3 * 4096 + 997],                # small odd tail
        pcm[:, : 2 * 4096],                      # no tail at all
        pcm[:, : 4096 + 7],                      # sub-16 tail (repeat-pad)
    ]
    m = BatchedFlacEncoder(len(variants), rate, 2, 16)
    for i, v in enumerate(variants):
        m.push(i, v)
    streams = m.finish_all()
    for i, s in enumerate(streams):
        got = _own_decode_i16(s)
        want = variants[i]
        n = want.shape[1]
        assert got.shape[1] >= n
        np.testing.assert_array_equal(got[:, :n], want, err_msg=f"lane {i}")
        dec = FlacDecoder()
        dec.add(s)
        assert dec.verify_md5(got.T.astype("<i2").tobytes())


def test_batched_flac_encode_oracle_decode(stereo_pcm):
    """libavcodec must decode the batched streams bit-exactly."""
    from soundkit_tpu.codecs.avdec import AvDecoder

    pcm, rate = stereo_pcm
    rng = np.random.default_rng(1)
    st = pcm.copy()
    st[1] = np.clip(st[1] + rng.normal(0, 40, pcm.shape[1]).astype(np.int64),
                    -32768, 32767)
    m = BatchedFlacEncoder(1, rate, 2, 16)
    m.push(0, st)
    while m.encode_step():
        pass
    stream = m.finish(0)

    av = AvDecoder("flac")
    parts = [np.asarray(av.push(stream)), np.asarray(av.flush())]
    full = np.concatenate([p for p in parts if p.size])
    got = np.round(full.reshape(-1, 2).T * 32768.0).astype(np.int64)
    n = st.shape[1]
    np.testing.assert_array_equal(got[:, :n], st)


def test_batched_flac_encode_mono_24bit(stereo_pcm):
    """Mono and 24-bit lanes through the same device analysis."""
    pcm, rate = stereo_pcm

    mono = pcm[:1, : 3 * 4096 + 777]
    m = BatchedFlacEncoder(2, rate, 1, 16)
    m.push(0, mono)
    m.push(1, mono // 3)
    while m.encode_step():
        pass
    for i, want in enumerate((mono, mono // 3)):
        s = m.finish(i)
        dec = FlacDecoder()
        a = dec.add(s)
        got = np.frombuffer(a.data, "<i2").astype(np.int64)
        assert got.shape[0] >= want.shape[1]
        np.testing.assert_array_equal(got[: want.shape[1]], want[0])

    rng = np.random.default_rng(2)
    x24 = np.clip(
        (pcm[:, : 2 * 4096 + 500] << 8)
        + rng.integers(-100, 100, (2, 2 * 4096 + 500)),
        -(1 << 23), (1 << 23) - 1,
    )
    m24 = BatchedFlacEncoder(1, rate, 2, 24)
    m24.push(0, x24)
    while m24.encode_step():
        pass
    s = m24.finish(0)
    dec = FlacDecoder()
    a = dec.add(s)
    assert a.bits_per_sample == 24
    raw = np.frombuffer(a.data, np.uint8).reshape(-1, 3)
    v = (raw[:, 0].astype(np.int64) | (raw[:, 1].astype(np.int64) << 8)
         | (raw[:, 2].astype(np.int64) << 16))
    v = (v ^ (1 << 23)) - (1 << 23)
    got = v.reshape(-1, 2).T
    n = x24.shape[1]
    np.testing.assert_array_equal(got[:, :n], x24)


def test_flac_analyze_sharding_invariance(stereo_pcm):
    """The analysis op is a pure lane map: outputs under an 8-device
    stream-axis sharding equal the unsharded outputs exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from soundkit_tpu.ops.flac_enc_batch import flac_analyze_device

    pcm, _ = stereo_pcm
    B, N = 8, 1024
    x = np.zeros((B, 2, N), np.int64)
    for b in range(B):
        x[b] = pcm[:, b * N : (b + 1) * N]

    with jax.enable_x64():
        import functools

        fn = jax.jit(functools.partial(flac_analyze_device, bits=16))
        plain = fn(jnp.asarray(x), jnp.asarray(N))
        mesh = Mesh(np.array(jax.devices()), ("streams",))

        def shard(a):
            return jax.device_put(
                jnp.asarray(a), NamedSharding(mesh, P("streams", None, None))
            )

        sharded = fn(shard(x), jnp.asarray(N))
        for p, s in zip(plain, sharded):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(s))


def test_encode_pending_equals_stepwise(stereo_pcm):
    """The folded single-call drain (encode_pending) must emit byte-
    identical streams to the one-round-per-call lockstep form."""
    pcm, rate = stereo_pcm
    variants = [pcm, pcm[:, : pcm.shape[1] // 3]]
    m_step = BatchedFlacEncoder(2, rate, 2, 16)
    m_fold = BatchedFlacEncoder(2, rate, 2, 16)
    for m in (m_step, m_fold):
        for i, v in enumerate(variants):
            m.push(i, v)
    while m_step.encode_step():
        pass
    n = m_fold.encode_pending()
    assert n > 0
    assert m_fold.encode_pending() == 0  # drained
    for i in range(2):
        assert m_step.finish(i) == m_fold.finish(i), f"lane {i}"
