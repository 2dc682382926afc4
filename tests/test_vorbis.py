"""From-scratch Vorbis decoder tests (codecs/vorbis_core.py).

Reference parity object: soundkit-vorbis/src/lib.rs:198-289 (lewton
VorbisPacketDecoder / streaming VorbisDecoder).
"""
import numpy as np
import pytest

FIXTURE = "/root/reference/testdata/vorbis/A_Tusk_is_used_to_make_costly_gifts.ogg"


def _oracle_f32(data: bytes) -> np.ndarray:
    """avcodec reference decode (interleaved f32)."""
    import struct

    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.vorbis import xiph_extradata
    from soundkit_tpu.demux.ogg import OggPacketizer

    pk = OggPacketizer()
    packets = [p for p, _ in pk.push(data)]
    av = AvDecoder("vorbis", extradata=xiph_extradata(packets[:3]))
    outs = [av.push(p) for p in packets[3:]]
    outs.append(av.flush())
    return np.concatenate(outs)


def test_vorbis_native_vs_oracle_fixture():
    """Own packet decode must be >90 dB vs the avcodec oracle on the
    fixture corpus (chunk-fed through the public streaming API)."""
    from soundkit_tpu.codecs.vorbis import VorbisDecoder

    data = open(FIXTURE, "rb").read()
    dec = VorbisDecoder()
    outs = [dec.decode_f32(data[i : i + 313]) for i in range(0, len(data), 313)]
    outs.append(dec.flush())
    pcm = np.concatenate(outs)
    assert dec._setup is not None, "native path not taken (floor0 fallback?)"

    ref = _oracle_f32(data)
    m = min(len(pcm), len(ref))
    assert m > 20000
    err = np.abs(pcm[:m] - ref[:m]).max()
    peak = np.abs(ref).max()
    snr = 20 * np.log10(peak / max(err, 1e-20))
    assert snr > 90.0, f"native vorbis vs oracle SNR {snr:.1f} dB"
    rms = np.sqrt(np.mean(pcm[:m] ** 2))
    assert rms > 1e-4, "decoded to silence"


def test_vorbis_stereo_coupling_vs_oracle():
    """Stereo square-polar coupling + residue type 2 (the fixture is
    mono/residue-1): encode uncorrelated noise with the avcodec vorbis
    encoder and decode with the from-scratch core."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.codecs.encoders import AvEncoder
    from soundkit_tpu.codecs.vorbis import VorbisPacketDecoder, split_xiph_extradata

    rng = np.random.default_rng(0)
    n = 44100
    sig = np.stack(
        [0.1 * rng.standard_normal(n), 0.1 * rng.standard_normal(n)], -1
    )
    inter = np.clip(sig, -1, 1).reshape(-1).astype(np.float32)
    enc = AvEncoder("vorbis", 44100, 2)
    pkts = enc.push_f32(inter) + enc.flush()

    dec = VorbisPacketDecoder(split_xiph_extradata(enc.extradata))
    assert dec._setup is not None
    ours = np.concatenate([dec.decode_packet_f32(p) for p in pkts])

    av = AvDecoder("vorbis", extradata=enc.extradata)
    outs = [av.push(p) for p in pkts]
    outs.append(av.flush())
    ref = np.concatenate(outs)
    m = min(len(ours), len(ref))
    assert m > 40000
    err = np.abs(ours[:m] - ref[:m]).max()
    peak = np.abs(ref).max()
    snr = 20 * np.log10(peak / max(err, 1e-20))
    assert snr > 90.0, f"stereo coupled SNR {snr:.1f} dB"


def test_vorbis_batched_matches_single():
    """Batched device synthesis (ops/vorbis_batch.py) must match the
    single-stream host decode per lane, ragged lanes included."""
    from soundkit_tpu.codecs.vorbis import VorbisDecoder
    from soundkit_tpu.models.vorbis_batch import BatchedVorbisDecoder

    data = open(FIXTURE, "rb").read()
    B = 3
    model = BatchedVorbisDecoder(B)
    # lanes fed with different chunk sizes; lane 2 lags behind
    for b, csz in enumerate((313, 1024, 4096)):
        feed = data if b < 2 else data[: len(data) // 2]
        for i in range(0, len(feed), csz):
            model.push(b, feed[i : i + csz])
    # drain everything: lockstep steps with the lagging lane frozen
    outs = model.decode_batches(
        max(len(lane.queue) for lane in model._lanes)
    )

    ref_dec = VorbisDecoder()
    ref = ref_dec.decode_f32(data)
    ch = ref_dec.channels
    ref = ref.reshape(-1, ch).T

    for b in range(2):
        got = outs[b]
        m = min(got.shape[1], ref.shape[1])
        assert m > 20000
        np.testing.assert_allclose(got[:, :m], ref[:, :m], atol=2e-6)
    assert outs[2].shape[1] < outs[0].shape[1]  # lagging lane decoded less
