"""Sharding invariance beyond AAC (VERDICT r2 weak #3 / next #5).

Every batched device step must produce EXACTLY the same output when
its stream axis is sharded over the 8-device mesh as unsharded, and
the output must really be distributed.  AAC already has this
(test_batched_models.py); these cover MP3, FLAC, Vorbis, telephony,
and a fleet-under-mesh smoke.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return Mesh(np.array(jax.devices()), ("streams",))


def _shard(mesh, a):
    return jax.device_put(
        jnp.asarray(a),
        NamedSharding(mesh, P("streams", *([None] * (np.ndim(a) - 1)))),
    )


def _assert_same_and_sharded(plain, sharded, atol=0.0):
    for p_, s_ in zip(plain, sharded):
        if atol:
            np.testing.assert_allclose(np.asarray(p_), np.asarray(s_), atol=atol)
        else:
            np.testing.assert_array_equal(np.asarray(p_), np.asarray(s_))
    assert len(sharded[0].sharding.device_set) == 8


def test_mp3_granule_sharded_8dev(mesh, testdata):
    from soundkit_tpu.codecs.mp3_native import Mp3NativeDecoder
    from soundkit_tpu.ops import mp3_batch as mb

    data = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    frames = Mp3NativeDecoder().push(data)
    granules = frames[4].granules[0]
    B = 16
    gb = mb.prepare_granule_batch([granules] * B, [frames[4].header] * B)
    overlap, fifo = mb.init_state(B)
    args = (gb.quant, gb.scale, gb.ms, gb.block_type, gb.mixed,
            gb.n_alias_sb, gb.lane_valid, np.asarray(overlap), np.asarray(fifo))

    step = jax.jit(mb.mp3_granule_device)
    plain = step(*[jnp.asarray(a) for a in args])
    sharded = step(*[_shard(mesh, a) for a in args])
    _assert_same_and_sharded(plain, sharded)


def test_flac_lpc_sharded_8dev(mesh):
    from soundkit_tpu.ops import flac_lpc as fl

    rng = np.random.RandomState(0)
    B, C, T = 16, 2, 1024
    resw = rng.randint(-4000, 4000, size=(B, C, T)).astype(np.int64)
    coef = np.zeros((B, C, fl.MAX_ORDER), np.int64)
    coef[:, :, 0] = 2
    coef[:, :, 1] = -1
    order = np.full((B, C), 2, np.int64)
    shift = np.zeros((B, C), np.int64)
    wasted = np.zeros((B, C), np.int64)
    chan_assign = np.zeros(B, np.int64)
    block_size = np.full(B, T, np.int64)
    lane_valid = np.ones(B, bool)
    args = (resw, coef, order, shift, wasted, chan_assign, block_size, lane_valid)

    step = jax.jit(fl.flac_frame_device)
    plain = step(*[jnp.asarray(a) for a in args])
    sharded = step(*[_shard(mesh, a) for a in args])
    _assert_same_and_sharded((plain,), (sharded,))


def test_vorbis_synth_sharded_8dev(mesh, testdata):
    from soundkit_tpu.codecs.vorbis_core import VorbisSetup
    from soundkit_tpu.demux.ogg import OggPacketizer
    from soundkit_tpu.ops import vorbis_batch as vb

    ogg = (testdata / "vorbis" / f"{CLIP}.ogg").read_bytes()
    pkts = [p for p, _ in OggPacketizer().push(ogg)]
    setup = VorbisSetup(pkts[0], pkts[2])
    spec_pkt = setup.decode_packet_spectrum(pkts[8])
    n0, n1 = setup.blocksize0, setup.blocksize1
    B, C = 16, setup.channels
    spec = np.zeros((B, C, n1 // 2), np.float32)
    spec[:, :, : spec_pkt.n // 2] = spec_pkt.spectrum.astype(np.float32)
    n_flag = np.full(B, 1 if spec_pkt.n == n1 else 0, np.int32)
    pf = np.full(B, spec_pkt.prev_flag, np.int32)
    nf = np.full(B, spec_pkt.next_flag, np.int32)
    valid = np.ones(B, bool)
    primed = np.ones(B, bool)
    carry, cflag = vb.init_state(B, C, n1)
    args = (spec, n_flag, pf, nf, valid, primed, carry, cflag)

    step = jax.jit(lambda *a: vb.vorbis_synth_step(*a, n0=n0, n1=n1))
    plain = step(*[jnp.asarray(a) for a in args])
    sharded = step(*[_shard(mesh, a) for a in args])
    _assert_same_and_sharded(plain, sharded)


def test_g726_scan_sharded_8dev(mesh, testdata):
    from soundkit_tpu.codecs.g726 import G726Packing, G726Rate, unpack_codes
    from soundkit_tpu.ops import adpcm

    raw = (testdata / "g726" / f"{CLIP}_32.g726").read_bytes()[:512]
    codes1 = unpack_codes(raw, 4, G726Packing.LEFT)
    B = 16
    codes = np.tile(codes1[None, :], (B, 1)).astype(np.int32)
    valid = np.ones_like(codes, bool)
    state = adpcm.g726_init_state(B)
    state_arrs = list(state)

    def step(codes, valid, *st):
        pcm, new_state = adpcm.g726_decode_scan(
            codes, adpcm.G726State(*st), 4, valid)
        return (pcm, *new_state)

    jstep = jax.jit(step)
    plain = jstep(jnp.asarray(codes), jnp.asarray(valid),
                  *[jnp.asarray(a) for a in state_arrs])
    sharded = jstep(_shard(mesh, codes), _shard(mesh, valid),
                    *[_shard(mesh, a) for a in state_arrs])
    _assert_same_and_sharded(plain, sharded)


def test_g722_scan_sharded_8dev(mesh, testdata):
    from soundkit_tpu.ops import g722 as g7

    raw = (testdata / "g722" / f"{CLIP}.g722").read_bytes()[:1024]
    B = 16
    codes = np.tile(np.frombuffer(raw, np.uint8)[None, :], (B, 1)).astype(np.int32)
    valid = np.ones_like(codes, bool)
    state = g7.g722_init_state(B)
    st_arrs = list(state)

    def step(codes, valid, *st):
        pcm, new_state = g7.g722_decode_scan(codes, type(state)(*st), valid)
        return (pcm, *new_state)

    jstep = jax.jit(step)
    plain = jstep(jnp.asarray(codes), jnp.asarray(valid),
                  *[jnp.asarray(a) for a in st_arrs])
    sharded = jstep(_shard(mesh, codes), _shard(mesh, valid),
                    *[_shard(mesh, a) for a in st_arrs])
    _assert_same_and_sharded(plain, sharded)


def test_silk_round_sharded_8dev(mesh, testdata):
    """Device SILK synthesis (ops/silk_batch.py): one WB stereo round
    fed from a real fixture packet via the native parse-export must be
    sharding-invariant over the streams axis."""
    import struct

    import jax.numpy as jnp

    from soundkit_tpu.codecs.opus_core import parse_packet
    from soundkit_tpu.codecs.silk_native import NativeSilkBatch
    from soundkit_tpu.ops import silk_batch as sb

    data = (testdata / "opus" / f"{CLIP}.opus").read_bytes()
    body, pos = data[19:], 0
    frame, bw, coded = None, None, None
    while pos + 2 <= len(body):
        (n,) = struct.unpack_from("<H", body, pos)
        toc, frames = parse_packet(body[pos + 2 : pos + 2 + n])
        if toc.mode == "silk" and int(toc.frame_duration) == 20 and frames:
            frame = frames[0]
            bw = toc.bandwidth
            coded = 2 if toc.stereo else 1
            break
        pos += 2 + n
    assert frame is not None, "no 20 ms SILK packet in fixture"

    B = 16
    nb = NativeSilkBatch(B, 2)
    valid = np.ones(B, np.uint8)
    p = nb.parse_many([frame] * B, np.full(B, bw, np.int32),
                      np.full(B, coded, np.int32), [20] * B, valid)
    g = valid.astype(bool) & (p["n"] > 0)
    assert g.all()
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    state = sb.init_state(B, bw, np.float32)
    args = (
        f32(p["exc"]), f32(p["gains"]), f32(p["coef"]),
        np.ascontiguousarray(p["flags"][:, 7:9]),
        np.ascontiguousarray(p["flags"][:, 5:7]),
        p["lags"], f32(p["ltp"]), f32(p["ltpscale"]),
        np.ascontiguousarray(p["flags"][:, 9:11]),
        (p["flags"][:, 2] == 2).astype(np.int32),
        np.ascontiguousarray(p["flags"][:, 4]),
        f32(p["stereo_w"]), np.ones(B, np.float32), g,
        np.ones(B, np.float32), *state,
    )
    step = sb._jitted_step(bw, True, "float32")
    plain = step(*[jnp.asarray(a) for a in args])
    sharded = step(*[_shard(mesh, a) for a in args])
    _assert_same_and_sharded(plain, sharded)


def test_flac_rice_plane_sharded_8dev(mesh):
    """Device Rice decode (ops/flac_rice.py): the segment-table SIMD
    bitstream interpreter must produce an identical residual plane with
    the lane/segment axes sharded over the mesh.  Random words are a
    valid input by construction (the interpreter clamps reads and drops
    out-of-range scatters), so plain-vs-sharded equality is exact."""
    import jax
    import jax.numpy as jnp

    from soundkit_tpu.ops import flac_rice as fr

    rng = np.random.RandomState(7)
    NL, W, stride = 16, 64, 256
    words = rng.randint(0, 2**32, size=(NL, W), dtype=np.uint64).astype(np.uint32)
    per_lane = 4
    N = NL * per_lane  # 64 segments, divisible by the 8-device mesh
    seg_lane = np.repeat(np.arange(NL, dtype=np.int32), per_lane)
    seg_bitoff = np.tile(np.array([40, 300, 700, 1100], np.int32), NL)
    seg_k = np.tile(np.array([0, 3, -17, 9], np.int32), NL)  # incl. fixed-width
    seg_n = np.full(N, 32, np.int32)
    pos = np.tile(np.array([0, 32, 64, 96], np.int32), NL)
    chan = np.tile(np.array([0, 0, 1, 1], np.int32), NL)
    seg_dest = (seg_lane * 2 * stride + chan * stride + pos).astype(np.int32)
    warm = rng.randint(-1000, 1000, size=(NL, 2, 32)).astype(np.int32)
    cflag = (np.arange(NL) % 4 == 3).astype(np.int32)[:, None] * np.ones((1, 2), np.int32)
    cval = rng.randint(-99, 99, size=(NL, 2)).astype(np.int32)

    step = jax.jit(fr.flac_rice_plane_device, static_argnums=(9, 10, 11))
    a = (words, seg_lane, seg_bitoff, seg_k, seg_n, seg_dest, warm, cflag, cval)
    plain = step(*[jnp.asarray(x) for x in a], 192, NL, stride)
    sharded = step(*[_shard(mesh, x) for x in a], 192, NL, stride)
    _assert_same_and_sharded((plain,), (sharded,))


def test_fleet_under_mesh_smoke(mesh, testdata):
    """The fleet's mixed decode runs (and matches the plain run) with
    an active mesh context — no sharding bug hides in the carried-state
    scans when a mesh is installed as ambient state."""
    from soundkit_tpu.models.fleet import StreamFleet

    aac = (testdata.parent / "golden" / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()

    def run():
        fleet = StreamFleet(capacity_per_group=2)
        fleet.push("a", aac)
        fleet.push("m", mp3)
        fleet.end_stream("a")
        fleet.end_stream("m")
        return fleet.collect()

    base = run()
    use_mesh = getattr(jax.sharding, "use_mesh", None) or getattr(
        jax, "set_mesh", None)
    if use_mesh is None:
        pytest.skip("no ambient-mesh API in this jax")
    with use_mesh(mesh):
        under = run()
    assert set(base) == set(under)
    for k in base:
        np.testing.assert_allclose(base[k], under[k], atol=1e-6)
