"""LOAS/LATM demux + mux tests.

The reference only tags MPEG-TS stream_type 0x11 packets as LATM and
passes the PES payload through (soundkit-audio-demux/src/lib.rs:2249);
we additionally parse AudioMuxElements down to raw access units, so
these tests go beyond parity: mux round-trips, chunk invariance, TS
integration, real-decoder validation of the re-serialized ASC, and
the reference-parity passthrough fallback.
"""
import numpy as np
import pytest

from soundkit_tpu.codecs.aac_lc import AacLcDecoder
from soundkit_tpu.demux.audio_demux import (
    AudioContainer,
    AudioPacketFormat,
    AudioTrackConfig,
    AudioTrackDemuxer,
    AudioTrackPacket,
)
from soundkit_tpu.demux.latm import (
    AscInfo,
    LatmError,
    LoasDemuxer,
    looks_like_loas,
    mux_loas,
    parse_audio_mux_element,
    parse_audio_specific_config,
    write_audio_mux_element,
)

from tests.test_audio_demux import CLIP, _drive, _mux_ts


def _adts_to_aus(adts: bytes):
    """Split an ADTS stream into raw AUs + (sr_index, channel_config)."""
    aus = []
    pos = 0
    sr_index = chan = None
    while pos + 7 <= len(adts):
        frame_len, sr_index, chan, hdr = AacLcDecoder.parse_adts_header(adts, pos)
        if pos + frame_len > len(adts):
            break
        aus.append(adts[pos + hdr : pos + frame_len])
        pos += frame_len
    return aus, sr_index, chan


@pytest.fixture(scope="module")
def aac_aus(golden):
    adts = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    aus, sr_index, chan = _adts_to_aus(adts)
    assert len(aus) > 20
    return aus, AscInfo(2, sr_index, 0, chan)  # sample_rate filled below


@pytest.fixture(scope="module")
def asc(aac_aus):
    from soundkit_tpu.demux.latm import SAMPLE_RATES

    _, a = aac_aus
    return AscInfo(2, a.sr_index, SAMPLE_RATES[a.sr_index], a.channel_config)


def test_asc_round_trip():
    for obj, sri, rate, chans in ((2, 8, 16000, 1), (2, 3, 48000, 2), (4, 4, 44100, 2)):
        raw = AscInfo(obj, sri, rate, chans).to_bytes()
        info = parse_audio_specific_config(raw)
        assert (info.object_type, info.sr_index, info.sample_rate, info.channel_config) == (
            obj, sri, rate, chans,
        )
        assert info.to_bytes() == raw


def test_asc_escape_rate_round_trip():
    raw = AscInfo(2, 0xF, 15123, 2).to_bytes()
    info = parse_audio_specific_config(raw)
    assert info.sample_rate == 15123 and info.sr_index == 0xF
    assert info.to_bytes() == raw


def test_audio_mux_element_round_trip(aac_aus, asc):
    aus, _ = aac_aus
    el = write_audio_mux_element(aus[0], asc, include_config=True)
    cfg, got = parse_audio_mux_element(el)
    assert got == [aus[0]]
    assert cfg.asc.sample_rate == asc.sample_rate
    assert cfg.asc.channel_config == asc.channel_config
    # same-mux element needs the previous config
    el2 = write_audio_mux_element(aus[1], asc, include_config=False)
    cfg2, got2 = parse_audio_mux_element(el2, prev_config=cfg)
    assert got2 == [aus[1]]
    with pytest.raises(LatmError):
        parse_audio_mux_element(el2)  # no config anywhere


def test_loas_round_trip_chunk_invariance(aac_aus, asc):
    aus, _ = aac_aus
    stream = mux_loas(aus, asc, config_period=8)
    assert looks_like_loas(stream)
    for chunk in (1, 7, 188, len(stream)):
        dm = LoasDemuxer()
        got = []
        for off in range(0, len(stream), chunk):
            got.extend(dm.push(stream[off : off + chunk]))
        assert got == aus, f"chunk={chunk}"
        assert dm.config is not None
        assert dm.config.asc.sr_index == asc.sr_index


def test_loas_resync_after_junk(aac_aus, asc):
    aus, _ = aac_aus
    stream = b"\x00\xffjunk" + mux_loas(aus[:4], asc, config_period=1)
    dm = LoasDemuxer()
    assert dm.push(stream) == aus[:4]


def test_large_au_length_escape(asc):
    big = bytes(range(256)) * 3  # 768 bytes: exercises 255-chunk coding
    el = write_audio_mux_element(big, asc, include_config=True)
    _, got = parse_audio_mux_element(el)
    assert got == [big]


def test_mpegts_latm_end_to_end(aac_aus, asc):
    aus, _ = aac_aus
    loas = mux_loas(aus, asc, config_period=4)
    ts = _mux_ts(loas, stream_type=0x11)
    events = _drive(AudioTrackDemuxer.new_auto(), ts, chunk=376)
    cfg = events[0]
    assert isinstance(cfg, AudioTrackConfig)
    assert cfg.container == AudioContainer.MPEG_TS
    assert cfg.packet_format == AudioPacketFormat.LATM
    assert cfg.stream_type == 0x11
    assert cfg.sample_rate == asc.sample_rate
    assert cfg.channels == asc.channel_config
    assert cfg.codec_private  # re-serialized ASC
    packets = [e for e in events if isinstance(e, AudioTrackPacket)]
    assert [p.data for p in packets] == aus
    assert all(p.format == AudioPacketFormat.RAW for p in packets)


def test_mpegts_latm_asc_drives_real_decoder(aac_aus, asc):
    """The re-serialized ASC must configure a real raw-AU decoder."""
    from soundkit_tpu.codecs.aac import AacRawDecoder

    aus, _ = aac_aus
    loas = mux_loas(aus, asc, config_period=4)
    ts = _mux_ts(loas, stream_type=0x11)
    events = _drive(AudioTrackDemuxer.new_auto(), ts)
    cfg = events[0]
    dec = AacRawDecoder(cfg.codec_private)
    pcm = [dec.decode_access_unit_f32(p.data)
           for p in events if isinstance(p, AudioTrackPacket)]
    total = sum(x.shape[-1] for x in pcm if x is not None and x.size)
    assert total >= 1024 * (len(aus) - 2)
    assert any(np.abs(x).max() > 1e-4 for x in pcm if x is not None and x.size)


def test_pipeline_spawn_aac_latm(golden, aac_aus, asc):
    """spawn_aac_latm decodes a LOAS stream to the same PCM as the
    ADTS path decodes the original ADTS stream."""
    from soundkit_tpu.pipeline.decode_pipeline import DecodePipeline

    from tests.test_pipeline import _drive as drive_pipeline, _pcm_bytes

    adts = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    aus, _ = aac_aus
    loas = mux_loas(aus, asc, config_period=4)

    got_latm = _pcm_bytes(drive_pipeline(DecodePipeline.spawn_aac_latm(), loas, chunk=777))
    got_adts = _pcm_bytes(drive_pipeline(DecodePipeline.spawn_aac_adts(), adts))
    a = np.frombuffer(got_latm, "<i2").astype(np.float64)
    b = np.frombuffer(got_adts, "<i2").astype(np.float64)
    n = min(len(a), len(b))
    assert n > 0 and abs(len(a) - len(b)) <= 4096  # same AU count, codec-delay slack
    err = a[:n] - b[:n]
    snr = 10 * np.log10((b[:n] ** 2).sum() / max((err ** 2).sum(), 1e-30))
    assert snr > 60, snr


def test_mpegts_latm_passthrough_fallback(golden):
    """A 0x11 track that never syncs falls back to reference-parity
    passthrough of the raw PES payloads."""
    adts = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()[:3000]
    ts = _mux_ts(adts, stream_type=0x11)  # ADTS bytes mislabelled as LATM
    dm = AudioTrackDemuxer.new_auto()
    events = dm.push(ts)
    events += dm.flush()
    cfg = [e for e in events if isinstance(e, AudioTrackConfig)][0]
    assert cfg.packet_format == AudioPacketFormat.LATM
    packets = [e for e in events if isinstance(e, AudioTrackPacket)]
    assert b"".join(p.data for p in packets) == adts
