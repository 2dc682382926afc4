"""Push/flush streaming API tests (WASM_API.md contract mirror)."""
import numpy as np
import pytest

from soundkit_tpu.simple import (
    AacDeboxer,
    AacLcStreamDecoder,
    MusicDecoder,
    OpusDeboxer,
    SoundKitFrameDecoder,
)

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def test_music_decoder_autodetect(testdata):
    data = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    dec = MusicDecoder()
    frames = []
    for i in range(0, len(data), 3000):
        frames.extend(dec.push(data[i : i + 3000]))
    frames.extend(dec.flush())
    assert frames
    assert frames[0].sample_rate == 16000
    assert frames[0].bits == 16
    total = sum(len(f.pcm) for f in frames) // 2
    assert total > 40000


def test_music_decoder_with_format(testdata):
    data = (testdata / "flac" / f"{CLIP}.flac").read_bytes()
    dec = MusicDecoder.new_with_format("flac")
    frames = dec.push(data) + dec.flush()
    total = sum(len(f.pcm) for f in frames) // 2
    assert total == 47360


def test_music_decoder_unknown_format():
    with pytest.raises(ValueError):
        MusicDecoder.new_with_format("wma")


def test_aac_debox_adts_then_decode(golden):
    data = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    box = AacDeboxer()
    aus = []
    for i in range(0, len(data), 1500):
        aus.extend(box.push(data[i : i + 1500]))
    aus.extend(box.flush())
    assert len(aus) == 46
    assert len(box.audio_specific_config) == 2

    dec = AacLcStreamDecoder(box.audio_specific_config)
    assert dec.sample_rate == 16000 and dec.channels == 2
    planar = dec.decode_planar(aus[5])
    assert planar.shape == (2, 1024)
    inter = dec.decode_interleaved(aus[6])
    assert inter.shape == (2048,)
    out = np.zeros(4096, np.float64)
    n = dec.decode_interleaved_into(aus[7], out)
    assert n == 2048


def test_aac_debox_mp4(testdata):
    data = (testdata / "mac_aac" / f"{CLIP}.m4a").read_bytes()
    box = AacDeboxer()
    aus = box.push(data) + box.flush()
    assert len(aus) == 48
    assert box.audio_specific_config


def test_opus_deboxer_both_framings(testdata):
    ogg = (testdata / "ogg_opus" / f"{CLIP}.ogg").read_bytes()
    box = OggBox = OpusDeboxer()
    pkts = box.push(ogg) + box.flush()
    assert pkts and box.opus_head[:8] == b"OpusHead"

    raw = (testdata / "opus" / f"{CLIP}.opus").read_bytes()
    box2 = OpusDeboxer()
    pkts2 = box2.push(raw) + box2.flush()
    assert pkts2 and box2.opus_head[:8] == b"OpusHead"


def test_frame_decoder_roundtrip():
    from soundkit_tpu.core.audio_types import EncodingFlag
    from soundkit_tpu.core.frame_header import FrameHeaderV2

    payload = b"packet-payload"
    h = FrameHeaderV2(EncodingFlag.OPUS, len(payload), 960, 48000, 2, 0).with_packet_crc32(payload)
    wire = h.encode() + payload
    dec = SoundKitFrameDecoder()
    frames = dec.push(wire)
    assert len(frames) == 1 and frames[0].payload == payload
    dec.flush()
