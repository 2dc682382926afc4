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


# -- the four r2-missing surface classes (VERDICT #7) ------------------------

def test_audio_track_demuxer_surface(testdata):
    """AudioTrackDemuxer (WasmAudioTrackDemuxer analog): container
    bytes -> Config + Packet events, chunked push + flush."""
    from soundkit_tpu.demux.audio_demux import AudioTrackConfig, AudioTrackPacket
    from soundkit_tpu.simple import AudioTrackDemuxer

    data = (testdata / "mac_aac" / f"{CLIP}.m4a").read_bytes()
    dm = AudioTrackDemuxer()
    events = []
    for i in range(0, len(data), 4096):
        events.extend(dm.push(data[i : i + 4096]))
    events.extend(dm.flush())
    configs = [e for e in events if isinstance(e, AudioTrackConfig)]
    packets = [e for e in events if isinstance(e, AudioTrackPacket)]
    assert configs and packets
    assert sum(len(p.data) for p in packets) > 10000

    with pytest.raises(ValueError):
        AudioTrackDemuxer.new_with_format("wma")


def test_flac_encoder_surface_roundtrip():
    """FlacEncoder (WasmFlacEncoder analog): planar f32 ->
    independently decodable FLAC frames that our own decoder recovers
    within 16-bit quantization."""
    from soundkit_tpu.codecs.flac import FlacDecoder
    from soundkit_tpu.simple import FlacEncoder

    rng = np.random.RandomState(3)
    n = 8192
    t = np.arange(n) / 16000.0
    left = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    right = (0.2 * np.sin(2 * np.pi * 660 * t) + 0.01 * rng.randn(n)).astype(
        np.float32
    )
    planar = np.concatenate([left, right])

    enc = FlacEncoder(16000, 2, bits_per_sample=16)
    blob = enc.encode_planar_f32(planar, n) + enc.flush()
    assert len(blob) > 100

    dec = FlacDecoder()
    audio = dec.add(blob)
    if audio is None:
        audio = dec.flush()
    pcm = np.frombuffer(audio.data, "<i2").astype(np.float64) / 32768.0
    got = pcm.reshape(-1, 2).T
    assert got.shape[1] >= n
    assert np.abs(got[0, :n] - left).max() < 2.0 / 32768
    assert np.abs(got[1, :n] - right).max() < 2.0 / 32768


def test_opus_encoder_surface():
    """OpusEncoder (WasmOpusEncoder analog): frame_size interleaved
    i16 samples -> raw Opus packets that the opus decoder accepts."""
    from soundkit_tpu.codecs.avdec import AvDecoder
    from soundkit_tpu.simple import OpusEncoder

    enc = OpusEncoder(48000, 2, bitrate=64000)
    fs = enc.frame_size
    assert fs > 0
    t = np.arange(fs * 4) / 48000.0
    tone = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    inter = np.stack([tone, tone], axis=1).reshape(-1)
    pkts = []
    for k in range(4):
        pkts.extend(enc.encode_interleaved_i16(inter[k * fs * 2 : (k + 1) * fs * 2]))
    pkts.extend(enc.flush())
    assert len(pkts) >= 4

    short = np.zeros(3, np.int16)
    with pytest.raises(ValueError):
        enc2 = OpusEncoder(48000, 2)
        enc2.encode_interleaved_i16(short)

    dec = AvDecoder("libopus", sample_rate=48000, channels=2)
    out = np.concatenate([dec.push(p) for p in pkts] + [dec.flush()])
    assert out.size >= fs * 2 * 3
    assert float(np.sqrt(np.mean(out**2))) > 0.05


def test_audio_content_cipher_surface():
    """AudioContentCipher (WasmAudioContentCipher analog): seal/open
    with epoch binding; mismatched epoch and tampered AAD fail."""
    from soundkit_tpu.core.audio_content_crypto import KeyEpochMismatch
    from soundkit_tpu.simple import AudioContentCipher

    key = bytes(range(32))
    c = AudioContentCipher(key)
    nonce = bytes(12)
    env = c.seal(7, nonce, b"pcm payload", b"aad")
    assert c.open(7, env, b"aad") == b"pcm payload"
    with pytest.raises(KeyEpochMismatch):
        c.open(8, env, b"aad")
    with pytest.raises(Exception):
        c.open(7, env, b"wrong aad")
    with pytest.raises(Exception):
        AudioContentCipher(bytes(32))  # zero key rejected


def test_audio_content_key_unwrapper_surface():
    """AudioContentKeyUnwrapper (lib.rs:106-163 analog): 48-byte
    envelope seal/open round-trip; size and zero-key validation."""
    from soundkit_tpu.simple import AudioContentKeyUnwrapper

    wrap_key = bytes(range(1, 33))
    u = AudioContentKeyUnwrapper(wrap_key)
    nonce = bytes(range(12))
    content_key = bytes(range(100, 132))
    sealed = u.seal(nonce, content_key, b"kex context")
    assert len(sealed) == 48
    assert u.open(nonce, sealed, b"kex context") == content_key
    with pytest.raises(Exception):
        u.open(nonce, sealed, b"other context")  # AAD mismatch
    with pytest.raises(ValueError):
        u.open(nonce[:8], sealed, b"kex context")  # bad nonce len
    with pytest.raises(ValueError):
        u.seal(nonce, bytes(32), b"")  # zero content key
    with pytest.raises(ValueError):
        AudioContentKeyUnwrapper(bytes(32))  # zero wrapping key


def test_opus_decoder_surface(testdata):
    """OpusDecoder (WasmOpusDecoder analog): per-packet decode of the
    ogg-opus fixture's packets, dec_frame vs dec_frame_reuse parity,
    output non-silent."""
    from soundkit_tpu.simple import OpusDecoder

    ogg = (testdata / "ogg_opus" / f"{CLIP}.ogg").read_bytes()
    box = OpusDeboxer()
    pkts = box.push(ogg) + box.flush()
    channels = box.opus_head[9]
    d1 = OpusDecoder(channels)
    d2 = OpusDecoder(channels)
    total = 0
    energy = 0.0
    for pkt in pkts[:40]:
        res = d1.dec_frame(pkt)
        n = d2.dec_frame_reuse(pkt)
        assert res.decoded_size == n > 0
        np.testing.assert_array_equal(
            res.output[: n * channels], d2.output[: n * channels]
        )
        total += n
        energy += float(
            np.abs(res.output[: n * channels].astype(np.int64)).sum()
        )
    assert total >= 40 * 480  # >= 10 ms frames at 48 kHz
    assert energy > 0
    with pytest.raises(ValueError):
        OpusDecoder(channels, sample_rate=44100)
