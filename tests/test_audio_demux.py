"""AudioTrackDemuxer tests (soundkit-audio-demux parity): MP4/WebM
autodetect on real fixtures, MPEG-TS on a synthesized mux, chunk
invariance."""
import numpy as np
import pytest

from soundkit_tpu.demux.audio_demux import (
    AudioCodec,
    AudioContainer,
    AudioDemuxError,
    AudioPacketFormat,
    AudioTrackConfig,
    AudioTrackDemuxer,
    AudioTrackPacket,
)

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _drive(dm, data, chunk=4096):
    events = []
    for off in range(0, len(data), chunk):
        events.extend(dm.push(data[off : off + chunk]))
    events.extend(dm.flush())
    return events


def test_mp4_autodetect(testdata):
    data = (testdata / "mac_aac" / f"{CLIP}.m4a").read_bytes()
    events = _drive(AudioTrackDemuxer.new_auto(), data)
    cfg = events[0]
    assert isinstance(cfg, AudioTrackConfig)
    assert cfg.container == AudioContainer.MP4
    assert cfg.codec == AudioCodec.AAC
    assert cfg.sample_rate == 16000
    assert cfg.codec_private  # ASC present
    packets = [e for e in events[1:] if isinstance(e, AudioTrackPacket)]
    assert len(packets) == cfg.sample_count == 48


def test_webm_autodetect(testdata):
    data = (testdata / "itag171" / "yt_itag_171_vorbis.webm").read_bytes()
    events = _drive(AudioTrackDemuxer.new_auto(), data)
    cfg = events[0]
    assert cfg.container == AudioContainer.WEBM
    assert cfg.codec == AudioCodec.VORBIS
    assert cfg.sample_rate == 44100 and cfg.channels == 2
    packets = [e for e in events if isinstance(e, AudioTrackPacket)]
    assert len(packets) == 56


def _mux_ts(adts: bytes, audio_pid=0x41, pmt_pid=0x20, stream_type=0x0F) -> bytes:
    """Minimal single-program TS mux of an audio elementary stream."""
    def packet(pid, payload, pusi, cc):
        hdr = bytes([0x47, (0x40 if pusi else 0) | (pid >> 8), pid & 0xFF,
                     0x10 | (cc & 0xF)])
        body = payload[: 184]
        pad = 184 - len(body)
        if pad:
            # adaptation field padding
            hdr = bytes([0x47, (0x40 if pusi else 0) | (pid >> 8), pid & 0xFF,
                         0x30 | (cc & 0xF)])
            af = bytes([pad - 1]) + (b"\x00" + b"\xff" * (pad - 2) if pad > 1 else b"")
            return hdr + af + body
        return hdr + body

    import zlib

    def psi(table):
        crc = zlib.crc32(table)  # not the MPEG CRC; our parser skips it
        return bytes([0]) + table + crc.to_bytes(4, "big")

    # PAT: table_id 0, prog 1 -> pmt_pid
    pat_body = bytes([0x00, 0xB0, 0x0D, 0x00, 0x01, 0xC1, 0x00, 0x00,
                      0x00, 0x01, 0xE0 | (pmt_pid >> 8), pmt_pid & 0xFF])
    # PMT: table_id 2, pcr pid, no prog info, one ES (0x0F ADTS @ audio_pid)
    pmt_body = bytes([0x02, 0xB0, 0x12, 0x00, 0x01, 0xC1, 0x00, 0x00,
                      0xE0 | (audio_pid >> 8), audio_pid & 0xFF, 0xF0, 0x00,
                      stream_type, 0xE0 | (audio_pid >> 8), audio_pid & 0xFF, 0xF0, 0x00])
    out = bytearray()
    out += packet(0, psi(pat_body), True, 0)
    out += packet(pmt_pid, psi(pmt_body), True, 0)
    # one PES with the whole adts stream, split over packets
    pes_hdr = b"\x00\x00\x01\xc0" + (len(adts) + 8).to_bytes(2, "big") + bytes(
        [0x80, 0x80, 0x05, 0x21, 0x00, 0x01, 0x00, 0x01]
    )
    stream = pes_hdr + adts
    cc = 0
    first = True
    for off in range(0, len(stream), 184):
        out += packet(audio_pid, stream[off : off + 184], first, cc)
        first = False
        cc += 1
    return bytes(out)


def test_mpegts_synthesized(golden):
    adts = (golden / "aac" / f"{CLIP}_encoded.aac").read_bytes()[:4000]
    ts = _mux_ts(adts)
    events = _drive(AudioTrackDemuxer.new_auto(), ts, chunk=400)
    cfg = events[0]
    assert cfg.container == AudioContainer.MPEG_TS
    assert cfg.codec == AudioCodec.AAC
    assert cfg.packet_format == AudioPacketFormat.ADTS
    assert cfg.pid == 0x41 and cfg.stream_type == 0x0F
    packets = [e for e in events if isinstance(e, AudioTrackPacket)]
    got = b"".join(p.data for p in packets)
    assert got == adts  # byte-faithful ES reconstruction
    assert packets[0].start_time is not None


def test_chunk_invariance(testdata):
    data = (testdata / "alac" / f"{CLIP}.m4a").read_bytes()

    def run(chunk):
        evs = _drive(AudioTrackDemuxer.new_auto(), data, chunk=chunk)
        return [e.data for e in evs if isinstance(e, AudioTrackPacket)]

    assert run(100) == run(8192) == run(len(data))


def test_explicit_format_and_errors():
    with pytest.raises(AudioDemuxError):
        AudioTrackDemuxer.new_with_format("ogg")
    dm = AudioTrackDemuxer.new_with_format("webm")
    assert dm.push(b"") == []
    dm2 = AudioTrackDemuxer.new_auto()
    with pytest.raises(AudioDemuxError):
        for _ in range(20):
            dm2.push(bytes(range(256)) * 20)
