"""Container-only audio track demuxer (no codec decode).

Behavioral equivalent of ``soundkit-audio-demux``'s
``AudioTrackDemuxer`` (src/lib.rs:103-142): MP4 / WebM / MPEG-TS
autodetection with the 8 KiB min / 64 KiB max detection window
(:4-5), emitting ``AudioTrackConfig`` followed by
``AudioTrackPacket`` events.
"""
from __future__ import annotations

import enum
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Union

from soundkit_tpu.demux.ebml import WebmAudioDemuxer
from soundkit_tpu.demux.mp4 import Mp4Error, demux_mp4_audio
from soundkit_tpu.demux.mpegts import MpegTsAudioDemuxer

MIN_DETECTION_BYTES = 8192
MAX_DETECTION_BYTES = 65536


class AudioContainer(enum.Enum):
    MP4 = "mp4"
    WEBM = "webm"
    MPEG_TS = "mpeg-ts"


class AudioCodec(enum.Enum):
    AAC = "aac"
    OPUS = "opus"
    VORBIS = "vorbis"
    MP3 = "mp3"
    AC3 = "ac3"
    ALAC = "alac"
    UNKNOWN = "unknown"


class AudioPacketFormat(enum.Enum):
    ADTS = "adts"
    LATM = "latm"
    RAW = "raw"


@dataclass
class AudioTrackConfig:
    container: AudioContainer
    codec: AudioCodec
    packet_format: Optional[AudioPacketFormat] = None
    codec_id: Optional[str] = None
    track_id: Optional[int] = None
    pid: Optional[int] = None
    stream_type: Optional[int] = None
    sample_rate: Optional[int] = None
    channels: Optional[int] = None
    sample_count: Optional[int] = None
    codec_private: bytes = b""
    pre_skip: Optional[int] = None
    output_gain: Optional[int] = None
    mapping_family: Optional[int] = None


@dataclass
class AudioTrackPacket:
    container: AudioContainer
    codec: AudioCodec
    format: AudioPacketFormat
    data: bytes
    track_id: Optional[int] = None
    pid: Optional[int] = None
    stream_type: Optional[int] = None
    sample_id: Optional[int] = None
    start_time: Optional[int] = None


AudioDemuxEvent = Union[AudioTrackConfig, AudioTrackPacket]


class AudioDemuxError(ValueError):
    pass


def _detect_container(buf: bytes) -> Optional[AudioContainer]:
    if len(buf) >= 12 and buf[4:8] == b"ftyp":
        return AudioContainer.MP4
    if buf[:4] == b"\x1a\x45\xdf\xa3":
        return AudioContainer.WEBM
    if len(buf) >= 188 * 2 and buf[0] == 0x47 and buf[188] == 0x47:
        return AudioContainer.MPEG_TS
    return None


_WEBM_CODECS = {
    "A_OPUS": AudioCodec.OPUS,
    "A_VORBIS": AudioCodec.VORBIS,
    "A_AAC": AudioCodec.AAC,
    "A_MPEG/L3": AudioCodec.MP3,
    "A_AC3": AudioCodec.AC3,
}


class AudioTrackDemuxer:
    def __init__(self, container: Optional[AudioContainer] = None):
        self._container = container
        self._detect_buf = bytearray()
        self._webm: Optional[WebmAudioDemuxer] = None
        self._ts: Optional[MpegTsAudioDemuxer] = None
        self._mp4_buf = bytearray()
        self._config_sent = False
        self._sample_id = 0
        self._finished = False

    @classmethod
    def new_auto(cls) -> "AudioTrackDemuxer":
        return cls()

    @classmethod
    def new_with_format(cls, fmt: str) -> "AudioTrackDemuxer":
        try:
            return cls(AudioContainer(fmt))
        except ValueError:
            raise AudioDemuxError(f"unknown container format {fmt!r}")

    def push(self, data: bytes) -> List[AudioDemuxEvent]:
        if self._finished:
            return []
        if self._container is None:
            self._detect_buf.extend(data)
            if len(self._detect_buf) < 12:
                return []
            detected = _detect_container(bytes(self._detect_buf[:MAX_DETECTION_BYTES]))
            if detected is None:
                if len(self._detect_buf) >= MAX_DETECTION_BYTES:
                    raise AudioDemuxError("failed to detect container format")
                return []
            self._container = detected
            data = bytes(self._detect_buf)
            self._detect_buf.clear()
        return self._dispatch(data)

    def flush(self) -> List[AudioDemuxEvent]:
        self._finished = True
        if self._container == AudioContainer.MP4:
            return self._flush_mp4()
        if self._container == AudioContainer.MPEG_TS and self._ts is not None:
            return [self._ts_packet(p) for p in self._ts.flush()]
        if self._container is None and self._detect_buf:
            # small complete file: one last detection attempt
            detected = _detect_container(bytes(self._detect_buf))
            if detected is None:
                raise AudioDemuxError("failed to detect container format")
            self._container = detected
            events = self._dispatch(bytes(self._detect_buf))
            self._detect_buf.clear()
            if detected == AudioContainer.MP4:
                events += self._flush_mp4()
            return events
        return []

    # -- per-container --

    def _dispatch(self, data: bytes) -> List[AudioDemuxEvent]:
        if self._container == AudioContainer.MP4:
            self._mp4_buf.extend(data)
            return []
        if self._container == AudioContainer.WEBM:
            if self._webm is None:
                self._webm = WebmAudioDemuxer()
            packets = self._webm.push(data)
            events: List[AudioDemuxEvent] = []
            tr = self._webm.track
            if tr is not None and not self._config_sent:
                codec = _WEBM_CODECS.get(tr.codec_id, AudioCodec.UNKNOWN)
                cfg = AudioTrackConfig(
                    container=AudioContainer.WEBM,
                    codec=codec,
                    packet_format=AudioPacketFormat.RAW,
                    codec_id=tr.codec_id,
                    track_id=tr.number,
                    sample_rate=int(tr.sample_rate) or None,
                    channels=tr.channels,
                    codec_private=tr.codec_private,
                )
                if codec == AudioCodec.OPUS and len(tr.codec_private) >= 19:
                    cfg.pre_skip = struct.unpack_from("<H", tr.codec_private, 10)[0]
                    cfg.output_gain = struct.unpack_from("<h", tr.codec_private, 16)[0]
                    cfg.mapping_family = tr.codec_private[18]
                events.append(cfg)
                self._config_sent = True
            for p in packets:
                self._sample_id += 1
                events.append(
                    AudioTrackPacket(
                        container=AudioContainer.WEBM,
                        codec=_WEBM_CODECS.get(
                            self._webm.track.codec_id, AudioCodec.UNKNOWN
                        ) if self._webm.track else AudioCodec.UNKNOWN,
                        format=AudioPacketFormat.RAW,
                        data=p,
                        track_id=self._webm.track.number if self._webm.track else None,
                        sample_id=self._sample_id,
                    )
                )
            return events
        if self._container == AudioContainer.MPEG_TS:
            if self._ts is None:
                self._ts = MpegTsAudioDemuxer()
            pes = self._ts.push(data)
            events = []
            tr = self._ts.track
            if tr is not None and not self._config_sent:
                events.append(
                    AudioTrackConfig(
                        container=AudioContainer.MPEG_TS,
                        codec=AudioCodec(tr.codec),
                        packet_format=AudioPacketFormat(tr.packet_format)
                        if tr.packet_format != "raw"
                        else AudioPacketFormat.RAW,
                        pid=tr.pid,
                        stream_type=tr.stream_type,
                    )
                )
                self._config_sent = True
            events.extend(self._ts_packet(p) for p in pes)
            return events
        raise AudioDemuxError("no container configured")

    def _ts_packet(self, p) -> AudioTrackPacket:
        tr = self._ts.track
        self._sample_id += 1
        return AudioTrackPacket(
            container=AudioContainer.MPEG_TS,
            codec=AudioCodec(tr.codec),
            format=AudioPacketFormat(tr.packet_format) if tr.packet_format != "raw" else AudioPacketFormat.RAW,
            data=p.data,
            pid=tr.pid,
            stream_type=tr.stream_type,
            sample_id=self._sample_id,
            start_time=p.pts,
        )

    def _flush_mp4(self) -> List[AudioDemuxEvent]:
        if not self._mp4_buf:
            return []
        try:
            track = demux_mp4_audio(bytes(self._mp4_buf))
        except Mp4Error as e:
            raise AudioDemuxError(str(e))
        self._mp4_buf.clear()
        codec = {"aac": AudioCodec.AAC, "alac": AudioCodec.ALAC}.get(
            track.codec, AudioCodec.UNKNOWN
        )
        events: List[AudioDemuxEvent] = [
            AudioTrackConfig(
                container=AudioContainer.MP4,
                codec=codec,
                packet_format=AudioPacketFormat.RAW,
                sample_rate=track.sample_rate or None,
                channels=track.channels or None,
                sample_count=len(track.samples),
                codec_private=track.config,
            )
        ]
        for i, s in enumerate(track.samples):
            events.append(
                AudioTrackPacket(
                    container=AudioContainer.MP4,
                    codec=codec,
                    format=AudioPacketFormat.RAW,
                    data=s,
                    sample_id=i,
                )
            )
        return events
