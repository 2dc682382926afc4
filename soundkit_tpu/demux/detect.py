"""Audio container/codec detection by magic bytes and syncwords.

Behavioral equivalent of the ``access-unit`` crate's ``detect_audio``
as used by the reference pipeline (soundkit-decoder/src/lib.rs:
1043-1113): variants MP3, AAC, M4A, FLAC, Opus, OggOpus, OggVorbis,
OggSpeex, WebM, Wav, ALAC, AIFF, AC3, Unknown.  Telephony formats
(G.711/722/726/729, GSM, AMR, raw PCM) are explicit-only paths, never
autodetected — same as the reference.
"""
from __future__ import annotations

import enum


class AudioType(enum.Enum):
    MP3 = "mp3"
    AAC = "aac"  # raw ADTS
    M4A = "m4a"
    FLAC = "flac"
    OPUS = "opus"  # soundkit raw-Opus framing (OpusHead + length-prefixed)
    OGG_OPUS = "ogg_opus"
    OGG_VORBIS = "ogg_vorbis"
    OGG_SPEEX = "ogg_speex"
    WEBM = "webm"
    WAV = "wav"
    ALAC = "alac"
    AIFF = "aiff"
    AC3 = "ac3"
    UNKNOWN = "unknown"


MIN_DETECTION_BYTES = 8192  # soundkit-decoder/src/lib.rs:49
MAX_DETECTION_BYTES = 65536  # :50

_MPEG1_L3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
_MPEG2_L3_BITRATES = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)


def _looks_like_mp3_frame(b: bytes, i: int) -> bool:
    if i + 4 > len(b):
        return False
    if b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
        return False
    version = (b[i + 1] >> 3) & 0x3  # 0=2.5, 2=2, 3=1
    layer = (b[i + 1] >> 1) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return False
    bitrate_idx = (b[i + 2] >> 4) & 0xF
    rate_idx = (b[i + 2] >> 2) & 0x3
    return bitrate_idx not in (0, 15) and rate_idx != 3


def _looks_like_adts(b: bytes, i: int) -> bool:
    if i + 7 > len(b):
        return False
    if b[i] != 0xFF or (b[i + 1] & 0xF6) != 0xF0:
        return False
    # layer bits must be 00 (checked by mask); sampling freq index valid
    sf_index = (b[i + 2] >> 2) & 0xF
    return sf_index < 13


def looks_like_ac3(b: bytes) -> bool:
    """0x0B77 syncword probe (soundkit-ac3/src/lib.rs:22)."""
    return len(b) >= 2 and b[0] == 0x0B and b[1] == 0x77


def detect_audio(buffer: bytes) -> AudioType:
    b = bytes(buffer[:MAX_DETECTION_BYTES])
    if len(b) < 4:
        return AudioType.UNKNOWN

    if b[:4] == b"RIFF" and len(b) >= 12 and b[8:12] == b"WAVE":
        return AudioType.WAV
    if b[:4] == b"fLaC":
        return AudioType.FLAC
    if b[:4] == b"OggS":
        # first page payload begins at 27 + n_segments
        if len(b) >= 28:
            nseg = b[26]
            payload = b[27 + nseg : 27 + nseg + 8]
            if payload.startswith(b"OpusHead"):
                return AudioType.OGG_OPUS
            if payload.startswith(b"\x01vorbis"):
                return AudioType.OGG_VORBIS
            if payload.startswith(b"Speex   "):
                return AudioType.OGG_SPEEX
        return AudioType.UNKNOWN
    if b[:4] == b"\x1a\x45\xdf\xa3":
        return AudioType.WEBM
    if b[:4] == b"FORM" and len(b) >= 12 and b[8:12] in (b"AIFF", b"AIFC"):
        return AudioType.AIFF
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # M4A container; ALAC if an alac sample entry appears
        return AudioType.ALAC if b"alac" in b else AudioType.M4A
    if b[:8] == b"OpusHead":
        return AudioType.OPUS
    if looks_like_ac3(b):
        return AudioType.AC3
    if b[:3] == b"ID3":
        return AudioType.MP3
    if _looks_like_adts(b, 0):
        return AudioType.AAC
    if _looks_like_mp3_frame(b, 0):
        return AudioType.MP3
    # scan a short window for an MP3/ADTS sync preceded by junk
    for i in range(min(len(b) - 4, 4096)):
        if b[i] == 0xFF:
            if _looks_like_adts(b, i):
                return AudioType.AAC
            if _looks_like_mp3_frame(b, i):
                return AudioType.MP3
    return AudioType.UNKNOWN
