"""Frame header / frame stream / crypto tests mirroring
soundkit/src/{crypto.rs:191-245, frame_stream.rs:150-223,
audio_content_crypto.rs:250-331} plus wire-format round-trips."""
import numpy as np
import pytest

from soundkit_tpu.core.audio_content_crypto import (
    AudioContentCipher,
    AudioContentCryptoError,
    AudioGroupMetadata,
    InvalidKeyEpoch,
    KeyEpochMismatch,
    ZeroKey,
)
from soundkit_tpu.core.audio_types import EncodingFlag, Endianness
from soundkit_tpu.core.crypto import (
    ChaCha20Poly1305PacketCipher,
    DecryptFailed,
    InvalidDecimalKey,
    NONCE_BYTES,
    key_from_decimal,
)
from soundkit_tpu.core.frame_header import (
    FrameHeader,
    FrameHeaderV2,
    get_encoding_flag,
)
from soundkit_tpu.core.frame_stream import (
    FrameStreamError,
    SoundKitFrameStream,
    SoundKitFrameStreamOptions,
)

TEST_KEY_DECIMAL = "83843157117408337365446905028299378179116700186920144823595584430653437972238"


def test_decimal_key_parser():
    key = key_from_decimal(TEST_KEY_DECIMAL)
    assert len(key) == 32 and key != b"\x00" * 32
    with pytest.raises(InvalidDecimalKey):
        key_from_decimal("12a4")
    with pytest.raises(InvalidDecimalKey):
        key_from_decimal("")


def test_nonce_prefixed_roundtrip():
    cipher = ChaCha20Poly1305PacketCipher(key_from_decimal(TEST_KEY_DECIMAL))
    nonce = bytes([7] * NONCE_BYTES)
    aad = b"soundkit-v2-header"
    enc = cipher.encrypt_nonce_prefixed(nonce, b"opus-packet", aad)
    assert enc[:NONCE_BYTES] == nonce
    assert enc[NONCE_BYTES:] != b"opus-packet"
    assert cipher.decrypt_nonce_prefixed(enc, aad) == b"opus-packet"
    with pytest.raises(DecryptFailed):
        cipher.decrypt_nonce_prefixed(enc, b"wrong-aad")


def test_v1_header_roundtrip_and_encoding_flag():
    h = FrameHeader(EncodingFlag.OPUS, 960, 48000, 2, 16, Endianness.LITTLE, id=42)
    data = h.encode()
    assert len(data) == h.size() <= 20
    assert FrameHeader.decode(data) == h
    assert get_encoding_flag(data) == EncodingFlag.OPUS

    h2 = FrameHeader(EncodingFlag.FLAC, 4096, 44100, 1, 24)
    assert FrameHeader.decode(h2.encode()) == h2
    assert get_encoding_flag(h2.encode()) == EncodingFlag.FLAC


def _encode_frame(payload: bytes, encrypted: bool, cipher=None) -> bytes:
    flags = FrameHeaderV2.FLAG_ENCRYPTED if encrypted else 0
    header = FrameHeaderV2(
        encoding=EncodingFlag.OPUS,
        payload_size=len(payload),
        sample_size=960,
        sample_rate=48000,
        channels=2,
        bits_per_sample=0,
        endianness=Endianness.LITTLE,
        id=5,
        bitrate=20000,
    ).with_packet_flags(flags).with_packet_crc32(payload)
    return header.encode() + payload


def test_v2_parses_plain_frames():
    packet = _encode_frame(b"opus", False)
    stream = SoundKitFrameStream()
    frames = stream.push(packet)
    assert len(frames) == 1
    assert frames[0].payload == b"opus"
    assert not frames[0].encrypted
    assert frames[0].header.id == 5
    assert frames[0].header.bitrate == 20000
    stream.finish()


def test_v2_decrypts_when_flagged():
    cipher = ChaCha20Poly1305PacketCipher(key_from_decimal(TEST_KEY_DECIMAL))
    nonce = bytes([3] * NONCE_BYTES)
    enc_payload = cipher.encrypt_nonce_prefixed(nonce, b"opus", b"")
    packet = _encode_frame(enc_payload, True)

    stream = SoundKitFrameStream(SoundKitFrameStreamOptions(cipher=cipher))
    frames = stream.push(packet)
    assert frames[0].payload == b"opus"
    assert frames[0].encrypted
    assert frames[0].encrypted_payload_size == len(enc_payload)


def test_v2_encrypted_without_cipher_errors():
    cipher = ChaCha20Poly1305PacketCipher(key_from_decimal(TEST_KEY_DECIMAL))
    enc = cipher.encrypt_nonce_prefixed(bytes(12), b"x", b"")
    packet = _encode_frame(enc, True)
    with pytest.raises(FrameStreamError, match="no cipher"):
        SoundKitFrameStream().push(packet)


def test_v2_crc_mismatch_detected():
    packet = bytearray(_encode_frame(b"payload!", False))
    packet[-1] ^= 0xFF  # corrupt payload
    with pytest.raises(FrameStreamError, match="CRC32"):
        SoundKitFrameStream().push(bytes(packet))


def test_v2_chunked_parse():
    packets = b"".join(_encode_frame(bytes([i] * (i + 1)), False) for i in range(5))
    stream = SoundKitFrameStream()
    frames = []
    for i in range(0, len(packets), 7):
        frames.extend(stream.push(packets[i : i + 7]))
    assert len(frames) == 5
    assert [len(f.payload) for f in frames] == [1, 2, 3, 4, 5]
    stream.finish()


def test_v2_finish_with_partial_errors():
    stream = SoundKitFrameStream()
    stream.push(_encode_frame(b"full", False)[:10])
    with pytest.raises(FrameStreamError, match="buffered bytes"):
        stream.finish()


# --- audio content crypto (ACE1) ---

KEY = bytes(range(0x80, 0xA0))
NONCE = bytes([0x07, 0, 0, 0, 0x40, 0x41, 0x42, 0x43, 0x44, 0x45, 0x46, 0x47])


def test_ace1_roundtrip_and_aad_binding():
    cipher = AudioContentCipher(KEY)
    aad = b"session=ses_one;stream=trk_program;sequence=41"
    env = cipher.seal(7, NONCE, b"audio frame", aad)
    assert env[:4] == b"ACE1"
    assert int.from_bytes(env[4:8], "little") == 7
    assert cipher.open(7, env, aad) == b"audio frame"
    with pytest.raises(AudioContentCryptoError):
        cipher.open(7, env, b"session=ses_one;stream=other;sequence=41")


def test_ace1_rejects_zero_key_epochs_and_tamper():
    with pytest.raises(ZeroKey):
        AudioContentCipher(bytes(32))
    cipher = AudioContentCipher(KEY)
    with pytest.raises(InvalidKeyEpoch):
        cipher.seal(0, NONCE, b"audio", b"metadata")
    env = bytearray(cipher.seal(7, NONCE, b"audio", b"metadata"))
    with pytest.raises(KeyEpochMismatch):
        cipher.open(8, bytes(env), b"metadata")
    env[-1] ^= 0x80
    with pytest.raises(AudioContentCryptoError):
        cipher.open(7, bytes(env), b"metadata")


def test_group_metadata_canonical():
    md = AudioGroupMetadata(
        session_context=b"ses_example",
        transport_session_id=1,
        config_generation=2,
        epoch_id=3,
        pts_samples=4,
        sample_rate=48000,
        frame_count=240,
        group_count=2,
        group_id=7,
        group_index=1,
        channel_start=16,
        channel_count=2,
        payload_kind=3,
        sample_format=2,
        flags=0x81,
    )
    aad = md.associated_data()
    assert aad[:4] == b"AEG1"
    assert aad[4] == 11
    import dataclasses

    changed = dataclasses.replace(md, group_id=8)
    assert changed.associated_data() != aad
    changed = dataclasses.replace(md, flags=0x01)
    assert changed.associated_data() != aad


# --- audio packets (v1) ---

def test_audio_packet_pcm_roundtrip():
    from soundkit_tpu.core.audio_packet import decode_audio_packet, encode_audio_packet

    pcm = np.array([0, 16384, -16384, 32767, -32768, 100], dtype=np.int16)
    interleaved = pcm.astype("<i2").tobytes()
    header = FrameHeader(EncodingFlag.PCM_SIGNED, 3, 48000, 2, 16)
    # PCMFloat passthrough packet
    packet = encode_audio_packet(EncodingFlag.PCM_FLOAT, None, header.encode() + interleaved)
    # decode as PCMSigned-16 via fresh header
    direct = FrameHeader(EncodingFlag.PCM_SIGNED, 3, 48000, 2, 16).encode() + interleaved
    audio = decode_audio_packet(direct)
    assert audio.sampling_rate == 48000
    assert len(audio.channels) == 2
    np.testing.assert_allclose(
        audio.channels[0], pcm[0::2].astype(np.float32) / 32767.0, atol=1e-6
    )
