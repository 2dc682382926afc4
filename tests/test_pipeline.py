"""Decode pipeline tests mirroring soundkit-decoder/src/lib.rs
integration patterns (:1740-2597): explicit + autodetect decode per
format, chunked input, DecodeOptions conversion, error-as-data."""
import numpy as np
import pytest

from soundkit_tpu.codecs.g711 import G711Law
from soundkit_tpu.codecs.g726 import G726Packing, G726Rate
from soundkit_tpu.core.audio_types import AudioData, EncodingFlag
from soundkit_tpu.core.raw_pcm import RawPcmFormat
from soundkit_tpu.core.wav import parse_wav
from soundkit_tpu.demux.detect import AudioType, detect_audio
from soundkit_tpu.pipeline.decode_pipeline import DecodePipeline, StreamDecoder
from soundkit_tpu.pipeline.output_options import (
    DecodeOptions,
    DecodeError,
    FormatDetectionFailed,
)

CLIP = "A_Tusk_is_used_to_make_costly_gifts"


def _drive(handle, data: bytes, chunk=4096):
    drained = []
    for off in range(0, len(data), chunk):
        handle.send_blocking(data[off : off + chunk], drained)
    handle.send_blocking(b"", drained)
    return drained + handle.recv_all()


def _pcm_bytes(outputs):
    datas = [o.data for o in outputs if isinstance(o, AudioData)]
    errs = [o for o in outputs if isinstance(o, DecodeError)]
    assert not errs, f"decode errors: {errs}"
    return b"".join(datas)


# --- detection matrix (access-unit equivalence) ---

@pytest.mark.parametrize(
    "path,expected",
    [
        ("wav_stereo/{}.wav", AudioType.WAV),
        ("flac/{}.flac", AudioType.FLAC),
        ("mp3/{}.mp3", AudioType.MP3),
        ("ogg_opus/{}.ogg", AudioType.OGG_OPUS),
        ("vorbis/{}.ogg", AudioType.OGG_VORBIS),
        ("speex/{}.spx", AudioType.OGG_SPEEX),
        ("itag171/yt_itag_171_vorbis.webm", AudioType.WEBM),
        ("mac_aac/{}.m4a", AudioType.M4A),
        ("alac/{}.m4a", AudioType.ALAC),
        ("aiff/{}.aiff", AudioType.AIFF),
        ("aifc/{}.aifc", AudioType.AIFF),
        ("ac3/{}.ac3", AudioType.AC3),
    ],
)
def test_detect_matrix(testdata, path, expected):
    p = testdata / path.format(CLIP)
    data = p.read_bytes()[:65536]
    assert detect_audio(data) == expected, p


def test_detect_unknown():
    assert detect_audio(b"\x00" * 9000) == AudioType.UNKNOWN
    assert detect_audio(b"ab") == AudioType.UNKNOWN


# --- explicit spawn paths ---

def test_explicit_g711_pipeline(testdata, golden):
    data = (testdata / "g711_ulaw" / f"{CLIP}.ulaw").read_bytes()
    handle = DecodePipeline.spawn_g711(G711Law.MU_LAW)
    pcm = _pcm_bytes(_drive(handle, data, chunk=137))
    gold = parse_wav((golden / "g711_ulaw" / f"{CLIP}.decoded.wav").read_bytes())
    assert pcm == gold.data


def test_explicit_g726_pipeline(testdata, golden):
    data = (testdata / "g726" / f"{CLIP}_32.g726").read_bytes()
    handle = DecodePipeline.spawn_g726(G726Packing.LEFT)
    pcm = _pcm_bytes(_drive(handle, data, chunk=127))
    gold = parse_wav((golden / "g726" / f"{CLIP}_32.decoded.wav").read_bytes())
    assert pcm == gold.data


def test_explicit_g722_pipeline(testdata, golden):
    data = (testdata / "g722" / f"{CLIP}.g722").read_bytes()
    handle = DecodePipeline.spawn_g722()
    pcm = _pcm_bytes(_drive(handle, data))
    gold = parse_wav((golden / "g722" / f"{CLIP}.decoded.wav").read_bytes())
    assert pcm == gold.data


def test_explicit_raw_pcm_pipeline(testdata, golden):
    data = (testdata / "linear16" / f"{CLIP}.s16le").read_bytes()
    handle = DecodePipeline.spawn_raw_pcm(RawPcmFormat.linear16(16000, 1))
    pcm = _pcm_bytes(_drive(handle, data, chunk=333))
    assert pcm == data
    gold = parse_wav((golden / "linear16" / f"{CLIP}.decoded.wav").read_bytes())
    assert pcm == gold.data


# --- autodetect paths ---

def test_autodetect_wav(testdata):
    data = (testdata / "wav_stereo" / f"{CLIP}.wav").read_bytes()
    outputs = _drive(DecodePipeline.spawn(), data)
    pcm = _pcm_bytes(outputs)
    assert pcm == parse_wav(data).data


def test_autodetect_flac_md5(testdata):
    data = (testdata / "flac" / f"{CLIP}.flac").read_bytes()
    outputs = _drive(DecodePipeline.spawn(), data, chunk=1000)
    audio = [o for o in outputs if isinstance(o, AudioData)]
    assert audio and audio[0].sampling_rate == 16000
    total = sum(a.frame_count for a in audio)
    assert total == 47360


def test_autodetect_failure_is_error_as_data():
    noise = bytes(range(256)) * 300  # 76800 bytes of junk
    outputs = _drive(DecodePipeline.spawn(), noise)
    assert any(isinstance(o, FormatDetectionFailed) for o in outputs)


def test_input_buffer_full():
    from soundkit_tpu.pipeline.output_options import InputBufferFull

    handle = DecodePipeline.spawn_with_buffers(2, 4)
    # stall the worker by never reading; queue fills
    with pytest.raises(InputBufferFull):
        for _ in range(1000):
            handle.send(b"\x00" * 100)


# --- DecodeOptions conversion ---

def test_options_convert_to_16k_mono_16bit(testdata):
    data = (testdata / "wav_stereo" / f"{CLIP}.wav").read_bytes()
    src = parse_wav(data)
    opts = DecodeOptions(output_bits_per_sample=16, output_sample_rate=8000, output_channels=1)
    outputs = _drive(DecodePipeline.spawn_with_options(opts), data)
    audio = [o for o in outputs if isinstance(o, AudioData)]
    assert audio
    for a in audio:
        assert (a.bits_per_sample, a.channel_count, a.sampling_rate) == (16, 1, 8000)
    total = sum(a.frame_count for a in audio)
    # ceil(T * 8000/src_rate)
    src_frames = src.frame_count
    assert abs(total - src_frames * 8000 / src.sampling_rate) <= 2


def test_options_resampler_chunk_invariance(testdata):
    data = (testdata / "linear16" / f"{CLIP}.s16le").read_bytes()
    opts = DecodeOptions(output_sample_rate=8000)

    def run(chunk):
        handle = DecodePipeline.spawn_raw_pcm(RawPcmFormat.linear16(16000, 1), opts)
        return _pcm_bytes(_drive(handle, data, chunk=chunk))

    assert run(4096) == run(333) == run(len(data))


def test_options_bit_depth_only(testdata):
    data = (testdata / "linear16" / f"{CLIP}.s16le").read_bytes()
    opts = DecodeOptions(output_bits_per_sample=24)
    handle = DecodePipeline.spawn_raw_pcm(RawPcmFormat.linear16(16000, 1), opts)
    outputs = _drive(handle, data)
    audio = [o for o in outputs if isinstance(o, AudioData)]
    assert all(a.bits_per_sample == 24 for a in audio)
    total = sum(len(a.data) for a in audio)
    assert total == len(data) // 2 * 3


def test_sync_core_chunk_invariance(testdata):
    """StreamDecoder without threads: chunked == whole."""
    data = (testdata / "wav_stereo" / f"{CLIP}.wav").read_bytes()

    def run(chunk):
        core = StreamDecoder()
        out = []
        for off in range(0, len(data), chunk):
            out.extend(core.process(data[off : off + chunk]))
        out.extend(core.process(b""))
        return b"".join(o.data for o in out if isinstance(o, AudioData))

    assert run(313) == run(8192) == run(len(data))


def test_detection_rejects_payload_sync_patterns(testdata):
    """Raw AMR/G.726 payload bytes contain 0xFFF sync lookalikes; the
    frame-length chaining in detect_audio must reject them (these
    formats are spawn-only, as in the reference's autodetect set)."""
    from soundkit_tpu.demux.detect import AudioType, detect_audio

    amr = (testdata / "amr_nb" / f"{CLIP}.amr").read_bytes()
    assert detect_audio(amr[:65536]) == AudioType.UNKNOWN
    g726 = next((testdata / "g726").glob("*")).read_bytes()
    assert detect_audio(g726[:65536]) == AudioType.UNKNOWN


@pytest.mark.parametrize("method,path,want_rate", [
    ("spawn", "flac/{}.flac", 16000),                      # autodetect
    ("spawn_flac", "flac/{}.flac", 16000),
    ("spawn_aac_adts", None, 16000),                       # golden adts
    ("spawn_ac3", "ac3/{}.ac3", 48000),  # AC-3 min rate is 32k; fixture was upsampled
    ("spawn_speex", "speex/{}.spx", 8000),  # narrowband fixture
    ("spawn_ogg_opus", "ogg_opus/{}.ogg", 48000),
    ("spawn_opus", "opus/{}.opus", 48000),
    ("spawn_aiff", "aiff/{}.aiff", 8000),  # fixture COMM says 8 kHz
    ("spawn_webm", "itag171/yt_itag_171_vorbis.webm", 44100),
])
def test_every_spawn_method_decodes(testdata, method, path, want_rate):
    """Each explicit spawn_* handle decodes its fixture to non-silent
    PCM at the expected rate (the reference's per-format
    test_decode_explicit_* matrix, threaded-handle edition)."""
    from soundkit_tpu.core.audio_types import AudioData
    from soundkit_tpu.pipeline.decode_pipeline import DecodePipeline

    if path is None:
        data = (testdata.parent / "golden" / "aac" / f"{CLIP}_encoded.aac").read_bytes()
    elif "{}" in path:
        data = (testdata / path.format(CLIP)).read_bytes()
    else:
        data = (testdata / path).read_bytes()

    h = getattr(DecodePipeline, method)()
    outs = []
    for i in range(0, len(data), 4096):
        h.send_blocking(data[i : i + 4096], outs)
    h.send_blocking(b"", outs)  # EOF
    outs.extend(h.recv_all())
    audio = [o for o in outs if isinstance(o, AudioData)]
    assert audio, f"{method} produced no audio"
    assert audio[0].sampling_rate == want_rate
    pcm = np.concatenate([np.frombuffer(a.data, "<i2") for a in audio]).astype(np.float64)
    assert len(pcm) > 8000
    assert np.sqrt(np.mean((pcm / 32768) ** 2)) > 1e-4, f"{method} decoded silence"


def test_spawn_variants_with_buffers_and_rate(testdata):
    from soundkit_tpu.core.audio_types import AudioData
    from soundkit_tpu.codecs.g726 import G726Rate
    from soundkit_tpu.pipeline.decode_pipeline import DecodePipeline
    from soundkit_tpu.pipeline.output_options import DecodeOptions

    data = (testdata / "g726" / f"{CLIP}_40.g726").read_bytes()
    from soundkit_tpu.codecs.g726 import G726Packing

    h = DecodePipeline.spawn_g726_with_rate(G726Rate.RATE_40000, G726Packing.LEFT)
    outs = []
    h.send_blocking(data, outs)
    h.send_blocking(b"", outs)
    outs.extend(h.recv_all())
    audio = [o for o in outs if isinstance(o, AudioData)]
    assert audio and audio[0].sampling_rate == 8000

    wav = (testdata / "wav_stereo" / f"{CLIP}.wav").read_bytes()
    h2 = DecodePipeline.spawn_with_buffers_and_options(
        16, 16, DecodeOptions(output_sample_rate=8000, output_channels=1)
    )
    outs2 = []
    for i in range(0, len(wav), 2048):
        h2.send_blocking(wav[i : i + 2048], outs2)
    h2.send_blocking(b"", outs2)
    outs2.extend(h2.recv_all())
    audio2 = [o for o in outs2 if isinstance(o, AudioData)]
    assert audio2 and audio2[0].sampling_rate == 8000 and audio2[0].channel_count == 1


def test_no_audio_decoded_error_on_silent_consumption(testdata):
    """A stream the detector routes to a decoder which then consumes
    everything without emitting one PCM frame must end with
    NoAudioDecoded, not a clean empty EOF. Real shape: an Ogg-Opus
    stream truncated right after the header page — the demuxer parses
    the OpusHead and waits for audio packets that never arrive."""
    from soundkit_tpu.core.audio_types import AudioData
    from soundkit_tpu.pipeline.decode_pipeline import StreamDecoder
    from soundkit_tpu.pipeline.output_options import DecodeError, NoAudioDecoded

    ogg = (testdata / "ogg_opus" / f"{CLIP}.ogg").read_bytes()[:9000]
    sd = StreamDecoder()
    outs = []
    for i in range(0, len(ogg), 313):
        outs.extend(sd.process(ogg[i : i + 313]))
    outs.extend(sd.process(b""))
    assert not any(isinstance(o, AudioData) for o in outs)
    assert sum(isinstance(o, NoAudioDecoded) for o in outs) == 1
    assert sum(isinstance(o, DecodeError) for o in outs) == 1  # exactly one

    # empty stream on autodetect: clean empty EOF, no error
    assert StreamDecoder().process(b"") == []

    # healthy stream: audio, no NoAudioDecoded
    mp3 = (testdata / "mp3" / f"{CLIP}.mp3").read_bytes()
    sd2 = StreamDecoder()
    outs2 = []
    for i in range(0, len(mp3), 4096):
        outs2.extend(sd2.process(mp3[i : i + 4096]))
    outs2.extend(sd2.process(b""))
    assert any(isinstance(o, AudioData) for o in outs2)
    assert not any(isinstance(o, DecodeError) for o in outs2)
