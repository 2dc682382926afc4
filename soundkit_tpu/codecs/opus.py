"""Opus decoders: Ogg-encapsulated, and soundkit's raw-Opus framing.

API equivalents of the reference's:
- ``OggOpusDemuxer`` / ``OggOpusDecoder``
  (soundkit-ogg-opus/src/lib.rs:193,275): config + packet events, PCM
  decode with pre-skip handling.
- ``OpusStreamDecoder`` (soundkit-opus/src/lib.rs:295-430): soundkit's
  raw framing — 19-byte OpusHead, then u16-LE length-prefixed packets.

Packet decode is the owned RFC 6716 decoder (opus_core.py: range
decoder + CELT mono/stereo + SILK mono) with pre-skip and output gain
applied from the OpusHead; hybrid or stereo-SILK packets switch the
stream to the libavcodec delegate through a gapless replay
(see _OpusCore).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from soundkit_tpu.codecs.avdec import AvDecoder, f32_to_i16
from soundkit_tpu.core.audio_types import AudioData, EncodingFlag, Endianness
from soundkit_tpu.demux.ogg import OggPacketizer

OPUS_SAMPLE_RATE = 48000


@dataclass(frozen=True)
class OpusHead:
    version: int
    channels: int
    pre_skip: int
    input_sample_rate: int
    output_gain: int
    mapping_family: int
    raw: bytes

    @classmethod
    def parse(cls, data: bytes) -> "OpusHead":
        if len(data) < 19 or data[:8] != b"OpusHead":
            raise ValueError("not an OpusHead")
        return cls(
            version=data[8],
            channels=data[9],
            pre_skip=struct.unpack_from("<H", data, 10)[0],
            input_sample_rate=struct.unpack_from("<I", data, 12)[0],
            output_gain=struct.unpack_from("<h", data, 16)[0],
            mapping_family=data[18],
            raw=bytes(data),
        )


_CELT_SUPPORT_WIN = {}


def _celt_support_window(NB: int) -> np.ndarray:
    """The [NB + 120] support slice of the low-overlap window."""
    if NB not in _CELT_SUPPORT_WIN:
        from soundkit_tpu.codecs.opus_celt import tables

        w = tables()["celt_window"].astype(np.float64)
        win = np.zeros(NB + 120)
        win[:120] = w
        win[120:NB] = 1.0
        win[NB:] = w[::-1]
        _CELT_SUPPORT_WIN[NB] = win
    return _CELT_SUPPORT_WIN[NB]


class _NativeCeltStream:
    """Single-stream CELT fast path: C++ range-decode/PVQ parse
    (native/src/celt_parse.cpp, ~160x the Python stage) + pure-numpy
    synthesis mirroring CeltDecoder._synthesize in f64 — NO jax, so
    the path works even when the pinned TPU plugin cannot initialize
    (the tunnel-wedge failure mode), and its output matches the
    Python decoder to machine precision.  Raises OpusUnsupported on
    anything it cannot serve (non-CELT mode, non-20 ms frames, PLC);
    the caller then replays history through the Python decoder."""

    HIST = 1200  # > max comb period 1024 + taps

    def __init__(self, channels: int):
        from soundkit_tpu.codecs.celt_native import NativeCeltParser
        from soundkit_tpu.codecs.opus_celt import tables

        self.C = channels
        self._parser = NativeCeltParser(channels)
        t = tables()
        self._band_end = t["celt_band_end"].astype(int)
        self._win = t["celt_window"].astype(np.float64)
        self._ola = np.zeros((channels, 120))
        self._hist = np.zeros((channels, self.HIST))
        self._emph = np.zeros(channels)

    def _comb_packed(self, x, base, i0, i1, T0, T1, gw0, gw1) -> None:
        """CeltDecoder._comb_inplace with premultiplied tap weights
        (the pack_comb_params layout the C++ parse emits)."""
        if not (gw0.any() or gw1.any()):
            return
        g00, g01, g02 = gw0
        g10, g11, g12 = gw1
        w = self._win
        overlap = min(120, i1 - i0)
        for i in range(overlap):
            f = w[i] * w[i]
            j = base + i0 + i
            x[j] = (
                x[j]
                + (1 - f) * (
                    g00 * x[j - T0]
                    + g01 * (x[j - T0 - 1] + x[j - T0 + 1])
                    + g02 * (x[j - T0 - 2] + x[j - T0 + 2])
                )
                + f * (
                    g10 * x[j - T1]
                    + g11 * (x[j - T1 - 1] + x[j - T1 + 1])
                    + g12 * (x[j - T1 - 2] + x[j - T1 + 2])
                )
            )
        if gw1.any():
            # the steady tail recursion has lag T1 (>= 15): chunks of
            # T1-2 samples only read positions strictly before the
            # chunk, so each chunk vectorizes
            i = i0 + overlap
            while i < i1:
                step = min(T1 - 2, i1 - i)
                j = base + i
                idx = np.arange(j, j + step)
                x[idx] += (
                    g10 * x[idx - T1]
                    + g11 * (x[idx - T1 - 1] + x[idx - T1 + 1])
                    + g12 * (x[idx - T1 - 2] + x[idx - T1 + 2])
                )
                i += step

    @staticmethod
    def _imdct_fast(freq: np.ndarray, NB: int) -> np.ndarray:
        """[NB] spectrum -> [NB + 120] windowed time support, equal to
        ``freq @ _imdct_matrix(NB)`` to ~1e-11 relative: DCT-IV + the
        MDCT's odd/even symmetric extension + low-overlap window."""
        try:
            import scipy.fft as sf
        except ImportError:
            from soundkit_tpu.codecs.opus_celt import _imdct_matrix

            return freq @ _imdct_matrix(NB)
        win = _celt_support_window(NB)
        half = NB // 2
        v = sf.dct(freq, type=4) / 2.0
        pad = (NB - 120) // 2
        # y_full = [v[half:], -v[::-1], -v[:half]]; support slice is
        # [pad : pad + NB + 120] of the 2*NB frame
        y = np.concatenate([v[half:], -v[::-1], -v[:half]])
        return y[pad : pad + NB + 120] * win

    def _synth(self, freq: np.ndarray, comb: np.ndarray,
               sflag: int) -> np.ndarray:
        """[C, 960] spectra -> [960, C] float PCM (CeltDecoder
        _synthesize, comb params in packed form)."""
        from scipy.signal import lfilter

        from soundkit_tpu.codecs.opus_celt import CELT_EMPH_COEFF

        C, N = freq.shape
        B = 8 if sflag else 1
        NB = N // B
        T0a, T1a = int(comb[0]), int(comb[1])
        gw0a, gw1a = comb[2:5], comb[5:8]
        T0b, T1b = int(comb[8]), int(comb[9])
        gw0b, gw1b = comb[10:13], comb[13:16]
        res = np.empty((N, C))
        for c in range(C):
            out = np.zeros(N + 120)
            out[:120] = self._ola[c]
            for b in range(B):
                out[b * NB : b * NB + NB + 120] += \
                    self._imdct_fast(freq[c, b::B], NB)
            self._ola[c] = out[N : N + 120]
            x = np.concatenate([self._hist[c], out[:N]])
            base = self.HIST
            self._comb_packed(x, base, 0, min(120, N), T0a, T1a,
                              gw0a, gw1a)
            self._comb_packed(x, base, 120, N, T0b, T1b, gw0b, gw1b)
            pcm = x[base : base + N]
            self._hist[c] = np.concatenate([self._hist[c][N:], pcm])
            o, zf = lfilter([1.0], [1.0, -CELT_EMPH_COEFF], pcm,
                            zi=[CELT_EMPH_COEFF * self._emph[c]])
            self._emph[c] = o[-1]
            res[:, c] = o
        return res / 32768.0

    def decode_packet(self, data: bytes) -> np.ndarray:
        """One packet -> [n, channels] float at 48 kHz."""
        from soundkit_tpu.codecs.opus_core import (
            OpusUnsupported,
            parse_packet,
        )

        if not data:
            raise OpusUnsupported("PLC on the native CELT fast path")
        toc, frames = parse_packet(data)
        if toc.mode != "celt" or toc.frame_duration != 20:
            raise OpusUnsupported("fast path serves 20 ms CELT only")
        coded = 2 if toc.stereo else 1
        if coded > self.C:
            raise OpusUnsupported("stereo packet in a mono stream")
        end = int(self._band_end[toc.bandwidth])
        outs = []
        for f in frames:
            freq, comb, sflag = self._parser.parse(f, end, coded)
            if coded < self.C:
                freq = np.repeat(freq, self.C, axis=0)
            outs.append(self._synth(freq, comb, sflag))
        return np.concatenate(outs, axis=0)


# replay-history bound: trim to _HISTORY_KEEP packets once the buffer
# crosses _HISTORY_CAP (amortized O(1) per packet, O(1) steady-state
# memory per stream).  96 packets of 20 ms = ~2 s of warmup tail, far
# beyond CELT/SILK state memory (see _OpusCore._trim_history).
_HISTORY_CAP = 256
_HISTORY_KEEP = 96


class _OpusCore:
    """Shared packet decode with OpusHead config.

    Mono and stereo mapping-family-0 streams decode through the owned
    RFC 6716 decoder — CELT-only streams ride the native fast path
    (_NativeCeltStream) until a packet it cannot serve appears, at
    which point the FULL history replays through the Python decoder
    (opus_core.py: CELT mono/stereo, SILK, hybrid) so state at the
    transition is exactly what an all-Python decode would hold;
    packets neither owns (multistream mappings) switch the stream to
    the libavcodec delegate with the same gapless-replay pattern."""

    def __init__(self, head: OpusHead):
        self.head = head
        self.sample_rate = OPUS_SAMPLE_RATE
        self.channels = head.channels
        self._av: Optional[AvDecoder] = None
        self._own = None
        self._fast = None  # None = not yet built, False = disabled
        if head.channels in (1, 2) and head.mapping_family == 0:
            from soundkit_tpu.codecs.opus_core import OpusDecoder as _Own

            self._own = _Own(head.channels)
            self._history: List[bytes] = []
            self._dropped = 0  # raw 48k samples of trimmed prefix
            self._emitted = 0
            self._skip = head.pre_skip
            self._gain = (
                10.0 ** (head.output_gain / (20.0 * 256.0))
                if head.output_gain
                else 1.0
            )
        else:
            self._av = AvDecoder("opus", extradata=head.raw)

    def _fallback(self) -> np.ndarray:
        """Replay history into avcodec, dropping the samples the owned
        path already emitted, so the caller's stream stays gapless."""
        self._own = None
        self._fast = False
        self._av = AvDecoder("opus", extradata=self.head.raw)
        parts = [self._av.push(p) for p in self._history]
        self._history = []
        parts = [p for p in parts if p.size]
        out = (
            np.concatenate(parts) if parts else np.zeros(0, dtype=np.float32)
        )
        emitted_before = max(0, self._dropped - self.head.pre_skip)
        drop = max(0, self._emitted - emitted_before) * self.channels
        return out[drop:] if drop else out

    def _post(self, pcm) -> np.ndarray:
        """Gain + pre-skip + emitted accounting for one packet."""
        out = np.asarray(pcm, dtype=np.float32).reshape(-1)
        if self._gain != 1.0:
            out = out * np.float32(self._gain)
        if self._skip:
            k = min(self._skip, out.shape[0] // self.channels)
            out = out[k * self.channels :]
            self._skip -= k
        self._emitted += out.shape[0] // self.channels
        return out

    def _try_fast(self, packet: bytes) -> Optional[np.ndarray]:
        """Native CELT decode, or None when the stream must move to
        the Python path (fast path disabled from then on)."""
        from soundkit_tpu.codecs.opus_core import OpusUnsupported

        if self._fast is None:
            try:
                self._fast = _NativeCeltStream(self.channels)
            except Exception:
                self._fast = False
                return None
        if self._fast is False:
            return None
        try:
            return self._fast.decode_packet(packet)
        except Exception:
            # OpusUnsupported (non-CELT packet) or any runtime failure
            # of the native/jax stack: the Python replay rebuilds exact
            # state either way
            self._fast = False
            return None

    def _trim_history(self) -> None:
        """Bound the replay buffer: O(1) steady-state memory per lane.

        Decoder state memory is short (CELT: one frame of overlap, two
        frames of energy carry, ~1 period of postfilter history; SILK:
        two frames of LPC/LTP state), so a replay from the retained
        tail converges to the full-history decode long before the tail
        ends — the replayed prefix output is discarded anyway (only
        not-yet-emitted samples are returned).  Dropped packets are
        accounted by their TOC duration so the skip/emitted arithmetic
        stays aligned without decoding them."""
        from soundkit_tpu.codecs.opus_core import packet_duration_48k

        if len(self._history) <= _HISTORY_CAP:
            return
        cut = self._history[: len(self._history) - _HISTORY_KEEP]
        self._history = self._history[len(cut):]
        self._dropped += sum(packet_duration_48k(p) for p in cut)

    def _replay_own(self) -> np.ndarray:
        """Rebuild the Python decoder's state from the retained packet
        history (the fast path fed none of it) and return only the
        samples not yet emitted.  When the history was trimmed the
        rebuilt state is converged-from-tail rather than bit-exact —
        inaudible after the >1 s warmup the retained tail provides."""
        from soundkit_tpu.codecs.opus_core import OpusDecoder as _Own

        own = _Own(self.channels)
        skip = max(0, self.head.pre_skip - self._dropped)
        chunks = []
        for p in self._history:
            out = np.asarray(own.decode_packet(p), np.float32).reshape(-1)
            if self._gain != 1.0:
                out = out * np.float32(self._gain)
            if skip:
                k = min(skip, out.shape[0] // self.channels)
                out = out[k * self.channels :]
                skip -= k
            chunks.append(out)
        flat = (
            np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        )
        self._own = own
        self._skip = skip
        # post-skip samples produced by trimmed-away prefix packets
        emitted_before = max(0, self._dropped - self.head.pre_skip)
        drop = max(0, self._emitted - emitted_before) * self.channels
        new = flat[drop:] if drop else flat
        self._emitted += new.shape[0] // self.channels
        return new

    def decode_packet_f32(self, packet: bytes) -> np.ndarray:
        if self._own is not None:
            from soundkit_tpu.codecs.opus_core import OpusUnsupported

            self._history.append(packet)
            self._trim_history()
            if self._fast is not False:
                pcm = self._try_fast(packet)
                if pcm is not None:
                    return self._post(pcm)
                # first unservable packet: move state to the Python
                # decoder by replaying the whole history through it
                try:
                    return self._replay_own()
                except OpusUnsupported:
                    return self._fallback()
            try:
                pcm = self._own.decode_packet(packet)
            except OpusUnsupported:
                return self._fallback()
            return self._post(pcm)
        return self._av.push(packet)

    def flush_f32(self) -> np.ndarray:
        if self._own is not None:
            return np.zeros(0, dtype=np.float32)
        return self._av.flush()


class OggOpusDemuxer:
    """Config/packet event demuxer (soundkit-ogg-opus/src/lib.rs:193)."""

    def __init__(self) -> None:
        self._pkts = OggPacketizer()
        self.head: Optional[OpusHead] = None
        self._tags_skipped = False

    def push(self, data: bytes) -> List[bytes]:
        """Returns raw Opus packets; populates .head on config."""
        out = []
        for packet, _granule in self._pkts.push(data):
            if self.head is None:
                self.head = OpusHead.parse(packet)
                continue
            if not self._tags_skipped:
                self._tags_skipped = True  # OpusTags
                continue
            out.append(packet)
        return out


class OggOpusDecoder:
    """Ogg-Opus -> PCM (soundkit-ogg-opus/src/lib.rs:275)."""

    def __init__(self) -> None:
        self._demux = OggOpusDemuxer()
        self._core: Optional[_OpusCore] = None

    @property
    def sample_rate(self) -> Optional[int]:
        return OPUS_SAMPLE_RATE if self._core else None

    @property
    def channels(self) -> Optional[int]:
        return self._core.channels if self._core else None

    def decode_f32(self, data: bytes) -> np.ndarray:
        packets = self._demux.push(data)
        if self._core is None and self._demux.head is not None:
            self._core = _OpusCore(self._demux.head)
        if self._core is None or not packets:
            return np.zeros(0, dtype=np.float32)
        out = [self._core.decode_packet_f32(p) for p in packets]
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush(self) -> np.ndarray:
        return self._core.flush_f32() if self._core else np.zeros(0, dtype=np.float32)


class OpusStreamDecoder:
    """soundkit raw-Opus framing: OpusHead(19B) then [u16-LE len][packet]*
    (soundkit-opus/src/lib.rs:295-430)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._core: Optional[_OpusCore] = None

    @property
    def sample_rate(self) -> Optional[int]:
        return OPUS_SAMPLE_RATE if self._core else None

    @property
    def channels(self) -> Optional[int]:
        return self._core.channels if self._core else None

    def decode_f32(self, data: bytes) -> np.ndarray:
        self._buf.extend(data)
        out = []
        if self._core is None:
            if len(self._buf) < 19:
                return np.zeros(0, dtype=np.float32)
            head = OpusHead.parse(bytes(self._buf[:19]))
            self._core = _OpusCore(head)
            del self._buf[:19]
        while len(self._buf) >= 2:
            plen = struct.unpack_from("<H", self._buf, 0)[0]
            if len(self._buf) < 2 + plen:
                break
            packet = bytes(self._buf[2 : 2 + plen])
            del self._buf[: 2 + plen]
            out.append(self._core.decode_packet_f32(packet))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def decode_i16(self, data: bytes) -> np.ndarray:
        return f32_to_i16(self.decode_f32(data))

    def flush(self) -> np.ndarray:
        return self._core.flush_f32() if self._core else np.zeros(0, dtype=np.float32)
