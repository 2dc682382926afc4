"""Ogg-Opus fleet group: per-lane Ogg demux + three batched engines.

Extends the serving fleet's batched coverage to Ogg-Opus streams:
each lane demuxes its Ogg pages on the host
(codecs/opus.OggOpusDemuxer), validates every packet's TOC, and is
classified by its first audio packet:

- CELT 20 ms (music) lanes queue into the shared
  ``BatchedCeltDecoder`` (device IMDCT/comb/de-emphasis over all
  lanes per round, C++ range decode/PVQ host stage);
- SILK 20 ms (voice) lanes queue into ``BatchedSilkDeviceDecoder``
  (one C++ skt_silk_parse_many walk per round, LTP/LPC synthesis +
  unmix + 48 kHz resample on device — ops/silk_batch.py);
- hybrid 20 ms lanes queue into ``BatchedHybridDecoder`` (the SILK
  walk's exported coder state seeds the CELT continuation parse;
  both synthesis halves run on device and sum).

All three emit device-resident [rounds, B, C, 960] slots with valid
samples at the END and lane-disjoint zeros elsewhere, so the fleet's
device_out/i16 collect path is a pure add across engines.

Streams no engine serves (multi-frame packets, mid-stream SILK
bandwidth or mode switches, transition-redundancy starts) raise
:class:`OpusLaneUnsupported` out of ``push`` so the fleet reroutes
them to a per-stream host pipeline by replaying the stream's raw
bytes (the same pattern as the Vorbis topology reroute).  Because a
mode switch can appear at ANY packet (not just the headers),
``lane_configured`` stays False so the fleet retains each Opus
lane's raw bytes for the lane's lifetime — the price of guaranteed
bit-equal reroutes.

Reference role: soundkit-ogg-opus decode inside the per-stream
pipeline (soundkit-decoder/src/lib.rs spawn paths), re-split so the
synthesis FLOPs batch onto the device.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.opus import OggOpusDemuxer
from soundkit_tpu.models.opus_batch import (
    BatchedCeltDecoder,
    BatchedHybridDecoder,
    BatchedSilkDeviceDecoder,
)


class OpusLaneUnsupported(Exception):
    """This stream needs the host pipeline (hybrid/odd framing/mode
    switches); the fleet replays its raw bytes into a per-stream
    decoder."""


def _classify(packet: bytes, channels: int):
    """(kind, toc, frame) for a servable packet, else (None, ..)."""
    from soundkit_tpu.codecs.opus_core import (
        _TOC_CACHE,
        TOC_ATTRS,
        parse_packet,
    )

    if not packet:
        return None, None, None
    mode, dur, stereo, _bw, code = TOC_ATTRS[packet[0]]
    if code == 0:
        # fast path: code-0 packets (one frame) need no length parse
        if dur != 20 or (2 if stereo else 1) > channels:
            return None, None, None
        return mode, _TOC_CACHE[packet[0]], packet[1:]
    try:
        toc, frames = parse_packet(packet)
    except Exception:
        return None, None, None
    coded = 2 if toc.stereo else 1
    if (toc.frame_duration != 20 or len(frames) != 1
            or coded > channels):
        return None, None, None
    if toc.mode == "celt":
        return "celt", toc, frames[0]
    if toc.mode == "silk":
        return "silk", toc, frames[0]
    if toc.mode == "hybrid":
        return "hybrid", toc, frames[0]
    return None, None, None


class BatchedOggOpusDecoder:
    """B-lane Ogg-Opus serving model over the device CELT synthesis."""

    FRAME = 960

    def __init__(self, num_streams: int, channels: int = 2,
                 celt_wire: str = "f32"):
        self.B = num_streams
        self.C = channels
        self._celt = BatchedCeltDecoder(num_streams, channels,
                                        wire=celt_wire)
        try:
            self._silk: Optional[BatchedSilkDeviceDecoder] = \
                BatchedSilkDeviceDecoder(num_streams, channels)
        except Exception:
            self._silk = None  # no native lib: voice lanes reroute
        try:
            self._hyb: Optional[BatchedHybridDecoder] = \
                BatchedHybridDecoder(num_streams, channels)
        except Exception:
            self._hyb = None
        self._kind: List[Optional[str]] = [None] * num_streams
        self._demux: List[OggOpusDemuxer] = [
            OggOpusDemuxer() for _ in range(num_streams)
        ]
        self._queued = [0] * num_streams  # packets ever queued per lane

    def reset_lane(self, b: int) -> None:
        self._celt.reset_lane(b)
        if self._silk is not None:
            self._silk.reset_lane(b)
        if self._hyb is not None:
            self._hyb.reset_lane(b)
        self._kind[b] = None
        self._demux[b] = OggOpusDemuxer()
        self._queued[b] = 0

    def lane_configured(self, b: int) -> bool:
        # an Opus lane can still hit a reroute at any packet (mode
        # switch), so the fleet must keep its replay bytes: never
        # report configured
        return False

    def lane_sample_rate(self, b: int) -> Optional[int]:
        return 48000 if self._demux[b].head is not None else None

    def lane_ready(self, b: int) -> int:
        if self._kind[b] == "silk":
            return self._silk.lane_ready(b)
        if self._kind[b] == "hybrid":
            return self._hyb.lane_ready(b)
        return self._celt.queued(b)

    def push(self, b: int, data: bytes) -> None:
        dm = self._demux[b]
        had_head = dm.head is not None
        pkts = dm.push(data)
        if dm.head is not None and not had_head:
            if dm.head.channels > self.C or dm.head.mapping_family != 0:
                raise OpusLaneUnsupported("unsupported OpusHead")
            self._celt.configure_lane(
                b, dm.head.pre_skip, dm.head.output_gain
            )
            if self._silk is not None:
                self._silk.configure_lane(
                    b, dm.head.pre_skip, dm.head.output_gain
                )
        for pkt in pkts:
            kind, toc, frame = _classify(pkt, self.C)
            if kind is None:
                raise OpusLaneUnsupported("non-20ms/multiframe packet")
            if self._kind[b] is None:
                if kind == "silk" and self._silk is None:
                    raise OpusLaneUnsupported("no native silk batch")
                if kind == "hybrid" and self._hyb is None:
                    raise OpusLaneUnsupported("no native hybrid batch")
                self._kind[b] = kind
            if kind != self._kind[b]:
                raise OpusLaneUnsupported("mid-stream mode switch")
            if kind == "celt":
                # _classify already split the TOC: hand the frame +
                # end band + coded channels straight to the queue (no
                # second split in the decode loop)
                self._celt.push_frame(
                    b, frame, self._celt._band_end_i[toc.bandwidth],
                    2 if toc.stereo else 1)
            elif kind == "hybrid":
                # a transition-redundancy packet at stream START is
                # flagged by the engine at decode time; reroute the
                # lane on its next push (real encoders attach
                # redundancy only to transition packets, which the
                # mode-switch guard above reroutes before decode)
                if self._hyb.lane_error(b):
                    raise OpusLaneUnsupported(self._hyb.lane_error(b))
                self._hyb.push_packet(b, frame, toc.bandwidth,
                                      2 if toc.stereo else 1)
            else:
                # a SILK packet with trailing CELT redundancy only
                # appears at mode/bandwidth switches; the switch
                # packet itself triggers the reroute below, and the
                # replay decodes the redundancy exactly
                bw0 = self._silk.bw[b]
                if bw0 is not None and toc.bandwidth != bw0:
                    raise OpusLaneUnsupported("silk bandwidth switch")
                self._silk.push_packet(b, frame, toc.bandwidth,
                                       2 if toc.stereo else 1)
            self._queued[b] += 1

    def decode_batches(self, n: int, device_out: bool = False):
        """Decode up to ``n`` lockstep packet rounds.

        Returns (pcm, lengths): pcm [rounds, B, C, 960] (device array
        when ``device_out``, valid samples at the END of each slot;
        host array otherwise, valid samples at the START), lengths
        [rounds, B] int32.

        All three engines produce lane-disjoint device slots with
        zeros elsewhere, so the device combine is a pure add — no
        scatters, no host staging."""
        # dispatch every engine's device rounds (async) before any
        # combine/fetch work
        parts = [self._celt.decode_ready(max_packets=n,
                                         device_out=device_out)]
        if self._silk is not None:
            parts.append(self._silk.decode_ready(
                max_packets=n, device_out=device_out))
        if self._hyb is not None:
            parts.append(self._hyb.decode_ready(
                max_packets=n, device_out=device_out))
        R = max(lens.shape[0] for _, lens in parts)
        if R == 0:
            return parts[0]
        lengths = np.zeros((R, self.B), np.int32)
        for _, lens in parts:
            lengths[: lens.shape[0]] += lens
        if device_out:
            import jax.numpy as jnp

            total = None
            for pcm, lens in parts:
                r = lens.shape[0]
                if r == 0:
                    continue
                if r < R:
                    pcm = jnp.concatenate(
                        [pcm, jnp.zeros((R - r, self.B, self.C,
                                         self.FRAME), jnp.float32)],
                        axis=0)
                total = pcm if total is None else total + pcm
            return total, lengths
        out = np.zeros((R, self.B, self.C, self.FRAME), np.float32)
        cpcm, clen = parts[0]
        out[: clen.shape[0]] = cpcm  # celt host slots: valid at START
        for pcm, lens in parts[1:]:
            # silk/hybrid host slots carry valid samples at the END;
            # convert to the host START convention lane-wise
            for i in range(lens.shape[0]):
                for b in np.flatnonzero(lens[i]):
                    m = int(lens[i, b])
                    out[i, b, :, :m] = pcm[i, b, :, self.FRAME - m:]
        return out, lengths
