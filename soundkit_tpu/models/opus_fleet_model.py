"""Ogg-Opus fleet group: per-lane Ogg demux + two batched engines.

Extends the serving fleet's batched coverage to Ogg-Opus streams:
each lane demuxes its Ogg pages on the host
(codecs/opus.OggOpusDemuxer), validates every packet's TOC, and is
classified by its first audio packet:

- CELT 20 ms (music) lanes queue into the shared
  ``BatchedCeltDecoder`` (device IMDCT/comb/de-emphasis over all
  lanes per round, C++ range decode/PVQ host stage);
- SILK 20 ms (voice) lanes queue into ``BatchedSilkDecoder`` (one
  C++ skt_silk_decode_many call per round + per-lane oracle-matched
  resampling).  Its host PCM is scattered into the CELT engine's
  device array per round, so the fleet's device_out/i16 collect path
  is identical for both.

Streams neither engine can serve (hybrid, multi-frame packets,
mid-stream bandwidth or mode switches) raise
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
    BatchedSilkDecoder,
)


class OpusLaneUnsupported(Exception):
    """This stream needs the host pipeline (hybrid/odd framing/mode
    switches); the fleet replays its raw bytes into a per-stream
    decoder."""


def _classify(packet: bytes, channels: int):
    """(kind, toc, frame) for a servable packet, else (None, ..)."""
    from soundkit_tpu.codecs.opus_core import parse_packet

    if not packet:
        return None, None, None
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
    return None, None, None


class BatchedOggOpusDecoder:
    """B-lane Ogg-Opus serving model over the device CELT synthesis."""

    FRAME = 960

    def __init__(self, num_streams: int, channels: int = 2):
        self.B = num_streams
        self.C = channels
        self._celt = BatchedCeltDecoder(num_streams, channels)
        try:
            self._silk: Optional[BatchedSilkDecoder] = \
                BatchedSilkDecoder(num_streams, channels)
        except Exception:
            self._silk = None  # no native lib: voice lanes reroute
        self._kind: List[Optional[str]] = [None] * num_streams
        self._demux: List[OggOpusDemuxer] = [
            OggOpusDemuxer() for _ in range(num_streams)
        ]
        self._queued = [0] * num_streams  # packets ever queued per lane

    def reset_lane(self, b: int) -> None:
        self._celt.reset_lane(b)
        if self._silk is not None:
            self._silk.reset_lane(b)
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
        return len(self._celt._packets[b])

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
                raise OpusLaneUnsupported("non-20ms/hybrid packet")
            if self._kind[b] is None:
                if kind == "silk" and self._silk is None:
                    raise OpusLaneUnsupported("no native silk batch")
                self._kind[b] = kind
            if kind != self._kind[b]:
                raise OpusLaneUnsupported("mid-stream mode switch")
            if kind == "celt":
                self._celt.push_packet(b, pkt)
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
        [rounds, B] int32."""
        # dispatch the device CELT rounds first (async), then decode
        # the SILK lanes on the host while the device works
        cpcm, clen = self._celt.decode_ready(max_packets=n,
                                             device_out=device_out)
        if self._silk is None:
            return cpcm, clen
        spcm, slen = self._silk.decode_ready(max_packets=n)
        rc, rs = clen.shape[0], slen.shape[0]
        R = max(rc, rs)
        if R == 0:
            return cpcm, clen
        lengths = np.zeros((R, self.B), np.int32)
        lengths[:rc] = clen
        if rs:
            lengths[:rs] += slen
        silk_lanes = [b for b in range(self.B)
                      if self._kind[b] == "silk"
                      and rs and slen[:, b].any()]
        if device_out:
            import jax.numpy as jnp

            if rc < R:
                pad = jnp.zeros((R - rc, self.B, self.C, self.FRAME),
                                jnp.float32)
                cpcm = (jnp.concatenate([cpcm, pad], axis=0)
                        if rc else pad)
            if silk_lanes:
                idx = np.asarray(silk_lanes)
                host = np.zeros((R, len(idx), self.C, self.FRAME),
                                np.float32)
                host[:rs] = spcm[:, idx]
                cpcm = cpcm.at[:, idx].set(jnp.asarray(host))
            return cpcm, lengths
        out = np.zeros((R, self.B, self.C, self.FRAME), np.float32)
        out[:rc] = cpcm
        for b in silk_lanes:
            for i in range(rs):
                m = int(slen[i, b])
                if m > 0:
                    # host convention: valid samples at the START
                    out[i, b, :, :m] = spcm[i, b, :, self.FRAME - m:]
        return out, lengths
