"""Ogg-Opus fleet group: per-lane Ogg demux + batched device CELT.

Extends the serving fleet's batched coverage to Ogg-Opus music
streams: each lane demuxes its Ogg pages on the host
(codecs/opus.OggOpusDemuxer), validates every packet's TOC, and
queues CELT 20 ms packets into the shared ``BatchedCeltDecoder``
(device IMDCT/comb/de-emphasis over all lanes per round, C++ range
decode/PVQ host stage).

Streams the CELT model cannot serve raise :class:`OpusLaneUnsupported`
out of ``push`` so the fleet reroutes them to a per-stream host
pipeline by replaying the stream's raw bytes (the same pattern as the
Vorbis topology reroute).  Because a mode switch can appear at ANY
packet (not just the headers), ``lane_configured`` stays False so the
fleet retains each Opus lane's raw bytes for the lane's lifetime —
the price of guaranteed bit-equal reroutes; speech streams reroute at
their first audio packet, and real Ogg music streams are CELT-only.

Reference role: soundkit-ogg-opus decode inside the per-stream
pipeline (soundkit-decoder/src/lib.rs spawn paths), re-split so the
synthesis FLOPs batch onto the device.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.opus import OggOpusDemuxer
from soundkit_tpu.models.opus_batch import BatchedCeltDecoder


class OpusLaneUnsupported(Exception):
    """This stream needs the host pipeline (SILK/hybrid/odd framing);
    the fleet replays its raw bytes into a per-stream decoder."""


def _toc_servable(packet: bytes, channels: int) -> bool:
    from soundkit_tpu.codecs.opus_core import parse_packet

    if not packet:
        return False
    try:
        toc, frames = parse_packet(packet)
    except Exception:
        return False
    coded = 2 if toc.stereo else 1
    return (toc.mode == "celt" and toc.frame_duration == 20
            and len(frames) == 1 and coded <= channels)


class BatchedOggOpusDecoder:
    """B-lane Ogg-Opus serving model over the device CELT synthesis."""

    FRAME = 960

    def __init__(self, num_streams: int, channels: int = 2):
        self.B = num_streams
        self.C = channels
        self._celt = BatchedCeltDecoder(num_streams, channels)
        self._demux: List[OggOpusDemuxer] = [
            OggOpusDemuxer() for _ in range(num_streams)
        ]
        self._queued = [0] * num_streams  # packets ever queued per lane

    def reset_lane(self, b: int) -> None:
        self._celt.reset_lane(b)
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
        for pkt in pkts:
            if not _toc_servable(pkt, self.C):
                raise OpusLaneUnsupported("non-CELT/non-20ms packet")
            self._celt.push_packet(b, pkt)
            self._queued[b] += 1

    def decode_batches(self, n: int, device_out: bool = False):
        """Decode up to ``n`` lockstep packet rounds.

        Returns (pcm, lengths): pcm [rounds, B, C, 960] (device array
        when ``device_out``, valid samples at the END of each slot;
        host array otherwise, valid samples at the START), lengths
        [rounds, B] int32."""
        return self._celt.decode_ready(max_packets=n,
                                       device_out=device_out)
