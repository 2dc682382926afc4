"""Batched multi-stream Ogg Vorbis decoder.

Stream-batch data parallelism over N concurrent Ogg Vorbis streams:
host entropy decode (codecs/vorbis_core.py) emits per-packet spectra;
ONE jitted device step (ops/vorbis_batch.py) runs IMDCT + window +
overlap-add for all lanes in lockstep, carrying per-lane lap state.
Replaces the reference's one-decoder-per-stream design
(soundkit-vorbis/src/lib.rs:289) the same way models/aac_lc_batch.py
replaces thread-per-pipeline.

All lanes must share the (blocksize0, blocksize1, channels) topology
(one compiled step per topology; mixed fleets use one model instance
per group, like the AAC model's per-sample-rate parser groups).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from soundkit_tpu.codecs.vorbis_core import VorbisSetup
from soundkit_tpu.demux.ogg import OggPacketizer
from soundkit_tpu.ops import vorbis_batch as vb


class TopologyMismatch(ValueError):
    """A lane's stream headers disagree with the model topology.

    Raised from ``push`` at header-parse time; callers that multiplex
    arbitrary streams (models/fleet.py) catch this, free the lane, and
    reroute the stream to a per-stream host decoder."""


class _Lane:
    def __init__(self) -> None:
        self.pkts = OggPacketizer()
        self.headers: List[bytes] = []
        self.setup: Optional[VorbisSetup] = None
        self.queue: List = []  # decoded spectra
        self.primed = False


class BatchedVorbisDecoder:
    def __init__(self, num_streams: int):
        self.B = num_streams
        self._lanes = [_Lane() for _ in range(num_streams)]
        self._step = None
        self._topology = None  # (n0, n1, channels)
        self._state = None  # device [B, C, n1//2] lap carry
        self._cflag = None  # host [B] previous-block-size flags

    def push(self, stream_idx: int, data: bytes) -> None:
        lane = self._lanes[stream_idx]
        for packet, _g in lane.pkts.push(data):
            if lane.setup is None:
                lane.headers.append(packet)
                if len(lane.headers) == 3:
                    lane.setup = VorbisSetup(lane.headers[0], lane.headers[2])
                    topo = (
                        lane.setup.blocksize0,
                        lane.setup.blocksize1,
                        lane.setup.channels,
                    )
                    if self._topology is None:
                        self._topology = topo
                    elif topo != self._topology:
                        # leave the lane unconfigured so a later
                        # reset_lane/alloc starts clean
                        lane.setup = None
                        lane.headers = []
                        raise TopologyMismatch(
                            f"lane {stream_idx} topology {topo} != model "
                            f"topology {self._topology}"
                        )
                continue
            spec = lane.setup.decode_packet_spectrum(packet)
            if spec is not None:
                lane.queue.append(spec)

    @property
    def ready_frames(self) -> int:
        return min(len(lane.queue) for lane in self._lanes)

    def decode_batches(
        self, n_batches: int, device_out: bool = False
    ) -> List:
        """Decode ``n_batches`` lockstep packets.

        Default: per-lane host PCM arrays [C, samples] concatenated
        over the batches.  Lanes with empty queues decode nothing that
        step (state frozen).

        ``device_out=True`` skips the d2h PCM fetch entirely and
        returns ``(outs, lens)`` where ``outs`` is a list of
        ``n_batches`` device arrays [B, C, n1//2] and ``lens`` a host
        [n_batches, B] int array of valid lengths — for callers that
        keep post-processing on device (the fetch of a [1024, C, 1024]
        f32 buffer crosses the tunnel's d2h stall cliff).

        The carry_flag (previous block size per lane) is pure host
        bookkeeping — new_flag = n_flag where a packet arrived — so it
        lives host-side; only the f32 lap carry stays on device.
        """
        import jax
        import jax.numpy as jnp

        from soundkit_tpu.utils.wire import from_device_chunked

        if self._topology is None:
            if device_out:
                return [], np.zeros((0, self.B), dtype=np.int32)
            return [np.zeros((0, 0)) for _ in range(self.B)]
        n0, n1, C = self._topology
        h1 = n1 // 2
        if self._step is None:
            self._step = jax.jit(
                lambda *a: vb.vorbis_synth_step(*a, n0=n0, n1=n1)
            )
            carry, cflag = vb.init_state(self.B, C, n1)
            self._state = jnp.asarray(carry)
            self._cflag = cflag  # host-side, never round-tripped

        outs = [[] for _ in range(self.B)]
        dev_outs: List = []
        dev_lens: List[np.ndarray] = []
        for _ in range(n_batches):
            spec = np.zeros((self.B, C, h1), dtype=np.float32)
            n_flag = np.ones(self.B, dtype=np.int32)
            pf = np.ones(self.B, dtype=np.int32)
            nf = np.ones(self.B, dtype=np.int32)
            valid = np.zeros(self.B, dtype=bool)
            primed = np.zeros(self.B, dtype=bool)
            cflag_host = self._cflag
            for b, lane in enumerate(self._lanes):
                primed[b] = lane.primed
                if not lane.queue:
                    continue
                s = lane.queue.pop(0)
                valid[b] = True
                half = s.n // 2
                spec[b, :, :half] = s.spectrum.astype(np.float32)
                n_flag[b] = 1 if s.n == n1 else 0
                pf[b] = s.prev_flag
                nf[b] = s.next_flag
                if not lane.primed:
                    # prime: treat prev block as same-size (d = n/2)
                    cflag_host[b] = n_flag[b]
                    lane.primed = True
            out, out_len, carry, _ = self._step(
                jnp.asarray(spec), jnp.asarray(n_flag), jnp.asarray(pf),
                jnp.asarray(nf), jnp.asarray(valid), jnp.asarray(primed),
                self._state, jnp.asarray(cflag_host),
            )
            self._state = carry
            # host mirror of the step's new_carry_flag
            self._cflag = np.where(valid, n_flag, cflag_host).astype(np.int32)
            # host-computable lengths: no device fetch needed
            prev_n = np.where(cflag_host == 1, n1, n0)
            cur_n = np.where(n_flag == 1, n1, n0)
            len_np = np.where(valid & primed, prev_n // 4 + cur_n // 4, 0)
            del out_len  # device twin of len_np
            if device_out:
                dev_outs.append(out)
                dev_lens.append(len_np)
                continue
            mx = int(len_np.max()) if len_np.size else 0
            if mx == 0:
                continue
            out_np = from_device_chunked(out[..., :mx])
            for b in range(self.B):
                if len_np[b] > 0:
                    outs[b].append(out_np[b, :, : len_np[b]])
        if device_out:
            lens = (
                np.stack(dev_lens)
                if dev_lens
                else np.zeros((0, self.B), dtype=np.int32)
            )
            return dev_outs, lens
        return [
            np.concatenate(o, axis=-1) if o else np.zeros((C, 0))
            for o in outs
        ]

    def decode_ready(self) -> List[np.ndarray]:
        return self.decode_batches(self.ready_frames)

    # -- fleet group interface (models/fleet.py) ---------------------------

    def lane_ready(self, b: int) -> int:
        return len(self._lanes[b].queue)

    def lane_configured(self, b: int) -> bool:
        """True once lane ``b``'s headers parsed and matched the model
        topology (past the point where TopologyMismatch can raise)."""
        return self._lanes[b].setup is not None

    def lane_sample_rate(self, b: int) -> Optional[int]:
        setup = self._lanes[b].setup
        return setup.sample_rate if setup else None

    def reset_lane(self, b: int) -> None:
        """Recycle lane ``b``: fresh Ogg/header state and zeroed device
        lap carry, so no audio bleeds from the previous occupant.  The
        new stream must share the group topology (blocksizes/channels);
        a mismatch raises at header parse."""
        self._lanes[b] = _Lane()
        if self._state is not None:
            self._state = self._state.at[b].set(0.0)
            self._cflag[b] = 1
