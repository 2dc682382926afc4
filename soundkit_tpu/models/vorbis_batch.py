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
        self._state = None

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
                        raise ValueError(
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

    def decode_batches(self, n_batches: int) -> List[np.ndarray]:
        """Decode ``n_batches`` lockstep packets; returns per-lane PCM
        arrays [C, samples] concatenated over the batches.  Lanes with
        empty queues decode nothing that step (state frozen)."""
        import jax
        import jax.numpy as jnp

        if self._topology is None:
            return [np.zeros((0, 0)) for _ in range(self.B)]
        n0, n1, C = self._topology
        h1 = n1 // 2
        if self._step is None:
            self._step = jax.jit(
                lambda *a: vb.vorbis_synth_step(*a, n0=n0, n1=n1)
            )
            carry, cflag = vb.init_state(self.B, C, n1)
            self._state = (jnp.asarray(carry), jnp.asarray(cflag))

        outs = [[] for _ in range(self.B)]
        for _ in range(n_batches):
            spec = np.zeros((self.B, C, h1), dtype=np.float32)
            n_flag = np.ones(self.B, dtype=np.int32)
            pf = np.ones(self.B, dtype=np.int32)
            nf = np.ones(self.B, dtype=np.int32)
            valid = np.zeros(self.B, dtype=bool)
            primed = np.zeros(self.B, dtype=bool)
            carry, cflag = self._state
            cflag_host = np.array(cflag)  # mutable copy
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
            out, out_len, carry, cflag = self._step(
                jnp.asarray(spec), jnp.asarray(n_flag), jnp.asarray(pf),
                jnp.asarray(nf), jnp.asarray(valid), jnp.asarray(primed),
                carry, jnp.asarray(cflag_host),
            )
            self._state = (carry, cflag)
            out_np = np.asarray(out)
            len_np = np.asarray(out_len)
            for b in range(self.B):
                if len_np[b] > 0:
                    outs[b].append(out_np[b, :, : len_np[b]])
        return [
            np.concatenate(o, axis=-1) if o else np.zeros((C, 0))
            for o in outs
        ]

    def decode_ready(self) -> List[np.ndarray]:
        return self.decode_batches(self.ready_frames)

    # -- fleet group interface (models/fleet.py) ---------------------------

    def lane_ready(self, b: int) -> int:
        return len(self._lanes[b].queue)

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
            carry, cflag = self._state
            self._state = (carry.at[b].set(0.0), cflag.at[b].set(1))
