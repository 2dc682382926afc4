"""Headline benchmark: aggregate xrealtime batched AAC-LC device decode.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.json): >=1000x aggregate realtime decode per v5e
chip batched over 1024 streams; this measures the flagship batched
AAC-LC device step (dequant + stereo + TNS scan + matmul IMDCT +
windowing + overlap-add) over 512 stereo streams (1024 channel lanes)
on real parsed frames from the golden ADTS fixture.  x-realtime is
computed at 48 kHz (the conservative standard AAC rate; the fixture
itself is 16 kHz, which would triple the number).
"""
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from soundkit_tpu.codecs.aac_lc import AdtsStream
    from soundkit_tpu.ops import aac_batch as ab

    B = 512  # stereo streams -> 1024 channel lanes
    rate = 48000.0

    data = open(
        "/root/reference/golden/aac/A_Tusk_is_used_to_make_costly_gifts_encoded.aac",
        "rb",
    ).read()
    stream = AdtsStream()
    aus = stream.push(data)
    frames = [stream.decoder.decode_au(au) for au in aus[:16]]
    batches = []
    saved, prev_shape = ab.init_state(B)
    for f in frames:
        fb = ab.prepare_frame_batch([f] * B)
        batches.append(
            tuple(
                jnp.asarray(a)
                for a in (fb.quant, fb.scale, fb.ms_mask, fb.int_factor, fb.perm,
                          fb.filt_id, fb.lpc, fb.seq, fb.shape)
            )
        )

    step = jax.jit(ab.aac_decode_frame_device)
    saved = jnp.asarray(saved)
    prev_shape = jnp.asarray(prev_shape)
    chan_valid = jnp.ones((B, 2), dtype=bool)

    # warmup / compile
    pcm, saved_w, prev_w = step(*batches[0], prev_shape, chan_valid, saved)
    pcm.block_until_ready()

    iters = 3
    t0 = time.perf_counter()
    s, p = saved_w, prev_w
    n_frames = 0
    for _ in range(iters):
        for b in batches:
            pcm, s, p = step(*b, p, chan_valid, s)
            n_frames += 1
    pcm.block_until_ready()
    elapsed = time.perf_counter() - t0

    audio_seconds = n_frames * B * 1024 / rate
    x_realtime = audio_seconds / elapsed

    print(
        json.dumps(
            {
                "metric": "aggregate_x_realtime_aac_lc_device_decode_512_streams",
                "value": round(x_realtime, 1),
                "unit": "x_realtime_per_chip_at_48k",
                "vs_baseline": round(x_realtime / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
