"""Headline benchmark: aggregate xrealtime batched decode per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.json): >=1000x aggregate realtime decode per v5e
chip batched over 1024 streams.  vs_baseline = value / 1000.

Currently measures the G.711 mu-law batched device path (BASELINE
config 1); will move to the FLAC/MP3/AAC-LC composite as those device
paths land.
"""
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from soundkit_tpu.ops import companding as comp

    streams = 1024
    seconds_per_step = 10.0
    rate = 8000
    n = int(rate * seconds_per_step)  # u-law bytes per stream per step

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 256, size=(streams, n), dtype=np.uint8))

    fn = jax.jit(comp.decode_mulaw)
    fn(codes).block_until_ready()  # compile

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(codes).block_until_ready()
    elapsed = time.perf_counter() - t0

    audio_seconds = streams * seconds_per_step * iters
    x_realtime = audio_seconds / elapsed

    print(
        json.dumps(
            {
                "metric": "aggregate_x_realtime_g711_decode_1024_streams",
                "value": round(x_realtime, 1),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(x_realtime / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
