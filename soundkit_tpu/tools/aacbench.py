"""AAC-LC diagnostic CLI: per-frame quality attribution vs the oracle.

Parity object: the reference's aac-wasm-bench CLI modes
(aac-wasm-bench/src/main.rs:12-70):

  python -m soundkit_tpu.tools.aacbench quality-hotspots [limit]
  python -m soundkit_tpu.tools.aacbench frame-features <idx> [idx...]
  python -m soundkit_tpu.tools.aacbench frame-errors <idx> [idx...]
  python -m soundkit_tpu.tools.aacbench export-soundkit-wav [out.wav]

The candidate is this framework's own AAC-LC decode (host syntax layer
+ device numeric path); the reference decode is the avcodec oracle
(the FDK role).  Fixture override: SOUNDKIT_AAC_FIXTURE env var
(reference analog: SOUNDKIT_AAC_SOURCE_WAV, soundkit-aac-lc/README.md:88).
"""
from __future__ import annotations

import os
import sys

import numpy as np

FIXTURE = os.environ.get(
    "SOUNDKIT_AAC_FIXTURE",
    "/root/reference/golden/aac/A_Tusk_is_used_to_make_costly_gifts_encoded.aac",
)


def _force_cpu() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


def _fixture_aus():
    from soundkit_tpu.codecs.aac_lc import AdtsStream

    data = open(FIXTURE, "rb").read()
    stream = AdtsStream()
    aus = stream.push(data)
    return data, stream, aus


def _decode_ours(data: bytes) -> np.ndarray:
    """[frames, C, 1024] via the production batched path at B=1."""
    from soundkit_tpu.models.aac_lc_batch import BatchedAacLcDecoder

    dec = BatchedAacLcDecoder(1)
    dec.push(0, data)
    pcm = dec.decode_ready()  # [frames, 1, C, 1024]
    return np.asarray(pcm)[:, 0]


def _decode_oracle(data: bytes, channels: int) -> np.ndarray:
    from soundkit_tpu.codecs.avdec import AvDecoder

    av = AvDecoder("aac")
    outs = [av.push(data), av.flush()]
    pcm = np.concatenate(outs)
    n = len(pcm) // channels
    return pcm[: n * channels].reshape(n, channels).T  # [C, samples]


def _per_frame_errors():
    data, stream, aus = _fixture_aus()
    ours = _decode_ours(data)  # [F, C, 1024]
    F, C, _ = ours.shape
    ref = _decode_oracle(data, C)
    # the oracle discards the first (priming) frame; align by searching
    # a small frame offset for minimal error
    flat = ours.transpose(1, 0, 2).reshape(C, -1)
    best = None
    for off_frames in range(0, 3):
        off = off_frames * 1024
        m = min(flat.shape[1] - off, ref.shape[1])
        if m <= 0:
            continue
        err = float(np.sqrt(np.mean((flat[:, off : off + m] - ref[:, :m]) ** 2)))
        if best is None or err < best[0]:
            best = (err, off_frames, m)
    _, off_frames, m = best
    errs = []
    for f in range(F - off_frames):
        a = ours[f + off_frames]
        lo, hi = f * 1024, min((f + 1) * 1024, m)
        if hi <= lo:
            break
        b = ref[:, lo:hi]
        e = a[:, : hi - lo] - b
        rmse = float(np.sqrt(np.mean(e**2)))
        peak = float(np.abs(b).max())
        errs.append((f, rmse, peak, e))
    return errs, aus, off_frames


def quality_hotspots(limit: int) -> None:
    print(f"fixture={os.path.basename(FIXTURE)} mode=quality-hotspots limit={limit}")
    errs, aus, off = _per_frame_errors()
    ranked = sorted(errs, key=lambda t: -t[1])[:limit]
    for f, rmse, peak, _e in ranked:
        snr = 20 * np.log10(max(peak, 1e-9) / max(rmse, 1e-12))
        print(
            f"oracle-vs-soundkit frame={f} rmse={rmse:.3e} peak={peak:.4f} "
            f"snr_db={snr:.1f} au_bytes={len(aus[f]) if f < len(aus) else 0}"
        )


def frame_features(indices) -> None:
    _data, stream, aus = _fixture_aus()
    from soundkit_tpu.codecs.aac_lc import EIGHT_SHORT_SEQUENCE

    for idx in indices:
        f = int(idx)
        if f >= len(aus):
            print(f"frame={f} error=out of range ({len(aus)} AUs)")
            continue
        frame = stream.decoder.decode_au(aus[f])
        el = frame.elements[0]
        feats = []
        for ch, ics in enumerate(el.ics):
            n_tns = sum(len(w) for w in ics.tns)
            feats.append(
                f"ch{ch}:seq={ics.window_sequence}"
                f" shape={ics.window_shape}"
                f" max_sfb={ics.max_sfb}"
                f" short={ics.window_sequence == EIGHT_SHORT_SEQUENCE}"
                f" tns_filters={n_tns}"
                f" global_gain={ics.global_gain}"
            )
        ms = int(np.count_nonzero(el.ms_mask)) if el.ms_mask is not None else 0
        print(
            f"frame={f} kind={el.kind} au_bytes={len(aus[f])} "
            f"ms_lines={ms} " + " ".join(feats)
        )


def frame_errors(indices) -> None:
    errs, _aus, _off = _per_frame_errors()
    by_frame = {f: e for f, _r, _p, e in errs}
    for idx in indices:
        f = int(idx)
        e = by_frame.get(f)
        if e is None:
            print(f"frame={f} error=not decoded")
            continue
        for r0 in range(0, e.shape[1], 256):
            seg = e[:, r0 : r0 + 256]
            print(
                f"oracle-vs-soundkit frame={f} region={r0}-{r0 + seg.shape[1]}"
                f" rmse={float(np.sqrt(np.mean(seg**2))):.3e}"
                f" maxerr={float(np.abs(seg).max()):.3e}"
            )


def export_wav(path: str) -> None:
    from soundkit_tpu.core.audio_types import PcmData
    from soundkit_tpu.core.wav import generate_wav_buffer
    from soundkit_tpu.codecs.aac_lc import SAMPLE_RATES

    data, stream, aus = _fixture_aus()
    ours = _decode_ours(data)  # [F, C, 1024]
    F, C, _ = ours.shape
    planar = [ours[:, c].reshape(-1).astype(np.float32) for c in range(C)]
    rate = SAMPLE_RATES[stream.sr_index]
    wav = generate_wav_buffer(PcmData.f32(planar), rate)
    with open(path, "wb") as fh:
        fh.write(wav)
    print(
        f"wrote={path} frames={F} samples/ch={F * 1024} sr={rate} ch={C}"
    )


def main(argv) -> None:
    _force_cpu()
    if not argv:
        print(__doc__)
        return
    mode = argv[0]
    if mode == "quality-hotspots":
        limit = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 12
        quality_hotspots(limit)
    elif mode == "frame-features":
        frame_features(argv[1:])
    elif mode == "frame-errors":
        frame_errors(argv[1:])
    elif mode == "export-soundkit-wav":
        export_wav(argv[1] if len(argv) > 1 else "soundkit-aac-lc.wav")
    else:
        print(f"unknown mode {mode!r}")
        print(__doc__)


if __name__ == "__main__":
    main(sys.argv[1:])
