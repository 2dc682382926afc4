"""Phase-vocoder time stretch / pitch shift kernel.

TPU-native replacement for the reference's Rubber Band C++ dependency
(soundkit-rubberband{,-sys}; SURVEY.md §2.3 rebuild plan: phase
vocoder + windowed-sinc polyphase as owned kernels).  The algorithm is
fully vectorized (no per-frame Python loop): STFT -> per-bin true
frequency estimation -> cumulative synthesis phase -> ISTFT with
window-squared normalization; pitch shift = stretch by ratio*pitch
then polyphase resample by 1/pitch (ops.resample).

Runs in numpy on the host path; the identical math runs under jnp for
batched device use (rfft/irfft are XLA-supported).
"""
from __future__ import annotations

from fractions import Fraction
from typing import Tuple

import numpy as np

FRAME = 2048
HOP_A = 512


def _princarg(x: np.ndarray) -> np.ndarray:
    return (x + np.pi) % (2 * np.pi) - np.pi


def stretch_channels(channels: np.ndarray, time_ratio: float) -> np.ndarray:
    """Time-stretch planar f32 [C, n] by ``time_ratio`` (>1 = longer).

    Pure phase vocoder; length out ~= n * time_ratio.
    """
    x = np.atleast_2d(np.asarray(channels, dtype=np.float64))
    C, n = x.shape
    if n == 0 or abs(time_ratio - 1.0) < 1e-9:
        return x.astype(np.float32).copy()

    hop_s = max(1, int(round(HOP_A * time_ratio)))
    win = np.hanning(FRAME)

    # analysis frames [C, T, FRAME]
    pad = FRAME + HOP_A * int(np.ceil(n / HOP_A))
    xp = np.pad(x, ((0, 0), (FRAME // 2, pad)))
    T = (xp.shape[1] - FRAME) // HOP_A + 1
    idx = np.arange(FRAME)[None, :] + HOP_A * np.arange(T)[:, None]
    frames = xp[:, idx] * win  # [C, T, FRAME]
    spec = np.fft.rfft(frames, axis=-1)  # [C, T, K]
    K = spec.shape[-1]

    mag = np.abs(spec)
    phase = np.angle(spec)

    # per-bin instantaneous frequency (vectorized over frames)
    omega = 2 * np.pi * np.arange(K) / FRAME  # rad/sample
    dphi = np.diff(phase, axis=1, prepend=phase[:, :1])
    dev = _princarg(dphi - omega[None, None, :] * HOP_A)
    true_freq = omega[None, None, :] + dev / HOP_A  # [C, T, K]

    # synthesis phases: cumulative sum of true_freq * hop_s
    syn_phase = np.cumsum(true_freq * hop_s, axis=1)
    syn_phase += phase[:, :1, :] - syn_phase[:, :1, :]  # anchor first frame

    out_spec = mag * np.exp(1j * syn_phase)
    out_frames = np.fft.irfft(out_spec, n=FRAME, axis=-1) * win

    # overlap-add with window^2 normalization
    out_len = hop_s * (T - 1) + FRAME
    out = np.zeros((C, out_len))
    norm = np.zeros(out_len)
    win2 = win * win
    for t in range(T):  # scatter-add; T is small (n/512)
        out[:, t * hop_s : t * hop_s + FRAME] += out_frames[:, t]
        norm[t * hop_s : t * hop_s + FRAME] += win2
    out /= np.maximum(norm, 1e-8)[None, :]

    target = int(round(n * time_ratio))
    start = FRAME // 2
    out = out[:, start : start + target]
    if out.shape[1] < target:
        out = np.pad(out, ((0, 0), (0, target - out.shape[1])))
    return out.astype(np.float32)


def pitch_ratio_fraction(pitch_scale: float, max_den: int = 64) -> Tuple[int, int]:
    frac = Fraction(pitch_scale).limit_denominator(max_den)
    return frac.numerator, frac.denominator


def stretch_pitch(
    channels: np.ndarray, time_ratio: float, pitch_scale: float
) -> np.ndarray:
    """Combined time stretch + pitch shift.

    Stretch by time_ratio * pitch_scale, then resample by 1/pitch_scale
    so duration = n * time_ratio and pitch moves by pitch_scale.
    """
    from soundkit_tpu.ops import resample as rs

    x = np.atleast_2d(np.asarray(channels, dtype=np.float32))
    if abs(pitch_scale - 1.0) < 1e-9:
        return stretch_channels(x, time_ratio)
    stretched = stretch_channels(x, time_ratio * pitch_scale)
    num, den = pitch_ratio_fraction(pitch_scale)
    # resample rate ratio 1/pitch: in_rate=num, out_rate=den
    out = rs.resample_np(stretched, num * 1000, den * 1000)
    target = int(round(x.shape[1] * time_ratio))
    if out.shape[1] >= target:
        return out[:, :target].astype(np.float32)
    return np.pad(out, ((0, 0), (0, target - out.shape[1]))).astype(np.float32)
