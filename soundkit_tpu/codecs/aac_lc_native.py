"""C++ AAC-LC host parser wrapper: AUs -> FrameBatch lanes directly.

Production counterpart of the Python syntax layer (codecs/aac_lc.py —
kept as the executable spec); this path feeds the batched device step
without per-frame Python work.
"""
from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from soundkit_tpu.native.loader import load
from soundkit_tpu.ops.aac_batch import MAX_FILTERS, MAX_ORDER, FrameBatch


class NativeAacError(ValueError):
    pass


def _parse_threads() -> int:
    """Worker threads for the batched compact parse.

    Defaults to the core count (1 on the single-core bench host, so
    the inline path runs and results stay fully deterministic there);
    override with SKT_PARSE_THREADS.  With >1 workers the PNS sign
    noise is drawn from per-worker RNG streams, so PNS band signs
    (not energies) differ from the single-threaded parse.
    """
    import os

    env = os.environ.get("SKT_PARSE_THREADS")
    if env:
        return max(1, int(env))
    return max(1, os.cpu_count() or 1)


class NativeAacParser:
    def __init__(self, sr_index: int):
        self._lib = load()
        self._h = self._lib.skt_aac_new(sr_index)
        self.sr_index = sr_index
        # reusable per-AU scratch
        self._quant = np.zeros((2, 1024), dtype=np.int32)
        self._scale = np.zeros((2, 1024), dtype=np.float32)
        self._perm = np.zeros((2, 1024), dtype=np.int32)
        self._filt = np.zeros((2, 1024), dtype=np.int32)
        self._lpc = np.zeros((2, MAX_FILTERS, MAX_ORDER), dtype=np.float32)
        self._meta = np.zeros(8, dtype=np.int32)
        self._ms = np.zeros(1024, dtype=np.uint8)
        self._intf = np.zeros(1024, dtype=np.float32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.skt_aac_free(self._h)
            self._h = None

    def parse_into(self, au: bytes, fb: FrameBatch, lane: int) -> None:
        """Parse one AU directly into batch lane ``lane``."""
        rc = self._lib.skt_aac_parse_au(
            self._h, bytes(au), len(au),
            self._quant.reshape(-1), self._scale.reshape(-1),
            self._perm.reshape(-1), self._filt.reshape(-1),
            self._lpc.reshape(-1), self._meta, self._ms, self._intf,
        )
        if rc != 0:
            raise NativeAacError(self._lib.skt_aac_error(self._h).decode())
        fb.quant[lane] = self._quant
        fb.scale[lane] = self._scale
        fb.perm[lane] = self._perm
        fb.filt_id[lane] = self._filt
        fb.lpc[lane] = self._lpc
        fb.seq[lane, 0] = self._meta[0]
        fb.shape[lane, 0] = self._meta[1]
        fb.chan_valid[lane, 0] = bool(self._meta[2])
        fb.seq[lane, 1] = self._meta[3]
        fb.shape[lane, 1] = self._meta[4]
        fb.chan_valid[lane, 1] = bool(self._meta[5])
        fb.ms_mask[lane] = self._ms.astype(bool)
        fb.int_factor[lane] = self._intf


def empty_frame_batch(B: int, C: int = 2) -> FrameBatch:
    perm = np.tile(np.arange(1024, dtype=np.int32), (B, C, 1))
    return FrameBatch(
        quant=np.zeros((B, C, 1024), dtype=np.int32),
        scale=np.zeros((B, C, 1024), dtype=np.float32),
        ms_mask=np.zeros((B, 1024), dtype=bool),
        int_factor=np.zeros((B, 1024), dtype=np.float32),
        perm=perm,
        filt_id=np.full((B, C, 1024), -1, dtype=np.int32),
        lpc=np.zeros((B, C, MAX_FILTERS, MAX_ORDER), dtype=np.float32),
        seq=np.zeros((B, C), dtype=np.int32),
        shape=np.zeros((B, C), dtype=np.int32),
        chan_valid=np.zeros((B, C), dtype=bool),
    )


def prepare_frame_batch_native(
    parsers: List[NativeAacParser], aus: List[Optional[bytes]]
) -> FrameBatch:
    """One AU per lane (None = silent lane)."""
    B = len(aus)
    fb = empty_frame_batch(B)
    for i, au in enumerate(aus):
        if au is not None:
            parsers[i].parse_into(au, fb, i)
    return fb


def _parse_batch_into(
    parser: NativeAacParser,
    aus: List[Optional[bytes]],
    fb: FrameBatch,
    chan_valid_u8: np.ndarray,
    ms_u8: np.ndarray,
) -> None:
    """One C call parsing every non-None lane of ``aus`` into ``fb``.

    Lanes passed as None are left untouched (the C side skips them
    before writing defaults), so several calls with disjoint lane
    subsets — one per sample-rate subgroup — compose into one batch.
    """
    B = len(aus)
    blob = bytearray()
    offsets = np.zeros(B, dtype=np.int64)
    lens = np.full(B, -1, dtype=np.int64)
    for i, au in enumerate(aus):
        if au is not None:
            offsets[i] = len(blob)
            lens[i] = len(au)
            blob.extend(au)
    parser._lib.skt_aac_parse_batch(
        parser._h, bytes(blob), offsets, lens, B,
        fb.quant.reshape(-1), fb.scale.reshape(-1), fb.perm.reshape(-1),
        fb.filt_id.reshape(-1), fb.lpc.reshape(-1), fb.seq.reshape(-1),
        fb.shape.reshape(-1), chan_valid_u8.reshape(-1),
        ms_u8.reshape(-1), fb.int_factor.reshape(-1),
    )


def prepare_frame_batch_batched(
    parser: NativeAacParser, aus: List[Optional[bytes]]
) -> FrameBatch:
    """All lanes in ONE C call (no per-AU Python overhead)."""
    B = len(aus)
    fb = empty_frame_batch(B)
    chan_valid_u8 = np.zeros((B, 2), dtype=np.uint8)
    ms_u8 = np.zeros((B, 1024), dtype=np.uint8)
    _parse_batch_into(parser, aus, fb, chan_valid_u8, ms_u8)
    fb.chan_valid[:] = chan_valid_u8.astype(bool)
    fb.ms_mask[:] = ms_u8.astype(bool)
    return fb


def prepare_frame_batch_grouped(
    parsers: dict,
    lane_sr: List[Optional[int]],
    aus: List[Optional[bytes]],
) -> FrameBatch:
    """Mixed-rate batch: one C call per distinct sr_index subgroup.

    ``parsers`` maps sr_index -> NativeAacParser; ``lane_sr[i]`` is the
    sr_index of lane i's stream. The scalefactor-band tables the parser
    uses depend on sr_index, so lanes must be parsed by a parser built
    for THEIR rate — the single-parser path mis-banded any lane whose
    rate differed from the first stream's. Single-rate groups still
    take exactly one C call.
    """
    B = len(aus)
    fb = empty_frame_batch(B)
    chan_valid_u8 = np.zeros((B, 2), dtype=np.uint8)
    ms_u8 = np.zeros((B, 1024), dtype=np.uint8)
    for sr, parser in parsers.items():
        sub = [
            au if (au is not None and lane_sr[i] == sr) else None
            for i, au in enumerate(aus)
        ]
        if any(a is not None for a in sub):
            _parse_batch_into(parser, sub, fb, chan_valid_u8, ms_u8)
    fb.chan_valid[:] = chan_valid_u8.astype(bool)
    fb.ms_mask[:] = ms_u8.astype(bool)
    return fb


def _alloc_compact(B: int):
    from soundkit_tpu.ops.aac_batch import CompactFrameBatch

    cb = CompactFrameBatch(
        quant=np.zeros((B, 2, 1024), dtype=np.int16),
        line_sf=np.zeros((B, 2, 1024), dtype=np.uint8),
        is_pos=np.zeros((B, 1024), dtype=np.int8),
        is_sign=np.zeros((B, 1024), dtype=np.int8),
        ms_mask=np.zeros((B, 1024), dtype=np.uint8),
        regions=np.zeros((B, 2, MAX_FILTERS, 3), dtype=np.int16),
        lpc=np.zeros((B, 2, MAX_FILTERS, MAX_ORDER), dtype=np.float32),
        seq=np.zeros((B, 2), dtype=np.int32),
        shape=np.zeros((B, 2), dtype=np.int32),
        chan_valid=np.zeros((B, 2), dtype=np.uint8),
    )
    return cb


class CompactBatchWorkspace:
    """Wire-buffer provider for the serving hot path.

    This intentionally allocates FRESH arrays per batch.  An earlier
    version rotated a fixed pool, but jnp.asarray/jnp.array may defer
    the host read into the async dispatch stream (measured on the CPU
    backend: a source buffer mutated after the call corrupts the
    in-flight value), so reusing a buffer that a previous batch's
    transfer might still read is a race.  Allocation is ~0.3 ms at
    B=512 — noise next to the ~10 ms parse — so safety wins.
    """

    def __init__(self, B: int, depth: int = 3):
        self.B = B

    def next(self):
        return _alloc_compact(self.B)


def prepare_compact_batch(
    parser: NativeAacParser,
    aus: List[Optional[bytes]],
    workspace: Optional[CompactBatchWorkspace] = None,
):
    """Compact wire form for bandwidth-bound host->device links.

    Returns (CompactFrameBatch, overflow: bool); when overflow is True
    some |quant| exceeded int16 (pathological escapes) and the caller
    should use prepare_frame_batch_batched for this batch instead.
    Pass a ``CompactBatchWorkspace`` on hot loops to skip allocation.
    """
    B = len(aus)
    blob = bytearray()
    offsets = np.zeros(B, dtype=np.int64)
    lens = np.full(B, -1, dtype=np.int64)
    for i, au in enumerate(aus):
        if au is not None:
            offsets[i] = len(blob)
            lens[i] = len(au)
            blob.extend(au)
    if workspace is not None:
        if workspace.B != B:
            raise NativeAacError(f"workspace B={workspace.B}, batch B={B}")
        cb = workspace.next()
    else:
        cb = _alloc_compact(B)
    overflow = np.zeros(1, dtype=np.int32)
    parser._lib.skt_aac_parse_batch_compact(
        parser._h, bytes(blob), offsets, lens, B,
        cb.quant.reshape(-1), cb.line_sf.reshape(-1),
        cb.is_pos.reshape(-1), cb.is_sign.reshape(-1),
        cb.ms_mask.reshape(-1), cb.regions.reshape(-1), cb.lpc.reshape(-1),
        cb.seq.reshape(-1), cb.shape.reshape(-1),
        cb.chan_valid.reshape(-1), overflow,
    )
    return cb, bool(overflow[0])


def prepare_compact_batch_packed(
    parser: NativeAacParser, aus: List[Optional[bytes]]
):
    """Compact wire in ONE packed uint8 buffer (one host->device
    transfer instead of ten; see ops.aac_batch.compact_wire_layout).

    Returns (buf uint8[total], overflow: bool). The buffer is freshly
    allocated per batch — async transfers may read it after dispatch,
    so it must never be pooled (see CompactBatchWorkspace docstring).
    Decode with ops.aac_batch.aac_decode_frame_device_compact_packed.
    """
    from soundkit_tpu.ops.aac_batch import compact_wire_layout

    B = len(aus)
    layout, total = compact_wire_layout(B)
    # Every lane field is written by the C side when all lanes are
    # active, so skip the 10+ MB zero-fill in the common case (silent
    # lanes must see pre-zeroed wire, so keep zeros for those).
    all_active = all(au is not None for au in aus)
    buf = (np.empty if all_active else np.zeros)(total, dtype=np.uint8)
    views = {
        name: buf[off : off + int(np.prod(shp)) * np.dtype(dt).itemsize]
        .view(dt)
        .reshape(-1)
        for name, off, dt, shp in layout
    }
    # pointer-array entry: no concatenated blob copy; the bytes objects
    # are borrowed for the duration of the (GIL-released) C call only
    ptrs = (ctypes.c_char_p * B)()
    lens = np.empty(B, dtype=np.int64)
    for i, au in enumerate(aus):
        if au is not None:
            ptrs[i] = au
            lens[i] = len(au)
        else:
            lens[i] = -1
    overflow = np.zeros(1, dtype=np.int32)
    parser._lib.skt_aac_parse_batch_compact_ptrs(
        parser._h, ptrs, lens, B, _parse_threads(),
        views["quant"], views["line_sf"], views["is_pos"], views["is_sign"],
        views["ms_mask"], views["regions"], views["lpc"],
        views["seq"], views["shape"], views["chan_valid"], overflow,
    )
    return buf, bool(overflow[0])


def _v3_views(buf: np.ndarray, B: int) -> dict:
    from soundkit_tpu.ops.aac_batch import v3_wire_layout

    layout, _total = v3_wire_layout(B)
    return {
        name: buf[off : off + int(np.prod(shp)) * np.dtype(dt).itemsize]
        .view(dt)
        .reshape(-1)
        for name, off, dt, shp in layout
    }


def _v3_args(views: dict):
    return (
        views["esc_idx"], views["esc_val"], views["regions"], views["quant"],
        views["sf_len"], views["sf_val"], views["msis_len"], views["msis_ms"],
        views["msis_pos"], views["msis_sign"], views["refl"], views["crb"],
        views["order"], views["seq"], views["shape"], views["chan_valid"],
    )


def prepare_v3_batch_packed(
    parser: NativeAacParser, aus: List[Optional[bytes]]
):
    """v3 packed wire: ~3.6 KB/lane (i8 quant + escapes, RLE sf/MS/
    intensity, raw TNS reflection indices).  Returns (buf uint8[total],
    overflow: bool); on overflow (escape budget / run tables exceeded,
    or |quant| > 32767) the affected lanes are zeroed and the caller
    should re-parse the batch through the compact path.  Decode with
    ops.aac_batch.aac_decode_frame_device_v3_packed.  Never pool the
    buffer (async transfers may read it after dispatch)."""
    from soundkit_tpu.ops.aac_batch import v3_wire_layout

    B = len(aus)
    _layout, total = v3_wire_layout(B)
    all_active = all(au is not None for au in aus)
    buf = (np.empty if all_active else np.zeros)(total, dtype=np.uint8)
    if not all_active:
        # silent lanes must read as "no escapes" on device
        _v3_views(buf, B)["esc_idx"][:] = 0xFFFF
    views = _v3_views(buf, B)
    ptrs = (ctypes.c_char_p * B)()
    lens = np.empty(B, dtype=np.int64)
    for i, au in enumerate(aus):
        if au is not None:
            ptrs[i] = au
            lens[i] = len(au)
        else:
            lens[i] = -1
    overflow = np.zeros(1, dtype=np.int32)
    parser._lib.skt_aac_parse_batch_v3_ptrs(
        parser._h, ptrs, lens, B, _parse_threads(), *_v3_args(views), overflow
    )
    return buf, bool(overflow[0])


def _v4_views(buf: np.ndarray, B: int) -> dict:
    from soundkit_tpu.ops.aac_batch import v4_wire_layout

    layout, _total = v4_wire_layout(B)
    return {
        name: buf[off : off + int(np.prod(shp)) * np.dtype(dt).itemsize]
        .view(dt)
        .reshape(-1)
        for name, off, dt, shp in layout
    }


def prepare_v4_batch_packed(
    parser: NativeAacParser, aus: List[Optional[bytes]]
):
    """v4 packed wire (~1.9 KB/lane): raw AU bytes + section program;
    the spectral Huffman decode runs ON DEVICE
    (ops.aac_batch.aac_decode_frame_device_v4_packed + the
    ops.aac_entropy interpreter).  The host walks spectral bits
    length-only — no value decode, no quant conversion.

    Returns (buf uint8[total], max_steps, overflow: bool); on overflow
    (PNS/pulse content, run table exceeded, AU > cap) the affected
    lanes are zeroed and the caller should re-parse through the v3
    path.  jit the device step with static max_steps."""
    from soundkit_tpu.ops.aac_batch import v4_wire_layout

    B = len(aus)
    _layout, total = v4_wire_layout(B)
    all_active = all(au is not None for au in aus)
    buf = (np.empty if all_active else np.zeros)(total, dtype=np.uint8)
    views = _v4_views(buf, B)
    ptrs = (ctypes.c_char_p * B)()
    lens = np.empty(B, dtype=np.int64)
    for i, au in enumerate(aus):
        if au is not None:
            ptrs[i] = au
            lens[i] = len(au)
        else:
            lens[i] = -1
    overflow = np.zeros(1, dtype=np.int32)
    max_cw = np.zeros(1, dtype=np.int32)
    parser._lib.skt_aac_parse_batch_v4_ptrs(
        parser._h, ptrs, lens, B, _parse_threads(),
        views["regions"], views["sf_len"], views["sf_val"],
        views["msis_len"], views["msis_ms"], views["msis_pos"],
        views["msis_sign"], views["refl"], views["crb"], views["order"],
        views["runs"], views["n_runs"], views["spec_bit"],
        views["pns"].view(np.uint8),
        views["seq"], views["shape"], views["chan_valid"], views["au"],
        max_cw, overflow,
    )
    # static scan length, bucketed so jit caches stay warm across
    # batches (computed by the C entry: worst lane's codeword total)
    max_steps = max((int(max_cw[0]) + 63) // 64 * 64, 64)
    return buf, max_steps, bool(overflow[0])


def prepare_v3_batch_packed_grouped(
    parsers: dict,
    lane_sr: List[Optional[int]],
    aus: List[Optional[bytes]],
):
    """v3 packed wire for mixed-rate groups: one C call per distinct
    sr_index subgroup into the same pre-zeroed buffer."""
    from soundkit_tpu.ops.aac_batch import v3_wire_layout

    B = len(aus)
    _layout, total = v3_wire_layout(B)
    buf = np.zeros(total, dtype=np.uint8)
    views = _v3_views(buf, B)
    views["esc_idx"][:] = 0xFFFF
    overflow = np.zeros(1, dtype=np.int32)
    any_overflow = False
    for sr, parser in parsers.items():
        blob = bytearray()
        offsets = np.zeros(B, dtype=np.int64)
        lens = np.full(B, -1, dtype=np.int64)
        hit = False
        for i, au in enumerate(aus):
            if au is not None and lane_sr[i] == sr:
                offsets[i] = len(blob)
                lens[i] = len(au)
                blob.extend(au)
                hit = True
        if not hit:
            continue
        parser._lib.skt_aac_parse_batch_v3(
            parser._h, bytes(blob), offsets, lens, B, *_v3_args(views), overflow
        )
        any_overflow |= bool(overflow[0])
    return buf, any_overflow


def prepare_compact_batch_packed_grouped(
    parsers: dict,
    lane_sr: List[Optional[int]],
    aus: List[Optional[bytes]],
):
    """Packed compact wire for mixed-rate groups: one C call per
    distinct sr_index subgroup into the SAME pre-zeroed buffer (the C
    side skips silent lanes without writing defaults).

    Returns (buf uint8[total], overflow: bool).
    """
    from soundkit_tpu.ops.aac_batch import compact_wire_layout

    B = len(aus)
    layout, total = compact_wire_layout(B)
    buf = np.zeros(total, dtype=np.uint8)
    views = {
        name: buf[off : off + int(np.prod(shp)) * np.dtype(dt).itemsize]
        .view(dt)
        .reshape(-1)
        for name, off, dt, shp in layout
    }
    overflow = np.zeros(1, dtype=np.int32)
    any_overflow = False
    for sr, parser in parsers.items():
        blob = bytearray()
        offsets = np.zeros(B, dtype=np.int64)
        lens = np.full(B, -1, dtype=np.int64)
        hit = False
        for i, au in enumerate(aus):
            if au is not None and lane_sr[i] == sr:
                offsets[i] = len(blob)
                lens[i] = len(au)
                blob.extend(au)
                hit = True
        if not hit:
            continue
        parser._lib.skt_aac_parse_batch_compact(
            parser._h, bytes(blob), offsets, lens, B,
            views["quant"], views["line_sf"], views["is_pos"],
            views["is_sign"], views["ms_mask"], views["regions"],
            views["lpc"], views["seq"], views["shape"],
            views["chan_valid"], overflow,
        )
        any_overflow |= bool(overflow[0])
    return buf, any_overflow
