"""Fuzz the C++ host parsers (AAC/MP3/FLAC/GSM/ALAC) for crash-safety.

Serving ingests hostile bytes; the parsers must reject malformed
input without memory errors.  This harness builds an
AddressSanitizer-instrumented copy of the native library, loads it in
a subprocess (LD_PRELOAD=libasan), and drives each parser with
byte-mutated copies of the real fixtures plus pure random data.  Any
ASAN report or signal fails the run.

Usage:  python soundkit_tpu/native/tools/fuzz_parsers.py [iterations]
"""
from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

NATIVE = Path(__file__).resolve().parent.parent
REPO = NATIVE.parent.parent
ASAN_LIB = NATIVE / "libsoundkit_host_asan.so"

WORKER = r"""
import ctypes, random, sys
import numpy as np

lib = ctypes.CDLL(sys.argv[1])
seed = int(sys.argv[2]); iters = int(sys.argv[3])
rng = random.Random(seed)

lib.skt_aac_new.restype = ctypes.c_void_p
lib.skt_aac_new.argtypes = [ctypes.c_int]
lib.skt_mp3_new.restype = ctypes.c_void_p
lib.skt_flac_new.restype = ctypes.c_void_p
# without argtypes ctypes truncates 64-bit handles to int -> fake crash
lib.skt_aac_free.argtypes = [ctypes.c_void_p]
lib.skt_mp3_free.argtypes = [ctypes.c_void_p]
lib.skt_flac_free.argtypes = [ctypes.c_void_p]
from numpy.ctypeslib import ndpointer
i16p = ndpointer(np.int16, flags="C_CONTIGUOUS")
i32p = ndpointer(np.int32, flags="C_CONTIGUOUS")
u8p = ndpointer(np.uint8, flags="C_CONTIGUOUS")
i8p = ndpointer(np.int8, flags="C_CONTIGUOUS")
f32p = ndpointer(np.float32, flags="C_CONTIGUOUS")

lib.skt_aac_parse_batch_compact.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p,
    ndpointer(np.int64, flags="C_CONTIGUOUS"), ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ctypes.c_int, i16p, u8p, i8p, i8p, u8p, i16p, f32p, i32p, i32p, u8p, i32p]
lib.skt_mp3_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
lib.skt_mp3_push.restype = ctypes.c_long
lib.skt_mp3_pop.argtypes = [ctypes.c_void_p, i16p, i16p, i32p]
lib.skt_flac_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
lib.skt_flac_feed.restype = ctypes.c_int
lib.skt_flac_next_parts.argtypes = [ctypes.c_void_p, i32p, i32p, i32p, ctypes.c_long]
lib.skt_flac_next_parts.restype = ctypes.c_int
lib.skt_flac_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
lib.skt_flac_push.restype = ctypes.c_int
lib.skt_flac_pull.argtypes = [ctypes.c_void_p, i32p, ctypes.c_long]
lib.skt_flac_pull.restype = ctypes.c_long
lib.skt_gsm_new.restype = ctypes.c_void_p
lib.skt_gsm_new.argtypes = [ctypes.c_int]
lib.skt_gsm_free.argtypes = [ctypes.c_void_p]
lib.skt_gsm_decode.restype = ctypes.c_long
lib.skt_gsm_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, i16p]
lib.skt_alac_new.restype = ctypes.c_void_p
lib.skt_alac_new.argtypes = [ctypes.c_char_p, ctypes.c_long]
lib.skt_alac_free.argtypes = [ctypes.c_void_p]
lib.skt_alac_frame_length.restype = ctypes.c_long
lib.skt_alac_frame_length.argtypes = [ctypes.c_void_p]
lib.skt_alac_channels.restype = ctypes.c_int
lib.skt_alac_channels.argtypes = [ctypes.c_void_p]
lib.skt_alac_decode.restype = ctypes.c_long
lib.skt_alac_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, i32p]

corpora = {
    "aac": open("/root/reference/golden/aac/A_Tusk_is_used_to_make_costly_gifts_encoded.aac","rb").read(),
    "mp3": open("/root/reference/testdata/mp3/A_Tusk_is_used_to_make_costly_gifts.mp3","rb").read(),
    "flac": open("/root/reference/testdata/flac/A_Tusk_is_used_to_make_costly_gifts.flac","rb").read(),
    "gsm": open("/root/reference/testdata/gsm/A_Tusk_is_used_to_make_costly_gifts.gsm","rb").read(),
    "alac": open("/root/reference/testdata/alac/A_Tusk_is_used_to_make_costly_gifts.m4a","rb").read(),
}

def mutate(data: bytes) -> bytes:
    b = bytearray(data)
    mode = rng.randrange(5)
    if mode == 0:  # random byte flips
        for _ in range(rng.randrange(1, 64)):
            b[rng.randrange(len(b))] = rng.randrange(256)
    elif mode == 1:  # truncate
        b = b[: rng.randrange(1, len(b))]
    elif mode == 2:  # splice two offsets
        i, j = sorted(rng.randrange(len(b)) for _ in range(2))
        b = b[:i] + b[j:]
    elif mode == 3:  # pure random
        b = bytearray(rng.randbytes(rng.randrange(16, 8192)))
    else:  # random prefix + tail
        b = bytearray(rng.randbytes(rng.randrange(0, 512))) + b
    return bytes(b)

def fuzz_aac(data):
    h = lib.skt_aac_new(rng.randrange(12))
    # chop into pseudo-AUs at random boundaries
    aus, pos = [], 0
    while pos < len(data) and len(aus) < 8:
        n = rng.randrange(1, 4096)
        aus.append(data[pos:pos+n]); pos += n
    B = len(aus)
    blob = b"".join(aus)
    offsets = np.zeros(B, np.int64); lens = np.zeros(B, np.int64)
    o = 0
    for i, au in enumerate(aus):
        offsets[i] = o; lens[i] = len(au); o += len(au)
    quant = np.zeros((B,2,1024), np.int16); lsf = np.zeros((B,2,1024), np.uint8)
    ip = np.zeros((B,1024), np.int8); isg = np.zeros((B,1024), np.int8)
    msk = np.zeros((B,1024), np.uint8); reg = np.zeros((B,2,8,3), np.int16)
    lpc = np.zeros((B,2,8,20), np.float32); seq = np.zeros((B,2), np.int32)
    shp = np.zeros((B,2), np.int32); cv = np.zeros((B,2), np.uint8)
    ov = np.zeros(1, np.int32)
    lib.skt_aac_parse_batch_compact(h, blob, offsets, lens, B,
        quant.reshape(-1), lsf.reshape(-1), ip.reshape(-1), isg.reshape(-1),
        msk.reshape(-1), reg.reshape(-1), lpc.reshape(-1), seq.reshape(-1),
        shp.reshape(-1), cv.reshape(-1), ov)
    lib.skt_aac_free(h)

def fuzz_mp3(data):
    h = lib.skt_mp3_new()
    step = rng.choice([17, 313, len(data) or 1])
    for i in range(0, len(data), step):
        lib.skt_mp3_push(h, data[i:i+step], len(data[i:i+step]))
    q = np.zeros((2,576), np.int16); e = np.zeros((2,576), np.int16)
    m = np.zeros(10, np.int32)
    while lib.skt_mp3_pop(h, q.reshape(-1), e.reshape(-1), m):
        pass
    lib.skt_mp3_free(h)

def fuzz_flac(data):
    h = lib.skt_flac_new()
    if rng.random() < 0.5:
        lib.skt_flac_push(h, data, len(data))
        buf = np.zeros(65536, np.int32)
        while lib.skt_flac_pull(h, buf, len(buf)) > 0:
            pass
    else:
        lib.skt_flac_feed(h, data, len(data))
        meta = np.zeros(12, np.int32)
        resw = np.zeros(2*8192, np.int32); coef = np.zeros(64, np.int32)
        for _ in range(64):
            if lib.skt_flac_next_parts(h, meta, resw, coef, 8192) != 1:
                break
    lib.skt_flac_free(h)

def fuzz_gsm(data):
    h = lib.skt_gsm_new(rng.randrange(2))
    out = np.zeros((len(data)//33 + 2) * 320 + 320, np.int16)
    lib.skt_gsm_decode(h, data, len(data), out)
    lib.skt_gsm_free(h)

ALAC_COOKIE = bytes.fromhex(
    "00000024616c616300000000000010000010280a0e010000000020040001f40000001f40"
)

def fuzz_alac(data):
    # half real cookie (mutated packets penetrate the full decode),
    # half random cookie bytes (config-parse hardening)
    if rng.random() < 0.5:
        cookie = ALAC_COOKIE
    else:
        cookie = bytes(rng.randbytes(rng.choice([12, 24, 36, 48])))
    h = lib.skt_alac_new(cookie, len(cookie))
    if not h:
        return
    fl = lib.skt_alac_frame_length(h)
    ch = lib.skt_alac_channels(h)
    out = np.zeros(max(fl * ch, 1), np.int32)
    pos = 0
    for _ in range(4):
        n = rng.randrange(1, 4096)
        pkt = data[pos:pos+n]
        if not pkt:
            break
        lib.skt_alac_decode(h, pkt, len(pkt), out)
        pos += n
    lib.skt_alac_free(h)

lib.skt_flac_pack_frames.restype = ctypes.c_long
lib.skt_flac_pack_frames.argtypes = [
    ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ndpointer(np.int64, flags="C_CONTIGUOUS"),
    i32p, i32p, i32p, i32p, i32p, ctypes.c_int, ctypes.c_void_p, i32p,
    u8p, ctypes.c_long, ndpointer(np.int64, flags="C_CONTIGUOUS")]
lib.skt_flac_pack_frame1.restype = ctypes.c_long
lib.skt_flac_pack_frame1.argtypes = [
    ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_longlong, ctypes.c_int, ctypes.c_int, i32p, i32p, i32p,
    i32p, ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ndpointer(np.int64, flags="C_CONTIGUOUS"), i32p, u8p, ctypes.c_long]

def fuzz_flac_pack(_data):
    # hostile PLANS over random PCM: garbled kind/order/shift/assign
    # values from a corrupted device wire must never read OOB
    npr = np.random.default_rng(rng.randrange(1 << 30))
    F = rng.randrange(1, 5)
    N = rng.choice([64, 256, 1024, 4096])
    ch = rng.randrange(1, 3)
    lim = 1 << 23
    block = npr.integers(-lim, lim, (F, 2, N)).astype(np.int32)
    assign = npr.integers(-3, 40, F).astype(np.int32)
    kind = npr.integers(-2, 4, F * 2).astype(np.int32)
    order = npr.integers(-5, 70, F * 2).astype(np.int32)
    shift = npr.integers(-9, 70, F * 2).astype(np.int32)
    qlp = npr.integers(-(1 << 14), 1 << 14, F * 2 * 8).astype(np.int32)
    res = npr.integers(-(1 << 28), 1 << 28, F * 2 * N).astype(np.int32)
    fno = npr.integers(0, 1 << 40, F).astype(np.int64)
    cap = 256 + N * 12
    out = np.zeros(F * cap, np.uint8)
    out_len = np.zeros(F, np.int64)
    use_res = rng.random() < 0.5
    lib.skt_flac_pack_frames(
        F, N, ch, rng.choice([8000, 44100, 47999]), rng.choice([16, 24]),
        14, fno, assign, kind, order, shift, qlp, 8,
        res.ctypes.data if use_res else None, block.reshape(-1),
        out, cap, out_len)
    # single-frame generic entry with equally hostile plans
    n1 = int(rng.choice([16, 1000, 4096]))
    warm = npr.integers(-lim, lim, 2 * n1).astype(np.int64)
    res1 = npr.integers(-(1 << 28), 1 << 28, 2 * n1).astype(np.int64)
    qlp1 = npr.integers(-(1 << 14), 1 << 14, 2 * 32).astype(np.int32)
    kind1 = npr.integers(-2, 6, 2).astype(np.int32)
    order1 = npr.integers(-5, 70, 2).astype(np.int32)
    sb1 = npr.integers(-4, 40, 2).astype(np.int32)
    sh1 = npr.integers(-9, 70, 2).astype(np.int32)
    out1 = np.zeros(256 + 2 * n1 * 6, np.uint8)
    lib.skt_flac_pack_frame1(
        n1, 44100, 16, rng.randrange(-3, 40), rng.randrange(1 << 40),
        rng.randrange(16), 2, kind1, order1, sb1, sh1, warm, res1, qlp1,
        out1, len(out1))

# -- CELT parse: serves untrusted packets in the fleet's opus group.
# The C++ stage needs the spec tables pushed (normally done by
# codecs/celt_native); push them here so the ASAN build can be fuzzed.
_celt_ready = False
try:
    sys.path.insert(0, "/root/repo")
    from soundkit_tpu.codecs.opus_tables import tables as _celt_tables
    from soundkit_tpu.codecs.opus_tables import PVQ_U_ROW_OFFSETS

    lib.skt_celt_table_i.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
    lib.skt_celt_table_f.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long]
    lib.skt_celt_tables_done.restype = ctypes.c_int
    lib.skt_celt_new.restype = ctypes.c_void_p
    lib.skt_celt_new.argtypes = [ctypes.c_int]
    lib.skt_celt_free.argtypes = [ctypes.c_void_p]
    lib.skt_celt_parse.restype = ctypes.c_int
    lib.skt_celt_parse.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int)]
    _t = _celt_tables()

    def _push_i(name, arr):
        a = np.ascontiguousarray(np.asarray(arr).reshape(-1), np.int64)
        lib.skt_celt_table_i(name.encode(),
                             a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                             a.size)

    def _push_f(name, arr):
        a = np.ascontiguousarray(np.asarray(arr).reshape(-1), np.float64)
        lib.skt_celt_table_f(name.encode(),
                             a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                             a.size)

    _push_i("pvq_u", _t["celt_pvq_u"])
    _push_i("pvq_row_off", np.asarray(PVQ_U_ROW_OFFSETS))
    _push_i("freq_bands", _t["celt_freq_bands"])
    _push_i("log_freq_range", _t["celt_log_freq_range"])
    _push_f("mean_energy", _t["celt_mean_energy"])
    _push_f("alpha_coef", _t["celt_alpha_coef"])
    _push_f("beta_coef", _t["celt_beta_coef"])
    _push_i("coarse_energy_dist", _t["celt_coarse_energy_dist"])
    _push_i("static_alloc", _t["celt_static_alloc"])
    _push_i("static_caps", _t["celt_static_caps"])
    _push_i("cache_index", _t["celt_cache_index"])
    _push_i("cache_bits", _t["celt_cache_bits"])
    _push_i("log2_frac", _t["celt_log2_frac"])
    _push_i("tf_select", _t["celt_tf_select"])
    _push_i("qn_exp2", _t["celt_qn_exp2"])
    _push_i("bit_interleave", _t["celt_bit_interleave"])
    _push_i("bit_deinterleave", _t["celt_bit_deinterleave"])
    _push_i("model_spread", _t["celt_model_spread"])
    _push_i("model_tapset", _t["celt_model_tapset"])
    _push_i("model_alloc_trim", _t["celt_model_alloc_trim"])
    _push_i("model_energy_small", _t["celt_model_energy_small"])
    _push_f("postfilter_taps", _t["celt_postfilter_taps"])
    _push_f("window", _t["celt_window"])
    _celt_ready = lib.skt_celt_tables_done() == 0
except Exception as e:
    print("celt fuzz disabled:", e)

def _celt_frames():
    # real CELT frames from the ogg fixture packets (strip the TOC)
    from soundkit_tpu.demux.ogg import OggPacketizer
    data = open("/root/reference/testdata/ogg_opus/A_Tusk_is_used_to_make_costly_gifts.ogg", "rb").read()
    pk = OggPacketizer()
    out = []
    for p, _g in pk.push(data):
        if len(p) > 2 and p[:8] != b"OpusHead" and p[:8] != b"OpusTags":
            out.append(p[1:])
    return out

_CELT_CORPUS = _celt_frames() if _celt_ready else []

def fuzz_celt(data):
    if not _celt_ready or not _CELT_CORPUS:
        return
    C = rng.randrange(1, 3)
    h = lib.skt_celt_new(C)
    freq = np.zeros((2, 960), np.float64)
    comb = np.zeros(16, np.float64)
    sflag = ctypes.c_int(0)
    for _ in range(4):
        frame = mutate(_CELT_CORPUS[rng.randrange(len(_CELT_CORPUS))])
        lib.skt_celt_parse(
            h, frame, len(frame), 960, 0, rng.choice([13, 17, 19, 21]),
            rng.randrange(1, C + 1),
            freq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            comb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.byref(sflag))
    lib.skt_celt_free(h)

# -- SILK decode: serves untrusted voice packets (OpusDecoder default
# stage).  Same table-push requirement as CELT.
_silk_ready = False
try:
    lib.skt_silk_table.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
    lib.skt_silk_tables_done.restype = ctypes.c_int
    lib.skt_silk_new.restype = ctypes.c_void_p
    lib.skt_silk_free.argtypes = [ctypes.c_void_p]
    lib.skt_silk_decode.restype = ctypes.c_long
    lib.skt_silk_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long)]
    from soundkit_tpu.codecs.silk_native import _TABLE_KEYS as _SILK_KEYS
    for _key in _SILK_KEYS:
        _a = np.ascontiguousarray(np.asarray(_t[_key]).reshape(-1), np.int64)
        lib.skt_silk_table(_key[5:].encode(),
                           _a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                           _a.size)
    _silk_ready = lib.skt_silk_tables_done() == 0
except Exception as e:
    print("silk fuzz disabled:", e)

def _silk_frames():
    import struct as _struct
    data = open("/root/reference/testdata/opus/A_Tusk_is_used_to_make_costly_gifts.opus", "rb").read()
    body = data[19:]
    out = []
    pos = 0
    while pos + 2 <= len(body):
        (n,) = _struct.unpack_from("<H", body, pos)
        p = body[pos + 2:pos + 2 + n]
        if len(p) > 1:
            out.append(p[1:])
        pos += 2 + n
    return out

_SILK_CORPUS = _silk_frames() if _silk_ready else []

def fuzz_silk(data):
    if not _silk_ready or not _SILK_CORPUS:
        return
    h = lib.skt_silk_new()
    out = np.zeros((3 * 320, 2), np.float64)
    info = np.zeros(13, np.int64)
    for _ in range(4):
        frame = mutate(_SILK_CORPUS[rng.randrange(len(_SILK_CORPUS))])
        lib.skt_silk_decode(
            h, frame, len(frame), rng.randrange(3), rng.randrange(1, 3),
            rng.choice([10, 20, 40, 60]), rng.randrange(2),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            info.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    lib.skt_silk_free(h)

fns = {"aac": fuzz_aac, "mp3": fuzz_mp3, "flac": fuzz_flac,
       "gsm": fuzz_gsm, "alac": fuzz_alac, "flac_pack": fuzz_flac_pack,
       "celt": fuzz_celt, "silk": fuzz_silk}
corpora["flac_pack"] = b"\x00" * 64  # plans are generated, not mutated
corpora["celt"] = b"\x00" * 64       # frames come from _CELT_CORPUS
corpora["silk"] = b"\x00" * 64       # frames come from _SILK_CORPUS
for it in range(iters):
    kind = rng.choice(list(fns))
    fns[kind](mutate(corpora[kind]))
print(f"worker seed={seed}: {iters} iterations clean")
"""


def build_asan() -> Path:
    srcs = sorted((NATIVE / "src").glob("*.cpp"))
    if not ASAN_LIB.exists() or any(
        s.stat().st_mtime > ASAN_LIB.stat().st_mtime for s in srcs
    ):
        cmd = [
            "g++", "-O1", "-g", "-fsanitize=address", "-fno-omit-frame-pointer",
            "-fPIC", "-std=c++17", "-shared", "-o", str(ASAN_LIB),
            *map(str, srcs), "-lavcodec", "-lavutil",
        ]
        subprocess.run(cmd, check=True, cwd=NATIVE)
    return ASAN_LIB


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    lib = build_asan()
    asan_rt = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    stdcxx = subprocess.run(
        ["g++", "-print-file-name=libstdc++.so"], capture_output=True, text=True
    ).stdout.strip()
    env = dict(
        os.environ,
        # libstdc++ must be preloaded too, or ASAN's __cxa_throw
        # interceptor finds no real implementation and aborts on the
        # library's ordinary control-flow exceptions
        LD_PRELOAD=f"{asan_rt} {stdcxx}",
        ASAN_OPTIONS="detect_leaks=0:abort_on_error=1:exitcode=99",
    )
    failures = 0
    for seed in range(8):
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, str(lib), str(seed), str(iters)],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=180,
        )
        status = "ok" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        print(f"seed {seed}: {status} {proc.stdout.strip()}", flush=True)
        if proc.returncode != 0:
            failures += 1
            print(proc.stderr[-4000:])
    print("FUZZ:", "CLEAN" if failures == 0 else f"{failures} failing workers")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
