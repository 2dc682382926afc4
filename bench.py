"""Headline benchmark: end-to-end aggregate xrealtime batched AAC-LC.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.json): >=1000x aggregate realtime decode per v5e
chip batched over 1024 streams.  This measures the FULL flagship path
per frame batch over 1024 stereo streams with DISTINCT per-lane
content (each lane decodes a different AU of the fixture each step, so
the host parser's branch predictor sees realistic entropy):

  C++ host syntax parse (ADTS AUs -> v4 wire: metadata + raw AU bytes,
  length-only spectral walk, PGO-built) + jitted device decode where
  the spectral Huffman decode itself runs ON DEVICE as a SIMD
  bitstream interpreter (ops/aac_entropy.py: one codeword per lane per
  scan step, flat 16-bit-prefix LUT, lax.clz escapes) followed by wire
  unpack + RLE expand + dequant + stereo + TNS lattice/scan + matmul
  IMDCT + windowing + overlap-add.

The v4 wire ships as ONE uint8 buffer passed directly to the jitted
step (fused transfer+execute dispatch); the host no longer decodes
spectral values at all (the round-2 bottleneck: 8-10 ms/batch of host
VLC against 0.04 ms device compute).  Host work drops to ~6-7 ms of
syntax parse + spectral walk per 1024-stream batch; the device step
incl. the ~512-iteration entropy scan costs ~1 ms.

x-realtime is computed at 48 kHz.  Every recorded pass is preceded by
a healthy throughput probe, and the gate holds until the hard
deadline: a collapsed tunnel yields FEWER healthy passes (disclosed
via discarded_passes/gate_probes), never a median manufactured from
collapsed ones.  ``value`` is the MEDIAN of the healthy passes — the
defensible statistic — with the best pass alongside.

HARD DEADLINE: the whole process is bounded by SKT_BENCH_DEADLINE_S
(default 1200 s) of wall clock.  A daemon monitor thread fires at the
deadline and prints the JSON line with whatever passes exist at that
moment — flagged "degraded": true, collapsed passes disclosed — then
force-exits 0.  This guarantees a parseable result inside the driver's
budget even when the shared tunnel wedges inside a blocking device
call for the entire window (round 3 recorded nothing because the
liveness wait (3600 s) + throughput gate (1800 s) + passes could
outlast the driver's timeout).
"""
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

METRIC = "aggregate_x_realtime_aac_lc_e2e_1024_distinct_streams"
UNIT = "x_realtime_per_chip_at_48k"

_emit_lock = threading.Lock()
_emitted = [False]

# shared progress state so the deadline monitor can report whatever
# exists when it fires
_state = {
    "passes": [],       # healthy recorded passes
    "discarded": [],    # collapsed passes (disclosed, not counted)
    "gate_probes": [],  # throughput probe history
    "phase": "startup",
}


def emit(payload: dict) -> None:
    """Print the single JSON result line exactly once."""
    with _emit_lock:
        if _emitted[0]:
            return
        _emitted[0] = True
        print(json.dumps(payload), flush=True)


def build_result(passes, discarded, probes, degraded: bool,
                 note: str | None = None) -> dict:
    """``value`` is the MEDIAN of the healthy-gated passes — the
    defensible statistic (round-4 lesson: a best-pass headline reads
    generously when the shared tunnel collapses for most of the
    window).  The best pass rides alongside as ``best``."""
    if passes:
        ordered = sorted(passes)
        best = ordered[-1]
        median = ordered[len(ordered) // 2]
        out = {
            "metric": METRIC,
            "value": round(median, 1),
            "unit": UNIT,
            "vs_baseline": round(median / 1000.0, 3),
            "best": round(best, 1),
            "best_vs_baseline": round(best / 1000.0, 3),
            "median": round(median, 1),
            "median_vs_baseline": round(median / 1000.0, 3),
            "passes": [round(v, 1) for v in passes],
            "discarded_passes": [round(v, 1) for v in discarded],
            "gate_probes": probes,
        }
    else:
        # nothing healthy recorded: fall back to the best collapsed
        # evidence we have (a discarded pass, else a gate probe) so the
        # record is non-null even on a fully-collapsed tunnel day
        fallback = max(list(discarded) + [float(p) for p in probes] + [0.0])
        out = {
            "metric": METRIC,
            "value": round(fallback, 1),
            "unit": UNIT,
            "vs_baseline": round(fallback / 1000.0, 3),
            "passes": [],
            "discarded_passes": [round(v, 1) for v in discarded],
            "gate_probes": probes,
        }
    if degraded:
        out["degraded"] = True
    if note:
        out["note"] = note
    record = Path(__file__).parent / "benchmarks" / "HEADLINE_RECORD.json"
    if passes and not degraded:
        # a healthy-gated session: persist it as the committed record
        try:
            record.write_text(json.dumps({
                "median": out["median"], "best": out["best"],
                "passes": out["passes"],
                "date": time.strftime("%Y-%m-%d"),
            }) + "\n")
        except OSError:
            pass
    elif record.exists():
        # collapsed-tunnel day: disclose the last healthy-gated
        # session alongside the degraded evidence (the shared tunnel
        # spends hours in bulk-bandwidth collapse, CLAUDE.md)
        try:
            out["last_healthy_record"] = json.loads(record.read_text())
        except (OSError, ValueError):
            pass
    return out


def start_deadline_monitor(deadline: float) -> None:
    """Fire at the wall-clock deadline: emit whatever exists, exit 0.

    Runs on a daemon thread and uses os._exit so a tunnel wedged inside
    a blocking block_until_ready() on the main thread cannot prevent
    the JSON line from printing (CLAUDE.md: the tunnel can wedge
    entirely for 10+ minutes).
    """

    def monitor():
        while True:
            left = deadline - time.time()
            if left <= 0:
                break
            time.sleep(min(left, 5.0))
        if _emitted[0]:
            return
        note = (f"wall-clock deadline hit during phase "
                f"'{_state['phase']}'; result built from partial passes")
        emit(build_result(_state["passes"], _state["discarded"],
                          _state["gate_probes"], degraded=True, note=note))
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(0)

    threading.Thread(target=monitor, daemon=True).start()


def wait_for_device(max_wait_s: float) -> bool:
    """Block until the TPU answers a trivial op, or the budget runs out.

    The shared axon tunnel can wedge entirely for 10+ minutes (even
    jnp.ones((8,)) hangs — CLAUDE.md tunnel notes); without this gate
    the bench would hang inside warmup with no diagnostics.  Probes run
    on daemon threads so a stuck transfer never blocks the retry loop.
    """
    deadline = time.time() + max_wait_s
    attempt = 0
    ok = [False]

    def probe():
        try:
            import jax.numpy as jnp

            (jnp.ones((8,)) * 2).block_until_ready()
            ok[0] = True
        except Exception as e:  # backend init failure: report + retry
            print(f"bench: device probe error: {e!r}", file=sys.stderr)

    while time.time() < deadline:
        attempt += 1
        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(90)
        if ok[0]:
            if attempt > 1:
                print(f"bench: device healthy after {attempt} probes",
                      file=sys.stderr)
            return True
        print(f"bench: device unresponsive (probe {attempt}); waiting",
              file=sys.stderr)
        time.sleep(30)
        if ok[0]:  # a late probe may have landed during the sleep
            return True
    return False


def main() -> None:
    # hard wall-clock bound on the WHOLE process; every wait budget
    # below is clamped to fit inside it
    total_budget = float(os.environ.get("SKT_BENCH_DEADLINE_S", 1200.0))
    hard_deadline = time.time() + total_budget
    start_deadline_monitor(hard_deadline)

    def time_left() -> float:
        return hard_deadline - time.time()

    _state["phase"] = "device liveness wait"
    wait_budget = min(
        float(os.environ.get("SKT_BENCH_WAIT_S", 3600)),
        total_budget * 0.45,
    )
    if not wait_for_device(wait_budget):
        emit({
            "metric": METRIC,
            "value": 0,
            "unit": UNIT,
            "vs_baseline": 0.0,
            "degraded": True,
            "note": "tpu unreachable: tunnel wedged for the whole "
                    "liveness wait budget",
        })
        return

    _state["phase"] = "imports + fixture parse"
    import jax

    from soundkit_tpu.codecs.aac_lc import AdtsStream
    from soundkit_tpu.codecs.aac_lc_native import (
        NativeAacParser,
        prepare_v4_batch_packed,
    )
    from soundkit_tpu.ops import aac_batch as ab

    B = 1024  # stereo streams
    rate = 48000.0

    data = open(
        "/root/reference/golden/aac/A_Tusk_is_used_to_make_costly_gifts_encoded.aac",
        "rb",
    ).read()
    stream = AdtsStream()
    aus = list(stream.push(data))
    # widen the distinct-content pool with the second 16 kHz AAC-LC
    # fixture (raw AUs from the MP4 sample table, same sr_index)
    try:
        from soundkit_tpu.demux.mp4 import demux_mp4_audio

        track = demux_mp4_audio(
            open(
                "/root/reference/testdata/mac_aac/"
                "A_Tusk_is_used_to_make_costly_gifts.m4a",
                "rb",
            ).read()
        )
        if track.sample_rate == 16000:
            aus += list(track.samples)
    except Exception:
        pass
    n = len(aus)
    parser = NativeAacParser(stream.sr_index)

    # v4 wire: raw AUs + section program, spectral Huffman decoded ON
    # DEVICE (ops/aac_entropy.py SIMD interpreter) — the host does the
    # cheap syntax parse + a length-only spectral walk (~1.4x faster
    # than the v3 full decode) and the wire drops the quant payload.
    # donate the carried state so the step reuses its HBM across frames
    step = jax.jit(
        ab.aac_decode_frame_device_v4_packed,
        donate_argnums=(1, 2),
        static_argnums=(3,),
    )

    def init():
        import jax.numpy as jnp

        saved, prev = ab.init_state(B)
        return jnp.asarray(saved), jnp.asarray(prev)

    # one fixed scan length for the whole run (the corpus-wide worst
    # bucket): a single compile instead of one per distinct bucket
    ms_fixed = 64
    for t in range(0, n, B):
        _, mst, _ = prepare_v4_batch_packed(
            parser, [aus[(t + i) % n] for i in range(B)])
        ms_fixed = max(ms_fixed, mst)

    def parse(t):
        # lane i decodes AU (t+i) mod n: every lane differs from its
        # neighbours and advances each step
        buf, _, overflow = prepare_v4_batch_packed(
            parser, [aus[(t + i) % n] for i in range(B)])
        if overflow:  # content the raw wire can't express
            raise RuntimeError("v4 overflow on bench corpus")
        return buf, ms_fixed

    # warmup / compile
    _state["phase"] = "warmup compile"
    s, p = init()
    buf, ms0 = parse(0)
    pcm, s, p = step(buf, p, s, ms0)
    pcm.block_until_ready()

    audio_seconds = B * 1024 / rate

    # throughput gate: the liveness probe above catches a wedged
    # tunnel, but the tunnel also enters long collapsed states where
    # ops answer yet h2d runs 10-20x slow (measured 2026-08-18: passes
    # of 29-134x vs the usual ~1900x).  Time a short burst and wait
    # (bounded) for the tunnel to recover before recording passes.
    # The gate budget is clamped so that pass recording ALWAYS gets a
    # slice of the wall-clock budget (round 3 lesson).
    min_x = float(os.environ.get("SKT_BENCH_MIN_X", 700.0))
    probe_history = _state["gate_probes"]

    def mini_pass(k: int = 4) -> float:
        s, p = init()
        t0 = time.perf_counter()
        for t in range(k):
            buf, mst = parse(t)
            pcm, s, p = step(buf, p, s, mst)
            pcm.block_until_ready()
        return k * audio_seconds / (time.perf_counter() - t0)

    def gate_ok() -> bool:
        """One healthy-throughput probe; False means collapsed."""
        est = mini_pass()
        probe_history.append(round(est, 1))
        return est >= min_x

    n_batches = 46  # fixed per-pass work regardless of AU pool size
    pipeline = os.cpu_count() and os.cpu_count() > 1
    ex = ThreadPoolExecutor(1) if pipeline else None

    def one_pass() -> float:
        s, p = init()
        t0 = time.perf_counter()
        if pipeline:
            # one-ahead parse on a worker thread (multi-core hosts)
            fut = ex.submit(parse, 0)
            for t in range(n_batches):
                buf, mst = fut.result()
                fut = ex.submit(parse, t + 1)
                pcm, s, p = step(buf, p, s, mst)
                pcm.block_until_ready()
            fut.result()
        else:
            # single-core host: the worker thread only adds GIL
            # contention; the async device dispatch already overlaps
            # the next parse with the in-flight step
            for t in range(n_batches):
                buf, mst = parse(t)
                pcm, s, p = step(buf, p, s, mst)
                pcm.block_until_ready()
        elapsed = time.perf_counter() - t0
        return n_batches * audio_seconds / elapsed

    # EVERY recorded pass is preceded by a healthy gate probe (the
    # tunnel enters multi-minute collapsed states mid-run, so gating
    # only the start still records collapse, measured 2026-08-18:
    # gate probe 1319x followed by passes of 190-316x).  Round-5
    # change (VERDICT r4 ask #2): the gate holds until the HARD
    # deadline — a collapsed window produces FEWER healthy passes,
    # never a median manufactured from collapsed ones.  Collapsed
    # passes are disclosed in ``discarded_passes``; a window with zero
    # healthy probes emits degraded:true with the collapsed evidence.
    _state["phase"] = "gated pass recording"
    passes = _state["passes"]
    discarded = _state["discarded"]
    # one mini-probe ~2.5 s healthy, up to ~25 s collapsed; keep the
    # probe-sleep loop cheap enough that a late-recovering tunnel
    # still gets pass time
    while len(passes) < 5:
        if time_left() < 60.0:
            # deadline imminent: stop with what we have rather than
            # let the monitor cut us off mid-pass
            break
        if not gate_ok():
            print(
                f"bench: tunnel collapsed "
                f"({probe_history[-1]:.0f}x < {min_x:.0f}x); waiting",
                file=sys.stderr,
            )
            time.sleep(min(60.0, max(5.0, time_left() - 120.0)))
            continue
        x = one_pass()
        if x < min_x:
            # collapsed mid-pass: disclose it, re-gate, try again
            discarded.append(round(x, 1))
            print(
                f"bench: pass collapsed mid-run ({x:.0f}x); retrying",
                file=sys.stderr,
            )
            continue
        passes.append(x)

    healthy_probes = sum(1 for p in probe_history if p >= min_x)
    degraded = len(passes) < 5
    note = None
    if degraded and passes:
        note = (f"tunnel collapsed for part of the window; "
                f"{len(passes)} healthy-gated passes recorded "
                f"({healthy_probes} healthy probes)")
    elif not passes:
        note = ("zero healthy probes in the whole window; value is "
                "the best collapsed evidence, not machine capability")
    emit(build_result(passes, discarded, probe_history,
                      degraded=degraded, note=note))


if __name__ == "__main__":
    main()
