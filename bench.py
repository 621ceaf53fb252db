"""Benchmark harness — mirrors the reference's benchmark.cpp configuration.

Fixed config (parity with pir/cpp/benchmark.cpp:17-23): 288-byte items,
d=2 recursion, N=4096, 24-bit plain modulus, 1 query per request,
ciphertext-decomposition mode.  Headline metric: server ProcessRequest
throughput (queries/sec) on the accelerator backend, compared against a
cached single-process CPU run of the same pipeline (the practical
stand-in for the reference's single-CPU SEAL baseline, which cannot be
built in this zero-egress environment — see BASELINE.md).

Driver contract: prints a JSON result line per completed stage (flush),
and re-prints the headline (largest completed DB) line last, so the LAST
stdout line is always the best available measurement even if the process
is killed mid-run.  The whole run observes a hard wall-clock budget
(PIR_BENCH_BUDGET seconds, default 480): the 1M-item BASELINE headline
stage runs FIRST (it is the operative target — BASELINE.json "1M-element
DB"); the smaller 65536-item stage runs after only if budget remains.
The persistent XLA compile cache (benchmarks/.jax_cache) makes the
headline's cold-compile cost a once-per-container event.

  {"metric": "...", "value": N, "unit": "queries/sec", "vs_baseline": N}
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
CACHE = REPO / "benchmarks" / "cpu_baseline.json"

ITEM_SIZE = 288
DIMENSIONS = 2
POLY_DEGREE = 4096
PLAIN_BITS = 24
# parameter profile for the accelerator stack: "seal" (BFVDefault chain,
# comparable to the reference bit-for-bit) or "tpu32" (sub-32-bit chain,
# same security + workload, the TPU-native parameterization — see
# primes.tpu_coeff_modulus).  The CPU denominator always uses "seal".
PROFILE = os.environ.get("PIR_BENCH_PROFILE", "seal")

_T0 = time.perf_counter()
BUDGET = float(os.environ.get("PIR_BENCH_BUDGET", 480))
_DEADLINE = _T0 + BUDGET
# Margin kept for final printing / parent bookkeeping.
_MARGIN = 10.0

# Stage ladder: the 1M-item BASELINE headline config runs FIRST — it gets
# the whole budget on a cold compile cache (~30s DB setup + ~200s cold
# pipeline compile + measurement fits 480s; with the persistent cache warm
# it is ~90s).  min_need only gates stages after the first number lands.
STAGES = (
    {"db_size": 1 << 20, "min_need": 120.0},
    {"db_size": 1 << 16, "min_need": 60.0},
)


def _remaining() -> float:
    return _DEADLINE - time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=sys.stderr)
    sys.stderr.flush()


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, ON by default.

    Default dir: benchmarks/.jax_cache (gitignored, container-local).
    Override with PIR_JAX_CACHE=<dir>; disable with PIR_JAX_CACHE="".
    The min-compile-time floor keeps tiny client-side CPU executables out
    of the cache — only the multi-second server pipeline stages persist,
    and those are TPU executables reloaded on the same device, so the
    cross-CPU AOT SIGILL hazard observed with an unfiltered cache does
    not apply."""
    import jax

    cache_dir = os.environ.get("PIR_JAX_CACHE", str(REPO / "benchmarks" / ".jax_cache"))
    if not cache_dir:
        return
    try:
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as exc:  # cache is best-effort
        _log(f"compile cache unavailable: {exc}")


def build_stack(db_size):
    import numpy as np

    from pir_tpu.core.params import (
        create_pir_parameters,
        generate_encryption_params,
    )
    from pir_tpu.pir.client import PirClient
    from pir_tpu.pir.database import PirDatabase
    from pir_tpu.pir.server import PirServer

    params = create_pir_parameters(
        db_size, ITEM_SIZE, DIMENSIONS,
        generate_encryption_params(POLY_DEGREE, PLAIN_BITS, profile=PROFILE),
    )
    rng = np.random.default_rng(42)
    # one shared random payload pool per item keeps DB generation fast at 2^16+
    raw = [
        rng.integers(0, 256, ITEM_SIZE, dtype=np.uint8).tobytes()
        for _ in range(min(db_size, 4096))
    ]
    raw = [raw[i % len(raw)] for i in range(db_size)]
    db = PirDatabase.create(raw, params)
    # Transfer optimizations: seeded queries halve the upload and packed
    # (u32 lo, u8 hi) transfer cuts 37.5% off both directions.  Reply
    # mod-switch drops limbs the noise budget does not need: keep the
    # fewest leading limbs totalling >= t_bits + 12 bits (measured at the
    # 1M seal config: one 36-bit limb leaves 4 bits of budget on every
    # reply ciphertext, pk and seeded queries alike — only affordable
    # since balanced re-encode digits bought ~5 bits; the tpu32 chain's
    # 31-bit limbs keep two).
    t_bits = params.encryption_params.plain_modulus.bit_length()
    bits = 0
    reply_limbs = 0
    for q in params.encryption_params.ct_modulus:
        bits += q.bit_length()
        reply_limbs += 1
        if bits >= t_bits + 12:
            break
    client = PirClient(params, seed=7, compress_queries=True)
    server = PirServer(db, params, reply_limbs=reply_limbs)
    return params, raw, db, client, server


def measure_qps(db_size: int, max_iters: int, time_cap: float) -> float:
    """Build + warm + measure; measurement loop stops at max_iters or when
    time_cap (seconds from now) is exhausted, whichever first."""
    import jax

    _enable_compile_cache()
    _log(f"building stack, db_size={db_size}, backend={jax.default_backend()}")
    params, raw, db, client, server = build_stack(db_size)
    _log(f"stack built, dims={params.dimensions}, num_pt={params.num_pt}")
    request = client.create_request([db_size // 3])
    _log("request created; warming up (jit compile)")
    resp = server.process_request(request)  # the one warmup/compile run
    _log("warmup done")
    # correctness check rides along
    out = client.process_response([db_size // 3], resp)
    assert out[0] == raw[db_size // 3], "benchmark retrieval mismatch"

    t_end = time.perf_counter() + time_cap
    t0 = time.perf_counter()
    iters = 0
    while iters < max_iters:
        server.process_request(request)  # reply is host numpy: timing closed
        iters += 1
        if time.perf_counter() >= t_end:
            break
    dt = time.perf_counter() - t0
    _log(f"measured {iters} iters in {dt:.2f}s (sequential)")
    seq = iters / dt

    # Pipelined serving via PirServer.process_stream: the caller thread
    # submits device work while a worker thread completes reply
    # transfers, so the reply download of request n overlaps the compute
    # of n+1..n+depth.  Replies still fully serialized and checked.
    # depth 4: within noise of 6 at the 1M config over short windows and
    # kinder to smaller DBs over sustained ones (deeper queues delay
    # replies behind more queued compute through the in-order link).
    depth = 4
    t0 = time.perf_counter()
    t_end = t0 + time_cap

    def request_stream():
        for _ in range(3 * max_iters):
            if time.perf_counter() >= t_end:
                return
            yield request

    iters = sum(1 for _ in server.process_stream(request_stream(), depth=depth))
    dt = time.perf_counter() - t0
    _log(f"measured {iters} iters in {dt:.2f}s (pipelined depth {depth})")
    return seq, iters / dt


def _read_cache() -> dict:
    """Per-db-size CPU baseline cache {str(db_size): qps}."""
    if not CACHE.exists():
        return {}
    data = json.loads(CACHE.read_text())
    if "db_size" in data:  # legacy single-entry format
        return {str(data["db_size"]): data["qps"]}
    return data


def cpu_baseline(db_size: int) -> float:
    """Cached single-process CPU qps for db_size; measures only if missing
    AND the budget allows (small sizes only — a cold 1M CPU run takes ~an
    hour and must never run under the driver)."""
    cache = _read_cache()
    if str(db_size) in cache:
        return cache[str(db_size)]
    # a cold run is only sane for small DBs with plenty of budget left
    est = 120.0 if db_size <= (1 << 16) else 1e9
    if _remaining() - _MARGIN < est:
        return 0.0
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["PIR_BENCH_DB_SIZE"] = str(db_size)
    env["PIR_BENCH_PROFILE"] = "seal"  # denominator: reference-shaped params
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--cpu-baseline-child"],
            env=env,
            capture_output=True,
            text=True,
            timeout=max(30.0, _remaining() - _MARGIN),
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        qps = json.loads(line)["qps"]
    except Exception as exc:
        _log(f"cpu baseline at {db_size} failed: {exc}")
        return 0.0
    cache[str(db_size)] = qps
    CACHE.parent.mkdir(exist_ok=True)
    CACHE.write_text(json.dumps(cache))
    return qps


def _measure_child(db_size: int, iters: int, timeout: float) -> float:
    """Run the accelerator measurement in a subprocess (guards against a
    wedged remote compile / stuck chip claim), return qps."""
    env = dict(os.environ)
    env["PIR_BENCH_DB_SIZE"] = str(db_size)
    # child self-limits its measurement loop to its share of the budget
    env["PIR_BENCH_MEASURE_CAP"] = str(max(10.0, min(60.0, timeout / 4)))
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--accel-child",
             "--iters", str(iters)],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired as exc:
        err = exc.stderr or b""
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
        sys.stderr.write(err[-2000:])
        raise
    sys.stderr.write(out.stderr[-2000:])
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    parsed = json.loads(line)
    return parsed["qps"], parsed.get("qps_pipelined", 0.0)


_EMITTED: list = []  # (db_size, json_line) — for the final headline re-print


def _emit(db_size: int, qps: float, backend_note: str = "") -> None:
    base = cpu_baseline(db_size)
    vs = qps / base if base > 0 else 0.0
    prof = "" if PROFILE == "seal" else f", {PROFILE} profile"
    line = json.dumps(
        {
            "metric": f"server ProcessRequest throughput, {db_size}-item DB, "
            f"288B items, d=2, N=4096 (decomp mode{prof}){backend_note}",
            "value": round(qps, 4),
            "unit": "queries/sec",
            "vs_baseline": round(vs, 3),
        }
    )
    _EMITTED.append((db_size, line))
    print(line, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-baseline-child", action="store_true")
    ap.add_argument("--accel-child", action="store_true")
    # iteration caps sized so the time caps (PIR_BENCH_MEASURE_CAP) bind
    # first: short windows (~4s) were dominated by host-link jitter —
    # repeated same-code 1M runs spread 14.9-17.7 q/s across two hours
    ap.add_argument("--iters", type=int, default=150)
    args = ap.parse_args()

    db_size_env = int(os.environ.get("PIR_BENCH_DB_SIZE", 1 << 20))
    measure_cap = float(os.environ.get("PIR_BENCH_MEASURE_CAP", 30.0))

    if args.cpu_baseline_child:
        import jax

        jax.config.update("jax_platforms", "cpu")
        qps, _ = measure_qps(db_size_env, max(2, args.iters // 2), 120.0)
        print(json.dumps({"qps": qps}), flush=True)
        return

    if args.accel_child:
        # SIGUSR1 dumps all thread stacks (diagnosing wedged remote compiles)
        import faulthandler
        import signal

        faulthandler.register(signal.SIGUSR1, file=sys.stderr)
        # register the CPU backend next to the TPU so client-side
        # keygen/encrypt run locally, not through remote compile
        import jax

        try:
            jax.config.update("jax_platforms", "axon,cpu")
            jax.devices("cpu")
        except Exception:
            # axon plugin absent (e.g. CPU-only run): fall back cleanly
            jax.config.update("jax_platforms", "cpu")
        qps, qps_pipe = measure_qps(db_size_env, args.iters, measure_cap)
        print(json.dumps({"qps": qps, "qps_pipelined": qps_pipe}), flush=True)
        return

    # ---- parent: staged ladder under the hard budget --------------------
    got_any = False
    for stage in STAGES:
        db_size = stage["db_size"]
        room = _remaining() - _MARGIN
        if got_any and room < stage["min_need"]:
            _log(f"skipping db_size={db_size}: {room:.0f}s left "
                 f"< {stage['min_need']}s needed")
            continue
        timeout = max(30.0, room)
        try:
            qps, qps_pipe = _measure_child(db_size, args.iters, timeout)
        except Exception as exc:
            _log(f"stage db_size={db_size} failed: {type(exc).__name__}")
            continue
        _emit(db_size, qps)
        if qps_pipe > 0:
            _emit(db_size, qps_pipe, ", pipelined")
        got_any = True

    if not got_any:
        # accelerator unreachable in every stage: record the cached CPU
        # number rather than nothing
        db_size = STAGES[-1]["db_size"]
        qps = cpu_baseline(db_size)
        _emit(db_size, qps, ", CPU fallback - accelerator unreachable")
    elif _EMITTED:
        # the LAST stdout line is the driver's recorded number: re-print
        # the headline — best line of the largest completed DB size
        best_db = max(db for db, _ in _EMITTED)
        print([l for db, l in _EMITTED if db == best_db][-1], flush=True)


if __name__ == "__main__":
    main()
