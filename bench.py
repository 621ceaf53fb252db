"""Benchmark harness — mirrors the reference's benchmark.cpp configuration.

Fixed config (parity with pir/cpp/benchmark.cpp:17-23): 288-byte items,
d=2 recursion, N=4096, 24-bit plain modulus, 1 query per request,
ciphertext-decomposition mode.  Headline metric: server ProcessRequest
throughput (queries/sec) on the default JAX backend (the TPU under the
driver), compared against a single-process CPU run of the same pipeline
(the practical stand-in for the reference's single-CPU SEAL baseline,
which cannot be built in this zero-egress environment — see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/sec", "vs_baseline": N}
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

# Default: the BASELINE "1M-element DB" headline config; falls back to
# smaller sizes / CPU if the accelerator misbehaves (see main()).
DB_SIZE = int(os.environ.get("PIR_BENCH_DB_SIZE", 1 << 20))
ITEM_SIZE = 288
DIMENSIONS = 2
POLY_DEGREE = 4096
PLAIN_BITS = 24
WARMUP = 1


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
        db_size, ITEM_SIZE, DIMENSIONS, generate_encryption_params(POLY_DEGREE, PLAIN_BITS)
    )
    rng = np.random.default_rng(42)
    # one shared random payload per item keeps DB generation fast at 2^16+
    raw = [
        rng.integers(0, 256, ITEM_SIZE, dtype=np.uint8).tobytes()
        for _ in range(min(db_size, 4096))
    ]
    raw = [raw[i % len(raw)] for i in range(db_size)]
    db = PirDatabase.create(raw, params)
    # Transfer optimizations: seeded queries halve the upload and packed
    # (u32 lo, u8 hi) transfer cuts 37.5% off both directions.  Reply
    # mod-switch (PirServer(reply_limbs=1)) is NOT safe at this config:
    # at 1M items (dims 162x162, t=24 bits) the post-scan noise budget
    # does not survive dropping to one 36-bit limb (measured budget 0).
    client = PirClient(params, seed=7, compress_queries=True)
    server = PirServer(db, params)
    return params, raw, db, client, server


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=sys.stderr)


_T0 = time.perf_counter()


def measure_qps(iters: int, db_size: int):
    import jax

    _log(f"building stack, db_size={db_size}, backend={jax.default_backend()}")
    params, raw, db, client, server = build_stack(db_size)
    _log(f"stack built, dims={params.dimensions}, num_pt={params.num_pt}")
    request = client.create_request([db_size // 3])
    _log("request created; warming up (jit compile)")
    # warm up (compile)
    for _ in range(WARMUP):
        resp = server.process_request(request)
    _log("warmup done")
    # correctness check rides along
    out = client.process_response([db_size // 3], resp)
    assert out[0] == raw[db_size // 3], "benchmark retrieval mismatch"

    t0 = time.perf_counter()
    for _ in range(iters):
        resp = server.process_request(request)
    jax.block_until_ready  # responses are host numpy already; timing closed
    dt = time.perf_counter() - t0
    return iters / dt


def cpu_baseline(db_size) -> float:
    if CACHE.exists():
        data = json.loads(CACHE.read_text())
        if data.get("db_size") == db_size:
            return data["qps"]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["PIR_BENCH_DB_SIZE"] = str(db_size)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--cpu-baseline-child"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    qps = json.loads(line)["qps"]
    CACHE.parent.mkdir(exist_ok=True)
    CACHE.write_text(json.dumps({"db_size": db_size, "qps": qps}))
    return qps


def _measure_child(db_size: int, iters: int, timeout: int = 1500) -> float:
    """Run the accelerator measurement in a subprocess (guards against the
    occasional wedged remote-compile), return qps."""
    env = dict(os.environ)
    env["PIR_BENCH_DB_SIZE"] = str(db_size)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--accel-child",
         "--iters", str(iters)],
        env=env,
        capture_output=True,
        text=True,
        timeout=int(os.environ.get("PIR_BENCH_TIMEOUT", timeout)),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["qps"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-baseline-child", action="store_true")
    ap.add_argument("--accel-child", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.cpu_baseline_child:
        import jax

        jax.config.update("jax_platforms", "cpu")
        qps = measure_qps(max(2, args.iters // 2), DB_SIZE)
        print(json.dumps({"qps": qps}))
        return

    if args.accel_child:
        # register the CPU backend next to the TPU so client-side
        # keygen/encrypt run locally, not through remote compile
        import jax

        try:
            jax.config.update("jax_platforms", "axon,cpu")
            jax.devices("cpu")
        except Exception:
            # axon plugin absent (e.g. CPU-only run): fall back cleanly
            jax.config.update("jax_platforms", "cpu")
        qps = measure_qps(args.iters, DB_SIZE)
        print(json.dumps({"qps": qps}))
        return

    db_size = DB_SIZE
    backend_note = ""
    try:
        qps = _measure_child(db_size, args.iters)
    except Exception:
        try:
            # wedged compile or OOM at full size: fall back to a smaller DB
            db_size = 1 << 16
            qps = _measure_child(db_size, args.iters, timeout=900)
        except Exception:
            # accelerator unreachable (e.g. stuck chip claim): record the
            # CPU number rather than nothing
            backend_note = ", CPU fallback - accelerator unreachable"
            qps = cpu_baseline(db_size)
    try:
        base = cpu_baseline(db_size)
        vs = qps / base if base > 0 else 0.0
    except Exception:
        vs = 0.0
    print(
        json.dumps(
            {
                "metric": f"server ProcessRequest throughput, {db_size}-item DB, "
                f"288B items, d=2, N=4096 (decomp mode){backend_note}",
                "value": round(qps, 4),
                "unit": "queries/sec",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
