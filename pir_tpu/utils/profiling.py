"""Tracing/profiling hooks (SURVEY §5a — the reference has none; BASELINE
requires per-kernel roofline accounting).

Wraps the JAX profiler so any protocol phase can be traced and inspected
with TensorBoard/XProf:

    from pir_tpu.utils.profiling import trace
    with trace("/tmp/pir-trace"):
        server.process_request(request)
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed(label: str, sink=print):
    """Wall-clock scope timer that blocks on outstanding device work."""
    import jax

    t0 = time.perf_counter()
    yield
    (jax.device_put(0) + 0).block_until_ready()
    sink(f"[{label}] {time.perf_counter() - t0:.4f}s")
