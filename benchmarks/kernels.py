"""Per-kernel microbenchmarks + roofline accounting (BASELINE: "every
field-arithmetic kernel profiled to speed-of-light per chip").

Measures on the current default backend:
  * negacyclic NTT throughput (batched, the DB-scan shape),
  * pointwise Barrett / Shoup modmul throughput,
  * key-switch throughput (the expansion hot op).

Prints one JSON line per kernel with achieved vs. theoretical ceilings.
The v5e ceiling model: u64 lane math lowers to u32 ops on the VPU
(8x128 lanes, ~940 GOP/s int32 per core); a Shoup modmul is ~18 u32
multiplies + ~20 auxiliary ops, a Barrett modmul ~57 + ~40.

Run: python benchmarks/kernels.py [--batch B] [--n N]
"""

import argparse
import json
import sys
import time

import numpy as np


def bench_op(fn, *args, iters=10):
    """Chained timing: feed the output back as the first input so the device
    cannot overlap iterations (async dispatch otherwise under-reports), and
    force a readback at the end."""
    import numpy as np
    import jax

    out = jax.block_until_ready(fn(*args))  # compile + first-exec warmup
    same_shape = getattr(out, "shape", None) == getattr(args[0], "shape", None)
    t0 = time.perf_counter()
    x = args[0]
    for _ in range(iters):
        out = fn(x, *args[1:])
        if same_shape:
            x = out
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pir_tpu.core import primes
    from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
    from pir_tpu.core.context import PirContext
    from pir_tpu.ops import modular, keyswitch
    from pir_tpu.ops.ntt import NttTables
    from pir_tpu.bfv import keys as keys_mod

    backend = jax.default_backend()
    B, N = args.batch, args.n
    moduli = primes.default_coeff_modulus(N)[:2]
    tables = NttTables(moduli, N)
    L = len(moduli)
    rng = np.random.default_rng(0)

    x = jnp.asarray(
        np.stack(
            [rng.integers(0, q, size=(B, N), dtype=np.uint64) for q in moduli],
            axis=1,
        )
    )  # [B, L, N]

    results = []

    # NTT ----------------------------------------------------------------
    fwd = jax.jit(tables.forward)
    dt = bench_op(fwd, x, iters=args.iters)
    butterflies = B * L * (N // 2) * int(np.log2(N))
    results.append(
        {
            "kernel": "ntt_forward",
            "backend": backend,
            "shape": [B, L, N],
            "ms": round(dt * 1e3, 3),
            "ntts_per_sec": round(B * L / dt, 1),
            "butterflies_per_sec": round(butterflies / dt, 0),
        }
    )

    # modmul -------------------------------------------------------------
    lc = tables.limbs
    y = jnp.asarray(np.asarray(x))
    mul_barrett = jax.jit(lambda a, b: lc.mul(a, b))
    dt = bench_op(mul_barrett, x, y, iters=args.iters)
    results.append(
        {
            "kernel": "modmul_barrett",
            "backend": backend,
            "elems": B * L * N,
            "ms": round(dt * 1e3, 3),
            "modmuls_per_sec": round(B * L * N / dt, 0),
        }
    )
    shoup = modular.shoup_precompute(np.asarray(y), np.asarray(lc.q))
    mul_shoup = jax.jit(
        lambda a, w, ws: modular.mul_mod_shoup(a, w, ws, lc.q)
    )
    dt = bench_op(mul_shoup, x, y, jnp.asarray(shoup), iters=args.iters)
    results.append(
        {
            "kernel": "modmul_shoup",
            "backend": backend,
            "elems": B * L * N,
            "ms": round(dt * 1e3, 3),
            "modmuls_per_sec": round(B * L * N / dt, 0),
        }
    )

    # key switch ---------------------------------------------------------
    if len(primes.default_coeff_modulus(N)) < 2:
        # keyswitch needs a special prime; the secure default chain for
        # small rings has one prime, so this section needs N >= 4096
        for r in results:
            print(json.dumps(r))
        return
    params = create_pir_parameters(
        16, 0, 1, generate_encryption_params(N, 20)
    )
    ctx = PirContext(params)
    krng = np.random.default_rng(1)
    sk = keys_mod.gen_secret_key(ctx, krng)
    gk = keys_mod.gen_galois_keys(ctx, sk, [N + 1], krng)
    kb = min(B, 64)
    cts = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        rng.integers(0, q, size=(2, N), dtype=np.uint64)
                        for q in ctx.ct_moduli
                    ],
                    axis=1,
                )
                for _ in range(kb)
            ]
        )
    )  # [kb, 2, L, N]
    gkarr = {N + 1: jnp.asarray(gk[N + 1].data)}
    apply_g = jax.jit(lambda c, k: keyswitch.apply_galois(ctx, k, c, N + 1))
    dt = bench_op(apply_g, cts, gkarr, iters=args.iters)
    results.append(
        {
            "kernel": "galois_keyswitch",
            "backend": backend,
            "batch": kb,
            "ms": round(dt * 1e3, 3),
            "keyswitches_per_sec": round(kb / dt, 1),
        }
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    main()
