"""Per-kernel microbenchmarks + roofline accounting (BASELINE: "every
field-arithmetic kernel profiled to speed-of-light per chip").

Measures on the current default backend:
  * negacyclic NTT throughput (batched, the DB-scan shape),
  * pointwise Barrett / Shoup modmul throughput,
  * the Pallas raw-accumulation DB-scan MAC kernel,
  * key-switch throughput (the expansion hot op).

Prints one JSON line per kernel including the speed-of-light ceiling and
the achieved fraction on TPU backends (`ceiling_*`, `achieved_fraction`).

Ceiling model (documented, explicit):  u64 lane math lowers to u32 VPU
ops; the chip's int32 lane rate is VPU_GOPS (v5e: 8x128 lanes — ~940
G int32 ops/s/core sustained).  Each kernel's per-element u32-op budget
(OP_BUDGET) counts hardware 32-bit multiplies via their 16-bit-half
decomposition (a 32x32->64 product = 4 muls + 4 carries) plus
adds/compares/selects:

  * Shoup 64-bit modmul: mulhi64 (16) + two 64-bit low muls (12) +
    corrections ~= 28 muls + 30 aux -> 58 ops.
  * Barrett 64x64 modmul: mul64_wide (16) + barrett128 (two mulhi + one
    low mul + carries) ~= 44 muls + 53 aux -> 97 ops.
  * NTT butterfly: one Shoup modmul + modadd + modsub -> 70 ops.
  * Raw-accumulation scan MAC (moduli < 2^48): 9 muls + ~12 adds ->
    21 ops (Barrett reduction amortized over the contraction).
  * Single-u32 scan MAC (tpu32 profile, moduli < 2^32): mul32_wide
    (4 muls + 7 aux) + 4 half-extract/adds -> 15 ops.

Run: python benchmarks/kernels.py [--batch B] [--n N]
"""

import argparse
import json
import sys
import time

import numpy as np

# int32 lane throughput per chip (sustained), by backend kind
VPU_GOPS = {"tpu": 940.0}

# u32 ops per element-op (see module docstring for the derivations)
OP_BUDGET = {
    "modmul_shoup": 58.0,
    "modmul_barrett": 97.0,
    "ntt_butterfly": 70.0,
    "scan_mac": 21.0,
    "scan_mac_u32": 15.0,
}


def _roofline(result: dict, backend: str, rate_key: str, rate: float, budget: str):
    """Attach ceiling_ops_per_sec + achieved_fraction to a result row.

    Ceilings model the VPU (u32-lane) formulation of each op.  Kernels
    that route work onto the MXU instead — the four-step digit-matmul NTT
    and the key switch built on it — can legitimately exceed 1.0: the
    fraction then reads as speedup over the VPU speed-of-light."""
    gops = VPU_GOPS.get(backend)
    if gops is None:
        result["ceiling_" + rate_key] = None
        result["achieved_fraction"] = None
        return
    ceiling = gops * 1e9 / OP_BUDGET[budget]
    result["ceiling_" + rate_key] = round(ceiling, 0)
    result["achieved_fraction"] = round(rate / ceiling, 4)


def _sync(x):
    """Completion barrier that actually works through remote-dispatch
    backends: device_get of a one-element slice (block_until_ready can
    return before remote execution finishes on the axon tunnel, which
    silently turns warmups and timing fences into no-ops)."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    flat = leaf.reshape(-1)[:1] if getattr(leaf, "ndim", 0) else leaf
    jax.device_get(flat)


def bench_op(fn, *args, iters=10):
    """Chained timing: feed the output back as the first input so the device
    cannot overlap iterations, warm until compile is genuinely absorbed,
    and subtract the fixed sync round-trip measured on a no-op."""
    out = fn(*args)
    _sync(out)  # compile + first exec, genuinely awaited
    same_shape = getattr(out, "shape", None) == getattr(args[0], "shape", None)
    # fixed cost of the sync fence itself (tunnel round trip)
    t0 = time.perf_counter()
    _sync(args[0])
    fence = time.perf_counter() - t0
    def run(k):
        t0 = time.perf_counter()
        x = args[0]
        out = None
        for _ in range(k):
            out = fn(x, *args[1:])
            if same_shape:
                x = out
        _sync(out)
        return time.perf_counter() - t0 - fence

    net = run(iters)
    # cheap ops drown in the fence round trip: rescale until signal > noise
    while net < 5 * fence and iters < 2000:
        iters *= 8
        net = run(iters)
    return max(net, 1e-9) / iters


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
    row = {
        "kernel": "ntt_forward",
        "backend": backend,
        "impl": "mxu" if backend == "tpu" else "xla",
        "ceiling_model": "vpu-butterfly",
        "shape": [B, L, N],
        "ms": round(dt * 1e3, 3),
        "ntts_per_sec": round(B * L / dt, 1),
        "butterflies_per_sec": round(butterflies / dt, 0),
    }
    _roofline(row, backend, "butterflies_per_sec", butterflies / dt,
              "ntt_butterfly")
    results.append(row)

    # modmul -------------------------------------------------------------
    lc = tables.limbs
    y = jnp.asarray(np.asarray(x))
    mul_barrett = jax.jit(lambda a, b: lc.mul(a, b))
    dt = bench_op(mul_barrett, x, y, iters=args.iters)
    row = {
        "kernel": "modmul_barrett",
        "backend": backend,
        "elems": B * L * N,
        "ms": round(dt * 1e3, 3),
        "modmuls_per_sec": round(B * L * N / dt, 0),
    }
    _roofline(row, backend, "modmuls_per_sec", B * L * N / dt, "modmul_barrett")
    results.append(row)
    shoup = modular.shoup_precompute(np.asarray(y), np.asarray(lc.q))
    mul_shoup = jax.jit(
        lambda a, w, ws: modular.mul_mod_shoup(a, w, ws, lc.q)
    )
    dt = bench_op(mul_shoup, x, y, jnp.asarray(shoup), iters=args.iters)
    row = {
        "kernel": "modmul_shoup",
        "backend": backend,
        "elems": B * L * N,
        "ms": round(dt * 1e3, 3),
        "modmuls_per_sec": round(B * L * N / dt, 0),
    }
    _roofline(row, backend, "modmuls_per_sec", B * L * N / dt, "modmul_shoup")
    results.append(row)

    # Pallas raw-accumulation scan MAC (the DB-scan production kernel) ----
    if max(int(q).bit_length() for q in moduli) <= 48:
        from pir_tpu.ops import pallas_scan

        D = 128
        P = max(1, B // 16)
        sv = jnp.asarray(
            np.stack(
                [
                    rng.integers(0, q, size=(D, 2, N), dtype=np.uint64)
                    for q in moduli
                ],
                axis=2,
            )
        )  # [D, 2, L, N]
        dbp = jnp.asarray(
            np.stack(
                [
                    rng.integers(0, q, size=(P, D, N), dtype=np.uint64)
                    for q in moduli
                ],
                axis=1,
            )
        )  # [P, L, D, N]
        dbh, dbl = pallas_scan.split_planes(dbp, moduli)
        rh = tuple(int(v) for v in tables.limbs.ratio_hi[:, 0])
        rl = tuple(int(v) for v in tables.limbs.ratio_lo[:, 0])
        interp = backend != "tpu"
        contract = jax.jit(
            lambda s, h, l: pallas_scan.contract_dim_auto(
                s, h, l, tuple(moduli), rh, rl, interpret=interp
            )
        )
        dt = bench_op(contract, sv, dbh, dbl, iters=args.iters)
        macs = P * D * 2 * L * N
        row = {
            "kernel": "pallas_scan_mac",
            "backend": backend,
            "shape": [P, L, D, N],
            "ms": round(dt * 1e3, 3),
            "macs_per_sec": round(macs / dt, 0),
        }
        _roofline(row, backend, "macs_per_sec", macs / dt, "scan_mac")
        results.append(row)

        # single-u32 variant (the tpu32 parameter profile's scan kernel)
        try:
            m32 = tuple(primes.tpu_coeff_modulus(N)[:L])
        except ValueError:
            m32 = None
        if m32 is not None:
            t32 = NttTables(m32, N)
            sv32 = jnp.asarray(
                np.stack(
                    [
                        rng.integers(0, q, size=(D, 2, N), dtype=np.uint64)
                        for q in m32
                    ],
                    axis=2,
                )
            )
            db32 = jnp.asarray(
                np.stack(
                    [
                        rng.integers(0, q, size=(P, D, N), dtype=np.uint64)
                        for q in m32
                    ],
                    axis=1,
                )
            )
            dbh32, dbl32 = pallas_scan.split_planes(db32, m32)
            assert dbh32 is None  # sub-32-bit: lo plane only
            rh32 = tuple(int(v) for v in t32.limbs.ratio_hi[:, 0])
            rl32 = tuple(int(v) for v in t32.limbs.ratio_lo[:, 0])
            contract32 = jax.jit(
                lambda s, l: pallas_scan.contract_dim_auto(
                    s, None, l, m32, rh32, rl32, interpret=interp
                )
            )
            dt = bench_op(contract32, sv32, dbl32, iters=args.iters)
            row = {
                "kernel": "pallas_scan_mac_u32",
                "backend": backend,
                "shape": [P, L, D, N],
                "ms": round(dt * 1e3, 3),
                "macs_per_sec": round(macs / dt, 0),
            }
            _roofline(row, backend, "macs_per_sec", macs / dt, "scan_mac_u32")
            results.append(row)

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
    # composite op model per key switch (ops/keyswitch.py pipeline):
    # decompose (L*Lp barrett_reduce_64 ~30 ops) + forward NTT over QP of
    # the digits + inner product (2*L*Lp barrett modmuls) + inverse NTT of
    # the two output polys + P scale-down (~96 ops per ct-limb coeff).
    Lc, Lp, logN = ctx.L, ctx.Lp, int(np.log2(N))
    ks_ops_per_coeff = (
        Lc * Lp * 30
        + (Lc * Lp + 2 * Lp) * (logN / 2) * OP_BUDGET["ntt_butterfly"]
        + 2 * Lc * Lp * OP_BUDGET["modmul_barrett"]
        + 2 * Lc * 96
    )
    row = {
        "kernel": "galois_keyswitch",
        "backend": backend,
        "batch": kb,
        "ms": round(dt * 1e3, 3),
        "keyswitches_per_sec": round(kb / dt, 1),
    }
    gops = VPU_GOPS.get(backend)
    if gops is None:
        row["ceiling_keyswitches_per_sec"] = None
        row["achieved_fraction"] = None
    else:
        ceiling = gops * 1e9 / (ks_ops_per_coeff * N)
        row["ceiling_keyswitches_per_sec"] = round(ceiling, 1)
        row["achieved_fraction"] = round(kb / dt / ceiling, 4)
    results.append(row)

    # key switch, tpu32 profile (sub-32-bit chain: 4-mul u32 inner product)
    try:
        params32 = create_pir_parameters(
            16, 0, 1, generate_encryption_params(N, 20, profile="tpu32")
        )
    except ValueError:
        params32 = None
    if params32 is not None:
        ctx32 = PirContext(params32)
        sk32 = keys_mod.gen_secret_key(ctx32, np.random.default_rng(1))
        gk32 = keys_mod.gen_galois_keys(
            ctx32, sk32, [N + 1], np.random.default_rng(1)
        )
        cts32 = jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            rng.integers(0, q, size=(2, N), dtype=np.uint64)
                            for q in ctx32.ct_moduli
                        ],
                        axis=1,
                    )
                    for _ in range(kb)
                ]
            )
        )
        gkarr32 = {N + 1: jnp.asarray(gk32[N + 1].data)}
        apply_g32 = jax.jit(
            lambda c, k: keyswitch.apply_galois(ctx32, k, c, N + 1)
        )
        dt = bench_op(apply_g32, cts32, gkarr32, iters=args.iters)
        results.append({
            "kernel": "galois_keyswitch_tpu32",
            "backend": backend,
            "batch": kb,
            "L": ctx32.L,
            "Lp": ctx32.Lp,
            "ms": round(dt * 1e3, 3),
            "keyswitches_per_sec": round(kb / dt, 1),
        })

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    main()
