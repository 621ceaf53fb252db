"""Bisect steady-state throughput of the pallas-path scan stages (scratch).

Distinct pre-uploaded inputs per iteration defeat the axon tunnel's
identical-dispatch memoization; block at the end measures throughput.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "axon,cpu")

from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.core.context import PirContext
from pir_tpu.ops import pallas_scan, scan, decompose

db_size = 1 << 16
params = create_pir_parameters(db_size, 288, 2, generate_encryption_params(4096, 24))
ctx = PirContext(params)
dims = params.dimensions
total = 1
for d in dims: total *= d
inner = dims[-1]; prefix = total // inner
L, N = ctx.L, ctx.n
print("dims:", dims, flush=True)

rng = np.random.default_rng(0)
db = rng.integers(0, ctx.ct_moduli[0], size=(total, L, N), dtype=np.uint64)
db_j = jnp.asarray(db)
grouped = db_j.reshape(prefix, inner, L, N)
planes = pallas_scan.split_planes(jnp.transpose(grouped, (0, 2, 1, 3)), ctx.ct_moduli)
jax.block_until_ready(planes)

K = 10

def timeit(name, f, variants, *rest):
    """variants: list of K distinct first-args; rest: shared args."""
    out = jax.block_until_ready(f(variants[0], *rest))
    t0 = time.perf_counter()
    outs = [f(v, *rest) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(variants)
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return out

def svs(count, size):
    return [
        jnp.asarray(rng.integers(0, ctx.ct_moduli[0], size=size, dtype=np.uint64))
        for _ in range(count)
    ]

sv_variants = svs(K, (sum(dims), 2, L, N))
sv_last_v = [s[dims[0]:] for s in sv_variants]
sv0_v = [s[: dims[0]] for s in sv_variants]

f1 = jax.jit(lambda s, h, l: scan.contract_dim_planes(ctx, s, h, l))
r1 = timeit("1 inner contraction (pallas)", f1, sv_last_v, planes[0], planes[1])

items = db_j.reshape(prefix, inner, L, N)
f1x = jax.jit(lambda s, d: scan.contract_dim(ctx, s, d))
r1x = timeit("1x inner contraction (xla, no shoup)", f1x, sv_last_v, items)

r1_v = [jax.block_until_ready(f1(s, planes[0], planes[1])) for s in sv_last_v]
f2 = jax.jit(lambda r: ctx.ntt_q.inverse(r))
r2 = timeit("2 INTT of result", f2, r1_v)

r2_v = [jax.block_until_ready(f2(r)) for r in r1_v]
f3 = jax.jit(lambda r: decompose.decompose_ct(ctx, r[:, None]))
r3 = timeit("3 decompose_ct", f3, r2_v)

r3_v = [jax.block_until_ready(f3(r)) for r in r2_v]
def fwd(pts):
    return ctx.ntt_q.forward(
        jnp.broadcast_to(pts[..., None, :], pts.shape[:-1] + (L, N))
    )
f4 = jax.jit(fwd)
r4 = timeit("4 NTT forward digits", f4, r3_v)

r4_v = [jax.block_until_ready(f4(r)) for r in r3_v]
newC = r4.shape[1] * r4.shape[2]
def flat(p):
    items = p.reshape(1, dims[0], newC, L, N)
    return items.transpose(0, 2, 1, 3, 4).reshape(newC, dims[0], L, N)
f5 = jax.jit(lambda p: scan.items_to_planes(ctx, flat(p)))
r5 = timeit("5 items_to_planes (transpose+split)", f5, r4_v)

r5_v = [jax.block_until_ready(f5(r)) for r in r4_v]
f6 = jax.jit(lambda hl, s: scan.contract_dim_planes(ctx, s, hl[0], hl[1]))
r6 = timeit("6 upper contraction (pallas)", f6, r5_v, sv0_v[0])

f8 = jax.jit(lambda p, s: scan.contract_dim(ctx, s, flat(p)))
timeit("8 upper contraction (xla)", f8, r4_v, sv0_v[0])

fp = jax.jit(lambda s, h, l: scan.database_scan_decomp(ctx, None, dims, s, db_planes=(h, l)))
t0 = time.perf_counter(); jax.block_until_ready(fp(sv_variants[0], planes[0], planes[1]))
print("full scan (pallas) compile+run:", round(time.perf_counter()-t0, 1), flush=True)
timeit("9 full scan (pallas)", fp, sv_variants, planes[0], planes[1])

fx = jax.jit(lambda s, d: scan.database_scan_decomp(ctx, d, dims, s))
t0 = time.perf_counter(); jax.block_until_ready(fx(sv_variants[0], db_j))
print("full scan (xla) compile+run:", round(time.perf_counter()-t0, 1), flush=True)
timeit("10 full scan (xla, no shoup)", fx, sv_variants, db_j)
