"""Where does the pipeline compile time go? (stage-by-stage jit timing)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "axon,cpu")
print("backend:", jax.default_backend())

from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.core.context import PirContext
from pir_tpu.ops import pallas_scan, scan, expand

db_size = 1 << 16
params = create_pir_parameters(db_size, 288, 2, generate_encryption_params(4096, 24))
ctx = PirContext(params)
dims = params.dimensions
print("dims:", dims)
total = 1
for d in dims: total *= d
inner = dims[-1]
prefix = total // inner
L, N = ctx.L, ctx.n

rng = np.random.default_rng(0)
db = rng.integers(0, ctx.ct_moduli[0], size=(total, L, N), dtype=np.uint64)
sv = rng.integers(0, ctx.ct_moduli[0], size=(sum(dims), 2, L, N), dtype=np.uint64)
db_j = jnp.asarray(db); sv_j = jnp.asarray(sv)
grouped = db_j.reshape(prefix, inner, L, N)
planes = pallas_scan.split_planes(jnp.transpose(grouped, (0, 2, 1, 3)), ctx.ct_moduli)
jax.block_until_ready(planes)

# 1. inner contraction alone (pallas raw)
t0 = time.perf_counter()
r = scan.contract_dim_planes(ctx, sv_j[dims[0]:], planes[0], planes[1])
jax.block_until_ready(r)
print("inner pallas contraction compile+run:", time.perf_counter() - t0)
t0 = time.perf_counter()
r = scan.contract_dim_planes(ctx, sv_j[dims[0]:], planes[0], planes[1])
jax.block_until_ready(r)
print("  steady:", time.perf_counter() - t0)

# 2. full decomp scan (pallas)
f = jax.jit(lambda s: scan.database_scan_decomp(ctx, None, dims, s, db_planes=planes))
t0 = time.perf_counter()
r = f(sv_j); jax.block_until_ready(r)
print("full scan (pallas) compile+run:", time.perf_counter() - t0)
t0 = time.perf_counter()
r = f(sv_j); jax.block_until_ready(r)
print("  steady:", time.perf_counter() - t0)

# 3. full decomp scan (xla)
f2 = jax.jit(lambda s: scan.database_scan_decomp(ctx, db_j, dims, s))
t0 = time.perf_counter()
r = f2(sv_j); jax.block_until_ready(r)
print("full scan (xla, no shoup) compile+run:", time.perf_counter() - t0)
t0 = time.perf_counter()
r = f2(sv_j); jax.block_until_ready(r)
print("  steady:", time.perf_counter() - t0)
