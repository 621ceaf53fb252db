"""Stage-level timing of the 1M-item pipeline on the TPU."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "axon,cpu")

from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.core.context import PirContext
from pir_tpu.ops import expand, scan, decompose
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer

import os
db_size = int(os.environ.get("DB", 1 << 20))
profile = os.environ.get("PROFILE", "seal")
params = create_pir_parameters(
    db_size, 288, 2, generate_encryption_params(4096, 24, profile=profile)
)
ctx = PirContext(params)
dims = params.dimensions
dim_sum = params.dimensions_sum
print("dims:", dims, "num_pt:", params.num_pt, flush=True)

rng = np.random.default_rng(42)
raw = [rng.integers(0, 256, 288, dtype=np.uint8).tobytes() for _ in range(4096)]
raw = [raw[i % len(raw)] for i in range(db_size)]
t0 = time.perf_counter()
db = PirDatabase.create(raw, params)
print(f"db setup {time.perf_counter()-t0:.1f}s scan_impl={db.scan_impl}", flush=True)
client = PirClient(params, seed=7, compress_queries=True)
server = PirServer(db, params)
req = client.create_request([db_size // 3])

# end-to-end reference timing
t0 = time.perf_counter(); resp = server.process_request(req); print(f"first e2e (compile) {time.perf_counter()-t0:.1f}s", flush=True)
out = client.process_response([db_size // 3], resp)
assert out[0] == raw[db_size // 3]
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    resp = server.process_request(req)
dt = time.perf_counter() - t0
print(f"e2e qps={iters/dt:.3f}  per-query {dt/iters*1000:.1f} ms", flush=True)

# --- stage bisection (device-resident, block_until_ready) ---
from pir_tpu.pir import wire
gk_arrays, rk = server._device_keys(req)
cts = wire.load_ciphertexts(req.query[0], ctx)
q_dev = jnp.asarray(cts)
dbh, dbl = server.db.db_planes

f_expand = jax.jit(lambda q, gk: expand.expand_query(ctx, gk, q, dim_sum))
sv = jax.block_until_ready(f_expand(q_dev, gk_arrays))
f_ntt = jax.jit(lambda s: ctx.ntt_q.forward(s))
sv_ntt = jax.block_until_ready(f_ntt(sv))
f_scan = jax.jit(lambda s, h, l: scan.database_scan_decomp(ctx, None, dims, s, db_planes=(h, l)))
reply = jax.block_until_ready(f_scan(sv_ntt, dbh, dbl))

def bench(name, fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1000:8.2f} ms", flush=True)
    return r

bench("expand_query", f_expand, q_dev, gk_arrays)
bench("ntt_forward(sv)", f_ntt, sv)
bench("full scan (planes)", f_scan, sv_ntt, dbh, dbl)

# scan internals: inner contraction vs upper level
inner = dims[-1]; prefix = int(np.prod(dims)) // inner
sv_last = sv_ntt[-inner:]
f_inner = jax.jit(lambda s, h, l: scan.contract_dim_planes(ctx, s, h, l))
bench("inner contraction", f_inner, sv_last, dbh, dbl)

res = jax.block_until_ready(jax.jit(lambda s,h,l: ctx.ntt_q.inverse(scan.contract_dim_planes(ctx, s, h, l)))(sv_last, dbh, dbl))
f_intt = jax.jit(lambda r: ctx.ntt_q.inverse(r))
bench("intt(inner result)", f_intt, jax.block_until_ready(jax.jit(lambda s,h,l: scan.contract_dim_planes(ctx,s,h,l))(sv_last,dbh,dbl)))

f_dec = jax.jit(lambda r: decompose.decompose_ct(ctx, r[:, None]))
pts = bench("decompose", f_dec, res)
f_dntt = jax.jit(lambda p: ctx.ntt_q.forward(jnp.broadcast_to(p[..., None, :], p.shape[:-1] + (ctx.L, ctx.n))))
bench("ntt(digits)", f_dntt, pts)

# transfer: host->device query + keys cached; device->host reply
t0 = time.perf_counter()
for _ in range(50):
    x = jax.device_get(reply)
print(f"{'reply device_get':30s} {(time.perf_counter()-t0)/50*1000:8.2f} ms", flush=True)
t0 = time.perf_counter()
for _ in range(50):
    y = jax.block_until_ready(jnp.asarray(cts))
print(f"{'query host->device':30s} {(time.perf_counter()-t0)/50*1000:8.2f} ms", flush=True)
print("reply shape/bytes:", reply.shape, reply.nbytes, " query bytes:", cts.nbytes, flush=True)
