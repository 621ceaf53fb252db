import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""Verify-skill drive: params golden + full PIR roundtrip on the real TPU,
sequential AND batched serving, retrieved bytes checked against the DB."""
import time
import numpy as np

from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer

# 1. params golden (SEAL 3.5 BFVDefault)
ep = generate_encryption_params(4096, 20)
assert ep.plain_modulus == 0xFC001, hex(ep.plain_modulus)
assert set(ep.coeff_modulus) == {0xffffee001, 0xffffc4001, 0x1ffffe0001}
print("params golden ok", flush=True)

# 2. full roundtrip, 65536 items, benchmark.cpp config
import jax
db_size = 65536
params = create_pir_parameters(db_size, 288, 2, generate_encryption_params(4096, 24))
rng = np.random.default_rng(3)
raw = [rng.integers(0, 256, 288, dtype=np.uint8).tobytes() for _ in range(db_size)]
db = PirDatabase.create(raw, params)
client = PirClient(params, seed=7, compress_queries=True)
server = PirServer(db, params)
idx = [123, 4096, 65535, 31337]
t0 = time.perf_counter()
req = client.create_request(idx[:1])
resp = server.process_request(req)
out = client.process_response(idx[:1], resp)
assert out[0] == raw[idx[0]], "sequential retrieval mismatch"
print(f"sequential roundtrip ok ({time.perf_counter()-t0:.0f}s incl compile)", flush=True)

# 3. batched serving over the wide scan kernel
t0 = time.perf_counter()
req4 = client.create_request(idx)
bat = server.process_request_batched(req4)
out = client.process_response(idx, bat)
for i, ix in enumerate(idx):
    assert out[i] == raw[ix], f"batched retrieval mismatch at {ix}"
# byte-identical to sequential serving
seq = server.process_request(req4)
for a, b in zip(seq.reply, bat.reply):
    assert list(a.ct) == list(b.ct), "batched reply differs from sequential"
print(f"batched roundtrip ok, bit-exact ({time.perf_counter()-t0:.0f}s incl compile)", flush=True)

# timing: batched aggregate vs sequential at this size
for B in (4, 8):
    ixs = [int(x) for x in np.random.default_rng(B).integers(0, db_size, B)]
    reqB = client.create_request(ixs)
    server.process_request_batched(reqB)  # warm shape
    t0 = time.perf_counter(); iters = 6
    for _ in range(iters):
        server.process_request_batched(reqB)
    dt = (time.perf_counter() - t0) / iters
    print(f"batch {B}: {dt*1e3:.1f} ms -> {B/dt:.1f} q/s aggregate", flush=True)
t0 = time.perf_counter(); iters = 6
for _ in range(iters):
    server.process_request(req)
dt = (time.perf_counter() - t0) / iters
print(f"sequential: {dt*1e3:.1f} ms/query -> {1/dt:.1f} q/s", flush=True)
print("VERIFY OK", flush=True)
