import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax
jax.config.update("jax_platforms", "axon,cpu")
print("backend:", jax.default_backend(), jax.devices())
from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer

db_size = 1 << 16
params = create_pir_parameters(db_size, 288, 2, generate_encryption_params(4096, 24))
rng = np.random.default_rng(1)
raw = [rng.integers(0,256,288,dtype=np.uint8).tobytes() for _ in range(db_size)]
t0=time.perf_counter()
db = PirDatabase.create(raw, params)
print("scan_impl:", db.scan_impl, "setup", time.perf_counter()-t0)
client = PirClient(params, seed=7, compress_queries=True)
server = PirServer(db, params)
req = client.create_request([db_size//3])
t0=time.perf_counter(); resp = server.process_request(req); print("first (compile):", time.perf_counter()-t0)
out = client.process_response([db_size//3], resp)
assert out[0] == raw[db_size//3], "MISMATCH"
print("correct!")
t0=time.perf_counter()
iters=10
for _ in range(iters): resp = server.process_request(req)
dt=time.perf_counter()-t0
print(f"qps={iters/dt:.3f}")
