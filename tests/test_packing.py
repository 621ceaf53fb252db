"""Packed host<->device transfer layout (ops/packing.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pir_tpu.ops import packing
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer
from pir_tpu.testing.fixtures import generate_test_db
from pir_tpu.testing.params import tiny_pir_params


def test_hi_dtype_selection():
    assert packing.hi_dtype_for([1 << 30]) == np.dtype(np.uint8)
    assert packing.hi_dtype_for([(1 << 37) - 1]) == np.dtype(np.uint8)
    assert packing.hi_dtype_for([(1 << 44) - 1]) == np.dtype(np.uint16)
    assert packing.hi_dtype_for([(1 << 50) - 1]) is None


@pytest.mark.parametrize("bits,dt", [(37, np.uint8), (44, np.uint16)])
def test_host_roundtrip(bits, dt):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << bits, size=(3, 2, 64), dtype=np.uint64)
    lo, hi = packing.split_host(a, np.dtype(dt))
    assert lo.dtype == np.uint32 and hi.dtype == dt
    assert np.array_equal(packing.join_host(lo, hi), a)


def test_device_roundtrip_matches_host():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 37, size=(2, 3, 64), dtype=np.uint64)
    lo, hi = packing.split_host(a, np.dtype(np.uint8))
    joined = jax.jit(packing.join_device)(jnp.asarray(lo), jnp.asarray(hi))
    assert np.array_equal(np.asarray(joined), a)
    d_lo, d_hi = jax.jit(
        lambda x: packing.split_device(x, np.uint8)
    )(jnp.asarray(a))
    assert np.array_equal(np.asarray(d_lo), lo)
    assert np.array_equal(np.asarray(d_hi), hi)


@pytest.mark.parametrize("packed", [True, False])
def test_pir_roundtrip_both_transfer_layouts(packed):
    params = tiny_pir_params(dbsize=40, bytes_per_item=8, dimensions=2, n=64)
    raw = generate_test_db(params.num_items, params.bytes_per_item, seed=41)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=42)
    server = PirServer(db, params, packed_transfer=packed)
    assert (server._hi_dtype is not None) == packed

    indices = [5, 39]
    response = server.process_request(client.create_request(indices))
    assert client.process_response(indices, response) == [
        raw[i] for i in indices
    ]
