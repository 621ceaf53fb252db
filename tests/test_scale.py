"""Scaled-ladder coverage (BASELINE config 5 path, shrunk to CI size).

Streams a six-figure-item database through the sharded ingest
(PirDatabase.ingest_shards — constant memory, native bulk encoder),
reassembles it from the per-shard checkpoints, and serves a query
through the mesh-backed server on the 8-device CPU mesh — the exact
pipeline a 16M-item multi-host deployment runs, at a size CI can hold.
"""

import numpy as np
import pytest

from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer


def _item(i: int, size: int) -> bytes:
    rng = np.random.default_rng(i)
    return rng.integers(0, 256, size, dtype=np.uint8).tobytes()


def test_shard_row_ranges_cover_exactly():
    params = create_pir_parameters(
        100_000, 288, 2, generate_encryption_params(4096, 24)
    )
    db = PirDatabase(params)
    for n_shards in (1, 2, 4, 8):
        ranges = db.shard_row_ranges(n_shards)
        assert ranges[0][0] == 0 and ranges[-1][1] == params.num_pt
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 == b0  # contiguous, disjoint


@pytest.mark.slow
def test_streaming_sharded_ingest_and_mesh_serve(tmp_path):
    n_items = 120_000
    params = create_pir_parameters(
        n_items, 288, 2, generate_encryption_params(4096, 24)
    )
    size = params.bytes_per_item

    # streaming ingest: a generator — nothing but one chunk in memory
    paths = PirDatabase.ingest_shards(
        (_item(i, size) for i in range(n_items)),
        params,
        tmp_path,
        n_shards=4,
        chunk_pts=256,
    )
    assert len(paths) == 4

    db = PirDatabase.load_shards(tmp_path, params)
    # bit-exact vs direct ingestion on a spot-checked row range
    direct = PirDatabase.create([_item(i, size) for i in range(n_items)], params)
    assert np.array_equal(db.db_pts, direct.db_pts)

    # per-shard rows are exactly the db-mesh operand slices
    ranges = db.shard_row_ranges(4)
    for s, (r0, r1) in enumerate(ranges):
        if r1 > r0:
            rows = PirDatabase.load_shard_rows(tmp_path, s)
            assert np.array_equal(rows[: r1 - r0], db.db_pts[r0:r1])

    # serve one query through the mesh-backed server on the CPU mesh
    from pir_tpu.parallel import sharded

    mesh = sharded.default_mesh(batch=2)
    server = PirServer(db, params, mesh=mesh)
    client = PirClient(params, seed=11)
    idx = [123, 67_890]
    resp = server.process_request(client.create_request(idx))
    out = client.process_response(idx, resp)
    for i, j in enumerate(idx):
        assert out[i] == _item(j, size)
