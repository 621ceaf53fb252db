"""Sharded pipeline on the 8-device CPU mesh: sharded == unsharded."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pir_tpu.parallel import sharded
from pir_tpu.pir import wire
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer
from pir_tpu.testing.fixtures import generate_test_db
from pir_tpu.testing.params import tiny_pir_params


def _setup(d, dbsize=30):
    params = tiny_pir_params(dbsize=dbsize, bytes_per_item=8, dimensions=d, n=64)
    raw = generate_test_db(dbsize, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    server = PirServer.create(db, params)
    return params, raw, db, client, server


@pytest.mark.parametrize("d,batch", [(1, 1), (2, 1), (2, 2), (3, 2)])
def test_sharded_matches_unsharded(d, batch):
    assert len(jax.devices()) == 8
    params, raw, db, client, server = _setup(d)
    mesh = sharded.default_mesh(batch=batch)

    indices = [3, 17, 29, 11][: 2 * batch] or [3]
    queries = [client._create_query(i) for i in indices]
    q = sharded.pad_axis(jnp.asarray(np.stack(queries)), 0, mesh.shape["batch"])
    gk = {
        e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()
    }

    pipeline = sharded.make_sharded_pipeline(
        db.ctx, params.dimensions, db.db_ntt, mesh
    )
    replies = pipeline(q, gk)

    # unsharded reference result, query by query
    for qi in range(len(indices)):
        single = server._pipeline(queries[qi].shape[0])(
            jnp.asarray(queries[qi]), gk, None, db.db_ntt, db.db_ntt_shoup
        )
        assert (np.asarray(replies[qi]) == np.asarray(single)).all(), qi


def test_sharded_end_to_end_decode():
    params, raw, db, client, server = _setup(2)
    mesh = sharded.default_mesh(batch=2)
    indices = [0, 29]
    queries = np.stack([client._create_query(i) for i in indices])
    gk = {e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()}
    pipeline = sharded.make_sharded_pipeline(
        db.ctx, params.dimensions, db.db_ntt, mesh
    )
    replies = np.asarray(pipeline(jnp.asarray(queries), gk))

    from pir_tpu.proto import payload_pb2 as pb

    resp = pb.Response()
    for qi in range(len(indices)):
        wire.save_ciphertexts(replies[qi], resp.reply.add())
    out = client.process_response(indices, resp)
    for i, idx in enumerate(indices):
        assert out[i] == raw[idx]


def test_sharded_with_shrunken_reply():
    params = tiny_pir_params(
        dbsize=30, bytes_per_item=8, dimensions=2, n=128, q_bits=(30, 30, 32)
    )
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    mesh = sharded.default_mesh(batch=2)
    indices = [0, 29]
    queries = np.stack([client._create_query(i) for i in indices])
    gk = {e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()}
    pipeline = sharded.make_sharded_pipeline(
        db.ctx, params.dimensions, db.db_ntt, mesh, reply_limbs=1
    )
    replies = np.asarray(pipeline(jnp.asarray(queries), gk))
    assert replies.shape[-2] == 1  # single limb crossed the wire

    from pir_tpu.proto import payload_pb2 as pb

    resp = pb.Response()
    for qi in range(len(indices)):
        wire.save_ciphertexts(replies[qi], resp.reply.add())
    out = client.process_response(indices, resp)
    for i, idx in enumerate(indices):
        assert out[i] == raw[idx]
