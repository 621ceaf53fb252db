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


@pytest.mark.parametrize(
    "d,batch,limb,q_bits",
    [
        (1, 1, 2, (26, 27, 28)),
        (2, 1, 2, (26, 27, 28)),
        (2, 2, 2, (26, 27, 28)),
        # four ct limbs, 4-way limb mesh
        (2, 1, 4, (26, 27, 28, 29, 30)),
        # unequal digit ratios per limb (3 vs 4) exercise the padded
        # all-gather decomposition
        (2, 1, 2, (26, 34, 36)),
    ],
)
def test_limb_sharded_matches_unsharded(d, batch, limb, q_bits):
    assert len(jax.devices()) == 8
    params = tiny_pir_params(
        dbsize=30, bytes_per_item=8, dimensions=d, n=64, q_bits=q_bits
    )
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    server = PirServer.create(db, params)
    mesh = sharded.default_mesh(batch=batch, limb=limb)
    assert dict(mesh.shape)["limb"] == limb

    indices = [3, 17, 29, 11][: 2 * batch] or [3]
    queries = [client._create_query(i) for i in indices]
    q = sharded.pad_axis(
        jnp.asarray(np.stack(queries)), 0, dict(mesh.shape)["batch"]
    )
    gk = {e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()}

    pipeline = sharded.make_sharded_pipeline(
        db.ctx, params.dimensions, db.db_ntt, mesh
    )
    replies = pipeline(q, gk)

    for qi in range(len(indices)):
        single = server._pipeline(queries[qi].shape[0])(
            jnp.asarray(queries[qi]), gk, None, db.db_ntt, db.db_ntt_shoup
        )
        assert (np.asarray(replies[qi]) == np.asarray(single)).all(), qi


def test_limb_sharded_end_to_end_decode():
    params = tiny_pir_params(dbsize=30, bytes_per_item=8, dimensions=2, n=64)
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    mesh = sharded.default_mesh(batch=2, limb=2)  # db=2 x batch=2 x limb=2
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


def _planes_of(db):
    """The Pallas-scan operand planes for a database (what
    PirDatabase._finalize builds when scan_impl="pallas")."""
    from pir_tpu.ops import pallas_scan

    inner = db.params.dimensions[-1]
    prefix = db.padded_size // inner
    grouped = jnp.asarray(db.db_ntt).reshape(prefix, inner, db.ctx.L, db.ctx.n)
    return pallas_scan.split_planes(
        jnp.transpose(grouped, (0, 2, 1, 3)), db.ctx.ct_moduli
    )


@pytest.mark.parametrize("d,batch", [(1, 1), (2, 2), (3, 2)])
def test_sharded_planes_matches_unsharded(d, batch):
    """The Pallas raw-accumulation kernel (interpret mode on the CPU mesh)
    under db x batch sharding is bit-exact vs the unsharded XLA path."""
    params, raw, db, client, server = _setup(d)
    mesh = sharded.default_mesh(batch=batch)
    indices = [3, 17, 29, 11][: 2 * batch] or [3]
    queries = [client._create_query(i) for i in indices]
    q = sharded.pad_axis(jnp.asarray(np.stack(queries)), 0, mesh.shape["batch"])
    gk = {e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()}

    pipeline = sharded.make_sharded_pipeline(
        db.ctx, params.dimensions, None, mesh, db_planes=_planes_of(db)
    )
    replies = pipeline(q, gk)
    for qi in range(len(indices)):
        single = server._pipeline(queries[qi].shape[0])(
            jnp.asarray(queries[qi]), gk, None, db.db_ntt, db.db_ntt_shoup
        )
        assert (np.asarray(replies[qi]) == np.asarray(single)).all(), qi


@pytest.mark.parametrize("limb,q_bits", [(2, (26, 27, 28)), (2, (26, 34, 36))])
def test_limb_sharded_planes_matches_unsharded(limb, q_bits):
    """Limb-sharded mesh with the runtime-constants Pallas kernel
    (contract_dim_raw_dyn): per-device moduli arrive as traced SMEM words."""
    params = tiny_pir_params(
        dbsize=30, bytes_per_item=8, dimensions=2, n=64, q_bits=q_bits
    )
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    server = PirServer.create(db, params)
    mesh = sharded.default_mesh(batch=1, limb=limb)
    indices = [3, 29]
    queries = [client._create_query(i) for i in indices]
    q = jnp.asarray(np.stack(queries))
    gk = {e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()}

    pipeline = sharded.make_sharded_pipeline(
        db.ctx, params.dimensions, None, mesh, db_planes=_planes_of(db)
    )
    replies = pipeline(q, gk)
    for qi in range(len(indices)):
        single = server._pipeline(queries[qi].shape[0])(
            jnp.asarray(queries[qi]), gk, None, db.db_ntt, db.db_ntt_shoup
        )
        assert (np.asarray(replies[qi]) == np.asarray(single)).all(), qi


@pytest.mark.parametrize("limb,q_bits", [(2, (26, 27, 28)), (2, (26, 34, 36))])
def test_limb_sharded_mxu_ntt_matches_unsharded(limb, q_bits):
    """The production MXU NTT (runtime-constants variant, interpret mode)
    on the limb mesh at a supported ring size (n=1024).

    This covers the round-3 blind spot: CPU meshes resolve "auto" to
    "xla" and the small-ring mesh tests sat below
    pallas_mxu_ntt.supported()'s floor, so the kernel never ran under a
    limb shard — where its per-limb constants are traced device slices.
    N=4096 is the smallest kernel-supported ring whose 128-bit-security
    modulus bound admits a 3-limb test chain (1024 allows 27 bits total).
    """
    from pir_tpu.ops import ntt as ntt_mod

    params = tiny_pir_params(
        dbsize=6, bytes_per_item=0, dimensions=2, n=4096, t_bits=20,
        q_bits=q_bits,
    )
    raw = generate_test_db(params.num_items, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    server = PirServer.create(db, params)
    mesh = sharded.default_mesh(batch=1, limb=limb)
    indices = [5]
    queries = [client._create_query(i) for i in indices]
    q = jnp.asarray(np.stack(queries))
    gk = {e: jnp.asarray(k.data) for e, k in client.galois_keys.keys.items()}

    with ntt_mod.use_impl("mxu_interpret"):
        pipeline = sharded.make_sharded_pipeline(
            db.ctx, params.dimensions, db.db_ntt, mesh
        )
        replies = np.asarray(pipeline(q, gk))

    for qi in range(len(indices)):
        single = server._pipeline(queries[qi].shape[0])(
            jnp.asarray(queries[qi]), gk, None, db.db_ntt, db.db_ntt_shoup
        )
        assert (replies[qi] == np.asarray(single)).all(), qi


@pytest.mark.parametrize("batch,limb", [(1, 1), (2, 1), (2, 2)])
def test_mesh_backed_server_roundtrip(batch, limb):
    """PirServer(mesh=...) serves the full protocol surface — proto in,
    proto out — through the sharded pipeline, bit-exact vs the single-chip
    server (the serving surface of server.cpp:44-63 on a mesh)."""
    params, raw, db, client, server = _setup(2)
    mesh = sharded.default_mesh(batch=batch, limb=limb)
    mesh_server = PirServer(db, params, mesh=mesh)

    indices = [3, 17, 29][: max(2, batch)]
    request = client.create_request(indices)
    resp_mesh = mesh_server.process_request(request)
    resp_single = server.process_request(request)
    assert resp_mesh.SerializeToString() == resp_single.SerializeToString()
    out = client.process_response(indices, resp_mesh)
    for i, idx in enumerate(indices):
        assert out[i] == raw[idx]
    # batched entry routes through the same mesh pipeline
    resp_b = mesh_server.process_request_batched(request)
    assert resp_b.SerializeToString() == resp_single.SerializeToString()


@pytest.mark.parametrize("d,batch", [(1, 2), (2, 1)])
def test_mesh_backed_server_ct_mult_roundtrip(d, batch):
    """Ciphertext-multiplication recursion through the mesh server
    (db/batch axes): proto-identical to single-chip, decodes correctly."""
    params = tiny_pir_params(
        dbsize=30, bytes_per_item=8, dimensions=d, n=64,
        use_ciphertext_multiplication=True,
    )
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=5)
    server = PirServer.create(db, params)
    mesh_server = PirServer(
        db, params, mesh=sharded.default_mesh(batch=batch)
    )
    indices = [3, 29]
    request = client.create_request(indices)
    resp_mesh = mesh_server.process_request(request)
    resp_single = server.process_request(request)
    assert resp_mesh.SerializeToString() == resp_single.SerializeToString()
    out = client.process_response(indices, resp_mesh)
    for i, idx in enumerate(indices):
        assert out[i] == raw[idx]


def test_mesh_backed_server_ct_mult_rejects_limb_axis():
    params = tiny_pir_params(
        dbsize=10, bytes_per_item=8, dimensions=1, n=64,
        use_ciphertext_multiplication=True,
    )
    raw = generate_test_db(10, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    with pytest.raises(ValueError, match="limb"):
        PirServer(db, params, mesh=sharded.default_mesh(batch=1, limb=2))


def test_limb_mesh_rejects_bad_widths():
    params = tiny_pir_params(dbsize=30, bytes_per_item=8, dimensions=2, n=64)
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    mesh = sharded.default_mesh(batch=1, limb=4)  # L=2 not divisible by 4
    with pytest.raises(ValueError, match="must divide"):
        sharded.make_sharded_pipeline(db.ctx, params.dimensions, db.db_ntt, mesh)
    mesh2 = sharded.default_mesh(batch=1, limb=2)
    with pytest.raises(ValueError, match="reply_limbs"):
        sharded.make_sharded_pipeline(
            db.ctx, params.dimensions, db.db_ntt, mesh2, reply_limbs=1
        )


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
