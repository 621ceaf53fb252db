"""Database scan — parity with database_test.cpp: true dot product against
plaintext expectation, multi-dim retrieval, index math goldens."""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.ops import decompose
from pir_tpu.pir.database import PirDatabase
from pir_tpu.testing.fixtures import generate_test_db, make_toolkit
from pir_tpu.testing.params import tiny_pir_params
from pir_tpu.utils.math import invert_mod


def _selection_vector(tk, dims, indices):
    """Pre-expanded selection vector: Enc(1) at the chosen index per dim."""
    cts = []
    for d, dim in enumerate(dims):
        for j in range(dim):
            m = np.zeros(tk.ctx.n, dtype=np.uint64)
            if j == indices[d]:
                m[0] = 1
            cts.append(np.asarray(enc_mod.encrypt(tk.ctx, tk.pk, m, tk.rng)))
    return jnp.asarray(np.stack(cts))


def test_multiply_d1_retrieves_item():
    params = tiny_pir_params(dbsize=40, bytes_per_item=8, dimensions=1, n=64)
    tk = make_toolkit(params)
    raw = generate_test_db(40, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    assert params.items_per_plaintext >= 1

    target = 17
    pt_index = target // params.items_per_plaintext
    sv = _selection_vector(tk, params.dimensions, [pt_index])
    reply = db.multiply(sv)
    assert reply.shape[0] == 1
    got_pt = enc_mod.decrypt(tk.ctx, tk.sk, reply[0])
    assert (got_pt == db.db_pts[pt_index]).all()


def test_multiply_d2_digit_recompose():
    params = tiny_pir_params(dbsize=30, bytes_per_item=8, dimensions=2, n=64)
    tk = make_toolkit(params)
    raw = generate_test_db(30, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    dims = params.dimensions
    assert len(dims) == 2

    target_pt = params.num_pt - 1
    i0, i1 = target_pt // dims[1], target_pt % dims[1]
    sv = _selection_vector(tk, dims, [i0, i1])
    reply = db.multiply(sv)
    er2 = decompose.expansion_ratio(tk.ctx) * 2
    assert reply.shape[0] == er2

    digit_pts = np.stack(
        [enc_mod.decrypt(tk.ctx, tk.sk, reply[k]) for k in range(er2)]
    )
    back = decompose.compose_ct(tk.ctx, digit_pts, 2)
    got_pt = enc_mod.decrypt(tk.ctx, tk.sk, jnp.asarray(back))
    assert (got_pt == db.db_pts[target_pt]).all()


def test_multiply_is_true_dot_product():
    """Non-one-hot selection: result == sum of selected rows (d=1)."""
    # bytes_per_item chosen so items_per_plaintext == 1 -> num_pt == 6
    params = tiny_pir_params(dbsize=6, bytes_per_item=88, dimensions=1, n=64)
    tk = make_toolkit(params)
    assert params.num_pt == 6
    raw = generate_test_db(6, params.bytes_per_item)
    db = PirDatabase.create(raw, params)
    D = params.dimensions[0]
    # selection weights 1 at rows 0 and 2
    cts = []
    for j in range(D):
        m = np.zeros(tk.ctx.n, dtype=np.uint64)
        m[0] = 1 if j in (0, 2) else 0
        cts.append(np.asarray(enc_mod.encrypt(tk.ctx, tk.pk, m, tk.rng)))
    reply = db.multiply(jnp.asarray(np.stack(cts)))
    got = enc_mod.decrypt(tk.ctx, tk.sk, reply[0])
    expect = (
        db.db_pts[0].astype(object) + db.db_pts[2].astype(object)
    ) % tk.ctx.t
    assert (got.astype(object) == expect).all()


def test_selection_vector_size_validated():
    params = tiny_pir_params(dbsize=10, bytes_per_item=8, dimensions=1, n=64)
    tk = make_toolkit(params)
    db = PirDatabase.create(generate_test_db(10, 8), params)
    sv = _selection_vector(tk, (3,), [0])
    with pytest.raises(ValueError):
        db.multiply(sv)


def test_populate_size_mismatch():
    params = tiny_pir_params(dbsize=10, bytes_per_item=8)
    with pytest.raises(ValueError):
        PirDatabase.create(generate_test_db(9, 8), params)


def test_index_math_goldens():
    # parity with database_test.cpp:390-464 golden tables
    params = tiny_pir_params(dbsize=1000, bytes_per_item=8, dimensions=3, n=64)
    db = PirDatabase(params)
    dims = params.dimensions
    ipp = params.items_per_plaintext
    # calculate_indices: last dim fastest
    for index in [0, 1, 999, 500]:
        pt = index // ipp
        got = db.calculate_indices(index)
        acc = 0
        for d, g in zip(dims, got):
            acc = acc * d + g
        assert acc == pt
    # item offsets
    assert db.calculate_item_offset(0) == 0
    assert (
        db.calculate_item_offset(ipp + 1) == params.bytes_per_item
        if ipp > 1
        else db.calculate_item_offset(1) == 0
    )


def test_int_db_populate_and_retrieve():
    params = tiny_pir_params(dbsize=8, bytes_per_item=0, dimensions=1, n=64,
                             t_bits=12)
    tk = make_toolkit(params)
    from pir_tpu.testing.fixtures import generate_int_db
    from pir_tpu.pir.encoders import IntegerEncoder

    # values must fit in N=64 binary digits; keep them small
    ints = [int(v % (1 << 40)) for v in generate_int_db(8)]
    db = PirDatabase.create(ints, params)
    sv = _selection_vector(tk, params.dimensions, [5])
    reply = db.multiply(sv)
    pt = enc_mod.decrypt(tk.ctx, tk.sk, reply[0])
    enc = IntegerEncoder(tk.ctx.n, tk.ctx.t)
    assert enc.decode_int64(pt) == ints[5]
