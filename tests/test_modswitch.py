"""Modulus switching (ops/modswitch.py) and the shrunken-reply serve path.

No reference analog (the reference returns full-width ciphertexts,
pir/cpp/server.cpp:192) — this is the SealPIR-style reply-size
optimization; the contract tested here is that switched ciphertexts
decrypt to the same plaintext and the full protocol stays correct.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.bfv import keys as keys_mod
from pir_tpu.core.context import PirContext
from pir_tpu.ops import modswitch
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer
from pir_tpu.testing.fixtures import generate_test_db
from pir_tpu.testing.params import tiny_pir_params


def _fresh(seed=0, n=64, t_bits=12, q_bits=(26, 27, 28)):
    params = tiny_pir_params(
        dbsize=8, bytes_per_item=4, n=n, t_bits=t_bits, q_bits=q_bits
    )
    ctx = PirContext(params)
    rng = np.random.default_rng(seed)
    sk = keys_mod.gen_secret_key(ctx, rng)
    pk = keys_mod.gen_public_key(ctx, sk, rng)
    return ctx, sk, pk, rng


def test_drop_one_preserves_plaintext():
    ctx, sk, pk, rng = _fresh()
    m = rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    ct1 = modswitch.mod_switch_drop_last(ctx, ct)
    assert ct1.shape == (2, ctx.L - 1, ctx.n)
    assert np.array_equal(enc_mod.decrypt(ctx, sk, ct1), m)


def test_switch_to_single_limb_preserves_plaintext():
    ctx, sk, pk, rng = _fresh(seed=1)
    m = rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    ct1 = modswitch.mod_switch_to(ctx, ct, 1)
    assert ct1.shape == (2, 1, ctx.n)
    assert np.array_equal(enc_mod.decrypt(ctx, sk, ct1), m)


def test_noop_when_already_at_level():
    ctx, sk, pk, rng = _fresh(seed=2)
    m = rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    assert modswitch.mod_switch_to(ctx, ct, ctx.L).shape == ct.shape


def test_budget_drops_by_about_the_prime_bits():
    ctx, sk, pk, rng = _fresh(seed=3)
    m = np.zeros(ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    before = enc_mod.invariant_noise_budget(ctx, sk, ct)
    after = enc_mod.invariant_noise_budget(
        ctx, sk, modswitch.mod_switch_drop_last(ctx, ct)
    )
    dropped_bits = ctx.ct_moduli[-1].bit_length()
    # the modulus shrank by `dropped_bits`, so the budget can fall at most
    # that much plus a small rounding term; fresh noise is tiny, so the
    # post-switch budget is set by the rounding term and stays positive
    assert before - dropped_bits - 4 <= after < before
    assert after > 0


def test_switch_rejects_below_one_limb():
    ctx, sk, pk, rng = _fresh(seed=4)
    ct = enc_mod.encrypt(ctx, pk, np.zeros(ctx.n, dtype=np.uint64), rng)
    ct1 = modswitch.mod_switch_to(ctx, ct, 1)
    with pytest.raises(ValueError):
        modswitch.mod_switch_drop_last(ctx, ct1)
    with pytest.raises(ValueError):
        modswitch.mod_switch_to(ctx, ct, 0)


def test_batched_shapes_broadcast():
    ctx, sk, pk, rng = _fresh(seed=5)
    m = rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    stack = jnp.stack([ct, ct])  # [2, 2, L, N]
    out = modswitch.mod_switch_to(ctx, stack, 1)
    assert out.shape == (2, 2, 1, ctx.n)
    assert np.array_equal(enc_mod.decrypt(ctx, sk, out[1]), m)


@pytest.mark.parametrize("dimensions", [1, 2])
def test_pir_roundtrip_with_shrunken_reply(dimensions):
    params = tiny_pir_params(
        dbsize=40,
        bytes_per_item=8,
        dimensions=dimensions,
        n=128,
        t_bits=12,
        q_bits=(30, 30, 32),
    )
    raw = generate_test_db(params.num_items, params.bytes_per_item, seed=7)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=8)
    server = PirServer.create(db, params)
    server.reply_limbs = 1

    indices = [0, 17, params.num_items - 1]
    request = client.create_request(indices)
    response = server.process_request(request)
    # the wire actually carries single-limb ciphertexts
    from pir_tpu.pir import wire

    cts = wire.load_ciphertexts(response.reply[0])
    assert cts.shape[-2] == 1
    assert client.process_response(indices, response) == [
        raw[i] for i in indices
    ]


def test_pir_batched_path_with_shrunken_reply():
    params = tiny_pir_params(
        dbsize=40,
        bytes_per_item=8,
        dimensions=2,
        n=128,
        t_bits=12,
        q_bits=(30, 30, 32),
    )
    raw = generate_test_db(params.num_items, params.bytes_per_item, seed=9)
    db = PirDatabase.create(raw, params)
    client = PirClient.create(params, seed=10)
    server = PirServer(db, params, reply_limbs=1)

    indices = [3, 25]
    response = server.process_request_batched(client.create_request(indices))
    assert client.process_response(indices, response) == [
        raw[i] for i in indices
    ]
