"""BFV core: keygen, encrypt/decrypt roundtrip, homomorphic ops, noise."""

import numpy as np
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.bfv import evaluator, keys
from pir_tpu.core.context import PirContext
from pir_tpu.testing.params import tiny_pir_params
from pir_tpu.testing import refmodel


@pytest.fixture(scope="module")
def ctx():
    return PirContext(tiny_pir_params(n=64, t_bits=12))


@pytest.fixture(scope="module")
def toolkit(ctx):
    rng = np.random.default_rng(7)
    sk = keys.gen_secret_key(ctx, rng)
    pk = keys.gen_public_key(ctx, sk, rng)
    return rng, sk, pk


def _rand_pt(ctx, rng):
    return rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)


def test_encrypt_decrypt_roundtrip(ctx, toolkit):
    rng, sk, pk = toolkit
    for _ in range(5):
        m = _rand_pt(ctx, rng)
        ct = enc_mod.encrypt(ctx, pk, m, rng)
        assert ct.shape == (2, ctx.L, ctx.n)
        got = enc_mod.decrypt(ctx, sk, ct)
        assert (got == m).all()


def test_fresh_noise_budget_positive(ctx, toolkit):
    rng, sk, pk = toolkit
    ct = enc_mod.encrypt(ctx, pk, _rand_pt(ctx, rng), rng)
    budget = enc_mod.invariant_noise_budget(ctx, sk, ct)
    # q ≈ 41 bits, t 12 bits -> ~25+ bits of budget on a fresh ct
    assert budget > 15


def test_homomorphic_add(ctx, toolkit):
    rng, sk, pk = toolkit
    m1, m2 = _rand_pt(ctx, rng), _rand_pt(ctx, rng)
    ct = evaluator.add_ct(
        ctx,
        enc_mod.encrypt(ctx, pk, m1, rng),
        enc_mod.encrypt(ctx, pk, m2, rng),
    )
    got = enc_mod.decrypt(ctx, sk, ct)
    expect = (m1.astype(object) + m2.astype(object)) % ctx.t
    assert (got.astype(object) == expect).all()


def test_multiply_plain_ntt(ctx, toolkit):
    rng, sk, pk = toolkit
    m1, m2 = _rand_pt(ctx, rng), _rand_pt(ctx, rng)
    ct = enc_mod.encrypt(ctx, pk, m1, rng)
    ct_ntt = evaluator.ct_to_ntt(ctx, ct)
    pt_ntt = evaluator.plaintext_to_ntt(ctx, m2)
    prod = evaluator.ct_from_ntt(ctx, evaluator.multiply_plain_ntt(ctx, ct_ntt, pt_ntt))
    got = enc_mod.decrypt(ctx, sk, prod)
    expect = refmodel.negacyclic_mul(m1, m2, ctx.t)
    assert got.astype(object).tolist() == expect


def test_multiply_plain_reduces_budget(ctx, toolkit):
    rng, sk, pk = toolkit
    m1, m2 = _rand_pt(ctx, rng), _rand_pt(ctx, rng)
    ct = enc_mod.encrypt(ctx, pk, m1, rng)
    fresh = enc_mod.invariant_noise_budget(ctx, sk, ct)
    ct_ntt = evaluator.ct_to_ntt(ctx, ct)
    pt_ntt = evaluator.plaintext_to_ntt(ctx, m2)
    prod = evaluator.ct_from_ntt(ctx, evaluator.multiply_plain_ntt(ctx, ct_ntt, pt_ntt))
    after = enc_mod.invariant_noise_budget(ctx, sk, prod)
    assert 0 < after < fresh


def test_encrypt_zero(ctx, toolkit):
    rng, sk, pk = toolkit
    ct = enc_mod.encrypt_zero(ctx, pk, rng)
    assert (enc_mod.decrypt(ctx, sk, ct) == 0).all()


def test_ntt_roundtrip_on_ct(ctx, toolkit):
    rng, sk, pk = toolkit
    m = _rand_pt(ctx, rng)
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    back = evaluator.ct_from_ntt(ctx, evaluator.ct_to_ntt(ctx, ct))
    assert (np.asarray(back) == np.asarray(ct)).all()
