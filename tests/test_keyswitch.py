"""Galois automorphism + key switching + monomial shifts on ciphertexts."""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.bfv import keys
from pir_tpu.core.context import PirContext
from pir_tpu.ops import keyswitch, poly
from pir_tpu.testing.params import tiny_pir_params
from pir_tpu.testing import refmodel
from pir_tpu.utils.math import generate_galois_elts


@pytest.fixture(scope="module")
def ctx():
    return PirContext(tiny_pir_params(n=64, t_bits=12))


@pytest.fixture(scope="module")
def toolkit(ctx):
    rng = np.random.default_rng(13)
    sk = keys.gen_secret_key(ctx, rng)
    pk = keys.gen_public_key(ctx, sk, rng)
    gkeys = keys.gen_galois_keys(
        ctx, sk, generate_galois_elts(ctx.n) + [5, 3], rng
    )
    return rng, sk, pk, gkeys


def _rand_pt(ctx, rng):
    return rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)


def test_apply_galois_matches_plain_automorphism(ctx, toolkit):
    rng, sk, pk, gkeys = toolkit
    for elt in [ctx.n + 1, ctx.n // 2 + 1, 5, 3]:
        m = _rand_pt(ctx, rng)
        ct = enc_mod.encrypt(ctx, pk, m, rng)
        ct_g = keyswitch.apply_galois(ctx, gkeys, ct, elt)
        got = enc_mod.decrypt(ctx, sk, ct_g)
        expect = refmodel.automorphism(m, elt, ctx.t)
        assert got.astype(object).tolist() == expect, elt


def test_apply_galois_noise_budget(ctx, toolkit):
    rng, sk, pk, gkeys = toolkit
    ct = enc_mod.encrypt(ctx, pk, _rand_pt(ctx, rng), rng)
    ct_g = keyswitch.apply_galois(ctx, gkeys, ct, ctx.n + 1)
    assert enc_mod.invariant_noise_budget(ctx, sk, ct_g) > 5


def test_substitution_golden_vectors(ctx, toolkit):
    """Literal-polynomial substitution table, parity with the reference's
    SubstituteOperatorTest (pir/cpp/server_test.cpp:291-305), scaled to N=64.
    """
    rng, sk, pk, gkeys = toolkit
    n, t = ctx.n, ctx.t
    cases = [
        # (input coeffs {idx: val}, k, expected {idx: val})
        ({0: 0x42}, 3, {0: 0x42}),
        ({1: 1}, 5, {5: 1}),
        ({2: 6}, 3, {6: 6}),
        ({1: 1}, n + 1, {1: t - 1}),
        ({4: 1}, n + 1, {4: 1}),
        ({8: 1}, n // 2 + 1, {8: 1}),
        ({n - 1: 0x77}, 3, {n - 3: 0x77}),
    ]
    for coeffs, k, expect in cases:
        m = np.zeros(n, dtype=np.uint64)
        for i, v in coeffs.items():
            m[i] = v
        if k not in gkeys.keys:
            gkeys.keys.update(keys.gen_galois_keys(ctx, sk, [k], rng).keys)
        ct = enc_mod.encrypt(ctx, pk, m, rng)
        got = enc_mod.decrypt(ctx, sk, keyswitch.apply_galois(ctx, gkeys, ct, k))
        want = np.zeros(n, dtype=np.uint64)
        for i, v in expect.items():
            want[i] = v
        assert (got == want).all(), (coeffs, k)


def test_monomial_shift_on_ciphertext(ctx, toolkit):
    """multiply_inverse_power_of_x golden vectors
    (pir/cpp/server_test.cpp:333-339)."""
    rng, sk, pk, _ = toolkit
    cases = [
        ({1: 0x42}, 1, {0: 0x42}),
        ({42: 0x42}, 41, {1: 0x42}),
        ({4: 1, 3: 1, 1: 1}, 1, {3: 1, 2: 1, 0: 1}),
        ({16: 1, 12: 1, 8: 1}, 4, {12: 1, 8: 1, 4: 1}),
    ]
    for coeffs, k, expect in cases:
        m = np.zeros(ctx.n, dtype=np.uint64)
        for i, v in coeffs.items():
            m[i] = v
        ct = enc_mod.encrypt(ctx, pk, m, rng)
        shifted = poly.multiply_inverse_power_of_x(ctx, ct, k)
        got = enc_mod.decrypt(ctx, sk, shifted)
        want = np.zeros(ctx.n, dtype=np.uint64)
        for i, v in expect.items():
            want[i] = v
        assert (got == want).all(), (coeffs, k)


def test_monomial_shift_wraps_with_sign(ctx, toolkit):
    rng, sk, pk, _ = toolkit
    m = np.zeros(ctx.n, dtype=np.uint64)
    m[0] = 1
    ct = enc_mod.encrypt(ctx, pk, m, rng)
    # x^0 * x^{-1} = -x^{N-1}
    shifted = poly.multiply_inverse_power_of_x(ctx, ct, 1)
    got = enc_mod.decrypt(ctx, sk, shifted)
    assert got[ctx.n - 1] == ctx.t - 1
    assert got[: ctx.n - 1].sum() == 0


def test_batched_apply_galois(ctx, toolkit):
    rng, sk, pk, gkeys = toolkit
    ms = [_rand_pt(ctx, rng) for _ in range(3)]
    cts = jnp.stack([enc_mod.encrypt(ctx, pk, m, rng) for m in ms])
    elt = ctx.n + 1
    out = keyswitch.apply_galois(ctx, gkeys, cts, elt)
    assert out.shape == cts.shape
    for b, m in enumerate(ms):
        got = enc_mod.decrypt(ctx, sk, out[b])
        assert got.astype(object).tolist() == refmodel.automorphism(m, elt, ctx.t)


def test_relinearize_target_shape(ctx, toolkit):
    rng, sk, pk, _ = toolkit
    rk = keys.gen_relin_key(ctx, sk, rng)
    assert rk.key.data.shape == (ctx.L, 2, ctx.Lp, ctx.n)
