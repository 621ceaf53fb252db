"""BFV ct×ct multiplication (BEHZ) + relinearization."""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.bfv import multiply
from pir_tpu.core.context import PirContext
from pir_tpu.core.rns import RnsTool
from pir_tpu.ops import keyswitch
from pir_tpu.testing.fixtures import make_toolkit
from pir_tpu.testing.params import tiny_pir_params
from pir_tpu.testing import refmodel


@pytest.fixture(scope="module")
def tk():
    return make_toolkit(tiny_pir_params(n=64, t_bits=12))


def _rand_pt(ctx, rng, bound=None):
    return rng.integers(0, bound or ctx.t, size=ctx.n, dtype=np.uint64)


def _rand_rns(ctx, rng):
    out = np.zeros((ctx.L, ctx.n), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        out[li] = rng.integers(0, q, size=ctx.n, dtype=np.uint64)
    return out


def test_base_conversion_exact(tk):
    """q -> Bsk lift is exact for values in [0, q)."""
    ctx = tk.ctx
    tool = RnsTool(ctx.ct_moduli, ctx.n, ctx.t)
    coeffs = [int(v) for v in tk.rng.integers(0, 1 << 40, size=ctx.n)]
    x_q = jnp.asarray(refmodel.to_rns(coeffs, ctx.ct_moduli))
    got = np.asarray(tool.fastbconv_m_tilde_sm_mrq(x_q))
    expect = refmodel.to_rns(coeffs, tool.bsk_moduli)
    assert (got == expect).all()


def test_fastbconv_sk_exact_small_values(tk):
    """Bsk -> q conversion is exact for |v| < prod(B)/2, incl. negatives."""
    ctx = tk.ctx
    tool = RnsTool(ctx.ct_moduli, ctx.n, ctx.t)
    vals = [int(v) for v in tk.rng.integers(-(1 << 58), 1 << 58, size=ctx.n)]
    x_bsk = jnp.asarray(refmodel.to_rns(vals, tool.bsk_moduli))
    got = np.asarray(tool.fastbconv_sk(x_bsk))
    expect = refmodel.to_rns(vals, ctx.ct_moduli)
    assert (got == expect).all()


def test_multiply_decrypts_to_product(tk):
    ctx = tk.ctx
    for _ in range(3):
        m1 = _rand_pt(ctx, tk.rng)
        m2 = _rand_pt(ctx, tk.rng)
        ct1 = enc_mod.encrypt(ctx, tk.pk, m1, tk.rng)
        ct2 = enc_mod.encrypt(ctx, tk.pk, m2, tk.rng)
        prod = multiply.bfv_multiply(ctx, ct1, ct2)
        assert prod.shape == (3, ctx.L, ctx.n)
        got = enc_mod.decrypt(ctx, tk.sk, prod)
        expect = refmodel.negacyclic_mul(m1, m2, ctx.t)
        assert got.astype(object).tolist() == expect


def test_multiply_then_relinearize(tk):
    ctx = tk.ctx
    m1 = _rand_pt(ctx, tk.rng)
    m2 = _rand_pt(ctx, tk.rng)
    ct1 = enc_mod.encrypt(ctx, tk.pk, m1, tk.rng)
    ct2 = enc_mod.encrypt(ctx, tk.pk, m2, tk.rng)
    prod3 = multiply.bfv_multiply(ctx, ct1, ct2)
    prod2 = keyswitch.relinearize(ctx, tk.relin, prod3)
    assert prod2.shape == (2, ctx.L, ctx.n)
    got = enc_mod.decrypt(ctx, tk.sk, prod2)
    expect = refmodel.negacyclic_mul(m1, m2, ctx.t)
    assert got.astype(object).tolist() == expect
    assert enc_mod.invariant_noise_budget(ctx, tk.sk, prod2) > 0


def test_multiply_noise_budget_drops(tk):
    ctx = tk.ctx
    m = _rand_pt(ctx, tk.rng)
    ct = enc_mod.encrypt(ctx, tk.pk, m, tk.rng)
    fresh = enc_mod.invariant_noise_budget(ctx, tk.sk, ct)
    prod = multiply.bfv_multiply(ctx, ct, ct)
    after = enc_mod.invariant_noise_budget(ctx, tk.sk, prod)
    assert 0 < after < fresh


def test_multiply_batched(tk):
    ctx = tk.ctx
    ms = [(_rand_pt(ctx, tk.rng), _rand_pt(ctx, tk.rng)) for _ in range(2)]
    ct1 = jnp.stack([enc_mod.encrypt(ctx, tk.pk, a, tk.rng) for a, _ in ms])
    ct2 = jnp.stack([enc_mod.encrypt(ctx, tk.pk, b, tk.rng) for _, b in ms])
    prod = multiply.bfv_multiply(ctx, ct1, ct2)
    assert prod.shape == (2, 3, ctx.L, ctx.n)
    for i, (a, b) in enumerate(ms):
        got = enc_mod.decrypt(ctx, tk.sk, prod[i])
        assert got.astype(object).tolist() == refmodel.negacyclic_mul(a, b, ctx.t)
