"""Ciphertext digit decomposition — parity with ct_reencoder_test.cpp."""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.bfv import evaluator
from pir_tpu.core.context import PirContext
from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.ops import decompose
from pir_tpu.testing.fixtures import make_toolkit
from pir_tpu.testing.params import tiny_pir_params


def test_expansion_ratio_default_4096_params():
    # ExpansionRatio == 4 for the default N=4096 parameters
    # (ct_reencoder_test.cpp:77-79): two 36-bit ct limbs, 19-bit digits.
    params = create_pir_parameters(
        10, 0, 1, generate_encryption_params(4096, 20)
    )
    ctx = PirContext(params)
    assert decompose.pt_bits_per_coeff(ctx) == 19
    assert decompose.local_expansion_ratios(ctx) == [2, 2]
    assert decompose.expansion_ratio(ctx) == 4


def test_digit_widths_balanced_vs_legacy():
    """Balanced mode keeps the digit counts (reply shapes) but shrinks the
    per-digit magnitude — the free noise margin (ops/decompose docstring)."""
    enc = generate_encryption_params(4096, 20)
    legacy = create_pir_parameters(10, 0, 1, enc, reencode_digits="legacy")
    balanced = create_pir_parameters(10, 0, 1, enc)  # default
    ctx_l, ctx_b = PirContext(legacy), PirContext(balanced)
    assert legacy.reencode_mode == 0 and balanced.reencode_mode == 1
    # same counts -> same ExpansionRatio -> same reply shapes
    assert decompose.local_expansion_ratios(ctx_l) == decompose.local_expansion_ratios(ctx_b)
    assert decompose.digit_widths(ctx_l) == [19, 19]
    assert decompose.digit_widths(ctx_b) == [18, 18]  # 36-bit limbs, 2 digits
    # balanced widths always fit a plaintext coefficient
    assert all(w <= decompose.pt_bits_per_coeff(ctx_b)
               for w in decompose.digit_widths(ctx_b))


@pytest.mark.parametrize("mode", ["legacy", "balanced"])
def test_decompose_roundtrip_both_modes(mode):
    params = tiny_pir_params(n=64, t_bits=12, reencode_digits=mode)
    ctx = PirContext(params)
    rng = np.random.default_rng(5)
    ct = _rand_ct_words(ctx, rng)
    pts = np.asarray(decompose.decompose_ct(ctx, jnp.asarray(ct)))
    widths = decompose.digit_widths(ctx)
    assert pts.max() < ctx.t  # every digit is a valid plaintext coefficient
    back = decompose.compose_ct(ctx, pts, 2)
    assert (back == ct).all()
    if mode == "balanced":
        # magnitude strictly below the balanced width bound per limb
        er_off = 0
        pts2 = pts.reshape(2, -1, ctx.n)
        for r, w in zip(decompose.local_expansion_ratios(ctx), widths):
            chunk = pts2[:, er_off : er_off + r]
            assert int(chunk.max()) < (1 << w)
            er_off += r


@pytest.fixture(scope="module")
def tk():
    return make_toolkit(tiny_pir_params(n=64, t_bits=12))


def _rand_ct_words(ctx, rng):
    out = np.zeros((2, ctx.L, ctx.n), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        out[:, li, :] = rng.integers(0, q, size=(2, ctx.n), dtype=np.uint64)
    return out


def test_decompose_compose_roundtrip(tk):
    ct = _rand_ct_words(tk.ctx, tk.rng)
    pts = decompose.decompose_ct(tk.ctx, jnp.asarray(ct))
    er = decompose.expansion_ratio(tk.ctx)
    assert pts.shape == (2 * er, tk.ctx.n)
    assert (np.asarray(pts) < tk.ctx.t).all()
    back = decompose.compose_ct(tk.ctx, np.asarray(pts), 2)
    assert (back == ct).all()


def test_decompose_batched(tk):
    cts = np.stack([_rand_ct_words(tk.ctx, tk.rng) for _ in range(3)])
    pts = np.asarray(decompose.decompose_ct(tk.ctx, jnp.asarray(cts)))
    for b in range(3):
        back = decompose.compose_ct(tk.ctx, pts[b], 2)
        assert (back == cts[b]).all()


def test_decomposition_survives_encryption(tk):
    """Decompose a real ciphertext, recompose, decrypt — identity.

    The property the d>=2 protocol relies on (ct_reencoder_test.cpp:137-194).
    """
    ctx = tk.ctx
    m = tk.rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, tk.pk, m, tk.rng)
    pts = decompose.decompose_ct(ctx, ct)
    back = decompose.compose_ct(ctx, np.asarray(pts), 2)
    assert (enc_mod.decrypt(ctx, tk.sk, jnp.asarray(back)) == m).all()


def test_decompose_multiply_by_encrypted_one_recompose(tk):
    """Digit plaintexts times Enc(1), recomposed, still decrypt correctly —
    the actual upper-dimension scan step (ct_reencoder_test.cpp:137-194)."""
    ctx = tk.ctx
    m = tk.rng.integers(0, ctx.t, size=ctx.n, dtype=np.uint64)
    ct = enc_mod.encrypt(ctx, tk.pk, m, tk.rng)
    pts = np.asarray(decompose.decompose_ct(ctx, ct))
    one = np.zeros(ctx.n, dtype=np.uint64)
    one[0] = 1
    enc_one_ntt = evaluator.ct_to_ntt(ctx, enc_mod.encrypt(ctx, tk.pk, one, tk.rng))
    er2 = pts.shape[0]
    prod_cts = []
    for k in range(er2):
        pt_ntt = evaluator.plaintext_to_ntt(ctx, pts[k])
        prod = evaluator.ct_from_ntt(
            ctx, evaluator.multiply_plain_ntt(ctx, enc_one_ntt, pt_ntt)
        )
        prod_cts.append(prod)
    # decrypt each product (each digit scaled by exactly 1), recompose
    digit_pts = np.stack(
        [enc_mod.decrypt(ctx, tk.sk, c) for c in prod_cts]
    )
    back = decompose.compose_ct(ctx, digit_pts, 2)
    assert (enc_mod.decrypt(ctx, tk.sk, jnp.asarray(back)) == m).all()
