"""The reference's hex-poly golden tables, transcribed VERBATIM.

The substitution / inverse-power-of-x / oblivious-expansion literals from
pir/cpp/server_test.cpp:291-383 are the best cross-implementation fixtures
available in-container (they were validated against SEAL 3.5.6 by the
reference's CI).  This module carries the exact hex-poly strings from the
reference source, parsed by a small SEAL-syntax poly parser, and asserts
our operators reproduce them bit-for-bit at the reference's default
parameters (N=4096, 20-bit plain modulus — parameters.h:40,
parameters.cpp:45; so FC000 == t-1 == -1 mod 0xFC001).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.core.params import create_pir_parameters, generate_encryption_params
from pir_tpu.ops import expand, keyswitch, poly
from pir_tpu.testing.fixtures import make_toolkit

POLY_MODULUS_DEGREE = 4096


def parse_hex_poly(s: str, n: int = POLY_MODULUS_DEGREE) -> np.ndarray:
    """SEAL Plaintext hex-string syntax -> dense u64 coefficient vector.

    Grammar (seal::Plaintext(const string&)): terms joined by " + ", each
    "<hex>x^<dec>" or a bare "<hex>" constant; hex is uppercase, no 0x.
    """
    out = np.zeros(n, dtype=np.uint64)
    for term in s.split("+"):
        term = term.strip()
        if not term:
            continue
        if "x^" in term:
            coeff_s, exp_s = term.split("x^")
            out[int(exp_s)] = int(coeff_s, 16)
        else:
            out[0] = int(term, 16)
    return out


@pytest.fixture(scope="module")
def tk():
    params = create_pir_parameters(
        10, 0, 1, generate_encryption_params(POLY_MODULUS_DEGREE, 20)
    )
    return make_toolkit(params)


def _gk(tk):
    return {e: jnp.asarray(k.data) for e, k in tk.galois.keys.items()}


def _encrypt(tk, pt: np.ndarray):
    return enc_mod.encrypt(tk.ctx, tk.pk, pt, tk.rng)


# --- SubstituteOperatorTest literals, server_test.cpp:291-305 -------------
SUBSTITUTION_TABLE = [
    ("42", 3, "42"),
    ("1x^1", 5, "1x^5"),
    ("6x^2", 3, "6x^6"),
    ("1x^1", POLY_MODULUS_DEGREE + 1, "FC000x^1"),
    ("1x^4", POLY_MODULUS_DEGREE + 1, "1x^4"),
    ("1x^8", POLY_MODULUS_DEGREE // 2 + 1, "1x^8"),
    ("1x^8", POLY_MODULUS_DEGREE // 4 + 1, "1x^8"),
    ("1x^8", POLY_MODULUS_DEGREE // 8 + 1, "FC000x^8"),
    ("77x^4095", 3, "77x^4093"),
    ("1x^4095", POLY_MODULUS_DEGREE + 1, "FC000x^4095"),
    (
        "4x^4 + 33x^3 + 222x^2 + 19x^1 + 42",
        POLY_MODULUS_DEGREE + 1,
        "4x^4 + FBFCEx^3 + 222x^2 + FBFE8x^1 + 42",
    ),
]


@pytest.mark.parametrize("input_s,k,expected_s", SUBSTITUTION_TABLE)
def test_substitution_golden(tk, input_s, k, expected_s):
    ct = _encrypt(tk, parse_hex_poly(input_s))
    out = keyswitch.apply_galois(tk.ctx, _gk(tk), ct, k)
    got = enc_mod.decrypt(tk.ctx, tk.sk, out)
    np.testing.assert_array_equal(got, parse_hex_poly(expected_s))


# --- MultiplyInversePowerXTest literals, server_test.cpp:333-339 ----------
INVERSE_POWER_TABLE = [
    ("42x^1", 1, "42"),
    ("42x^42", 41, "42x^1"),
    ("1x^4 + 1x^3 + 1x^1", 1, "1x^3 + 1x^2 + 1"),
    ("1x^16 + 1x^12 + 1x^8", 4, "1x^12 + 1x^8 + 1x^4"),
]


@pytest.mark.parametrize("input_s,k,expected_s", INVERSE_POWER_TABLE)
def test_inverse_power_of_x_golden(tk, input_s, k, expected_s):
    ct = _encrypt(tk, parse_hex_poly(input_s))
    out = poly.multiply_inverse_power_of_x(tk.ctx, ct, k)
    got = enc_mod.decrypt(tk.ctx, tk.sk, out)
    np.testing.assert_array_equal(got, parse_hex_poly(expected_s))


# --- ObliviousExpansionTest literals, server_test.cpp:377-383 -------------
# Outputs are scaled by next_power_two(#items), pre-cancelled by the client
# in the real protocol (server.h:100-102).
EXPANSION_TABLE = [
    ("1", ["2", "0"]),
    ("1x^1", ["0", "2"]),
    ("3x^3 + 2x^2 + 1x^1 + 42", ["108", "4", "8", "C"]),
    ("1x^5", ["0", "0", "0", "0", "0", "8"]),
]


@pytest.mark.parametrize("input_s,expected_list", EXPANSION_TABLE)
def test_oblivious_expansion_golden(tk, input_s, expected_list):
    ct = _encrypt(tk, parse_hex_poly(input_s))
    outs = expand.expand_single(tk.ctx, _gk(tk), ct, len(expected_list))
    assert outs.shape[0] == len(expected_list)
    for i, exp_s in enumerate(expected_list):
        got = enc_mod.decrypt(tk.ctx, tk.sk, outs[i])
        np.testing.assert_array_equal(got, parse_hex_poly(exp_s), err_msg=f"i={i}")


# --- ObliviousExpansionTestMultiCT literals, server_test.cpp:425-428 ------
# (num_items, one-hot index, expected scaled value at that index)
MULTI_CT_TABLE = [
    (100, 42, 128),
    (100, 0, 128),
    (100, 99, 128),
    pytest.param(4096, 3007, 4096, marks=pytest.mark.slow),
    pytest.param(5000, 4095, 4096, marks=pytest.mark.slow),
    pytest.param(5000, 4200, 1024, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("num_items,index,expected_value", MULTI_CT_TABLE)
def test_multi_ct_expansion_golden(tk, num_items, index, expected_value):
    n = POLY_MODULUS_DEGREE
    num_cts = num_items // n + 1
    cts = []
    for i in range(num_cts):
        pt = np.zeros(n, dtype=np.uint64)
        if index // n == i:
            pt[index % n] = 1
        cts.append(_encrypt(tk, pt))
    outs = expand.expand_query(tk.ctx, _gk(tk), jnp.stack(cts), num_items)
    assert outs.shape[0] == num_items
    # decrypt only the hot index plus a sample of cold ones (decrypting all
    # 4096+ outputs would dominate the suite for no extra coverage)
    sample = {0, 1, index - 1, index, index + 1, num_items - 1}
    for i in sorted(x for x in sample if 0 <= x < num_items):
        got = enc_mod.decrypt(tk.ctx, tk.sk, outs[i])
        want = np.zeros(n, dtype=np.uint64)
        if i == index:
            want[0] = expected_value
        np.testing.assert_array_equal(got, want, err_msg=f"i={i}")
