"""Oblivious expansion — golden vectors from server_test.cpp scaled to a
small ring (the scale factors depend only on item counts, not N)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.bfv import encrypt as enc_mod
from pir_tpu.ops import expand
from pir_tpu.testing.fixtures import make_toolkit
from pir_tpu.testing.params import tiny_pir_params

N = 64


@pytest.fixture(scope="module")
def tk():
    return make_toolkit(tiny_pir_params(n=N, t_bits=12))


def _gk(tk):
    return {e: jnp.asarray(k.data) for e, k in tk.galois.keys.items()}


def _encrypt_coeffs(tk, coeffs: dict):
    m = np.zeros(N, dtype=np.uint64)
    for i, v in coeffs.items():
        m[i] = v
    return enc_mod.encrypt(tk.ctx, tk.pk, m, tk.rng)


def _decrypt_all(tk, cts):
    return [enc_mod.decrypt(tk.ctx, tk.sk, cts[i]) for i in range(cts.shape[0])]


def test_expansion_golden_vectors(tk):
    """parity with ObliviousExpansionTest (server_test.cpp:376-383)."""
    cases = [
        # (input {coeff: val}, num_items, expected list of {coeff: val})
        ({0: 1}, 2, [{0: 2}, {}]),
        ({1: 1}, 2, [{}, {0: 2}]),
        ({3: 3, 2: 2, 1: 1, 0: 0x42}, 4, [{0: 0x108}, {0: 4}, {0: 8}, {0: 0xC}]),
        ({5: 1}, 6, [{}, {}, {}, {}, {}, {0: 8}]),
    ]
    for coeffs, num_items, expected in cases:
        ct = _encrypt_coeffs(tk, coeffs)
        out = expand.expand_single(tk.ctx, _gk(tk), ct, num_items)
        assert out.shape[0] == num_items
        got = _decrypt_all(tk, out)
        for i, exp in enumerate(expected):
            want = np.zeros(N, dtype=np.uint64)
            for c, v in exp.items():
                want[c] = v % tk.ctx.t
            assert (got[i] == want).all(), (coeffs, num_items, i)


def test_expansion_full_ring(tk):
    """Expand all N items: scale factor becomes N."""
    idx = 37
    ct = _encrypt_coeffs(tk, {idx: 1})
    out = expand.expand_single(tk.ctx, _gk(tk), ct, N)
    got = _decrypt_all(tk, out)
    for i in range(N):
        expect = N if i == idx else 0
        assert got[i][0] == expect, i
        assert got[i][1:].sum() == 0, i


@pytest.mark.parametrize(
    "num_items,index,expected_value",
    [
        # parity with ObliviousExpansionTestMultiCT (server_test.cpp:423-428),
        # scaled: N=64 here.
        (100, 42, 64),   # first ct: full 64 -> scale 64; index in first ct
        (100, 0, 64),
        (100, 99, 64),   # second ct expands 36 -> next_pow2(36) = 64
        (64, 30, 64),    # exact multiple: second ct expands 0 items
        (80, 70, 16),    # second ct expands 16 -> scale 16
    ],
)
def test_expansion_multi_ct(tk, num_items, index, expected_value):
    num_cts = num_items // N + 1
    cts = []
    for c in range(num_cts):
        coeffs = {}
        if c == index // N:
            coeffs[index % N] = 1
        cts.append(_encrypt_coeffs(tk, coeffs))
    out = expand.expand_query(tk.ctx, _gk(tk), jnp.stack(cts), num_items)
    assert out.shape[0] == num_items
    got = _decrypt_all(tk, out)
    for i in range(num_items):
        expect = expected_value if i == index else 0
        assert got[i][0] == expect, i
        assert got[i][1:].sum() == 0, i


def test_expansion_wrong_ct_count(tk):
    ct = _encrypt_coeffs(tk, {0: 1})
    with pytest.raises(ValueError):
        expand.expand_query(tk.ctx, _gk(tk), ct[jnp.newaxis], 3 * N)


def test_expansion_too_many_items(tk):
    ct = _encrypt_coeffs(tk, {0: 1})
    with pytest.raises(ValueError):
        expand.expand_single(tk.ctx, _gk(tk), ct, N + 1)


def test_expansion_scaling_cancels_with_m_inverse(tk):
    """Client-side m⁻¹ pre-scaling: expansion of m⁻¹·one-hot yields exactly 1."""
    from pir_tpu.utils.math import invert_mod, next_power_two

    num_items = 10
    m = next_power_two(num_items)
    idx = 7
    ct = _encrypt_coeffs(tk, {idx: invert_mod(m, tk.ctx.t)})
    out = expand.expand_single(tk.ctx, _gk(tk), ct, num_items)
    got = _decrypt_all(tk, out)
    for i in range(num_items):
        assert got[i][0] == (1 if i == idx else 0), i


@pytest.mark.slow
def test_expansion_multi_ct_full_ring():
    """Reference multi-CT semantics at a full ring boundary
    (server_test.cpp:423-428 pattern, N=512 to stay CPU-fast): spill index
    in the second ciphertext, per-ct scale factors N and next_pow2(rest)."""
    from pir_tpu.testing.params import tiny_pir_params

    n = 512
    tkr = make_toolkit(
        tiny_pir_params(dbsize=10, bytes_per_item=8, n=n, t_bits=20,
                        q_bits=(30, 31, 32))
    )
    gk = {e: jnp.asarray(k.data) for e, k in tkr.galois.keys.items()}
    for num_items, index, expected in [(n + 200, n - 1, n), (n + 200, n + 90, 256)]:
        num_cts = num_items // n + 1
        cts = []
        for c in range(num_cts):
            m = np.zeros(n, dtype=np.uint64)
            if c == index // n:
                m[index % n] = 1
            cts.append(enc_mod.encrypt(tkr.ctx, tkr.pk, m, tkr.rng))
        out = expand.expand_query(tkr.ctx, gk, jnp.stack(cts), num_items)
        assert out.shape[0] == num_items
        for i in (index - 1, index, index + 1, 0, num_items - 1):
            got = enc_mod.decrypt(tkr.ctx, tkr.sk, out[i])
            want = expected if i == index else 0
            assert got[0] == want and got[1:].sum() == 0, i


def test_expand_batch_matches_single(tk):
    """expand_single_batch lane b == expand_single on ct b, bit for bit."""
    cts = jnp.stack(
        [
            _encrypt_coeffs(tk, {0: 1}),
            _encrypt_coeffs(tk, {3: 3, 2: 2, 1: 1}),
            _encrypt_coeffs(tk, {5: 7}),
        ]
    )
    num_items = 6
    got = expand.expand_single_batch(tk.ctx, _gk(tk), cts, num_items)
    assert got.shape[:2] == (3, num_items)
    for b in range(3):
        single = expand.expand_single(tk.ctx, _gk(tk), cts[b], num_items)
        assert (np.asarray(got[b]) == np.asarray(single)).all()


def test_expand_query_batch_matches(tk):
    """Batched multi-ct expansion == per-query expand_query."""
    ctx = tk.ctx
    total = N + 5  # spills into two ciphertexts
    q = jnp.stack(
        [
            jnp.stack(
                [
                    _encrypt_coeffs(tk, {b: 1}),
                    _encrypt_coeffs(tk, {2 * b: 1}),
                ]
            )
            for b in range(2)
        ]
    )  # [2, 2, 2, L, N]
    got = expand.expand_query_batch(ctx, _gk(tk), q, total)
    assert got.shape[:2] == (2, total)
    for b in range(2):
        single = expand.expand_query(ctx, _gk(tk), q[b], total)
        assert (np.asarray(got[b]) == np.asarray(single)).all()
