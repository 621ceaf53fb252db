"""Prime generation: SEAL-3.5-compatible values and structural properties."""

import pytest

from pir_tpu.core import primes


def test_batching_prime_matches_seal_4096_20():
    # Pinned by the reference's own golden vectors: the substitution tests in
    # pir/cpp/server_test.cpp:291-305 use t-1 == 0xFC000, i.e.
    # PlainModulus::Batching(4096, 20) == 0xFC001.
    assert primes.batching_prime(4096, 20) == 0xFC001


def test_batching_prime_properties():
    for n, bits in [(4096, 16), (4096, 24), (8192, 20), (8192, 42)]:
        t = primes.batching_prime(n, bits)
        assert t.bit_length() == bits
        assert (t - 1) % (2 * n) == 0
        assert primes.is_prime(t)


def test_default_coeff_modulus_structure():
    for n in [4096, 8192]:
        chain = primes.default_coeff_modulus(n)
        assert len(set(chain)) == len(chain)
        for p in chain:
            assert (p - 1) % (2 * n) == 0
            assert primes.is_prime(p)
        total = sum(p.bit_length() for p in chain)
        assert total <= primes.MAX_COEFF_MODULUS_BITS_128[n]
    assert [p.bit_length() for p in primes.default_coeff_modulus(4096)] == [36, 36, 37]
    assert [p.bit_length() for p in primes.default_coeff_modulus(8192)] == [
        43,
        43,
        44,
        44,
        44,
    ]


def test_get_primes_descending_distinct():
    ps = primes.get_primes(2 * 64, 20, 5)
    assert ps == sorted(ps, reverse=True)
    assert len(set(ps)) == 5


def test_primitive_root():
    q = primes.get_prime(2 * 64, 20)
    psi = primes.primitive_root_2n(q, 128)
    assert pow(psi, 64, q) == q - 1
    assert pow(psi, 128, q) == 1


def test_is_prime_edge_cases():
    assert not primes.is_prime(1)
    assert primes.is_prime(2)
    assert primes.is_prime(0xFC001)
    assert not primes.is_prime(0xFC001 * 3)
    # strong pseudoprime stress
    assert not primes.is_prime(3215031751)


def test_get_primes_exhaustion():
    with pytest.raises(ValueError):
        primes.get_primes(2 * 32768, 3, 1)


@pytest.mark.parametrize("n", [4096, 8192, 16384])
def test_tpu_coeff_modulus_profile(n):
    """Sub-32-bit chain: security bound, noise parity, NTT-friendliness."""
    chain = primes.tpu_coeff_modulus(n)
    default = primes.default_coeff_modulus(n)
    assert len(set(chain)) == len(chain)
    for q in chain:
        assert q.bit_length() <= 30  # value + digit bias stays under 2^32
        assert (q - 1) % (2 * n) == 0
        assert primes.is_prime(q)
    total = sum(q.bit_length() for q in chain)
    assert total <= primes.MAX_COEFF_MODULUS_BITS_128[n]
    # at least the default chain's ciphertext-modulus noise capacity
    assert sum(q.bit_length() for q in chain[:-1]) >= sum(
        q.bit_length() for q in default[:-1]
    )


def test_tpu_coeff_modulus_needs_multi_prime_ring():
    with pytest.raises(ValueError, match="tpu32"):
        primes.tpu_coeff_modulus(2048)
