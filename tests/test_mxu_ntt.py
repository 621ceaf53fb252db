"""MXU four-step digit-matmul NTT: bit-exactness vs the reference path.

The XLA per-stage formulation (ops/ntt.py) is the package's bit-exactness
reference (itself golden-tested against SEAL semantics in test_ntt.py);
ops/mxu_ntt.py must match it exactly on every supported size.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.core.params import generate_encryption_params
from pir_tpu.ops import mxu_ntt
from pir_tpu.ops.ntt import NttTables


def _toy_prime(n: int) -> int:
    """Smallest prime p = 1 mod 2n (NTT-friendly for degree n)."""
    p = 2 * n + 1
    while True:
        if all(p % d for d in range(2, int(p**0.5) + 1)):
            return p
        p += 2 * n


@pytest.mark.parametrize("n", [16, 64, 256, 1024])
def test_matches_reference_toy_primes(n, rng):
    moduli = (_toy_prime(n),)
    t = NttTables(moduli, n)
    x = jnp.asarray(rng.integers(0, moduli[0], (4, 1, n), dtype=np.uint64))
    ref = t.forward(x)
    got = mxu_ntt.ntt(t, x, inverse=False)
    assert jnp.array_equal(ref, got)
    assert jnp.array_equal(t.inverse(ref), mxu_ntt.ntt(t, got, inverse=True))


@pytest.mark.parametrize("n,bits", [(4096, 24), (8192, 24)])
def test_matches_reference_default_params(n, bits, rng):
    moduli = tuple(generate_encryption_params(n, bits).coeff_modulus)
    t = NttTables(moduli, n)
    L = len(moduli)
    x = jnp.asarray(rng.integers(0, min(moduli), (2, L, n), dtype=np.uint64))
    ref_f = t.forward(x)
    got_f = mxu_ntt.ntt(t, x, inverse=False)
    assert jnp.array_equal(ref_f, got_f)
    got_i = mxu_ntt.ntt(t, got_f, inverse=True)
    assert jnp.array_equal(got_i, x)


def test_batch_shapes(rng):
    n = 64
    moduli = (_toy_prime(n),)
    t = NttTables(moduli, n)
    # multi-axis leading batch dims survive the internal flatten
    x = jnp.asarray(rng.integers(0, moduli[0], (3, 2, 1, n), dtype=np.uint64))
    got = mxu_ntt.ntt(t, x, inverse=False)
    assert got.shape == x.shape
    ref = t.forward(x)
    assert jnp.array_equal(ref, got)


def test_supported_sizes():
    assert mxu_ntt.supported(4096)
    assert mxu_ntt.supported(16384)
    assert not mxu_ntt.supported(32768)  # n2 = 256 > MXU lane tile
    assert not mxu_ntt.supported(48)  # not a power of two


def test_balanced_digit_count_bounds():
    # q of exactly 8k-1 bits must not overflow the balanced representation
    for bits in (7, 8, 36, 37, 39, 40, 61):
        d = mxu_ntt._balanced_digit_count(bits)
        bias = sum(128 << (8 * i) for i in range(d))
        assert (1 << bits) - 1 + bias < (1 << (8 * d))
