"""Small, fast parameter sets for unit tests.

The reference's tests run real crypto at N=4096/8192; ours additionally use
tiny rings (N=64..256) with ~20-bit primes so kernel-level properties run in
milliseconds, plus the real default rings for golden-vector parity tests.
"""

from __future__ import annotations

from pir_tpu.core import primes
from pir_tpu.core.params import EncryptionParams, PirParams, create_pir_parameters


def tiny_encryption_params(
    n: int = 64, t_bits: int = 12, q_bits=(26, 27, 28)
) -> EncryptionParams:
    """N-degree ring with small NTT primes; last prime is the special prime."""
    coeff = primes.coeff_modulus_from_bits(n, list(q_bits))
    t = primes.get_prime(2 * n, t_bits)
    p = EncryptionParams(
        poly_modulus_degree=n, plain_modulus=t, coeff_modulus=tuple(coeff)
    )
    p.validate()
    return p


def tiny_pir_params(
    dbsize: int = 40,
    bytes_per_item: int = 8,
    dimensions: int = 1,
    n: int = 64,
    t_bits: int = 12,
    use_ciphertext_multiplication: bool = False,
    bits_per_coeff: int = 0,
    q_bits=(26, 27, 28),
    reencode_digits: str = "balanced",
) -> PirParams:
    return create_pir_parameters(
        dbsize,
        bytes_per_item,
        dimensions,
        tiny_encryption_params(n, t_bits, q_bits),
        use_ciphertext_multiplication,
        bits_per_coeff,
        reencode_digits=reencode_digits,
    )
