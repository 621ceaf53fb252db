"""BFV modulus switching: divide-and-round by the last RNS prime.

Semantics of ``seal::Evaluator::mod_switch_to_next`` for BFV (the
divide-and-round-q-last path): given a ciphertext over q = q_0···q_{L-1},
produce one over q/q_{L-1} whose coefficients are round(c / q_{L-1}),
computed purely in RNS:

    c' mod q_j = (c_j + h_j - [(c_last + h) mod q_last]_j) · q_last⁻¹ mod q_j

with h = floor(q_last / 2).  Invariant noise t·v/q is preserved up to a
small additive rounding term, so the switched ciphertext decrypts to the
same plaintext while occupying 1/L' of the bytes per dropped limb.

The reference has no analog — it returns full-width reply ciphertexts
(pir/cpp/server.cpp:192).  Switching the *final* reply ciphertexts down
before serialization is the classic SealPIR reply-shrinking optimization:
it cuts reply wire bytes and client decrypt cost by L/keep with no effect
on the protocol (the client infers the limb count from the array shape).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from pir_tpu.core.context import PirContext
from pir_tpu.ops import modular


@functools.lru_cache(maxsize=None)
def _drop_consts(moduli: tuple):
    """Constants for dropping the last prime of `moduli`.

    Returns (rest_limbs, q_last, half, half_mod_rest[L-1,1],
    inv_qlast_mod_rest[L-1,1], inv_shoup[L-1,1]).
    """
    rest = modular.LimbConstants(moduli[:-1])
    q_last = int(moduli[-1])
    half = q_last >> 1
    half_mod = np.array([[half % m] for m in moduli[:-1]], dtype=np.uint64)
    inv = np.array(
        [[pow(q_last % m, -1, m)] for m in moduli[:-1]], dtype=np.uint64
    )
    inv_shoup = modular.shoup_precompute(inv, rest.q)
    return rest, np.uint64(q_last), np.uint64(half), half_mod, inv, inv_shoup


def mod_switch_drop_last(ctx: PirContext, ct: jnp.ndarray) -> jnp.ndarray:
    """u64[..., L', N] coeff form mod q_0..q_{L'-1} -> [..., L'-1, N].

    Works on any polynomial array with the limb axis second-to-last
    (ciphertext polys included via broadcasting over leading axes).
    """
    cur = ct.shape[-2]
    if cur < 2:
        raise ValueError("cannot drop the last remaining modulus")
    moduli = ctx.ct_moduli[:cur]
    rest, q_last, half, half_mod, inv, inv_shoup = _drop_consts(tuple(moduli))

    last = ct[..., cur - 1 : cur, :]  # [..., 1, N]
    last_half = modular.add_mod(last, half, q_last)
    tmp = modular.barrett_reduce_64(last_half, rest.q, rest.ratio_hi)
    tmp = modular.sub_mod(tmp, half_mod, rest.q)
    diff = modular.sub_mod(ct[..., : cur - 1, :], tmp, rest.q)
    return modular.mul_mod_shoup(diff, inv, inv_shoup, rest.q)


def mod_switch_to(ctx: PirContext, ct: jnp.ndarray, keep: int) -> jnp.ndarray:
    """Drop trailing RNS limbs until `keep` remain (no-op if already there)."""
    if keep < 1:
        raise ValueError("must keep at least one modulus")
    while ct.shape[-2] > keep:
        ct = mod_switch_drop_last(ctx, ct)
    return ct
