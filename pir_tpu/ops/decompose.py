"""Ciphertext digit decomposition — the SealPIR "ciphertext re-encoding" trick.

Parity with the reference's CiphertextReencoder (pir/cpp/ct_reencoder.cpp):
each RNS coefficient word of a ciphertext is split into
ceil(log2(q_i) / pt_bits) base-2^pt_bits digits, each digit polynomial
becoming an ordinary plaintext that upper recursion levels multiply against
the next dimension's selection vector.  The inverse recomposition runs
client-side during response decoding.

``pt_bits`` is always floor(log2 t) — the reencoder ignores any user
``bits_per_coeff`` override, exactly like the reference (which derives it
from the plain modulus directly, ct_reencoder.cpp:32).

Digit order contract (must match the reference for reply-layout parity):
polynomial-major, then RNS limb, then digit (low digit first)
— ct_reencoder.cpp:49-67.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from pir_tpu.core.context import PirContext
from pir_tpu.utils.math import floor_log2


def pt_bits_per_coeff(ctx: PirContext) -> int:
    return floor_log2(ctx.t)


def local_expansion_ratios(ctx: PirContext) -> list[int]:
    """Digits per limb: ceil(log2(q_i)/pt_bits), float log2 like the reference."""
    bits = pt_bits_per_coeff(ctx)
    return [
        int(math.ceil(math.log2(q) / bits)) for q in ctx.ct_moduli
    ]


def expansion_ratio(ctx: PirContext) -> int:
    """Plaintexts per ciphertext polynomial (ct_reencoder.cpp:29-38)."""
    return sum(local_expansion_ratios(ctx))


def decompose_ct(ctx: PirContext, ct: jnp.ndarray) -> jnp.ndarray:
    """u64[..., size, L, N] coeff-form -> digit plaintexts u64[..., size*ER, N].

    Output index order: (poly, limb, digit) flattened C-style.
    """
    bits = pt_bits_per_coeff(ctx)
    mask = jnp.uint64((1 << bits) - 1)
    ratios = local_expansion_ratios(ctx)
    pieces = []
    for limb, r in enumerate(ratios):
        word = ct[..., :, limb, :]  # [..., size, N]
        for d in range(r):
            pieces.append((word >> jnp.uint64(d * bits)) & mask)
    # pieces currently ordered (limb, digit) with the poly axis inside each
    # piece; stack to [..., size, ER, N] then flatten poly-major.
    stacked = jnp.stack(pieces, axis=-2)  # [..., size, ER, N]
    shape = stacked.shape
    return stacked.reshape(*shape[:-3], shape[-3] * shape[-2], shape[-1])


def compose_ct(ctx: PirContext, pts: np.ndarray, ct_size: int = 2) -> np.ndarray:
    """Inverse of decompose_ct: digit plaintexts -> u64[ct_size, L, N].

    Host-side (client response path).  Parity with
    CiphertextReencoder::Decode (ct_reencoder.cpp:77-112).
    """
    bits = pt_bits_per_coeff(ctx)
    ratios = local_expansion_ratios(ctx)
    er = sum(ratios)
    pts = np.asarray(pts, dtype=np.uint64).reshape(ct_size, er, ctx.n)
    out = np.zeros((ct_size, ctx.L, ctx.n), dtype=np.uint64)
    for poly in range(ct_size):
        k = 0
        for limb, r in enumerate(ratios):
            acc = np.zeros(ctx.n, dtype=np.uint64)
            for d in range(r):
                acc += pts[poly, k] << np.uint64(d * bits)
                k += 1
            out[poly, limb] = acc
    return out
