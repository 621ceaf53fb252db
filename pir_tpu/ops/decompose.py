"""Ciphertext digit decomposition — the SealPIR "ciphertext re-encoding" trick.

Parity with the reference's CiphertextReencoder (pir/cpp/ct_reencoder.cpp):
each RNS coefficient word of a ciphertext is split into
ceil(log2(q_i) / pt_bits) digits, each digit polynomial becoming an
ordinary plaintext that upper recursion levels multiply against the next
dimension's selection vector.  The inverse recomposition runs client-side
during response decoding.

Digit widths are governed by ``params.reencode_mode``:

* **legacy (0)** — every digit is ``floor(log2 t)`` bits, byte-identical
  to the reference (which derives the width from the plain modulus
  directly and ignores any user ``bits_per_coeff`` override,
  ct_reencoder.cpp:32).  Required when a reference binary must decode the
  replies.
* **balanced (1)** — the SAME digit count per limb (so ExpansionRatio and
  every reply shape are unchanged) but balanced widths
  ``ceil(bitlen(q_i) / r_i)``: e.g. a 36-bit limb under t of 24 bits
  splits 18+18 instead of 23+13.  Digit magnitude drops ~2^5x, which is
  ~5 bits of extra invariant-noise budget on every upper-level product —
  the margin that keeps the 1M-item d=2 recursion off the decode cliff
  (a free lunch the reference leaves on the table; native-mode default).

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
    """Digits per limb: ceil(log2(q_i)/pt_bits), float log2 like the
    reference (ct_reencoder.cpp:33-36).  Identical in both modes."""
    bits = pt_bits_per_coeff(ctx)
    return [
        int(math.ceil(math.log2(q) / bits)) for q in ctx.ct_moduli
    ]


def digit_widths(ctx: PirContext) -> list[int]:
    """Per-limb digit width in bits.

    legacy: pt_bits for every limb.  balanced: ceil(bitlen(q_i)/r_i) —
    always <= pt_bits (r_i * pt_bits >= log2(q_i) by construction), so
    every digit remains a valid plaintext coefficient.
    """
    bits = pt_bits_per_coeff(ctx)
    mode = getattr(ctx.params, "reencode_mode", 0)
    if mode == 0:
        return [bits] * len(ctx.ct_moduli)
    ratios = local_expansion_ratios(ctx)
    return [
        -(-int(q).bit_length() // r) for q, r in zip(ctx.ct_moduli, ratios)
    ]


def expansion_ratio(ctx: PirContext) -> int:
    """Plaintexts per ciphertext polynomial (ct_reencoder.cpp:29-38)."""
    return sum(local_expansion_ratios(ctx))


def decompose_ct(ctx: PirContext, ct: jnp.ndarray) -> jnp.ndarray:
    """u64[..., size, L, N] coeff-form -> digit plaintexts u64[..., size*ER, N].

    Output index order: (poly, limb, digit) flattened C-style.
    """
    ratios = local_expansion_ratios(ctx)
    widths = digit_widths(ctx)
    pieces = []
    for limb, (r, w) in enumerate(zip(ratios, widths)):
        word = ct[..., :, limb, :]  # [..., size, N]
        mask = jnp.uint64((1 << w) - 1)
        for d in range(r):
            pieces.append((word >> jnp.uint64(d * w)) & mask)
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
    ratios = local_expansion_ratios(ctx)
    widths = digit_widths(ctx)
    er = sum(ratios)
    pts = np.asarray(pts, dtype=np.uint64).reshape(ct_size, er, ctx.n)
    out = np.zeros((ct_size, ctx.L, ctx.n), dtype=np.uint64)
    for poly in range(ct_size):
        k = 0
        for limb, (r, w) in enumerate(zip(ratios, widths)):
            acc = np.zeros(ctx.n, dtype=np.uint64)
            for d in range(r):
                acc += pts[poly, k] << np.uint64(d * w)
                k += 1
            out[poly, limb] = acc
    return out
