"""Homomorphic evaluator primitives over raw ciphertext arrays.

Replaces the ``seal::Evaluator`` ops the reference's hot path uses
(SURVEY §2b): coefficient-wise add, NTT-domain ciphertext×plaintext
multiply (the DB-scan kernel), and the NTT form conversions.  All functions
are pure, jittable, and batched over arbitrary leading axes.

Ciphertexts: ``u64[..., size, L, N]``; plaintexts: ``u64[..., N]`` (mod t)
or lifted RNS polys ``u64[..., L, N]``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pir_tpu.core.context import PirContext
from pir_tpu.ops import modular


def add_ct(ctx: PirContext, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Homomorphic addition (both operands in the same domain/form)."""
    return modular.add_mod(a, b, ctx.limbs_q.q)


def plaintext_to_rns(ctx: PirContext, pt) -> jnp.ndarray:
    """Plaintext u64[..., N] (mod t) -> RNS poly u64[..., L, N], un-scaled.

    Coefficients are taken as-is (t < every q_i), matching SEAL's
    non-centered plaintext lift for multiply_plain.
    """
    pt = jnp.asarray(pt, dtype=jnp.uint64)
    return jnp.broadcast_to(
        pt[..., None, :], pt.shape[:-1] + (ctx.L, pt.shape[-1])
    )


def plaintext_to_ntt(ctx: PirContext, pt) -> jnp.ndarray:
    """Plaintext mod t -> NTT form at ciphertext level (DB precompute path).

    Semantics of Evaluator::transform_to_ntt_inplace(plain, parms_id) as
    used for database plaintexts (pir/cpp/database.cpp:74,104).
    """
    return ctx.ntt_q.forward(plaintext_to_rns(ctx, pt))


def ct_to_ntt(ctx: PirContext, ct: jnp.ndarray) -> jnp.ndarray:
    return ctx.ntt_q.forward(ct)


def ct_from_ntt(ctx: PirContext, ct: jnp.ndarray) -> jnp.ndarray:
    return ctx.ntt_q.inverse(ct)


def multiply_plain_ntt(
    ctx: PirContext, ct_ntt: jnp.ndarray, pt_ntt: jnp.ndarray
) -> jnp.ndarray:
    """NTT-domain ct×pt product — the per-element DB-scan op.

    ct_ntt: u64[..., size, L, N]; pt_ntt: u64[..., L, N] (broadcasts over the
    size axis).  Semantics of Evaluator::multiply_plain in decomposition mode
    (pir/cpp/database.cpp:192,229).
    """
    return modular.mul_mod(
        ct_ntt,
        pt_ntt[..., None, :, :],
        ctx.limbs_q.q,
        ctx.limbs_q.ratio_hi,
        ctx.limbs_q.ratio_lo,
    )


def multiply_scalar_mod_t(ctx: PirContext, pt, scalar: int):
    """Plaintext scalar multiply mod t (host/test helper)."""
    pt = np.asarray(pt, dtype=np.uint64)
    return (pt.astype(object) * (scalar % ctx.t) % ctx.t).astype(np.uint64)
