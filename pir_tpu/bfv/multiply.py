"""BFV ciphertext×ciphertext multiplication (BEHZ full-RNS variant).

Replaces ``seal::Evaluator::multiply`` as used by the reference's
ciphertext-multiplication recursion mode (pir/cpp/database.cpp:204).

Pipeline for size-2 inputs (output size 3, relinearize separately):

1. lift both ciphertexts exactly into the auxiliary base Bsk
   (m_tilde trick + small Montgomery reduction);
2. negacyclic tensor product in NTT domain over q and over Bsk;
3. scale by t/q: multiply by t in both bases, fast_floor into Bsk;
4. exact conversion back to base q (Shenoy–Kumaresan).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from pir_tpu.core.context import PirContext
from pir_tpu.core.rns import RnsTool
from pir_tpu.ops import modular


@functools.lru_cache(maxsize=8)
def _rns_tool(ct_moduli: tuple, n: int, t: int) -> RnsTool:
    return RnsTool(ct_moduli, n, t)


def rns_tool_for(ctx: PirContext) -> RnsTool:
    return _rns_tool(tuple(ctx.ct_moduli), ctx.n, ctx.t)


def bfv_multiply(ctx: PirContext, ct1: jnp.ndarray, ct2: jnp.ndarray) -> jnp.ndarray:
    """u64[..., 2, L, N] × u64[..., 2, L, N] -> u64[..., 3, L, N] (coeff form)."""
    tool = rns_tool_for(ctx)
    lq = ctx.limbs_q
    lb = tool.limbs_bsk

    # 1. lift to Bsk (exact) and forward NTT in both bases
    def lift(ct):
        bsk = tool.fastbconv_m_tilde_sm_mrq(ct)
        return (
            ctx.ntt_q.forward(ct),
            tool.ntt_bsk.forward(bsk),
        )

    a_q, a_b = lift(ct1)
    b_q, b_b = lift(ct2)

    # 2. tensor product (dyadic, both bases): [..., 3, limbs, N]
    def tensor(x, y, limbs):
        x0, x1 = x[..., 0, :, :], x[..., 1, :, :]
        y0, y1 = y[..., 0, :, :], y[..., 1, :, :]
        mul = lambda u, v: modular.mul_mod(u, v, limbs.q, limbs.ratio_hi, limbs.ratio_lo)
        c0 = mul(x0, y0)
        c1 = modular.add_mod(mul(x0, y1), mul(x1, y0), limbs.q)
        c2 = mul(x1, y1)
        return jnp.stack([c0, c1, c2], axis=-3)

    prod_q = ctx.ntt_q.inverse(tensor(a_q, b_q, lq))
    prod_b = tool.ntt_bsk.inverse(tensor(a_b, b_b, lb))

    # 3. ×t then floor(t·v/q) in Bsk
    t_q = modular.mul_mod_shoup(
        prod_q, tool.t_mod_q, tool._shoup(tool.t_mod_q, lq), lq.q
    )
    t_b = modular.mul_mod_shoup(
        prod_b, tool.t_mod_bsk, tool._shoup(tool.t_mod_bsk, lb), lb.q
    )
    floored = tool.fast_floor(t_q, t_b)

    # 4. back to base q
    return tool.fastbconv_sk(floored)
