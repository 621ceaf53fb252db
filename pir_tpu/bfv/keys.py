"""BFV key material and key generation.

Replaces the ``seal::KeyGenerator`` surface the reference consumes
(pir/cpp/client.cpp:42-49, pir/cpp/test_base.cpp:80-84): secret key, public
key, Galois keys for the oblivious-expansion elements {N/2^i + 1}, and
relinearization keys.

Key-switching keys use the single-special-prime (GHS-style) construction
that SEAL 3.5 uses with its default chains: ciphertexts live mod q =
q_0···q_{L-1}; keys live mod q·P with P the last ("special") prime.  For a
target key t (s(x^g) for Galois, s² for relin), component i of the switch
key is a fresh RLWE encryption of zero under s over QP with P·t folded into
its i-th limb:

    ksk[i] = ( -(a_i·s + e_i) + P·t·δ_i ,  a_i )   (NTT form, [2, Lp, N])

where δ_i selects the i-th ciphertext limb.  See ops/keyswitch.py for the
application side.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from pir_tpu.bfv import sampling
from pir_tpu.core.context import PirContext
from pir_tpu.ops import modular


@dataclasses.dataclass
class SecretKey:
    """Ternary secret; cached in NTT form at both modulus levels."""

    coeffs: np.ndarray  # int64[N] in {-1, 0, 1}
    ntt_q: jnp.ndarray  # u64[L, N]   (ciphertext level)
    ntt_qp: jnp.ndarray  # u64[Lp, N] (key level)


@dataclasses.dataclass
class PublicKey:
    data: jnp.ndarray  # u64[2, L, N], NTT form at ciphertext level


@dataclasses.dataclass
class KSwitchKey:
    data: jnp.ndarray  # u64[L, 2, Lp, N], NTT form at key level
    # SEAL stream-PRNG seeds (8 u64 words per component) when the a-polys
    # were derived from seeds — enables seeded SEAL wire serialization
    # (Serializable semantics; pir/pir/seal_compat.py).  None otherwise.
    seeds: "list | None" = None


@dataclasses.dataclass
class GaloisKeys:
    keys: dict  # galois_elt -> KSwitchKey

    def __contains__(self, elt: int) -> bool:
        return elt in self.keys

    def __getitem__(self, elt: int) -> KSwitchKey:
        return self.keys[elt]


@dataclasses.dataclass
class RelinKeys:
    key: KSwitchKey  # target s^2


def gen_secret_key(ctx: PirContext, rng: np.random.Generator) -> SecretKey:
    s = sampling.ternary_poly(rng, ctx.n)
    s_q = jnp.asarray(sampling.signed_to_rns(s, ctx.ct_moduli))
    s_qp = jnp.asarray(sampling.signed_to_rns(s, ctx.key_moduli))
    fwd_q = ctx.jitted("ntt_q_fwd", lambda: ctx.ntt_q.forward)
    fwd_qp = ctx.jitted("ntt_qp_fwd", lambda: ctx.ntt_qp.forward)
    return SecretKey(coeffs=s, ntt_q=fwd_q(s_q), ntt_qp=fwd_qp(s_qp))


def gen_public_key(
    ctx: PirContext, sk: SecretKey, rng: np.random.Generator
) -> PublicKey:
    a = jnp.asarray(sampling.uniform_rns(rng, ctx.ct_moduli, ctx.n))  # NTT form
    e = jnp.asarray(
        sampling.signed_to_rns(sampling.error_poly(rng, ctx.n), ctx.ct_moduli)
    )

    def build():
        lq = ctx.limbs_q

        def fn(a, e_coeff, s_ntt):
            e_ntt = ctx.ntt_q.forward(e_coeff)
            pk0 = lq.neg(lq.add(lq.mul(a, s_ntt), e_ntt))
            return jnp.stack([pk0, a])

        return fn

    return PublicKey(data=ctx.jitted("gen_pk", build)(a, e, sk.ntt_q))


def gen_kswitch_key(
    ctx: PirContext,
    sk: SecretKey,
    target_ntt_qp: jnp.ndarray,
    rng: np.random.Generator,
    seeded_wire: bool = False,
) -> KSwitchKey:
    """Key-switching key for a target key given in NTT form over QP.

    seeded_wire: derive each component's uniform a-poly from a fresh SEAL
    stream-PRNG seed (seal_compat.sample_poly_uniform) instead of the
    host rng, and remember the seeds — the key then serializes in SEAL's
    seeded (Serializable) form, c1 replaced by its seed on the wire.
    Distribution and protocol behavior are unchanged (a is uniform either
    way)."""
    if ctx.special is None:
        raise ValueError(
            "key switching requires a special prime (>=2 coeff moduli)"
        )

    def build():
        lqp = ctx.limbs_qp

        def fn(a_all, e_all, s_ntt_qp, target):
            # a_all/e_all: [L, Lp, N] (a in NTT form, e in coeff form)
            e_ntt = ctx.ntt_qp.forward(e_all)
            b = lqp.neg(lqp.add(lqp.mul(a_all, s_ntt_qp), e_ntt))
            # Fold P·target into limb i of component i (NTT domain).
            comps = []
            for i in range(ctx.L):
                qi = int(ctx.ct_moduli[i])
                factor = np.uint64(int(ctx.special) % qi)
                rhi, rlo = modular.barrett_ratio(qi)
                folded = modular.mul_mod(
                    target[i], factor, np.uint64(qi), np.uint64(rhi),
                    np.uint64(rlo),
                )
                bi = b[i].at[i].set(
                    modular.add_mod(b[i, i], folded, np.uint64(qi))
                )
                comps.append(jnp.stack([bi, a_all[i]]))
            return jnp.stack(comps)

        return fn

    seeds = None
    if seeded_wire:
        from pir_tpu.pir import seal_compat

        seeds = [seal_compat.random_prng_seed(rng) for _ in range(ctx.L)]
        a_all = jnp.asarray(
            np.stack(
                [
                    seal_compat.sample_poly_uniform(s, ctx.key_moduli, ctx.n)
                    for s in seeds
                ]
            )
        )
    else:
        a_all = jnp.asarray(
            np.stack(
                [
                    sampling.uniform_rns(rng, ctx.key_moduli, ctx.n)
                    for _ in range(ctx.L)
                ]
            )
        )
    e_all = jnp.asarray(
        np.stack(
            [
                sampling.signed_to_rns(
                    sampling.error_poly(rng, ctx.n), ctx.key_moduli
                )
                for _ in range(ctx.L)
            ]
        )
    )
    data = ctx.jitted("gen_ksk", build)(a_all, e_all, sk.ntt_qp, target_ntt_qp)
    return KSwitchKey(data=data, seeds=seeds)


def _automorph_signed(coeffs: np.ndarray, galois_elt: int) -> np.ndarray:
    """x -> x^g on signed host-side coefficients (for s(x^g) targets)."""
    n = len(coeffs)
    out = np.zeros_like(coeffs)
    for i in range(n):
        j = (i * galois_elt) % (2 * n)
        if j < n:
            out[j] += coeffs[i]
        else:
            out[j - n] -= coeffs[i]
    return out


def gen_galois_keys(
    ctx: PirContext,
    sk: SecretKey,
    elts,
    rng: np.random.Generator,
    seeded_wire: bool = False,
) -> GaloisKeys:
    fwd_qp = ctx.jitted("ntt_qp_fwd", lambda: ctx.ntt_qp.forward)
    keys = {}
    for elt in elts:
        s_g = _automorph_signed(sk.coeffs, int(elt))
        target = fwd_qp(jnp.asarray(sampling.signed_to_rns(s_g, ctx.key_moduli)))
        keys[int(elt)] = gen_kswitch_key(
            ctx, sk, target, rng, seeded_wire=seeded_wire
        )
    return GaloisKeys(keys=keys)


def gen_relin_key(
    ctx: PirContext,
    sk: SecretKey,
    rng: np.random.Generator,
    seeded_wire: bool = False,
) -> RelinKeys:
    target = ctx.limbs_qp.mul(sk.ntt_qp, sk.ntt_qp)  # s^2 in NTT form
    return RelinKeys(
        key=gen_kswitch_key(ctx, sk, target, rng, seeded_wire=seeded_wire)
    )
