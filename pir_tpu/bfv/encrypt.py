"""BFV encryption, decryption, and noise introspection.

Replaces the ``seal::Encryptor``/``Decryptor`` surface the reference uses
(pir/cpp/client.cpp:137,211,240; pir/cpp/database.cpp:262-269).

Ciphertext layout: ``u64[size, L, N]`` coefficient form (size 2 fresh, 3
after an unrelinearized multiply).  Encryption math runs through the jitted
device ops; the final scale-and-round of decryption is exact host-side CRT
(client-side, off the hot path — the reference likewise leaves decryption
single-threaded on the client).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pir_tpu.bfv import sampling
from pir_tpu.bfv.keys import PublicKey, SecretKey
from pir_tpu.core.context import PirContext
from pir_tpu.ops import modular


def lift_plaintext(ctx: PirContext, m: np.ndarray) -> jnp.ndarray:
    """round(q·m/t) per coefficient, as an RNS poly u64[L, N].

    The exact-rational "scaling variant" SEAL uses for BFV encryption —
    NOT Δ·m = floor(q/t)·m.  The distinction matters: with Δ·m the encoding
    error is m·(q mod t)/q per coefficient, which after an *unreduced*
    message product M = m1·m2 (coefficients up to N·t²) grows to
    N·t³/q — catastrophically wrong at e.g. t=2^24, q=2^72, N=4096.  With
    round(q·m/t) the per-coefficient encoding error is ≤ t/(2q) and the
    product error stays ≪ 1/2.  Host-side big-int math (client-side op).
    """
    m_obj = np.asarray(m, dtype=np.uint64).astype(object)
    q = ctx.q_big
    t = ctx.t
    scaled = (m_obj * q + t // 2) // t  # round(q*m/t), exact
    out = np.zeros((ctx.L, ctx.n), dtype=np.uint64)
    for li, qi in enumerate(ctx.ct_moduli):
        out[li] = np.asarray(scaled % qi, dtype=np.uint64)
    return jnp.asarray(out)


def encrypt(
    ctx: PirContext, pk: PublicKey, m: np.ndarray, rng: np.random.Generator
) -> jnp.ndarray:
    """Fresh encryption of plaintext m (u64[N], mod t) -> u64[2, L, N]."""
    u = jnp.asarray(
        sampling.signed_to_rns(sampling.ternary_poly(rng, ctx.n), ctx.ct_moduli)
    )
    e0 = jnp.asarray(
        sampling.signed_to_rns(sampling.error_poly(rng, ctx.n), ctx.ct_moduli)
    )
    e1 = jnp.asarray(
        sampling.signed_to_rns(sampling.error_poly(rng, ctx.n), ctx.ct_moduli)
    )

    def build():
        lq = ctx.limbs_q

        def fn(pk_data, u_coeff, e0, e1, scaled_m):
            u_ntt = ctx.ntt_q.forward(u_coeff)
            c0 = lq.add(
                lq.add(ctx.ntt_q.inverse(lq.mul(pk_data[0], u_ntt)), e0),
                scaled_m,
            )
            c1 = lq.add(ctx.ntt_q.inverse(lq.mul(pk_data[1], u_ntt)), e1)
            return jnp.stack([c0, c1])

        return fn

    return ctx.jitted("encrypt", build)(
        pk.data, u, e0, e1, lift_plaintext(ctx, m)
    )


def encrypt_zero(
    ctx: PirContext, pk: PublicKey, rng: np.random.Generator
) -> jnp.ndarray:
    return encrypt(ctx, pk, np.zeros(ctx.n, dtype=np.uint64), rng)


def expand_a_from_seed(ctx: PirContext, seed: bytes) -> np.ndarray:
    """Deterministic uniform ring element u64[L, N] (coeff form) from a
    16-byte seed.  Shared by the encryptor and anyone re-expanding a
    seeded ciphertext (the server, pir/wire.py)."""
    gen = np.random.Generator(np.random.Philox(key=int.from_bytes(seed, "little")))
    return sampling.uniform_rns(gen, ctx.ct_moduli, ctx.n)


def encrypt_symmetric_seeded(
    ctx: PirContext,
    sk: SecretKey,
    m: np.ndarray,
    rng: np.random.Generator,
    seed: "bytes | None" = None,
) -> tuple[np.ndarray, bytes]:
    """Symmetric seeded encryption: returns (c0 u64[L, N], seed).

    The full ciphertext is (c0, a) with a = expand_a_from_seed(seed), so
    only c0 + 16 bytes cross the wire — half the bytes of a full fresh
    ciphertext.  Semantics of seal::Encryptor::encrypt_symmetric with a
    seeded second polynomial (the reference sends full ciphertexts,
    pir/cpp/client.cpp:136-140; this is a wire-size optimization the
    PTS1 codec in pir/wire.py carries transparently).

        c0 = Δm + e - a·s   ⇒   c0 + a·s = Δm + e
    """
    if seed is None:
        seed = rng.bytes(16)
    a = jnp.asarray(expand_a_from_seed(ctx, seed))
    e = jnp.asarray(
        sampling.signed_to_rns(sampling.error_poly(rng, ctx.n), ctx.ct_moduli)
    )

    def build():
        lq = ctx.limbs_q

        def fn(a_coeff, e, s_ntt, scaled_m):
            a_s = ctx.ntt_q.inverse(
                lq.mul(ctx.ntt_q.forward(a_coeff), s_ntt)
            )
            return lq.sub(lq.add(scaled_m, e), a_s)

        return fn

    c0 = ctx.jitted("encrypt_sym", build)(
        a, e, sk.ntt_q, lift_plaintext(ctx, m)
    )
    return np.asarray(c0), seed


def _phase(ctx: PirContext, sk: SecretKey, ct: jnp.ndarray) -> np.ndarray:
    """c0 + c1·s (+ c2·s² ...) mod q', coefficient form — Horner over s.

    The modulus level is read off the limb axis, so mod-switched
    ciphertexts (ops/modswitch.py) decrypt at their reduced q'.
    """
    size = ct.shape[-3]
    level = ct.shape[-2]
    ntt = ctx.ntt_q if level == ctx.L else ctx.ntt_qp.slice(level)

    def build():
        lq = ntt.limbs

        def fn(ct, s_ntt):
            acc = ct[..., size - 1, :, :]
            for k in range(size - 2, -1, -1):
                acc = lq.add(
                    ntt.inverse(lq.mul(ntt.forward(acc), s_ntt)),
                    ct[..., k, :, :],
                )
            return acc

        return fn

    return np.asarray(
        ctx.jitted(f"phase{size}_{level}", build)(ct, sk.ntt_q[:level])
    )


def decrypt(ctx: PirContext, sk: SecretKey, ct: jnp.ndarray) -> np.ndarray:
    """Decrypt to a plaintext u64[N] mod t: m = round(t·phase/q') mod t."""
    phase = _phase(ctx, sk, ct)
    coeffs = ctx.crt_lift(phase)
    q = ctx.q_prod(ct.shape[-2])
    t = ctx.t
    half = q >> 1
    out = np.zeros(ctx.n, dtype=np.uint64)
    for i, c in enumerate(coeffs):
        out[i] = ((t * c + half) // q) % t
    return out


def invariant_noise_budget(ctx: PirContext, sk: SecretKey, ct: jnp.ndarray) -> int:
    """Bits of noise budget left: floor(log2(q / (2·|t·phase mod q|_∞))).

    Semantics of seal::Decryptor::invariant_noise_budget as used by the
    reference's noise probe (pir/cpp/database.cpp:260-270).  0 means the
    ciphertext no longer decrypts reliably.
    """
    phase = _phase(ctx, sk, ct)
    coeffs = ctx.crt_lift(phase)
    q = ctx.q_prod(ct.shape[-2])
    t = ctx.t
    vmax = 0
    for c in coeffs:
        r = (t * c) % q
        if r > q // 2:
            r = q - r
        vmax = max(vmax, r)
    if vmax == 0:
        return q.bit_length()
    ratio = q // (2 * vmax)
    if ratio == 0:
        return 0
    return ratio.bit_length() - 1
