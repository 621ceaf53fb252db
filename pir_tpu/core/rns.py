"""RNS base-conversion machinery for BFV ciphertext multiplication (BEHZ).

The reference consumes this through SEAL's ``Evaluator::multiply``
(pir/cpp/database.cpp:204) as a black box; here it is built from scratch
as vectorized device math.  The scheme is the BEHZ16 full-RNS BFV variant
(the one SEAL 3.5 implements):

* auxiliary base **Bsk** = {b_1..b_k, m_sk} of NTT-friendly primes large
  enough that prod(B) > the tensor-product magnitude;
* **m_tilde = 2^32** Montgomery factor that makes the q→Bsk fast base
  conversion exact (the "small Montgomery reduction" removes the α·q
  overshoot);
* **fast_floor** computes floor(t·x/q) in Bsk with additive error ≤ k;
* **fastbconv_sk** (Shenoy–Kumaresan) converts exactly back to base q
  using the redundant m_sk limb.

All per-limb constants are host-precomputed Python big-int reductions;
conversions are jittable u64 array math.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pir_tpu.core import primes as primes_mod
from pir_tpu.ops import modular
from pir_tpu.ops.ntt import NttTables

_M_TILDE_BITS = 32
_M_TILDE = 1 << _M_TILDE_BITS
_M_TILDE_MASK = np.uint64(_M_TILDE - 1)


def _mod_cols(value: int, moduli) -> np.ndarray:
    """Big int reduced mod each modulus -> u64[L, 1] broadcast column."""
    return np.array([[value % int(m)] for m in moduli], dtype=np.uint64)


class RnsTool:
    def __init__(self, ct_moduli, n: int, t: int, aux_bits: int = 60):
        self.q_moduli = tuple(int(m) for m in ct_moduli)
        self.n = n
        self.t = t
        k = len(self.q_moduli)
        self.q = 1
        for m in self.q_moduli:
            self.q *= m

        # Auxiliary primes: enough that prod(B) > 2 * N * q (tensor-product
        # coefficient bound after fast_floor is ~< q·(N+α); SEAL uses k+1
        # primes of full width — we match: k primes for B plus m_sk).
        # Size requirements (see BEHZ16 §4 / SEAL's RNSTool):
        #   prod(B) > 2·t·N·q   (fastbconv_sk input bound)
        #   q·prod(Bsk) > t·N·q²  (tensor-product joint representation)
        # k primes of aux_bits for B plus one m_sk satisfies both for every
        # supported chain (aux_bits=60 vs q_i <= 61).
        need = k + 1
        pool = primes_mod.get_primes(2 * n, aux_bits, need + k)
        taken = [p for p in pool if p not in self.q_moduli][:need]
        self.b_moduli = tuple(taken[:k])
        self.m_sk = taken[k]
        self.bsk_moduli = self.b_moduli + (self.m_sk,)
        self.prod_b = 1
        for m in self.b_moduli:
            self.prod_b *= m

        self.limbs_q = modular.LimbConstants(self.q_moduli)
        self.limbs_bsk = modular.LimbConstants(self.bsk_moduli)
        self.ntt_bsk = NttTables(self.bsk_moduli, n)

        # ---- FastBConv q -> X constants -------------------------------
        punct_q = [self.q // m for m in self.q_moduli]
        self.inv_punct_q = np.array(
            [[pow(punct_q[i] % m, -1, m)] for i, m in enumerate(self.q_moduli)],
            dtype=np.uint64,
        )  # [k, 1]
        # punct_q[i] mod each target modulus of Bsk∪{m_tilde}
        self.punct_q_mod_bsk = np.array(
            [[p % m for p in punct_q] for m in self.bsk_moduli], dtype=np.uint64
        )  # [k_bsk, k]
        self.punct_q_mod_mtilde = np.array(
            [p % _M_TILDE for p in punct_q], dtype=np.uint64
        )  # [k]

        # ---- sm_mrq constants -----------------------------------------
        self.neg_inv_q_mod_mtilde = np.uint64(
            (-pow(self.q % _M_TILDE, -1, _M_TILDE)) % _M_TILDE
        )
        self.prod_q_mod_bsk = _mod_cols(self.q, self.bsk_moduli)
        self.prod_q_mtilde_mod_bsk = _mod_cols(self.q * _M_TILDE, self.bsk_moduli)
        self.inv_mtilde_mod_bsk = _mod_cols(
            0, self.bsk_moduli
        )  # placeholder, filled below
        for i, m in enumerate(self.bsk_moduli):
            self.inv_mtilde_mod_bsk[i, 0] = pow(_M_TILDE % m, -1, m)
        self.m_tilde_half = np.uint64(_M_TILDE // 2)

        # ---- fast_floor constants -------------------------------------
        self.inv_q_mod_bsk = np.zeros((len(self.bsk_moduli), 1), dtype=np.uint64)
        for i, m in enumerate(self.bsk_moduli):
            self.inv_q_mod_bsk[i, 0] = pow(self.q % m, -1, m)

        # ---- fastbconv_sk constants -----------------------------------
        punct_b = [self.prod_b // m for m in self.b_moduli]
        self.inv_punct_b = np.array(
            [[pow(punct_b[i] % m, -1, m)] for i, m in enumerate(self.b_moduli)],
            dtype=np.uint64,
        )
        self.punct_b_mod_q = np.array(
            [[p % m for p in punct_b] for m in self.q_moduli], dtype=np.uint64
        )  # [k_q, k_b]
        self.punct_b_mod_msk = np.array(
            [p % self.m_sk for p in punct_b], dtype=np.uint64
        )
        self.inv_prod_b_mod_msk = np.uint64(
            pow(self.prod_b % self.m_sk, -1, self.m_sk)
        )
        self.prod_b_mod_q = _mod_cols(self.prod_b, self.q_moduli)
        self.m_sk_half = np.uint64(self.m_sk // 2)

        # plain-scaling constants (t mod each modulus)
        self.t_mod_q = _mod_cols(t, self.q_moduli)
        self.t_mod_bsk = _mod_cols(t, self.bsk_moduli)

        self._shoup_cache = {}

    # ------------------------------------------------------------------
    def _fastbconv(self, x, inv_punct, src_limbs, punct_mod_tgt, tgt_limbs):
        """Generic fast base conversion.

        x: u64[..., k_src, N]; punct_mod_tgt: [k_tgt, k_src].
        Returns u64[..., k_tgt, N] == (x + α·prod_src) mod target, α ≤ k_src.
        """
        y = modular.mul_mod_shoup(
            x, inv_punct, self._shoup(inv_punct, src_limbs), src_limbs.q
        )  # [..., k_src, N]
        # Σ_i y_i · punct_i  mod each target modulus
        prod = modular.mul_mod(
            y[..., None, :, :],
            punct_mod_tgt[:, :, None],
            tgt_limbs.q[..., None],
            tgt_limbs.ratio_hi[..., None],
            tgt_limbs.ratio_lo[..., None],
        )  # [..., k_tgt, k_src, N]
        acc = jnp.sum(prod, axis=-2)  # < k_src · q_tgt, fits u64
        return modular.barrett_reduce_64(acc, tgt_limbs.q, tgt_limbs.ratio_hi)

    def _shoup(self, w: np.ndarray, limbs) -> np.ndarray:
        key = (id(w), id(limbs))
        if key not in self._shoup_cache:
            self._shoup_cache[key] = modular.shoup_precompute(w, limbs.q)
        return self._shoup_cache[key]

    # ------------------------------------------------------------------
    def fastbconv_m_tilde_sm_mrq(self, x_q: jnp.ndarray) -> jnp.ndarray:
        """Exact conversion x (base q) -> base Bsk via the m_tilde trick.

        x_q: u64[..., k_q, N] -> u64[..., k_bsk, N], exactly ≡ x mod each b.
        """
        lq = self.limbs_q
        # multiply by m_tilde mod q
        mt_mod_q = _mod_cols(_M_TILDE, self.q_moduli)
        xm = modular.mul_mod_shoup(
            x_q, mt_mod_q, self._shoup(mt_mod_q, lq), lq.q
        )
        # convert to Bsk and to m_tilde
        conv_bsk = self._fastbconv(
            xm, self.inv_punct_q, lq, self.punct_q_mod_bsk, self.limbs_bsk
        )
        # m_tilde target: power-of-two modulus — plain masked arithmetic
        y = modular.mul_mod_shoup(
            xm, self.inv_punct_q, self._shoup(self.inv_punct_q, lq), lq.q
        )
        conv_mt = (
            jnp.sum(
                (y * self.punct_q_mod_mtilde[:, None]) & _M_TILDE_MASK,
                axis=-2,
            )
            & _M_TILDE_MASK
        )  # [..., N]
        # small Montgomery reduction: r = -conv_mt / q mod m_tilde, centered
        r = (conv_mt * self.neg_inv_q_mod_mtilde) & _M_TILDE_MASK
        lb = self.limbs_bsk
        r_b = jnp.broadcast_to(r[..., None, :], conv_bsk.shape)
        corr = modular.mul_mod(
            r_b,
            self.prod_q_mod_bsk,
            lb.q,
            lb.ratio_hi,
            lb.ratio_lo,
        )
        # center r: subtract q·m_tilde where r >= m_tilde/2
        corr = jnp.where(
            r_b >= self.m_tilde_half,
            modular.sub_mod(corr, self.prod_q_mtilde_mod_bsk, lb.q),
            corr,
        )
        summed = modular.add_mod(conv_bsk, corr, lb.q)
        return modular.mul_mod_shoup(
            summed,
            self.inv_mtilde_mod_bsk,
            self._shoup(self.inv_mtilde_mod_bsk, lb),
            lb.q,
        )

    # ------------------------------------------------------------------
    def fast_floor(self, tx_q: jnp.ndarray, tx_bsk: jnp.ndarray) -> jnp.ndarray:
        """floor(x·t/q) in base Bsk (error ≤ k_q), inputs already ×t."""
        lb = self.limbs_bsk
        conv = self._fastbconv(
            tx_q, self.inv_punct_q, self.limbs_q, self.punct_q_mod_bsk, lb
        )
        diff = modular.sub_mod(tx_bsk, conv, lb.q)
        return modular.mul_mod_shoup(
            diff, self.inv_q_mod_bsk, self._shoup(self.inv_q_mod_bsk, lb), lb.q
        )

    # ------------------------------------------------------------------
    def fastbconv_sk(self, x_bsk: jnp.ndarray) -> jnp.ndarray:
        """Exact conversion base Bsk -> base q (Shenoy–Kumaresan)."""
        kb = len(self.b_moduli)
        x_b = x_bsk[..., :kb, :]
        x_msk = x_bsk[..., kb, :]
        limbs_b = self.limbs_bsk.slice(kb)
        conv_q = self._fastbconv(
            x_b, self.inv_punct_b, limbs_b, self.punct_b_mod_q, self.limbs_q
        )
        # α = (conv_msk - x_msk) / prod_B mod m_sk, centered
        msk = np.uint64(self.m_sk)
        msk_hi, msk_lo = modular.barrett_ratio(self.m_sk)
        y = modular.mul_mod_shoup(
            x_b, self.inv_punct_b, self._shoup(self.inv_punct_b, limbs_b),
            limbs_b.q,
        )
        prod = modular.mul_mod(
            y,
            self.punct_b_mod_msk[:, None],
            msk,
            np.uint64(msk_hi),
            np.uint64(msk_lo),
        )
        conv_msk = modular.barrett_reduce_64(
            jnp.sum(prod, axis=-2), msk, np.uint64(msk_hi)
        )
        alpha = modular.mul_mod(
            modular.sub_mod(conv_msk, x_msk, msk),
            self.inv_prod_b_mod_msk,
            msk,
            np.uint64(msk_hi),
            np.uint64(msk_lo),
        )  # [..., N]
        lq = self.limbs_q
        alpha_q = jnp.broadcast_to(alpha[..., None, :], conv_q.shape)
        corr = modular.mul_mod(
            modular.barrett_reduce_64(alpha_q, lq.q, lq.ratio_hi),
            self.prod_b_mod_q,
            lq.q,
            lq.ratio_hi,
            lq.ratio_lo,
        )
        out = modular.sub_mod(conv_q, corr, lq.q)
        # centering: where α >= m_sk/2, α -= m_sk  =>  add prod_B·m_sk... the
        # subtraction above used raw α; compensate by adding prod_B·m_sk ≡
        # prod_B·m_sk mod q on those lanes.
        prod_b_msk_mod_q = _mod_cols(self.prod_b * self.m_sk, self.q_moduli)
        out = jnp.where(
            alpha_q >= self.m_sk_half,
            modular.add_mod(out, prod_b_msk_mod_q, lq.q),
            out,
        )
        return out
