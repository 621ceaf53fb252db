"""MXU (systolic-array) negacyclic NTT/INTT via four-step digit matmuls.

TPU-native replacement for SEAL's ``transform_to/from_ntt_inplace``
(reference call sites pir/cpp/database.cpp:74,104,250-254), targeting the
MXU instead of the VPU: the radix-2 butterfly network keeps the VPU busy
with 64-bit emulated modular multiplies, while the chip's matrix unit —
two orders of magnitude more MACs/cycle — sits idle.  This module maps
the transform onto the MXU exactly.

Math.  The package-wide NTT layout (ops/ntt.py) satisfies the closed form

    out[j] = sum_i x[i] * psi^((2*rev(j)+1) * i)   (mod q)

(verified against NttTables.forward on unit vectors).  Factor N = n1*n2
and split i = i1*n2 + i2, j = jA*n2 + jB.  Because rev_N(jA*n2+jB) =
rev2(jB)*n1 + rev1(jA), the transform factors into the classic four-step
form with the bit-reversals folded into constant matrices:

    A   = x.reshape(n1, n2)
    C   = M1 @ A            M1[a, i1] = psi^(n2*i1*(2*rev1(a)+1))
    G   = C ∘ T             T[a, i2]  = psi^(i2*(2*rev1(a)+1))
    out = (G @ W2).reshape  W2[i2, b] = psi^(2*n1*i2*rev2(b))

and the inverse (bit-reversed in, natural out, with n^-1 folded in):

    U   = Y @ W2i           W2i[b, i2] = psi^(-2*n1*i2*rev2(b))
    V   = U ∘ Ti            Ti[a, i2]  = psi^(-(2*rev1(a)+1)*i2)
    X   = M1i @ V           M1i[i1, a] = n^-1 * psi^(-n2*i1*(2*rev1(a)+1))

Exact integer matmuls on the MXU.  Operands are split into balanced
base-256 digits in [-128, 127] (exact in bfloat16); each digit pair is a
bf16 matmul accumulated in f32.  With contraction K <= 128 and D <= 8
digits a diagonal bucket |sum| <= D*K*128^2 <= 2^24, so every f32 value
in flight is an exactly-represented integer.  Buckets are recombined to
u64 mod q in groups of five byte-shifts, each group Barrett-reduced and
scaled by 2^(40g) mod q — all bias constants are multiples of q, so no
correction term is needed.

Bit-exact with NttTables.forward/inverse (tests/test_mxu_ntt.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pir_tpu.core import primes as primes_mod
from pir_tpu.ops import modular

_LANES = 128


def supported(n: int) -> bool:
    """Four-step split with both factors <= 128 (MXU tile) and >= 2."""
    if n & (n - 1) or n < 4:
        return False
    n1 = 1 << ((n.bit_length() - 1) // 2)
    return n // n1 <= _LANES


def _rev_bits(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _balanced_digit_count(max_bits: int) -> int:
    """Smallest D so that x < 2^max_bits plus the balancing bias
    0x8080...80 (D bytes) still fits in D bytes — i.e. the balanced
    base-256 digits of x+bias exactly represent x."""
    d = max(1, (max_bits + 7) // 8)
    while (1 << max_bits) - 1 + sum(128 << (8 * i) for i in range(d)) >= (
        1 << (8 * d)
    ):
        d += 1
    return d


def _host_digits(mat: np.ndarray, ndig: int) -> np.ndarray:
    """u64[L, m, k] residues -> balanced digits i8[L, D, m, k]."""
    bias = sum(128 << (8 * i) for i in range(ndig))
    y = mat.astype(object) + bias
    digs = np.zeros((mat.shape[0], ndig) + mat.shape[1:], dtype=np.int32)
    for d in range(ndig):
        digs[:, d] = ((y >> (8 * d)) & 0xFF).astype(np.int32) - 128
    # numpy int8 master (not jnp): plans are built lazily, possibly inside
    # a jit trace, and cached on the tables object across traces; cast to
    # the matmul dtype (_dot_dtype) at use sites
    return digs.astype(np.int8)


def _dot_dtype():
    """bf16 feeds the MXU on TPU; CPU's dot thunk needs f32 (both exact
    for balanced byte digits)."""
    import jax

    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _device_digits(x: jnp.ndarray, ndig: int, dtype) -> jnp.ndarray:
    """u64[..., m, k] -> balanced digits [..., D, m, k] (D axis at -3)."""
    bias = np.uint64(sum(128 << (8 * i) for i in range(ndig)))
    y = x + bias
    planes = [
        (
            ((y >> np.uint64(8 * d)) & np.uint64(0xFF)).astype(jnp.int32)
            - jnp.int32(128)
        ).astype(dtype)
        for d in range(ndig)
    ]
    return jnp.stack(planes, axis=-3)


def default_split(n: int) -> tuple[int, int]:
    """The balanced n1*n2 = N factorization."""
    n1 = 1 << ((n.bit_length() - 1) // 2)
    return n1, n // n1


def build_matrices(tables, inverse: bool, n1: int, n2: int):
    """The three four-step constant tensors for any factorization N=n1*n2.

    Returns (m_left u64[L, n1, n1], tw u64[L, n1, n2], m_right
    u64[L, n2, n2]) per the module-docstring math (bit-reversals folded
    in; inverse carries n^-1 in m_left).  Host-side, Python pow().
    """
    n = tables.n
    assert n1 * n2 == n
    log1, log2 = n1.bit_length() - 1, n2.bit_length() - 1
    rev1 = [_rev_bits(a, log1) for a in range(n1)]
    rev2 = [_rev_bits(b, log2) for b in range(n2)]
    moduli = tables.moduli
    L = len(moduli)
    two_n = 2 * n
    m_left = np.zeros((L, n1, n1), dtype=np.uint64)
    tw = np.zeros((L, n1, n2), dtype=np.uint64)
    m_right = np.zeros((L, n2, n2), dtype=np.uint64)
    for li, q in enumerate(moduli):
        psi = primes_mod.primitive_root_2n(q, two_n)
        if inverse:
            psi = pow(psi, -1, q)
            n_inv = pow(n, -1, q)
        for a in range(n1):
            e_a = (2 * rev1[a] + 1) % two_n
            for i1 in range(n1):
                exp = (n2 * i1 * e_a) % two_n
                val = pow(psi, exp, q)
                if inverse:
                    # M1i[i1, a] with n^-1 folded in
                    m_left[li, i1, a] = val * n_inv % q
                else:
                    m_left[li, a, i1] = val
            for i2 in range(n2):
                tw[li, a, i2] = pow(psi, (e_a * i2) % two_n, q)
        for i2 in range(n2):
            for b in range(n2):
                exp = (2 * n1 * i2 * rev2[b]) % two_n
                val = pow(psi, exp, q)
                if inverse:
                    m_right[li, b, i2] = val  # W2i[jB, i2]
                else:
                    m_right[li, i2, b] = val  # W2[i2, jB]
    return m_left, tw, m_right


class _Plan:
    """Precomputed constants for one (tables, direction) pair."""

    def __init__(self, tables, inverse: bool):
        n = tables.n
        n1, n2 = default_split(n)
        self.n1, self.n2 = n1, n2
        moduli = tables.moduli
        max_bits = max(m.bit_length() for m in moduli)
        self.ndig = ndig = _balanced_digit_count(max_bits)
        if ndig * max(n1, n2) * (1 << 14) > (1 << 24):
            raise ValueError("digit-matmul exactness bound exceeded")

        m_left, tw, m_right = build_matrices(tables, inverse, n1, n2)

        q_col = tables.limbs.q  # [L, 1]
        q3 = q_col[:, :, None]  # [L, 1, 1]
        self.q3 = q3
        self.ratio_hi3 = tables.limbs.ratio_hi[:, :, None]
        self.m_left = _host_digits(m_left, ndig)
        self.m_right = _host_digits(m_right, ndig)
        self.tw = tw
        self.tw_shoup = modular.shoup_precompute(tw, q3)
        # 2^(40g) mod q scale factors for bucket groups g = 1, 2, ...
        n_buckets = 2 * ndig - 1
        self.n_groups = -(-n_buckets // 5)
        scales = []
        for g in range(1, self.n_groups):
            s = np.array(
                [[[pow(2, 40 * g, q)]] for q in moduli], dtype=np.uint64
            )
            scales.append((s, modular.shoup_precompute(s, q3)))
        self.group_scales = scales


def _plan(tables, inverse: bool) -> _Plan:
    attr = "_mxu_plan_inv" if inverse else "_mxu_plan_fwd"
    plan = getattr(tables, attr, None)
    if plan is None:
        plan = _Plan(tables, inverse)
        setattr(tables, attr, plan)
    return plan


def _recombine(plan: _Plan, buckets: list[jnp.ndarray]) -> jnp.ndarray:
    """Diagonal buckets (f32 exact ints, |.| <= 2^24) -> value mod q (u64).

    value = sum_s buckets[s] * 2^(8s); grouped five byte-shifts at a time,
    each group's bias (a multiple of q) keeps the u64 lift non-negative.
    """
    out = None
    for g in range(plan.n_groups):
        grp = buckets[5 * g : 5 * g + 5]
        acc = None
        for s, b in enumerate(grp):
            term = b.astype(jnp.int64) << jnp.int64(8 * s)
            acc = term if acc is None else acc + term
        # |acc| < 5 * 2^(24+32) < 2^59: lift by a q-multiple >= 2^59
        q3 = plan.q3
        k = ((jnp.uint64(1) << jnp.uint64(59)) // q3 + jnp.uint64(1)) * q3
        u = (acc + k.astype(jnp.int64)).astype(jnp.uint64)
        r = modular.barrett_reduce_64(u, q3, plan.ratio_hi3)
        if g > 0:
            scale, scale_shoup = plan.group_scales[g - 1]
            r = modular.mul_mod_shoup(r, scale, scale_shoup, q3)
        out = r if out is None else modular.add_mod(out, r, q3)
    return out


def _digit_matmul_left(plan, const_dig, data: jnp.ndarray) -> jnp.ndarray:
    """(const @ data) mod q: const_dig i8[L, D, m, k], data u64[B, L, k, j]."""
    ndig = plan.ndig
    dtype = _dot_dtype()
    const_dig = jnp.asarray(const_dig).astype(dtype)
    data_dig = _device_digits(data, ndig, dtype)  # [B, L, D, k, j]
    buckets = [None] * (2 * ndig - 1)
    for d in range(ndig):
        for e in range(ndig):
            p = jnp.einsum(
                "lak,blkj->blaj",
                const_dig[:, d],
                data_dig[:, :, e],
                preferred_element_type=jnp.float32,
            )
            s = d + e
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    return _recombine(plan, buckets)


def _digit_matmul_right(plan, data: jnp.ndarray, const_dig) -> jnp.ndarray:
    """(data @ const) mod q: data u64[B, L, a, k], const_dig i8[L, D, k, j]."""
    ndig = plan.ndig
    dtype = _dot_dtype()
    const_dig = jnp.asarray(const_dig).astype(dtype)
    data_dig = _device_digits(data, ndig, dtype)  # [B, L, D, a, k]
    buckets = [None] * (2 * ndig - 1)
    for d in range(ndig):
        for e in range(ndig):
            p = jnp.einsum(
                "blak,lkj->blaj",
                data_dig[:, :, d],
                const_dig[:, e],
                preferred_element_type=jnp.float32,
            )
            s = d + e
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    return _recombine(plan, buckets)


def ntt(tables, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """NTT/INTT of u64[..., L, N] — drop-in for NttTables.forward/inverse."""
    n = tables.n
    L = len(tables.moduli)
    plan = _plan(tables, inverse)
    n1, n2 = plan.n1, plan.n2
    batch = x.shape[:-2]
    a = x.reshape((-1, L, n1, n2))
    if inverse:
        u = _digit_matmul_right(plan, a, plan.m_right)
        v = modular.mul_mod_shoup(u, plan.tw, plan.tw_shoup, plan.q3)
        out = _digit_matmul_left(plan, plan.m_left, v)
    else:
        c = _digit_matmul_left(plan, plan.m_left, a)
        g = modular.mul_mod_shoup(c, plan.tw, plan.tw_shoup, plan.q3)
        out = _digit_matmul_right(plan, g, plan.m_right)
    return out.reshape(*batch, L, n)
