"""Pallas TPU kernel for the DB-scan contraction — the server's hot loop.

Computes acc[p] = Σ_j sv[j] ⊙ db[p, j] (NTT-domain, per-limb modular) with
all arithmetic in u32 lane pairs (Mosaic has no u64).  Compared to the XLA
u64-emulation path (~1 G modmul/s measured), the kernel keeps the j-loop
accumulator in VMEM, uses Shoup multiplication against the precomputed DB
companions, and reduces exactly once per output element.

Grid: (P, N / BLOCK_N).  Each program owns one prefix row and one
coefficient tile, loops over the contraction dimension D with a fori_loop,
and carries a 64-bit accumulator as u32 pairs.

Shapes (tileable): sv [D, 2, L, N], db/shoup [P, D, L, N], out [P, 2, L, N]
— each split into hi/lo u32 planes at the XLA boundary (ops/wide32.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pir_tpu.ops import wide32

DEFAULT_BLOCK_N = 512


def _scan_kernel(
    sv_h, sv_l, db_h, db_l, sh_h, sh_l, out_h, out_l, *, moduli, ratio_hi, D
):
    """One (prefix row, N-tile): contract over D with modular Shoup MACs."""
    L = len(moduli)

    def body(j, acc):
        acc_h, acc_l = acc
        # sv[j]: [2, L, BN]; db[0, j]: [L, BN] broadcast over the size axis
        xh = sv_h[j]
        xl = sv_l[j]
        wh = db_h[0, j][None]
        wl = db_l[0, j][None]
        ch = sh_h[0, j][None]
        cl = sh_l[0, j][None]
        new_h = []
        new_l = []
        for li in range(L):
            q = int(moduli[li])
            qh = np.uint32(q >> 32)
            ql = np.uint32(q & 0xFFFFFFFF)
            ph, plo = wide32.shoup_mulmod(
                xh[:, li], xl[:, li], wh[:, li], wl[:, li],
                ch[:, li], cl[:, li], qh, ql,
            )
            ah, al = wide32.add64(acc_h[:, li], acc_l[:, li], ph, plo)
            new_h.append(ah)
            new_l.append(al)
        return jnp.stack(new_h, axis=1), jnp.stack(new_l, axis=1)

    shape = (2, L) + sv_h.shape[3:]
    acc_h = jnp.zeros(shape, jnp.uint32)
    acc_l = jnp.zeros(shape, jnp.uint32)
    # i32 bounds: under jax_enable_x64, bare Python ints would make the loop
    # counter (and every index derived from it) i64, which Mosaic rejects.
    acc_h, acc_l = jax.lax.fori_loop(
        np.int32(0), np.int32(D), body, (acc_h, acc_l)
    )

    for li in range(len(moduli)):
        q = int(moduli[li])
        qh = np.uint32(q >> 32)
        ql = np.uint32(q & 0xFFFFFFFF)
        rh = np.uint32(int(ratio_hi[li]) >> 32)
        rl = np.uint32(int(ratio_hi[li]) & 0xFFFFFFFF)
        oh, ol = wide32.barrett_reduce64(
            acc_h[:, li], acc_l[:, li], rh, rl, qh, ql
        )
        out_h[0, :, li] = oh
        out_l[0, :, li] = ol


# ---------------------------------------------------------------------------
# Raw-accumulation kernel (v2) — the production TPU scan path.
#
# Per MAC the Shoup kernel above pays ~36 u32 multiplies reducing every
# product; with moduli below 48 bits the full 2b-bit product fits three u32
# words and a whole contraction fits 96 bits unreduced, so this kernel
# multiplies with 9 u32 muls (wide32.mul_u48_3w), sums exact 16-bit half
# partials across the contraction axis, and Barrett-reduces ONCE per output
# element.  It also drops the Shoup companion table — the database is read
# as a u32 lo plane plus a narrow (u8/u16) hi plane, cutting DB bytes from
# 16 to 5-6 per coefficient.
#
# Layout: the database is pre-transposed to [P, L, D, N] planes so the
# contraction axis D sits on sublanes and the coefficient tile on lanes;
# the per-(coefficient-tile) selection-vector block is reused across all P
# (grid order puts P innermost).
# ---------------------------------------------------------------------------


def _raw_kernel(svh, svl, dbh, dbl, outh, outl, *, moduli, ratios):
    L = len(moduli)
    for li in range(L):
        xh = svh[:, li]  # [2, D, bn] u32
        xl = svl[:, li]
        wh = dbh[0, li].astype(jnp.uint32)[None]  # [1, D, bn]
        wl = dbl[0, li][None]
        p2, p1, p0 = wide32.mul_u48_3w(xh, xl, wh, wl)
        q = int(moduli[li])
        s2, s1, s0 = wide32.sum96_over_axis(
            p2, p1, p0, axis=1, p2_max_bits=max(0, 2 * q.bit_length() - 64)
        )  # [2, bn]
        rhi, rlo = ratios[li]
        oh, ol = wide32.barrett_reduce96(s2, s1, s0, q, rhi, rlo)
        outh[0, :, li] = oh
        outl[0, :, li] = ol


def hi_plane_dtype(moduli=None, bits: int | None = None) -> jnp.dtype:
    """Narrowest dtype that holds bits 32.. of values below max(q)."""
    if bits is None:
        bits = max(int(q).bit_length() for q in moduli)
    hi_bits = bits - 32
    if hi_bits <= 8:
        return jnp.uint8
    if hi_bits <= 16:
        return jnp.uint16
    return jnp.uint32


def split_planes(
    x: jnp.ndarray, moduli=None, bits: int | None = None
) -> tuple[jnp.ndarray | None, jnp.ndarray]:
    """u64[..] -> (hi narrow, lo u32) planes.

    Sub-32-bit moduli (the "tpu32" parameter profile) have no high bits
    at all: the hi plane is None and consumers take the 4-mul single-word
    kernel path (_raw_kernel_u32) — 4 DB bytes/coefficient.
    """
    if bits is None:
        bits = max(int(q).bit_length() for q in moduli)
    hi, lo = wide32.split_u64(x)
    if bits <= 32:
        return None, lo
    return hi.astype(hi_plane_dtype(bits=bits)), lo


def max_raw_chunk(moduli=None, bits: int | None = None) -> int:
    """Longest unreduced 96-bit contraction: D <= 2^(96 - 2b), and the
    16-bit half partial sums must stay exact in u32 (D <= 2^16)."""
    b = bits if bits is not None else max(int(q).bit_length() for q in moduli)
    return max(1, min(1 << 16, 1 << max(0, 96 - 2 * b)))


def limb_consts(q: jnp.ndarray, ratio_hi: jnp.ndarray, ratio_lo: jnp.ndarray):
    """(q, ratio_hi, ratio_lo) u64[L, 1] columns -> u32[L, 6] word table
    (qh, ql, rhh, rhl, rlh, rll) for the runtime-constants kernel."""
    cols = []
    for arr in (q, ratio_hi, ratio_lo):
        hi, lo = wide32.split_u64(arr[:, 0])
        cols += [hi, lo]
    return jnp.stack(cols, axis=1)


def _raw_kernel_u32(svl, dbl, outh, outl, *, moduli, ratios):
    """Single-u32-residue MAC kernel (sub-32-bit moduli profile).

    4 u32 multiplies per MAC (one 32x32->64) vs _raw_kernel's 9, and four
    16-bit half partial sums vs six — the scan's arithmetic at the
    "tpu32" parameter profile.
    """
    L = len(moduli)
    for li in range(L):
        x = svl[:, li]  # [2, D, bn] u32 (residues < 2^32)
        w = dbl[0, li][None]  # [1, D, bn]
        ph, plo = wide32.mul32_wide(x, w)
        s2, s1, s0 = wide32.sum64_over_axis(ph, plo, axis=1)
        q = int(moduli[li])
        rhi, rlo = ratios[li]
        oh, ol = wide32.barrett_reduce96(s2, s1, s0, q, rhi, rlo)
        outh[0, :, li] = oh
        outl[0, :, li] = ol


def _raw_kernel_u32_dyn(consts, svl, dbl, outh, outl, *, L):
    """_raw_kernel_u32 with the per-limb constants as a traced SMEM table
    (limb-sharded meshes; layout of limb_consts)."""
    for li in range(L):
        x = svl[:, li]
        w = dbl[0, li][None]
        ph, plo = wide32.mul32_wide(x, w)
        s2, s1, s0 = wide32.sum64_over_axis(ph, plo, axis=1)
        oh, ol = wide32.barrett_reduce96_w(
            s2, s1, s0,
            consts[li, 0], consts[li, 1], consts[li, 2],
            consts[li, 3], consts[li, 4], consts[li, 5],
        )
        outh[0, :, li] = oh
        outl[0, :, li] = ol


def _raw_kernel_dyn(consts, svh, svl, dbh, dbl, outh, outl, *, L, max_bits=48):
    """_raw_kernel with per-limb modulus constants as a traced SMEM table
    (u32[L, 6]) instead of baked-in Python ints — required under
    shard_map limb sharding, where each device owns different moduli but
    all devices share one traced program."""
    for li in range(L):
        xh = svh[:, li]
        xl = svl[:, li]
        wh = dbh[0, li].astype(jnp.uint32)[None]
        wl = dbl[0, li][None]
        p2, p1, p0 = wide32.mul_u48_3w(xh, xl, wh, wl)
        s2, s1, s0 = wide32.sum96_over_axis(
            p2, p1, p0, axis=1, p2_max_bits=max(0, 2 * max_bits - 64)
        )
        oh, ol = wide32.barrett_reduce96_w(
            s2, s1, s0,
            consts[li, 0], consts[li, 1], consts[li, 2],
            consts[li, 3], consts[li, 4], consts[li, 5],
        )
        outh[0, :, li] = oh
        outl[0, :, li] = ol


@functools.partial(
    jax.jit, static_argnames=("max_bits", "block_n", "interpret")
)
def contract_dim_raw_dyn(
    sv_ntt: jnp.ndarray,
    db_hi: jnp.ndarray,
    db_lo: jnp.ndarray,
    consts: jnp.ndarray,
    max_bits: int,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """contract_dim_raw with runtime modulus constants (see limb_consts).

    max_bits: static upper bound on the moduli bit width (must be <= 48);
    governs the raw-chunk bound exactly as in the static path.
    """
    P, L, D, N = db_lo.shape
    assert max_bits <= 48, "raw-accumulation path requires moduli below 2^48"
    assert D <= max_raw_chunk(bits=max_bits)
    bn = min(block_n, N)
    assert N % bn == 0

    sv_t = jnp.transpose(sv_ntt, (1, 2, 0, 3))  # [2, L, D, N]

    zero = np.int32(0)
    grid = (N // bn, P)
    consts_spec = pl.BlockSpec(
        (L, 6), lambda n, p: (zero, zero), memory_space=pltpu.SMEM
    )
    sv_spec = pl.BlockSpec(
        (2, L, D, bn), lambda n, p: (zero, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    db_spec = pl.BlockSpec(
        (1, L, D, bn), lambda n, p: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 2, L, bn), lambda n, p: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    out_shape = (
        jax.ShapeDtypeStruct((P, 2, L, N), jnp.uint32),
        jax.ShapeDtypeStruct((P, 2, L, N), jnp.uint32),
    )
    if db_hi is None:
        sv_l = sv_t.astype(jnp.uint32)
        out_h, out_l = pl.pallas_call(
            functools.partial(_raw_kernel_u32_dyn, L=L),
            grid=grid,
            in_specs=[consts_spec, sv_spec, db_spec],
            out_specs=(out_spec, out_spec),
            out_shape=out_shape,
            interpret=interpret,
        )(consts, sv_l, db_lo)
        return wide32.join_u64(out_h, out_l)
    sv_h, sv_l = wide32.split_u64(sv_t)
    kernel = functools.partial(_raw_kernel_dyn, L=L, max_bits=max_bits)
    out_h, out_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[consts_spec, sv_spec, sv_spec, db_spec, db_spec],
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(consts, sv_h, sv_l, db_hi, db_lo)
    return wide32.join_u64(out_h, out_l)


@functools.partial(
    jax.jit,
    static_argnames=("moduli", "ratio_hi", "ratio_lo", "block_n", "interpret"),
)
def contract_dim_raw(
    sv_ntt: jnp.ndarray,
    db_hi: jnp.ndarray,
    db_lo: jnp.ndarray,
    moduli: tuple,
    ratio_hi: tuple,
    ratio_lo: tuple,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """acc[p] = Σ_j sv[j] ⊙ db[p, j] mod q — raw-accumulation Pallas path.

    sv_ntt: u64[D, 2, L, N]; db_hi/db_lo: [P, L, D, N] planes (see
    split_planes).  All moduli must be below 2^48 and D below
    max_raw_chunk(moduli) — callers chunk larger contractions.
    Returns u64[P, 2, L, N] (reduced).
    """
    P, L, D, N = db_lo.shape
    b = max(int(q).bit_length() for q in moduli)
    assert b <= 48, "raw-accumulation path requires moduli below 2^48"
    assert D <= max_raw_chunk(moduli)
    bn = min(block_n, N)
    assert N % bn == 0

    sv_t = jnp.transpose(sv_ntt, (1, 2, 0, 3))  # [2, L, D, N]

    zero = np.int32(0)
    # grid order (coefficient tile, prefix): P innermost so the sv block is
    # fetched once per tile and every db block is streamed exactly once.
    grid = (N // bn, P)
    sv_spec = pl.BlockSpec(
        (2, L, D, bn), lambda n, p: (zero, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    db_spec = pl.BlockSpec(
        (1, L, D, bn), lambda n, p: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 2, L, bn), lambda n, p: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    ratios = tuple(
        (int(h), int(l)) for h, l in zip(ratio_hi, ratio_lo)
    )
    out_shape = (
        jax.ShapeDtypeStruct((P, 2, L, N), jnp.uint32),
        jax.ShapeDtypeStruct((P, 2, L, N), jnp.uint32),
    )
    if db_hi is None:
        # single-u32 residues (tpu32 profile): lo planes only, 4-mul MACs
        assert b <= 32, "u32 scan path requires sub-32-bit moduli"
        sv_l = sv_t.astype(jnp.uint32)
        kernel = functools.partial(
            _raw_kernel_u32, moduli=moduli, ratios=ratios
        )
        out_h, out_l = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sv_spec, db_spec],
            out_specs=(out_spec, out_spec),
            out_shape=out_shape,
            interpret=interpret,
        )(sv_l, db_lo)
        return wide32.join_u64(out_h, out_l)
    sv_h, sv_l = wide32.split_u64(sv_t)
    kernel = functools.partial(_raw_kernel, moduli=moduli, ratios=ratios)
    out_h, out_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sv_spec, sv_spec, db_spec, db_spec],
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(sv_h, sv_l, db_hi, db_lo)
    return wide32.join_u64(out_h, out_l)


# ---------------------------------------------------------------------------
# Wide (multi-query) raw kernels — B query accumulators per database tile.
#
# Batched serving replays the same database against B independent selection
# vectors; re-invoking the single-query kernel per query (or vmapping it,
# which lowers to an extra grid dimension) streams the full DB from HBM B
# times.  These variants fold the query batch into the ciphertext size axis
# (S = 2·B), so ONE pass over the database planes serves every query: the
# sv block is fetched once per coefficient tile, each db block exactly once
# overall.  The contraction runs in in-kernel sub-chunks with a carried
# 3-word accumulator (acc96_add), keeping the elementwise temporaries
# bounded at any D while still paying ONE Barrett reduction per output.
# Replaces the whole-pipeline-vmap lane replication previously used for
# batched requests (reference analog: the serial query loop at
# pir/cpp/server.cpp:60-63).
# ---------------------------------------------------------------------------


def _raw_kernel_wide(svh, svl, dbh, dbl, outh, outl, *, moduli, ratios, sub):
    """Size-axis-generic 48-bit raw kernel: sv block [S, L, D, bn], db
    block [1, L, D, bn], out block [1, S, L, bn]; contraction sub-chunked
    in VMEM (sub <= max_raw_chunk so each chunk's half-sums stay exact)."""
    L = len(moduli)
    D = svh.shape[2]
    for li in range(L):
        q = int(moduli[li])
        p2_bits = max(0, 2 * q.bit_length() - 64)
        acc = None
        for c0 in range(0, D, sub):
            c1 = min(c0 + sub, D)
            xh = svh[:, li, c0:c1]
            xl = svl[:, li, c0:c1]
            wh = dbh[0, li, c0:c1].astype(jnp.uint32)[None]
            wl = dbl[0, li, c0:c1][None]
            p2, p1, p0 = wide32.mul_u48_3w(xh, xl, wh, wl)
            s = wide32.sum96_over_axis(p2, p1, p0, axis=1, p2_max_bits=p2_bits)
            acc = s if acc is None else wide32.acc96_add(*acc, *s)
        rhi, rlo = ratios[li]
        oh, ol = wide32.barrett_reduce96(*acc, q, rhi, rlo)
        outh[0, :, li] = oh
        outl[0, :, li] = ol


def _raw_kernel_wide_u32(svl, dbl, outh, outl, *, moduli, ratios, sub):
    """Single-u32-residue wide kernel (tpu32 profile): 4-mul MACs, 2-word
    products, the same carried 96-bit accumulator."""
    L = len(moduli)
    D = svl.shape[2]
    for li in range(L):
        acc = None
        for c0 in range(0, D, sub):
            c1 = min(c0 + sub, D)
            x = svl[:, li, c0:c1]
            w = dbl[0, li, c0:c1][None]
            ph, plo = wide32.mul32_wide(x, w)
            s = wide32.sum64_over_axis(ph, plo, axis=1)
            acc = s if acc is None else wide32.acc96_add(*acc, *s)
        q = int(moduli[li])
        rhi, rlo = ratios[li]
        oh, ol = wide32.barrett_reduce96(*acc, q, rhi, rlo)
        outh[0, :, li] = oh
        outl[0, :, li] = ol


@functools.partial(
    jax.jit,
    static_argnames=("moduli", "ratio_hi", "ratio_lo", "block_n", "interpret"),
)
def contract_dim_raw_wide(
    sv_ntt: jnp.ndarray,
    db_hi: jnp.ndarray,
    db_lo: jnp.ndarray,
    moduli: tuple,
    ratio_hi: tuple,
    ratio_lo: tuple,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """acc[p, s] = Σ_j sv[j, s] ⊙ db[p, j] mod q — S-wide raw Pallas path.

    sv_ntt: u64[D, S, L, N] (S = any folded (query, size) width);
    db_hi/db_lo: [P, L, D, N] planes.  Returns u64[P, S, L, N] reduced.
    The database is streamed from HBM exactly once regardless of S.
    """
    P, L, D, N = db_lo.shape
    S = sv_ntt.shape[1]
    b = max(int(q).bit_length() for q in moduli)
    assert b <= 48, "raw-accumulation path requires moduli below 2^48"
    assert D * (1 << (2 * b)) < (1 << 96), "96-bit accumulator overflow"
    bn = min(block_n, N)
    # the sv block keeps the FULL contraction axis resident ([S, L, D, bn]
    # u32 pairs); shrink the coefficient tile as S grows so it fits VMEM
    while bn > 128 and S * L * D * bn * 8 > (6 << 20):
        bn //= 2
    assert N % bn == 0
    # VMEM stack budget: per-sub-chunk temporaries scale with S·sub·bn.
    # The single-query kernels' bound was size 2 · D · bn <= 2·_MAX_D_BN;
    # the carried 96-bit accumulator adds ~3 words of [S, bn] per limb on
    # top, so this kernel keeps a ~25% margin below that (S·sub·bn at
    # 2·_MAX_D_BN measured 16.17M scoped VMEM vs the 16M limit at the
    # 1M-DB batch-4 shape).
    sub = max(8, min(max_raw_chunk(moduli), D, (3 * _MAX_D_BN // 2) // (S * bn)))

    sv_t = jnp.transpose(sv_ntt, (1, 2, 0, 3))  # [S, L, D, N]

    zero = np.int32(0)
    grid = (N // bn, P)
    sv_spec = pl.BlockSpec(
        (S, L, D, bn), lambda n, p: (zero, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    db_spec = pl.BlockSpec(
        (1, L, D, bn), lambda n, p: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, S, L, bn), lambda n, p: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    ratios = tuple((int(h), int(l)) for h, l in zip(ratio_hi, ratio_lo))
    out_shape = (
        jax.ShapeDtypeStruct((P, S, L, N), jnp.uint32),
        jax.ShapeDtypeStruct((P, S, L, N), jnp.uint32),
    )
    if db_hi is None:
        assert b <= 32, "u32 scan path requires sub-32-bit moduli"
        sv_l = sv_t.astype(jnp.uint32)
        kernel = functools.partial(
            _raw_kernel_wide_u32, moduli=moduli, ratios=ratios, sub=sub
        )
        out_h, out_l = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sv_spec, db_spec],
            out_specs=(out_spec, out_spec),
            out_shape=out_shape,
            interpret=interpret,
        )(sv_l, db_lo)
        return wide32.join_u64(out_h, out_l)
    sv_h, sv_l = wide32.split_u64(sv_t)
    kernel = functools.partial(
        _raw_kernel_wide, moduli=moduli, ratios=ratios, sub=sub
    )
    out_h, out_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sv_spec, sv_spec, db_spec, db_spec],
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(sv_h, sv_l, db_hi, db_lo)
    return wide32.join_u64(out_h, out_l)


def contract_dim_wide_auto(
    sv_ntt: jnp.ndarray,
    db_hi: jnp.ndarray,
    db_lo: jnp.ndarray,
    moduli: tuple,
    ratio_hi: tuple,
    ratio_lo: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """contract_dim_raw_wide with an XLA-level D-chunk fallback for shapes
    whose full contraction axis cannot stay VMEM-resident at width S."""
    from pir_tpu.ops import modular

    P, L, D, N = db_lo.shape
    S = sv_ntt.shape[1]
    # D chunk that keeps the sv block below the VMEM budget at bn=128
    d_cap = max(8, (6 << 20) // (S * L * 128 * 8))
    d_cap = min(d_cap, max_raw_chunk(moduli))
    if D <= d_cap:
        return contract_dim_raw_wide(
            sv_ntt, db_hi, db_lo, moduli, ratio_hi, ratio_lo,
            interpret=interpret,
        )
    acc = None
    q_col = jnp.asarray(np.array(moduli, dtype=np.uint64))[:, None]
    for start in range(0, D, d_cap):
        end = min(start + d_cap, D)
        part = contract_dim_raw_wide(
            sv_ntt[start:end],
            db_hi[:, :, start:end] if db_hi is not None else None,
            db_lo[:, :, start:end],
            moduli,
            ratio_hi,
            ratio_lo,
            interpret=interpret,
        )
        acc = part if acc is None else modular.add_mod(acc, part, q_col)
    return acc


# Mosaic allocates the kernel's elementwise intermediates on the VMEM
# stack; D·bn beyond ~96K u32 elements per limb overflows the 16MB scoped
# limit (observed at D=162, bn=1024).  Chunk the contraction to stay under.
_MAX_D_BN = 96 * 1024


def contract_dim_auto(
    sv_ntt: jnp.ndarray,
    db_hi: jnp.ndarray,
    db_lo: jnp.ndarray,
    moduli: tuple,
    ratio_hi: tuple,
    ratio_lo: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """contract_dim_raw with automatic D-chunking (VMEM + 96-bit bounds).

    Chunks beyond max_raw_chunk (unreduced-sum overflow) or the VMEM stack
    budget are contracted separately and combined with modular adds.
    """
    from pir_tpu.ops import modular

    P, L, D, N = db_lo.shape
    bn = min(DEFAULT_BLOCK_N, N)
    chunk = max(8, min(max_raw_chunk(moduli), D, _MAX_D_BN // bn))
    acc = None
    for start in range(0, D, chunk):
        end = min(start + chunk, D)
        part = contract_dim_raw(
            sv_ntt[start:end],
            db_hi[:, :, start:end] if db_hi is not None else None,
            db_lo[:, :, start:end],
            moduli,
            ratio_hi,
            ratio_lo,
            block_n=bn,
            interpret=interpret,
        )
        if acc is None:
            acc = part
        else:
            q_col = jnp.asarray(np.array(moduli, dtype=np.uint64))[:, None]
            acc = modular.add_mod(acc, part, q_col)
    return acc


def contract_dim_auto_dyn(
    sv_ntt: jnp.ndarray,
    db_hi: jnp.ndarray,
    db_lo: jnp.ndarray,
    consts: jnp.ndarray,
    q_col: jnp.ndarray,
    max_bits: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """contract_dim_raw_dyn with automatic D-chunking (the runtime-consts
    twin of contract_dim_auto).  q_col: u64[L, 1] for the chunk-combining
    modular adds."""
    from pir_tpu.ops import modular

    P, L, D, N = db_lo.shape
    bn = min(DEFAULT_BLOCK_N, N)
    chunk = max(8, min(max_raw_chunk(bits=max_bits), D, _MAX_D_BN // bn))
    acc = None
    for start in range(0, D, chunk):
        end = min(start + chunk, D)
        part = contract_dim_raw_dyn(
            sv_ntt[start:end],
            db_hi[:, :, start:end] if db_hi is not None else None,
            db_lo[:, :, start:end],
            consts,
            max_bits,
            block_n=bn,
            interpret=interpret,
        )
        acc = part if acc is None else modular.add_mod(acc, part, q_col)
    return acc


@functools.partial(
    jax.jit, static_argnames=("moduli", "ratio_hi", "block_n", "interpret")
)
def contract_dim_pallas(
    sv_ntt: jnp.ndarray,
    db_ntt: jnp.ndarray,
    db_shoup: jnp.ndarray,
    moduli: tuple,
    ratio_hi: tuple,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """acc[p] = Σ_j sv[j] ⊙ db[p, j] mod q — Pallas TPU path.

    sv_ntt: u64[D, 2, L, N]; db_ntt/db_shoup: u64[P, D, L, N].
    Returns u64[P, 2, L, N] (reduced).
    """
    P, D, L, N = db_ntt.shape
    bn = min(block_n, N)
    assert N % bn == 0

    sv_h, sv_l = wide32.split_u64(sv_ntt)
    db_h, db_l = wide32.split_u64(db_ntt)
    sh_h, sh_l = wide32.split_u64(db_shoup)

    grid = (P, N // bn)
    zero = np.int32(0)
    sv_spec = pl.BlockSpec(
        (D, 2, L, bn), lambda p, n: (zero, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    db_spec = pl.BlockSpec(
        (1, D, L, bn), lambda p, n: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 2, L, bn), lambda p, n: (p, zero, zero, n),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _scan_kernel, moduli=moduli, ratio_hi=ratio_hi, D=D
    )
    out_h, out_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sv_spec, sv_spec, db_spec, db_spec, db_spec, db_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((P, 2, L, N), jnp.uint32),
            jax.ShapeDtypeStruct((P, 2, L, N), jnp.uint32),
        ),
        interpret=interpret,
    )(sv_h, sv_l, db_h, db_l, sh_h, sh_l)
    return wide32.join_u64(out_h, out_l)
