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
