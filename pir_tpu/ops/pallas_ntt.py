"""Pallas TPU kernel: VMEM-staged negacyclic NTT/INTT.

TPU-native replacement for the per-stage XLA formulation in ops/ntt.py
(semantics: seal transform_to/from_ntt_inplace, reference call sites
pir/cpp/database.cpp:74,104,250-254).  The XLA path lowers to log2(N)
separate elementwise passes with an HBM round-trip of the whole tensor
between stages; this kernel keeps a block of polynomials VMEM-resident
across ALL butterfly stages, so HBM is touched exactly twice (read in,
write out).  Bit-exact with NttTables.forward/inverse — same merged
bit-reversed twiddle order, same Shoup reductions.

Layout: a polynomial's N coefficients are viewed as [R, 128] (rows ×
lanes, row-major).  A radix-2 butterfly at distance t pairs element n
with n ^ t; because blocks of 2t coefficients are aligned,
  * t >= 128: partners sit t/128 rows apart in the same lane — a
    sublane roll;
  * t <  128: partners sit t lanes apart in the same row — a lane roll
    (never crossing a row boundary, since 2t divides 128).
Each stage is 2 rolls + selects + one full-width Shoup multiply against a
stage-expanded twiddle plane (u32 pairs, wide32.py).  The full-width
multiply does 2x the minimal butterfly muls but keeps every op dense and
mask-free on the VPU; the inverse folds the final n^-1 scaling into the
last stage's twiddle plane (left half n^-1, right half s*n^-1), so
forward and inverse both run exactly log2(N) multiply passes.

All arithmetic is u32 lane pairs (Mosaic has no u64); per-limb modulus
words are baked in as [L, 1, 1] broadcast constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pir_tpu.ops import wide32

LANES = 128
DEFAULT_BLOCK_B = 8


def _stage_twiddles(tables, inverse: bool):
    """Stage-expanded twiddle planes u64[S, L, N] + Shoup companions.

    Forward stage s (m = 2^s blocks, half-length t = N/2^(s+1)): every
    element of block i carries psi_rev[m + i] (applied to the v operand at
    all positions).  Inverse stage s (t = 2^s, h = N/2^(s+1) blocks):
    LEFT positions carry 1 (the u+v half is unmultiplied), RIGHT positions
    carry psi_inv_rev[h + i]; the last stage additionally folds n^-1 into
    both halves.
    """
    n = tables.n
    L = len(tables.moduli)
    S = n.bit_length() - 1
    q = tables.limbs.q  # [L, 1]
    tw = np.zeros((S, L, n), dtype=np.uint64)
    if not inverse:
        for s in range(S):
            m = 1 << s
            two_t = n // m
            tw[s] = np.repeat(tables.psi_rev[:, m : 2 * m], two_t, axis=1)
    else:
        for s in range(S):
            t = 1 << s
            h = n // (2 * t)
            block = np.repeat(tables.psi_inv_rev[:, h : 2 * h], 2 * t, axis=1)
            left = (np.arange(n) & t) == 0
            plane = np.where(left[None, :], np.uint64(1), block)
            if s == S - 1:
                # fold n^-1 into the last stage (object ints: q < 2^61)
                plane = (
                    plane.astype(object) * tables.n_inv.astype(object)
                ) % q.astype(object)
                plane = plane.astype(np.uint64)
            tw[s] = plane
    tw_shoup = np.asarray(
        (tw.astype(object) * (1 << 64)) // q[None].astype(object),
        dtype=np.uint64,
    )
    return tw, tw_shoup


def _split_rows(x64: np.ndarray):
    """u64[S, L, N] -> two u32[S, L, R, 128] planes."""
    S, L, n = x64.shape
    hi = (x64 >> np.uint64(32)).astype(np.uint32)
    lo = (x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    r = n // LANES
    return hi.reshape(S, L, r, LANES), lo.reshape(S, L, r, LANES)


def stage_tables(tables, inverse: bool):
    """Cached (tw_hi, tw_lo, shoup_hi, shoup_lo) u32[S, L, R, 128] planes."""
    attr = "_pallas_stage_inv" if inverse else "_pallas_stage_fwd"
    cached = getattr(tables, attr, None)
    if cached is None:
        tw, sh = _stage_twiddles(tables, inverse)
        cached = _split_rows(tw) + _split_rows(sh)
        setattr(tables, attr, cached)
    return cached


def _roll(x, shift: int, axis: int):
    """out[i] = x[(i - shift) mod size] along axis; static shift."""
    size = x.shape[axis]
    s = shift % size
    if s == 0:
        return x
    a = jax.lax.slice_in_dim(x, size - s, size, axis=axis)
    b = jax.lax.slice_in_dim(x, 0, size - s, axis=axis)
    return jnp.concatenate([a, b], axis=axis)


def _left_mask(shape, t: int, row_axis: int, lane_axis: int):
    """Bool mask: True where element (flat coeff index) has bit t clear."""
    if t >= LANES:
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, row_axis)
        return (rows & (t // LANES)) == 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, lane_axis)
    return (lanes & t) == 0


def _partner_halves(xh, xl, t: int):
    """(u_hi, u_lo, v_hi, v_lo, left_mask) for butterfly distance t.

    u = the low-offset operand at every position, v = the high-offset one;
    x has shape [bB, R, 128] (one limb).
    """
    axis = 1 if t >= LANES else 2
    shift = t // LANES if t >= LANES else t
    left = _left_mask(xh.shape, t, 1, 2)
    fh = _roll(xh, -shift, axis)  # value from index + t
    fl = _roll(xl, -shift, axis)
    bh = _roll(xh, shift, axis)  # value from index - t
    bl = _roll(xl, shift, axis)
    uh = jnp.where(left, xh, bh)
    ul = jnp.where(left, xl, bl)
    vh = jnp.where(left, fh, xh)
    vl = jnp.where(left, fl, xl)
    return uh, ul, vh, vl, left


def _ntt_kernel(
    tw_h, tw_l, ts_h, ts_l, x_h, x_l, o_h, o_l, *, moduli, inverse, n
):
    """All log2(N) butterfly stages over one VMEM-resident block.

    Limbs iterate in a static outer loop so the modulus words stay scalar
    Python constants (Pallas kernels cannot capture array constants).
    """
    S = n.bit_length() - 1
    for li, q in enumerate(moduli):
        qh = np.uint32(int(q) >> 32)
        ql = np.uint32(int(q) & 0xFFFFFFFF)
        xh = x_h[:, li]  # [bB, R, 128]
        xl = x_l[:, li]
        for s in range(S):
            t = (n >> (s + 1)) if not inverse else (1 << s)
            uh, ul, vh, vl, left = _partner_halves(xh, xl, t)
            wh = tw_h[s, li][None]  # [1, R, 128] broadcast over bB
            wl = tw_l[s, li][None]
            ch = ts_h[s, li][None]
            cl = ts_l[s, li][None]
            if not inverse:
                ph, plo = wide32.shoup_mulmod(vh, vl, wh, wl, ch, cl, qh, ql)
                ah, al = wide32.addmod64(uh, ul, ph, plo, qh, ql)
                sh, sl = wide32.submod64(uh, ul, ph, plo, qh, ql)
                xh = jnp.where(left, ah, sh)
                xl = jnp.where(left, al, sl)
            else:
                ah, al = wide32.addmod64(uh, ul, vh, vl, qh, ql)
                dh, dl = wide32.submod64(uh, ul, vh, vl, qh, ql)
                selh = jnp.where(left, ah, dh)
                sell = jnp.where(left, al, dl)
                xh, xl = wide32.shoup_mulmod(
                    selh, sell, wh, wl, ch, cl, qh, ql
                )
        o_h[:, li] = xh
        o_l[:, li] = xl


@functools.partial(
    jax.jit, static_argnames=("moduli", "inverse", "block_b", "interpret")
)
def _ntt_flat(
    x: jnp.ndarray,
    tw_h, tw_l, ts_h, ts_l,
    moduli: tuple,
    inverse: bool,
    block_b: int = DEFAULT_BLOCK_B,
    interpret: bool = False,
) -> jnp.ndarray:
    """NTT/INTT of u64[B, L, N] via the VMEM-staged kernel."""
    B, L, n = x.shape
    r = n // LANES
    bB = max(1, min(block_b, B))
    pad = (-B) % bB
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, L, n), jnp.uint64)], axis=0
        )
    xh, xl = wide32.split_u64(x)
    xh = xh.reshape(-1, L, r, LANES)
    xl = xl.reshape(-1, L, r, LANES)

    zero = np.int32(0)
    grid = ((B + pad) // bB,)
    tw_spec = pl.BlockSpec(
        tw_h.shape, lambda b: (zero, zero, zero, zero),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec(
        (bB, L, r, LANES), lambda b: (b, zero, zero, zero),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _ntt_kernel, moduli=moduli, inverse=inverse, n=n
    )
    o_h, o_l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tw_spec, tw_spec, tw_spec, tw_spec, x_spec, x_spec],
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct(xh.shape, jnp.uint32),
            jax.ShapeDtypeStruct(xh.shape, jnp.uint32),
        ),
        interpret=interpret,
    )(tw_h, tw_l, ts_h, ts_l, xh, xl)
    out = wide32.join_u64(o_h, o_l).reshape(-1, L, n)
    return out[:B] if pad else out


def supported(n: int) -> bool:
    """The kernel's layout needs full 128-lane rows."""
    return n >= 2 * LANES and n % LANES == 0


def ntt(tables, x: jnp.ndarray, inverse: bool, interpret: bool = False):
    """NTT/INTT of u64[..., L, N] — drop-in for NttTables.forward/inverse."""
    L = len(tables.moduli)
    n = tables.n
    batch = x.shape[:-2]
    flat = x.reshape((-1, L, n))
    planes = stage_tables(tables, inverse)
    out = _ntt_flat(
        flat, *planes, moduli=tables.moduli, inverse=inverse,
        interpret=interpret,
    )
    return out.reshape(*batch, L, n)
