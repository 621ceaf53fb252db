"""64-bit modular arithmetic on u32 lane pairs — the Pallas-kernel substrate.

Mosaic (Pallas TPU) has no 64-bit integers, so inside kernels every 64-bit
quantity is an explicit (hi, lo) pair of uint32 arrays and every 32×32
product is built from 16-bit half-products (exact in u32).  These helpers
are plain jnp expressions usable both inside Pallas kernels and in regular
XLA code (for interpret-mode testing).

Cost model per Shoup modmul: ~36 u32 multiplies + ~40 adds/selects — the
per-element budget the scan kernel's roofline is computed against.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_M16 = np.uint32(0xFFFF)
_U32_1 = np.uint32(1)


def mul32_wide(a, b):
    """Full 64-bit product of u32 arrays -> (hi32, lo32)."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & _M16) + (hl & _M16)  # < 3·2^16, fits u32
    lo = (mid << 16) | (ll & _M16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def add64(xh, xl, yh, yl):
    """(x + y) mod 2^64 on pairs."""
    lo = xl + yl
    carry = (lo < xl).astype(jnp.uint32)
    return xh + yh + carry, lo


def sub64(xh, xl, yh, yl):
    """(x - y) mod 2^64 on pairs."""
    borrow = (xl < yl).astype(jnp.uint32)
    return xh - yh - borrow, xl - yl


def ge64(xh, xl, yh, yl):
    return (xh > yh) | ((xh == yh) & (xl >= yl))


def mullo64(xh, xl, yh, yl):
    """Low 64 bits of the 128-bit product, as a pair."""
    h, l = mul32_wide(xl, yl)
    return h + xl * yh + xh * yl, l


def mulhi64(xh, xl, yh, yl):
    """High 64 bits of the 128-bit product, as a pair."""
    # partial products: xl·yl (low), xl·yh + xh·yl (mid, <<32), xh·yh (<<64)
    h1, _l1 = mul32_wide(xl, yl)
    h2, l2 = mul32_wide(xl, yh)
    h3, l3 = mul32_wide(xh, yl)
    h4, l4 = mul32_wide(xh, yh)
    # mid sum: (h1 + l2 + l3) with carries feeding the high words
    m1 = h1 + l2
    c1 = (m1 < h1).astype(jnp.uint32)
    m2 = m1 + l3
    c2 = (m2 < m1).astype(jnp.uint32)
    # hi64 = xh·yh + (h2 + h3 + carries) + (mid >> 32 is m2's carry chain)
    lo_out = l4 + h2
    cc1 = (lo_out < l4).astype(jnp.uint32)
    lo_out2 = lo_out + h3
    cc2 = (lo_out2 < lo_out).astype(jnp.uint32)
    lo_out3 = lo_out2 + c1 + c2
    cc3 = (lo_out3 < lo_out2).astype(jnp.uint32)
    return h4 + cc1 + cc2 + cc3, lo_out3


def shoup_mulmod(xh, xl, wh, wl, sh, sl, qh, ql):
    """x·w mod q with Shoup companion s = floor(w·2^64/q); x < q.

    All operands are u32 pairs; q < 2^62.
    """
    eh, el = mulhi64(xh, xl, sh, sl)  # quotient estimate
    ph, pl_ = mullo64(xh, xl, wh, wl)
    th, tl = mullo64(eh, el, qh, ql)
    rh, rl = sub64(ph, pl_, th, tl)  # in [0, 2q)
    over = ge64(rh, rl, qh, ql)
    rh2, rl2 = sub64(rh, rl, qh, ql)
    return jnp.where(over, rh2, rh), jnp.where(over, rl2, rl)


def barrett_reduce64(xh, xl, rhih, rhil, qh, ql):
    """x mod q for x < 2^64, via the high Barrett ratio word (pair)."""
    eh, el = mulhi64(xh, xl, rhih, rhil)
    th, tl = mullo64(eh, el, qh, ql)
    rh, rl = sub64(xh, xl, th, tl)
    over = ge64(rh, rl, qh, ql)
    rh2, rl2 = sub64(rh, rl, qh, ql)
    return jnp.where(over, rh2, rh), jnp.where(over, rl2, rl)


# ---------------------------------------------------------------------------
# u64 <-> pair conversions (XLA-side, at kernel boundaries)
# ---------------------------------------------------------------------------


def split_u64(x):
    """u64 array -> (hi u32, lo u32)."""
    return (x >> jnp.uint64(32)).astype(jnp.uint32), (
        x & jnp.uint64(0xFFFFFFFF)
    ).astype(jnp.uint32)


def join_u64(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
