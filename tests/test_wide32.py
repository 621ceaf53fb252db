"""u32-pair arithmetic + Pallas scan kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.core import primes
from pir_tpu.ops import modular, wide32
from pir_tpu.ops.pallas_scan import contract_dim_pallas

M64 = (1 << 64) - 1


def _pairs(vals):
    v = jnp.asarray(np.asarray(vals, dtype=np.uint64))
    return wide32.split_u64(v)


def _join(h, l):
    return np.asarray(wide32.join_u64(h, l)).astype(object)


def test_mul32_wide(rng):
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    hi, lo = wide32.mul32_wide(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(object) * b.astype(object)
    assert (np.asarray(hi).astype(object) == prod >> 32).all()
    assert (np.asarray(lo).astype(object) == prod & 0xFFFFFFFF).all()


def test_mullo_mulhi_64(rng):
    x = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) * 2 + 1
    y = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64)
    xh, xl = _pairs(x)
    yh, yl = _pairs(y)
    prod = x.astype(object) * y.astype(object)
    lh, ll = wide32.mullo64(xh, xl, yh, yl)
    assert (_join(lh, ll) == prod & M64).all()
    hh, hl = wide32.mulhi64(xh, xl, yh, yl)
    assert (_join(hh, hl) == prod >> 64).all()


def test_add_sub_ge_64(rng):
    x = rng.integers(0, 1 << 64, size=500, dtype=np.uint64)
    y = rng.integers(0, 1 << 64, size=500, dtype=np.uint64)
    xh, xl = _pairs(x)
    yh, yl = _pairs(y)
    ah, al = wide32.add64(xh, xl, yh, yl)
    assert (_join(ah, al) == (x.astype(object) + y.astype(object)) & M64).all()
    sh, sl = wide32.sub64(xh, xl, yh, yl)
    assert (_join(sh, sl) == (x.astype(object) - y.astype(object)) & M64).all()
    ge = np.asarray(wide32.ge64(xh, xl, yh, yl))
    assert (ge == (x >= y)).all()


@pytest.mark.parametrize("qbits", [28, 36, 44, 61])
def test_shoup_and_barrett_pairs(rng, qbits):
    q = primes.get_prime(128, qbits)
    x = rng.integers(0, q, size=2000, dtype=np.uint64)
    w = rng.integers(0, q, size=2000, dtype=np.uint64)
    s = modular.shoup_precompute(w, q)
    xh, xl = _pairs(x)
    wh, wl = _pairs(w)
    sh, sl = _pairs(s)
    qh, ql = np.uint32(q >> 32), np.uint32(q & 0xFFFFFFFF)
    rh, rl_ = wide32.shoup_mulmod(xh, xl, wh, wl, sh, sl, qh, ql)
    expect = x.astype(object) * w.astype(object) % q
    assert (_join(rh, rl_) == expect).all()

    ratio_hi, _ = modular.barrett_ratio(q)
    z = rng.integers(0, 1 << 63, size=2000, dtype=np.uint64) * 2 + 1
    zh, zl = _pairs(z)
    bh, bl = wide32.barrett_reduce64(
        zh, zl,
        np.uint32(ratio_hi >> 32), np.uint32(ratio_hi & 0xFFFFFFFF),
        qh, ql,
    )
    assert (_join(bh, bl) == z.astype(object) % q).all()


def test_pallas_contract_matches_xla(rng):
    from pir_tpu.core.context import PirContext
    from pir_tpu.ops import scan
    from pir_tpu.testing.params import tiny_pir_params

    ctx = PirContext(tiny_pir_params(n=256, t_bits=13))
    P, D, L, N = 3, 7, ctx.L, ctx.n
    db = np.zeros((P, D, L, N), dtype=np.uint64)
    sv = np.zeros((D, 2, L, N), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        db[:, :, li] = rng.integers(0, q, size=(P, D, N), dtype=np.uint64)
        sv[:, :, li] = rng.integers(0, q, size=(D, 2, N), dtype=np.uint64)
    shoup = np.zeros_like(db)
    for li, q in enumerate(ctx.ct_moduli):
        shoup[:, :, li] = modular.shoup_precompute(db[:, :, li], q)

    expect = np.asarray(
        scan.contract_dim(ctx, jnp.asarray(sv), jnp.asarray(db))
    )
    got = np.asarray(
        contract_dim_pallas(
            jnp.asarray(sv),
            jnp.asarray(db),
            jnp.asarray(shoup),
            tuple(ctx.ct_moduli),
            tuple(int(r) for r in np.asarray(ctx.limbs_q.ratio_hi).ravel()),
            block_n=128,
            interpret=True,
        )
    )
    assert (got == expect).all()
