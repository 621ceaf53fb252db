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


@pytest.mark.parametrize("qbits", [30, 36, 44, 48])
def test_mul_u48_3w_and_sum96(rng, qbits):
    from pir_tpu.ops.pallas_scan import max_raw_chunk

    q = primes.get_prime(128, qbits)
    D = min(64, max_raw_chunk((q,)))
    x = rng.integers(0, q, size=(D, 50), dtype=np.uint64)
    w = rng.integers(0, q, size=(D, 50), dtype=np.uint64)
    xh, xl = _pairs(x)
    wh, wl = _pairs(w)
    p2, p1, p0 = wide32.mul_u48_3w(xh, xl, wh, wl)
    prod = x.astype(object) * w.astype(object)
    got = (
        np.asarray(p2).astype(object) << 64
    ) + (np.asarray(p1).astype(object) << 32) + np.asarray(p0).astype(object)
    assert (got == prod).all()

    s2, s1, s0 = wide32.sum96_over_axis(p2, p1, p0, axis=0)
    total = prod.sum(axis=0)
    gots = (
        np.asarray(s2).astype(object) << 64
    ) + (np.asarray(s1).astype(object) << 32) + np.asarray(s0).astype(object)
    assert (gots == total % (1 << 96)).all()

    ratio_hi, ratio_lo = modular.barrett_ratio(q)
    bh, bl = wide32.barrett_reduce96(s2, s1, s0, q, int(ratio_hi), int(ratio_lo))
    assert (_join(bh, bl) == total % q).all()


def test_barrett_reduce96_random(rng):
    q = primes.get_prime(256, 45)
    ratio_hi, ratio_lo = modular.barrett_ratio(q)
    words = rng.integers(0, 1 << 32, size=(3, 4000), dtype=np.uint32)
    x2, x1, x0 = (jnp.asarray(w) for w in words)
    rh, rl = wide32.barrett_reduce96(x2, x1, x0, q, int(ratio_hi), int(ratio_lo))
    vals = (
        words[0].astype(object) << 64
    ) + (words[1].astype(object) << 32) + words[2].astype(object)
    assert (_join(rh, rl) == vals % q).all()


# (26, 27) ct-limb bits take the single-u32-residue 4-mul kernel
# (_raw_kernel_u32, hi plane None); (26, 34) takes the 3-word 9-mul path.
@pytest.mark.parametrize("q_bits", [(26, 27, 28), (26, 34, 36)])
def test_pallas_raw_contract_matches_xla(rng, q_bits):
    from pir_tpu.core.context import PirContext
    from pir_tpu.ops import pallas_scan, scan
    from pir_tpu.testing.params import tiny_pir_params

    ctx = PirContext(tiny_pir_params(n=256, t_bits=13, q_bits=q_bits))
    assert max(q.bit_length() for q in ctx.ct_moduli) <= 48
    P, D, L, N = 3, 7, ctx.L, ctx.n
    db = np.zeros((P, D, L, N), dtype=np.uint64)
    sv = np.zeros((D, 2, L, N), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        db[:, :, li] = rng.integers(0, q, size=(P, D, N), dtype=np.uint64)
        sv[:, :, li] = rng.integers(0, q, size=(D, 2, N), dtype=np.uint64)

    expect = np.asarray(
        scan.contract_dim(ctx, jnp.asarray(sv), jnp.asarray(db))
    )
    dbt = jnp.transpose(jnp.asarray(db), (0, 2, 1, 3))  # [P, L, D, N]
    dbh, dbl = pallas_scan.split_planes(dbt, ctx.ct_moduli)
    got = np.asarray(
        scan.contract_dim_planes(ctx, jnp.asarray(sv), dbh, dbl, interpret=True)
    )
    assert (got == expect).all()


@pytest.mark.parametrize("q_bits", [(26, 27, 28), (26, 34, 36)])
def test_database_scan_decomp_planes_matches(rng, q_bits):
    from pir_tpu.core.context import PirContext
    from pir_tpu.ops import pallas_scan, scan
    from pir_tpu.testing.params import tiny_pir_params

    ctx = PirContext(tiny_pir_params(n=128, t_bits=13, q_bits=q_bits))
    dims = (3, 4)
    total = 12
    db = np.zeros((total, ctx.L, ctx.n), dtype=np.uint64)
    sv = np.zeros((sum(dims), 2, ctx.L, ctx.n), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        db[:, li] = rng.integers(0, q, size=(total, ctx.n), dtype=np.uint64)
        sv[:, :, li] = rng.integers(0, q, size=(sum(dims), 2, ctx.n), dtype=np.uint64)
    db_j = jnp.asarray(db)
    sv_j = jnp.asarray(sv)
    expect = np.asarray(scan.database_scan_decomp(ctx, db_j, dims, sv_j))

    grouped = db_j.reshape(total // dims[-1], dims[-1], ctx.L, ctx.n)
    planes = pallas_scan.split_planes(
        jnp.transpose(grouped, (0, 2, 1, 3)), ctx.ct_moduli
    )
    got = np.asarray(
        scan.database_scan_decomp(
            ctx, None, dims, sv_j, db_planes=planes, interpret=True
        )
    )
    assert (got == expect).all()


@pytest.mark.parametrize("q_bits", [(26, 27, 28), (26, 34, 36)])
def test_pallas_wide_contract_matches(rng, q_bits):
    """The S-wide kernel (batched serving) equals per-column contract_dim."""
    from pir_tpu.core.context import PirContext
    from pir_tpu.ops import pallas_scan, scan
    from pir_tpu.testing.params import tiny_pir_params

    ctx = PirContext(tiny_pir_params(n=256, t_bits=13, q_bits=q_bits))
    P, D, S, L, N = 3, 7, 6, ctx.L, ctx.n
    db = np.zeros((P, D, L, N), dtype=np.uint64)
    sv = np.zeros((D, S, L, N), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        db[:, :, li] = rng.integers(0, q, size=(P, D, N), dtype=np.uint64)
        sv[:, :, li] = rng.integers(0, q, size=(D, S, N), dtype=np.uint64)

    dbt = jnp.transpose(jnp.asarray(db), (0, 2, 1, 3))
    dbh, dbl = pallas_scan.split_planes(dbt, ctx.ct_moduli)
    got = np.asarray(
        scan.contract_dim_planes_wide(
            ctx, jnp.asarray(sv), dbh, dbl, interpret=True
        )
    )  # [P, S, L, N]
    # reference: the S columns two at a time through the 2-wide base path
    for s0 in range(0, S, 2):
        expect = np.asarray(
            scan.contract_dim(
                ctx, jnp.asarray(sv[:, s0 : s0 + 2]), jnp.asarray(db)
            )
        )
        assert (got[:, s0 : s0 + 2] == expect).all()


@pytest.mark.parametrize("q_bits", [(26, 27, 28), (26, 34, 36)])
def test_database_scan_decomp_batched_matches(rng, q_bits):
    """Multi-query scan == per-query scans, bit for bit."""
    from pir_tpu.core.context import PirContext
    from pir_tpu.ops import pallas_scan, scan
    from pir_tpu.testing.params import tiny_pir_params

    ctx = PirContext(tiny_pir_params(n=128, t_bits=13, q_bits=q_bits))
    dims = (3, 4)
    total = 12
    B = 2
    db = np.zeros((total, ctx.L, ctx.n), dtype=np.uint64)
    sv = np.zeros((B, sum(dims), 2, ctx.L, ctx.n), dtype=np.uint64)
    for li, q in enumerate(ctx.ct_moduli):
        db[:, li] = rng.integers(0, q, size=(total, ctx.n), dtype=np.uint64)
        sv[:, :, :, li] = rng.integers(
            0, q, size=(B, sum(dims), 2, ctx.n), dtype=np.uint64
        )
    grouped = jnp.asarray(db).reshape(
        total // dims[-1], dims[-1], ctx.L, ctx.n
    )
    planes = pallas_scan.split_planes(
        jnp.transpose(grouped, (0, 2, 1, 3)), ctx.ct_moduli
    )
    got = np.asarray(
        scan.database_scan_decomp_batched(
            ctx, dims, jnp.asarray(sv), planes, interpret=True
        )
    )
    for b in range(B):
        expect = np.asarray(
            scan.database_scan_decomp(
                ctx, None, dims, jnp.asarray(sv[b]), db_planes=planes,
                interpret=True,
            )
        )
        assert (got[b] == expect).all()
