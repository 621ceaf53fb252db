"""Property tests: vectorized u64 modular arithmetic vs Python big-int truth."""

import numpy as np
import jax.numpy as jnp

from pir_tpu.core import primes
from pir_tpu.ops import modular

MODULI = [
    (1 << 61) - 1,  # not NTT prime, but fine for mulmod tests (61-bit max)
    primes.get_prime(8192, 36),
    primes.get_prime(8192, 37),
    primes.get_prime(16384, 43),
    primes.get_prime(128, 20),
    0xFC001,
]


def _rand_u64_below(rng, bound, size):
    return rng.integers(0, bound, size=size, dtype=np.uint64)


def test_mul64_wide(rng):
    x = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) * 2 + 1
    y = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64)
    hi, lo = modular.mul64_wide(jnp.asarray(x), jnp.asarray(y))
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i in range(0, 1000, 97):
        prod = int(x[i]) * int(y[i])
        assert int(lo[i]) == prod & 0xFFFFFFFFFFFFFFFF
        assert int(hi[i]) == prod >> 64


def test_barrett_mul_mod(rng):
    for q in MODULI:
        rhi, rlo = modular.barrett_ratio(q)
        x = _rand_u64_below(rng, q, 4096)
        y = _rand_u64_below(rng, q, 4096)
        r = np.asarray(
            modular.mul_mod(
                jnp.asarray(x), jnp.asarray(y), np.uint64(q), np.uint64(rhi), np.uint64(rlo)
            )
        )
        expect = (x.astype(object) * y.astype(object)) % q
        assert (r.astype(object) == expect).all(), hex(q)


def test_barrett_reduce_64(rng):
    for q in MODULI:
        rhi, _ = modular.barrett_ratio(q)
        x = rng.integers(0, 1 << 63, size=4096, dtype=np.uint64) * 2 + 1
        r = np.asarray(
            modular.barrett_reduce_64(jnp.asarray(x), np.uint64(q), np.uint64(rhi))
        )
        assert (r.astype(object) == x.astype(object) % q).all(), hex(q)


def test_add_sub_neg_mod(rng):
    for q in MODULI[:3]:
        x = _rand_u64_below(rng, q, 2048)
        y = _rand_u64_below(rng, q, 2048)
        qq = np.uint64(q)
        add = np.asarray(modular.add_mod(jnp.asarray(x), jnp.asarray(y), qq))
        sub = np.asarray(modular.sub_mod(jnp.asarray(x), jnp.asarray(y), qq))
        neg = np.asarray(modular.neg_mod(jnp.asarray(x), qq))
        xo, yo = x.astype(object), y.astype(object)
        assert (add.astype(object) == (xo + yo) % q).all()
        assert (sub.astype(object) == (xo - yo) % q).all()
        assert (neg.astype(object) == (-xo) % q).all()


def test_shoup_mul(rng):
    for q in MODULI:
        w = _rand_u64_below(rng, q, 512)
        x = _rand_u64_below(rng, q, 512)
        w_shoup = modular.shoup_precompute(w, q)
        r = np.asarray(
            modular.mul_mod_shoup(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(w_shoup), np.uint64(q)
            )
        )
        expect = (x.astype(object) * w.astype(object)) % q
        assert (r.astype(object) == expect).all(), hex(q)


def test_limb_constants_broadcasting(rng):
    moduli = MODULI[1:4]
    lc = modular.LimbConstants(moduli)
    x = np.stack([_rand_u64_below(rng, q, 256) for q in moduli])  # [L, N]
    y = np.stack([_rand_u64_below(rng, q, 256) for q in moduli])
    r = np.asarray(lc.mul(jnp.asarray(x), jnp.asarray(y)))
    for li, q in enumerate(moduli):
        expect = (x[li].astype(object) * y[li].astype(object)) % q
        assert (r[li].astype(object) == expect).all()
    # batched leading dims
    xb = np.stack([x, y])  # [2, L, N]
    rb = np.asarray(lc.add(jnp.asarray(xb), jnp.asarray(xb)))
    assert rb.shape == xb.shape
    for li, q in enumerate(moduli):
        assert (
            rb[0, li].astype(object) == (2 * x[li].astype(object)) % q
        ).all()


def test_edge_values():
    # max operands at the largest supported modulus
    q = (1 << 61) - 1
    rhi, rlo = modular.barrett_ratio(q)
    x = jnp.asarray(np.array([q - 1, q - 1, 0, 1], dtype=np.uint64))
    y = jnp.asarray(np.array([q - 1, 1, q - 1, q - 1], dtype=np.uint64))
    r = np.asarray(
        modular.mul_mod(x, y, np.uint64(q), np.uint64(rhi), np.uint64(rlo))
    )
    expect = [(q - 1) * (q - 1) % q, q - 1, 0, q - 1]
    assert r.astype(object).tolist() == expect
