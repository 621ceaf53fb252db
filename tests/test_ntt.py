"""NTT kernel tests: roundtrip, convolution theorem, layout pin, batching."""

import numpy as np
import jax
import jax.numpy as jnp

from pir_tpu.core import primes
from pir_tpu.ops import ntt as ntt_mod
from pir_tpu.testing import refmodel


def _tables(n, nmod=2, bits=(20, 21)):
    moduli = [primes.get_prime(2 * n, b) for b in bits[:nmod]]
    return ntt_mod.NttTables(moduli, n)


def _rand_poly(rng, tables, batch=()):
    L = len(tables.moduli)
    out = np.zeros(batch + (L, tables.n), dtype=np.uint64)
    for li, q in enumerate(tables.moduli):
        out[..., li, :] = rng.integers(0, q, size=batch + (tables.n,), dtype=np.uint64)
    return out


def test_roundtrip_small(rng):
    for n in [8, 64, 256]:
        t = _tables(n)
        x = _rand_poly(rng, t)
        y = np.asarray(t.inverse(t.forward(jnp.asarray(x))))
        assert (y == x).all(), n


def test_roundtrip_4096(rng):
    t = _tables(4096, nmod=3, bits=(36, 36, 37))
    x = _rand_poly(rng, t)
    y = np.asarray(t.inverse(t.forward(jnp.asarray(x))))
    assert (y == x).all()


def test_forward_matches_slow_definition(rng):
    """Pin the bit-reversed layout: fast[j] == slow[brv(j)]."""
    n = 16
    t = _tables(n, nmod=1)
    q = t.moduli[0]
    psi = primes.primitive_root_2n(q, 2 * n)
    x = _rand_poly(rng, t)
    fast = np.asarray(t.forward(jnp.asarray(x)))[0]
    slow = refmodel.slow_negacyclic_ntt(x[0], psi, q)
    brv = ntt_mod._bit_reverse_indices(n).astype(int)
    assert fast.astype(object).tolist() == [slow[brv[j]] for j in range(n)]


def test_convolution_theorem(rng):
    n = 64
    t = _tables(n)
    a = _rand_poly(rng, t)
    b = _rand_poly(rng, t)
    fast = np.asarray(t.negacyclic_polymul(jnp.asarray(a), jnp.asarray(b)))
    for li, q in enumerate(t.moduli):
        expect = refmodel.negacyclic_mul(a[li], b[li], q)
        assert fast[li].astype(object).tolist() == expect, li


def test_batched_shapes(rng):
    n = 32
    t = _tables(n)
    x = _rand_poly(rng, t, batch=(3, 2))
    f = np.asarray(t.forward(jnp.asarray(x)))
    assert f.shape == x.shape
    # batch element independence
    f0 = np.asarray(t.forward(jnp.asarray(x[0, 0])))
    assert (f[0, 0] == f0).all()


def test_jit_and_grad_free(rng):
    n = 64
    t = _tables(n)
    x = jnp.asarray(_rand_poly(rng, t))
    jit_fwd = jax.jit(t.forward)
    assert (np.asarray(jit_fwd(x)) == np.asarray(t.forward(x))).all()


def test_slice_tables(rng):
    t = _tables(64, nmod=2)
    t1 = t.slice(1)
    x = _rand_poly(rng, t)
    full = np.asarray(t.forward(jnp.asarray(x)))
    part = np.asarray(t1.forward(jnp.asarray(x[:1])))
    assert (full[:1] == part).all()
