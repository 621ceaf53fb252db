"""Pallas VMEM-staged NTT kernel: bit-exactness vs the XLA formulation.

The kernel (ops/pallas_ntt.py) must agree bit-for-bit with
NttTables.forward/inverse (ops/ntt.py) — same merged bit-reversed twiddle
order (semantics: seal transform_to/from_ntt_inplace, reference
pir/cpp/database.cpp:74,104,250-254).  Tests run the Pallas interpreter on
the CPU backend; the real-TPU path is exercised by the benchmarks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.core import primes
from pir_tpu.ops import ntt as ntt_mod
from pir_tpu.ops import pallas_ntt


def _tables(n, nmod=2, bits=(20, 21)):
    moduli = [primes.get_prime(2 * n, b) for b in bits[:nmod]]
    return ntt_mod.NttTables(moduli, n)


def _rand_poly(rng, tables, batch=()):
    L = len(tables.moduli)
    out = np.zeros(batch + (L, tables.n), dtype=np.uint64)
    for li, q in enumerate(tables.moduli):
        out[..., li, :] = rng.integers(
            0, q, size=batch + (tables.n,), dtype=np.uint64
        )
    return out


@pytest.mark.parametrize(
    "n", [256, pytest.param(512, marks=pytest.mark.slow)]
)
def test_matches_xla_both_directions(rng, n):
    t = _tables(n)
    x = _rand_poly(rng, t, batch=(3,))
    xj = jnp.asarray(x)
    ref_f = np.asarray(t.forward(xj))
    got_f = np.asarray(pallas_ntt.ntt(t, xj, inverse=False, interpret=True))
    assert (ref_f == got_f).all()
    ref_i = np.asarray(t.inverse(jnp.asarray(ref_f)))
    got_i = np.asarray(
        pallas_ntt.ntt(t, jnp.asarray(ref_f), inverse=True, interpret=True)
    )
    assert (ref_i == got_i).all()
    assert (got_i == x).all()


def test_wide_moduli_and_batch_padding(rng):
    """45-bit primes (hi word exercised) + a batch that needs block padding."""
    n = 256
    t = _tables(n, nmod=2, bits=(45, 44))
    x = _rand_poly(rng, t, batch=(9,))  # pads 9 -> 16 at block_b=8
    xj = jnp.asarray(x)
    ref = np.asarray(t.forward(xj))
    got = np.asarray(pallas_ntt.ntt(t, xj, inverse=False, interpret=True))
    assert (ref == got).all()


def test_use_impl_dispatch(rng):
    """NttTables.forward routes through the kernel under use_impl."""
    n = 256
    t = _tables(n)
    x = jnp.asarray(_rand_poly(rng, t))
    ref = np.asarray(t.forward(x))
    with ntt_mod.use_impl("pallas_interpret"):
        got = np.asarray(t.forward(x))
    assert (ref == got).all()


def test_unsupported_n_falls_back(rng):
    """n below the 2x128-lane layout floor stays on the XLA path."""
    n = 64
    t = _tables(n)
    x = jnp.asarray(_rand_poly(rng, t))
    ref = np.asarray(t.forward(x))
    with ntt_mod.use_impl("pallas_interpret"):
        got = np.asarray(t.forward(x))
    assert (ref == got).all()
