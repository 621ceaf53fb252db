"""Fused Pallas MXU NTT kernel: bit-exactness under the interpreter.

The kernel (ops/pallas_mxu_ntt.py) is the production TPU NTT impl; on the
CPU test mesh it runs under the Pallas interpreter against the XLA
per-stage reference (itself golden-tested in test_ntt.py).  The same
kernel was verified bit-exact compiled on a real v5e chip for
block_b in {1, 2, 4, 8} (fwd + inv + roundtrip, N=4096, L=3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pir_tpu.core.params import generate_encryption_params
from pir_tpu.ops import ntt as ntt_mod
from pir_tpu.ops import pallas_mxu_ntt
from pir_tpu.ops.ntt import NttTables


@pytest.fixture(scope="module")
def tables_4096():
    moduli = tuple(generate_encryption_params(4096, 24).coeff_modulus)
    return NttTables(moduli, 4096)


# batch 1 exercises the block-shrink path, 5 the pad-to-block_b path;
# batch 3 duplicated 5's padding coverage at ~30s of interpreter time
@pytest.mark.parametrize("batch", [1, 5])
def test_interpret_matches_reference(tables_4096, batch, rng):
    t = tables_4096
    L = len(t.moduli)
    x = jnp.asarray(
        rng.integers(0, min(t.moduli), (batch, L, 4096), dtype=np.uint64)
    )
    ref = t.forward(x)
    got = pallas_mxu_ntt.ntt(t, x, inverse=False, interpret=True)
    assert jnp.array_equal(ref, got)
    back = pallas_mxu_ntt.ntt(t, got, inverse=True, interpret=True)
    assert jnp.array_equal(back, x)


def test_block_b_invariance(tables_4096, rng):
    t = tables_4096
    L = len(t.moduli)
    x = jnp.asarray(
        rng.integers(0, min(t.moduli), (5, L, 4096), dtype=np.uint64)
    )
    ref = t.forward(x)
    for bb in (1, 2, 4):
        got = pallas_mxu_ntt.ntt(
            t, x, inverse=False, interpret=True, block_b=bb
        )
        assert jnp.array_equal(ref, got), f"block_b={bb}"


def test_empty_batch(tables_4096):
    t = tables_4096
    L = len(t.moduli)
    x = jnp.zeros((0, L, 4096), jnp.uint64)
    out = pallas_mxu_ntt.ntt(t, x, inverse=False, interpret=True)
    assert out.shape == x.shape


def test_use_impl_dispatch(tables_4096, rng):
    """mxu_interpret routes NttTables.forward through the fused kernel."""
    t = tables_4096
    L = len(t.moduli)
    x = jnp.asarray(
        rng.integers(0, min(t.moduli), (1, L, 4096), dtype=np.uint64)
    )
    ref = t.forward(x)  # default on CPU resolves to xla
    with ntt_mod.use_impl("mxu_interpret"):
        got = t.forward(x)
    assert jnp.array_equal(ref, got)


def test_supported_gate():
    assert pallas_mxu_ntt.supported(4096)
    assert pallas_mxu_ntt.supported(8192)
    assert pallas_mxu_ntt.supported(16384)
    assert pallas_mxu_ntt.supported(2048)
    assert not pallas_mxu_ntt.supported(512)  # n1 < 8 rows
    assert not pallas_mxu_ntt.supported(4000)
