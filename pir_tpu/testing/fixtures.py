"""Shared test fixtures — the role of the reference's PIRTestingBase
(pir/cpp/test_base.{h,cpp}): seeded random databases and a full toolkit
(keys + encrypt/decrypt access) so component tests can peek at
intermediate ciphertexts.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from pir_tpu.bfv import keys as keys_mod
from pir_tpu.core.context import PirContext
from pir_tpu.core.params import PirParams
from pir_tpu.utils.math import generate_galois_elts


def generate_test_db(db_size: int, elem_size: int, seed: int = 42) -> list[bytes]:
    """Seeded random byte-string database (test_base.cpp:27-37 role)."""
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=elem_size, dtype=np.uint8).tobytes()
            for _ in range(db_size)]


def generate_int_db(db_size: int, seed: int = 42) -> list[int]:
    """Seeded random int64 database, 6 significant bytes like the reference
    (test_base.cpp:67-78 leaves 2 bytes of headroom for decode)."""
    rng = np.random.default_rng(seed)
    return [int(rng.integers(0, 1 << 48)) for _ in range(db_size)]


@dataclasses.dataclass
class Toolkit:
    """Keys + context for tests that decrypt intermediates (SetUpSealTools)."""

    ctx: PirContext
    rng: np.random.Generator
    sk: keys_mod.SecretKey
    pk: keys_mod.PublicKey
    galois: keys_mod.GaloisKeys
    relin: keys_mod.RelinKeys


# Keygen at N=4096 dominates test wall time, and most tests rebuild the
# identical toolkit — memoize on the (frozen, hashable) parameter tuple.
# Tests consume the toolkit's rng *after* keygen, so the memo snapshots the
# post-keygen bit-generator state and replays it into a FRESH Generator per
# call: every caller sees randomness bit-identical to an uncached build,
# regardless of what earlier tests drew from their own copies.
_TOOLKIT_MEMO: dict = {}


def make_toolkit(params: PirParams, seed: int = 42, extra_elts=()) -> Toolkit:
    key = (params, seed, tuple(extra_elts))
    hit = _TOOLKIT_MEMO.get(key)
    if hit is None:
        ctx = PirContext.for_params(params)
        rng = np.random.default_rng(seed)
        sk = keys_mod.gen_secret_key(ctx, rng)
        pk = keys_mod.gen_public_key(ctx, sk, rng)
        galois = keys_mod.gen_galois_keys(
            ctx, sk, list(generate_galois_elts(ctx.n)) + list(extra_elts), rng
        )
        relin = keys_mod.gen_relin_key(ctx, sk, rng)
        tk = Toolkit(ctx=ctx, rng=rng, sk=sk, pk=pk, galois=galois, relin=relin)
        hit = (tk, rng.bit_generator.state)
        _TOOLKIT_MEMO[key] = hit
    tk, rng_state = hit
    rng = np.random.default_rng()
    rng.bit_generator.state = rng_state
    return dataclasses.replace(tk, rng=rng)
