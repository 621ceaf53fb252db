"""Adversarial robustness of the SEAL stream parsers.

The loaders consume wire bytes; every length/header field must fail
closed (ValueError) on mutation — never crash, hang, or mis-allocate.
Mirrors the reference's status-checked deserialization contract
(pir/cpp/serialization.cpp:32-55 converts SEAL exceptions to
InvalidArgumentError for exactly this reason).
"""

import struct
import zlib

import numpy as np
import pytest

from pir_tpu.pir import seal_compat
from pir_tpu.testing.params import tiny_encryption_params


def _valid_blobs():
    ep = tiny_encryption_params(n=64)
    rng = np.random.default_rng(7)
    L, n = len(ep.coeff_modulus), 64
    ct = np.stack(
        [
            np.stack(
                [rng.integers(0, q, n, dtype=np.uint64) for q in ep.coeff_modulus]
            )
            for _ in range(2)
        ]
    )
    key_ct = ct  # key-level shape: same chain for the tiny params
    blobs = {
        "params": seal_compat.save_encryption_params(ep),
        "ct": seal_compat.save_ciphertext(ct, ep),
        "kswitch": seal_compat.save_kswitch_keys([[key_ct], []], ep),
    }
    return ep, blobs


def _load(kind, blob, ep):
    if kind == "params":
        return seal_compat.load_encryption_params(blob)
    if kind == "ct":
        return seal_compat.load_ciphertext(blob, ep)
    return seal_compat.load_kswitch_keys(blob, ep)


@pytest.mark.parametrize("kind", ["params", "ct", "kswitch"])
def test_truncations_fail_closed(kind):
    ep, blobs = _valid_blobs()
    blob = blobs[kind]
    _load(kind, blob, ep)  # the untruncated blob parses
    for cut in range(0, len(blob), 7):
        with pytest.raises(ValueError):
            _load(kind, blob[:cut], ep)


@pytest.mark.parametrize("kind", ["params", "ct", "kswitch"])
def test_random_mutations_never_crash(kind):
    """Random byte flips either still parse (mutations in poly words are
    data, not framing) or raise ValueError — nothing else escapes."""
    ep, blobs = _valid_blobs()
    blob = bytearray(blobs[kind])
    rng = np.random.default_rng(kind.encode()[0])
    for _ in range(300):
        mut = bytearray(blob)
        for _ in range(int(rng.integers(1, 5))):
            mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
        try:
            _load(kind, bytes(mut), ep)
        except ValueError:
            pass


@pytest.mark.parametrize("kind", ["params", "ct", "kswitch"])
def test_extreme_length_fields_fail_closed(kind):
    """Every u64-aligned position overwritten with extreme length-like
    values must not over-allocate or crash (bounds checks fire first)."""
    ep, blobs = _valid_blobs()
    blob = blobs[kind]
    for value in (0, 1, 2**63, 2**64 - 1, len(blob) + 1):
        for off in range(8, min(len(blob) - 8, 240), 8):
            mut = bytearray(blob)
            struct.pack_into("<Q", mut, off, value)
            try:
                _load(kind, bytes(mut), ep)
            except ValueError:
                pass


def test_deflate_bomb_bounded():
    """A deflate body that inflates enormously must still fail closed
    (the inflated payload hits the same bounds checks)."""
    ep, blobs = _valid_blobs()
    bomb = zlib.compress(b"\x00" * (1 << 24))
    header = struct.pack(
        "<HBBBBHQ", seal_compat.SEAL_MAGIC, 0x10, 3, 5,
        seal_compat.COMPR_DEFLATE, 0, 16 + len(bomb),
    )
    with pytest.raises(ValueError):
        seal_compat.load_ciphertext(header + bomb, ep)


def test_seeded_marker_with_truncated_seed_region():
    """Marker word present but stream cut inside the seed words."""
    ep, blobs = _valid_blobs()
    blob = bytearray(blobs["ct"])
    # place the marker at the start of poly 1's words
    body = seal_compat._unwrap(bytes(blob))
    L, n = len(ep.coeff_modulus), 64
    # poly-1 words start after: parms_id(32)+flags(1)+dims(24)+scale(8)+
    # nested header(16)+count(8) + poly0 words
    off = 16 + 32 + 1 + 24 + 8 + 16 + 8 + 8 * L * n
    struct.pack_into("<Q", blob, off, seal_compat.SEED_MARKER)
    cut = bytes(blob)[: off + 24]  # marker + part of the seed, then EOF
    with pytest.raises(ValueError):
        seal_compat.load_ciphertext(cut, ep)


def test_relin_keys_byte_golden():
    """Deterministic relin-key stream: frozen digest + structural frame
    (pins the emit path the way the ciphertext golden pins ct framing)."""
    import hashlib

    ep = tiny_encryption_params(n=64)
    L, n = len(ep.coeff_modulus), 64
    q = np.array([m for m in ep.coeff_modulus], dtype=np.uint64)[:, None]
    base = np.arange(2 * L * n, dtype=np.uint64).reshape(2, L, n)
    key_ct = base % q[None]
    blob = seal_compat.save_kswitch_keys([[key_ct]], ep)
    hdr = seal_compat.parse_header(blob)
    assert hdr["size"] == len(blob)
    # payload: key parms_id + row count 1 + per-row count 1 + nested ct
    assert struct.unpack_from("<4Q", blob, 16) == seal_compat.parms_id_for(ep)
    assert struct.unpack_from("<Q", blob, 48)[0] == 1  # rows
    assert struct.unpack_from("<Q", blob, 56)[0] == 1  # cts in row
    digest = hashlib.blake2b(blob, digest_size=16).hexdigest()
    assert digest == _RELIN_GOLDEN, digest
    # and it loads back bit-exact
    rows = seal_compat.load_kswitch_keys(blob, ep)
    assert (rows[0][0] == key_ct).all()


_RELIN_GOLDEN = "24db642a3482eaa057d408a720b5cc56"


def test_deflate_wrapped_emit_accepted():
    """Our emitted streams, re-wrapped in SEAL's deflate mode, load
    identically (covers the compressed top-level accept path for every
    object kind)."""
    ep, blobs = _valid_blobs()
    for kind, blob in blobs.items():
        body = zlib.compress(blob[16:])
        hdr = struct.pack(
            "<HBBBBHQ", seal_compat.SEAL_MAGIC, 0x10, 3, 5,
            seal_compat.COMPR_DEFLATE, 0, 16 + len(body),
        )
        a = _load(kind, blob, ep)
        b = _load(kind, hdr + body, ep)
        if kind == "params":
            assert a == b
        elif kind == "ct":
            assert (a == b).all()
        else:
            for ra, rb in zip(a, b):
                for x, y in zip(ra, rb):
                    assert (x == y).all()
