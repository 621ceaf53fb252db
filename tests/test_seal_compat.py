"""SEAL 3.5 stream codec: self-consistency + structure (see module caveat)."""

import struct

import numpy as np
import pytest

from pir_tpu.core.params import generate_encryption_params
from pir_tpu.pir import seal_compat, wire
from pir_tpu.testing.params import tiny_encryption_params


def test_roundtrip_default_params():
    ep = generate_encryption_params(4096, 20)
    blob = seal_compat.save_encryption_params(ep)
    assert seal_compat.load_encryption_params(blob) == ep


def test_header_structure():
    ep = generate_encryption_params(4096, 20)
    blob = seal_compat.save_encryption_params(ep)
    hdr = seal_compat.parse_header(blob)
    assert hdr["version"] == (3, 5)
    assert hdr["size"] == len(blob)
    # payload: scheme=BFV, degree, 3 moduli, plain modulus
    assert struct.unpack_from("<B", blob, 16)[0] == seal_compat.SCHEME_BFV
    assert struct.unpack_from("<Q", blob, 17)[0] == 4096
    assert struct.unpack_from("<Q", blob, 25)[0] == 3


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        seal_compat.parse_header(b"\x00" * 32)
    assert not seal_compat.looks_like_seal_stream(b"PTPE{}")


def test_compressed_stream_rejected():
    ep = generate_encryption_params(4096, 20)
    blob = bytearray(seal_compat.save_encryption_params(ep))
    blob[5] = 1  # compr_mode = deflate
    with pytest.raises(ValueError, match="compressed"):
        seal_compat.parse_header(bytes(blob))


def test_wire_accepts_both_encodings():
    ep = generate_encryption_params(4096, 20)
    native = wire.serialize_encryption_params(ep)
    seal = seal_compat.save_encryption_params(ep)
    assert wire.deserialize_encryption_params_any(native) == ep
    assert wire.deserialize_encryption_params_any(seal) == ep
    with pytest.raises(ValueError):
        wire.deserialize_encryption_params_any(b"garbage")


# ---------------------------------------------------------------------------
# blake2xb / parms_id
# ---------------------------------------------------------------------------


def test_pure_blake2b_matches_hashlib():
    """The raw-parameter-block BLAKE2b core vs hashlib with the standard
    sequential block (digest 64, fanout 1, depth 1) — validates the
    compression function on empty/short/multi-block inputs."""
    import hashlib

    seq = seal_compat._b2x_params(64, 1, 1, 0, 0, 0, 0, 0)
    for msg in (b"", b"abc", b"x" * 128, b"y" * 129, bytes(range(256)) * 3):
        assert seal_compat._blake2b_raw(msg, seq) == hashlib.blake2b(msg).digest()


def test_blake2xb_spec_properties():
    # deterministic, length-exact, and a prefix-free XOF (different output
    # lengths give unrelated streams, per the BLAKE2X design)
    a32 = seal_compat.blake2xb(b"abc", 32)
    assert len(a32) == 32
    assert a32 == seal_compat.blake2xb(b"abc", 32)
    a100 = seal_compat.blake2xb(b"abc", 100)
    assert len(a100) == 100
    assert a100[:32] != a32  # xof_length is part of the parameterization
    assert seal_compat.blake2xb(b"abd", 32) != a32
    with pytest.raises(ValueError):
        seal_compat.blake2xb(b"", 0)


def test_parms_id_distinguishes_params():
    a = seal_compat.parms_id_for(generate_encryption_params(4096, 20))
    b = seal_compat.parms_id_for(generate_encryption_params(4096, 24))
    c = seal_compat.parms_id_for(generate_encryption_params(8192, 20))
    assert len(a) == 4 and a != b and a != c and b != c


# ---------------------------------------------------------------------------
# ciphertext / kswitch-key streams
# ---------------------------------------------------------------------------


def _random_ct(ep, size=2, rng=None, limbs=None):
    rng = rng or np.random.default_rng(3)
    moduli = ep.coeff_modulus if limbs == "qp" else ep.ct_modulus
    return np.stack(
        [
            np.stack(
                [
                    rng.integers(0, q, ep.poly_modulus_degree, dtype=np.uint64)
                    for q in moduli
                ]
            )
            for _ in range(size)
        ]
    )


def test_ciphertext_stream_roundtrip():
    ep = tiny_encryption_params(n=64)
    ct = _random_ct(ep)
    blob = seal_compat.save_ciphertext(ct, ep)
    hdr = seal_compat.parse_header(blob)
    assert hdr["size"] == len(blob)
    out = seal_compat.load_ciphertext(blob, ep)
    assert np.array_equal(out, ct)


def test_ciphertext_stream_wrong_params_rejected():
    ep = tiny_encryption_params(n=64)
    other = tiny_encryption_params(n=128)
    blob = seal_compat.save_ciphertext(_random_ct(ep), ep)
    with pytest.raises(ValueError, match="parms_id"):
        seal_compat.load_ciphertext(blob, other)


def test_ntt_form_ciphertext_rejected_on_wire():
    ep = tiny_encryption_params(n=64)
    blob = seal_compat.save_ciphertext(_random_ct(ep), ep, is_ntt_form=True)
    with pytest.raises(ValueError, match="NTT"):
        seal_compat.load_ciphertext(blob, ep)


def test_wire_load_ciphertexts_accepts_seal_stream():
    from pir_tpu.core.params import create_pir_parameters
    from pir_tpu.core.context import PirContext
    from pir_tpu.proto import payload_pb2 as pb

    ep = tiny_encryption_params(n=64)
    params = create_pir_parameters(10, 8, 1, ep)
    ctx = PirContext(params)
    ct = _random_ct(ep)
    msg = pb.Ciphertexts()
    msg.ct.append(seal_compat.save_ciphertext(ct, ep))
    out = wire.load_ciphertexts(msg, ctx)
    assert np.array_equal(out[0], ct)
    with pytest.raises(ValueError, match="context"):
        wire.load_ciphertexts(msg)


def test_kswitch_keys_roundtrip_with_galois_rows():
    ep = tiny_encryption_params(n=64)
    rng = np.random.default_rng(5)
    # two galois elements with [L, 2, Lp, N] key data, as bfv/keys packs them
    L = len(ep.ct_modulus)
    keys = {
        33: np.stack([_random_ct(ep, 2, rng, "qp") for _ in range(L)]),
        5: np.stack([_random_ct(ep, 2, rng, "qp") for _ in range(L)]),
    }
    rows = seal_compat.galois_rows_from_dict(keys, ep.poly_modulus_degree)
    assert len(rows) == (33 - 1) // 2 + 1
    blob = seal_compat.save_kswitch_keys(rows, ep)
    back = seal_compat.galois_dict_from_rows(
        seal_compat.load_kswitch_keys(blob, ep)
    )
    assert set(back) == {5, 33}
    for e in (5, 33):
        assert np.array_equal(back[e], keys[e])


def test_galois_rows_validate_elements():
    ep = tiny_encryption_params(n=64)
    with pytest.raises(ValueError, match="galois element"):
        seal_compat.galois_rows_from_dict({4: np.zeros((1, 2, 3, 64))}, 64)
    assert seal_compat.galois_rows_from_dict({}, 64) == []
