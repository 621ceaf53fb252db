"""SEAL 3.5 stream codec: self-consistency + structure (see module caveat)."""

import struct

import pytest

from pir_tpu.core.params import generate_encryption_params
from pir_tpu.pir import seal_compat, wire


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
