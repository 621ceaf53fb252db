"""End-to-end SEAL 3.5 wire mode: every bytes field a SEAL stream.

The reference puts SEAL streams in every proto bytes field
(pir/cpp/serialization.h:81-138, parameters.cpp:99-100).  These tests run
the full protocol with wire_format="seal" on both ends and assert that
each emitted field starts with a well-formed SEAL header and parses with
the seal_compat loaders, plus hand-derived byte-layout fixtures pinning
the exact framing (offsets and field order per the documented SEAL 3.5.6
save_members layouts — see seal_compat module docstring for the caveat
that live SEAL cross-validation is impossible in this zero-egress
container).
"""

import struct

import numpy as np
import pytest

from pir_tpu.pir import seal_compat, wire
from pir_tpu.pir.client import PirClient
from pir_tpu.pir.database import PirDatabase
from pir_tpu.pir.server import PirServer
from pir_tpu.testing.fixtures import generate_test_db
from pir_tpu.testing.params import tiny_pir_params


def _assert_seal(b: bytes):
    assert seal_compat.looks_like_seal_stream(b)
    hdr = seal_compat.parse_header(b)
    assert hdr["version"] == (3, 5)
    assert hdr["size"] == len(b)


def _roundtrip_seal(params, indices, server_format="auto"):
    raw = generate_test_db(params.num_items, params.bytes_per_item, 42)
    db = PirDatabase.create(raw, params)
    client = PirClient(params, seed=7, wire_format="seal")
    server = PirServer(db, params, wire_format=server_format)

    request = client.create_request(indices)
    # every bytes field of the request is a SEAL stream
    _assert_seal(request.galois_keys)
    _assert_seal(request.relin_keys)
    for q in request.query:
        for ct in q.ct:
            _assert_seal(ct)
            seal_compat.load_ciphertext(ct, params.encryption_params)

    response = server.process_request(request)
    for r in response.reply:
        for ct in r.ct:
            _assert_seal(ct)
            seal_compat.load_ciphertext(ct, params.encryption_params)

    results = client.process_response(indices, response)
    for i, idx in enumerate(indices):
        assert results[i] == raw[idx], f"index {idx}"


def test_seal_wire_roundtrip_d1():
    _roundtrip_seal(tiny_pir_params(dbsize=10, bytes_per_item=8, n=64), [3, 9])


def test_seal_wire_roundtrip_d2():
    # recursion replies must use legacy (reference-width) re-encode digits
    # in SEAL wire mode — balanced params are rejected (guard tested below)
    _roundtrip_seal(
        tiny_pir_params(
            dbsize=30, bytes_per_item=8, dimensions=2, n=64,
            reencode_digits="legacy",
        ),
        [1, 25],
    )


def test_seal_wire_rejects_balanced_reencode_d2():
    params = tiny_pir_params(dbsize=30, bytes_per_item=8, dimensions=2, n=64)
    assert params.reencode_mode == 1
    with pytest.raises(ValueError, match="legacy"):
        PirClient(params, seed=7, wire_format="seal")


def test_seal_wire_roundtrip_ct_mult():
    _roundtrip_seal(
        tiny_pir_params(
            dbsize=30, bytes_per_item=8, dimensions=2, n=64,
            use_ciphertext_multiplication=True,
        ),
        [29],
    )


def test_server_explicit_seal_format_with_native_client():
    """wire_format="seal" on the server emits SEAL replies even for a
    native-codec client (which accepts both via the auto-detect loaders)."""
    params = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64)
    raw = generate_test_db(params.num_items, params.bytes_per_item, 42)
    db = PirDatabase.create(raw, params)
    client = PirClient(params, seed=7)
    server = PirServer(db, params, wire_format="seal")
    request = client.create_request([4])
    response = server.process_request(request)
    for r in response.reply:
        for ct in r.ct:
            _assert_seal(ct)
    assert client.process_response([4], response)[0] == raw[4]


def test_auto_format_echoes_native():
    params = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64)
    raw = generate_test_db(params.num_items, params.bytes_per_item, 42)
    db = PirDatabase.create(raw, params)
    client = PirClient(params, seed=7)
    server = PirServer(db, params)  # auto
    response = server.process_request(client.create_request([2]))
    for r in response.reply:
        for ct in r.ct:
            assert not seal_compat.looks_like_seal_stream(ct)
    assert client.process_response([2], response)[0] == raw[2]


def test_params_proto_seal_mode():
    params = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64)
    msg = wire.pir_params_to_proto(params, wire_format="seal")
    _assert_seal(msg.encryption_parameters)
    back = wire.pir_params_from_proto(msg)
    assert back.encryption_params == params.encryption_params
    assert back.dimensions == params.dimensions


def test_seal_mode_rejects_compressed_queries():
    params = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64)
    with pytest.raises(ValueError, match="native-codec extension"):
        PirClient(params, seed=7, compress_queries=True, wire_format="seal")


# ---------------------------------------------------------------------------
# Hand-derived byte-layout fixtures
# ---------------------------------------------------------------------------


def test_ciphertext_stream_byte_layout():
    """Pin the exact framing of a SEAL 3.5 Ciphertext stream.

    Layout (seal/serialization.h SEALHeader + ciphertext save_members;
    full derivation in SEAL_STREAM.md):
      [0:2)   magic 0xA15E        [2]     header size 0x10
      [3]     major 3             [4]     minor 5
      [5]     compr none (0)      [6:8)   reserved 0
      [8:16)  u64 total size
      [16:48) parms_id (4 x u64, level of the ct's limb count)
      [48]    is_ntt_form byte
      [49:57) u64 size (polys)    [57:65) u64 poly_modulus_degree
      [65:73) u64 coeff_mod_count [73:81) f64 scale (1.0 for BFV)
      [81:97) nested IntArray SEALHeader (data_.save)
      [97:105) u64 data word count
      [105:)  raw little-endian u64 words, [poly][limb][coeff] order
    """
    ep = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64).encryption_params
    L = len(ep.coeff_modulus) - 1  # data level
    n = ep.poly_modulus_degree
    ct = np.arange(2 * L * n, dtype=np.uint64).reshape(2, L, n)
    b = seal_compat.save_ciphertext(ct, ep)

    assert struct.unpack_from("<H", b, 0)[0] == 0xA15E
    assert b[2] == 0x10 and b[3] == 3 and b[4] == 5 and b[5] == 0
    assert struct.unpack_from("<H", b, 6)[0] == 0
    assert struct.unpack_from("<Q", b, 8)[0] == len(b)
    assert struct.unpack_from("<4Q", b, 16) == seal_compat.parms_id_for(ep, L)
    assert b[48] == 0  # coefficient form
    assert struct.unpack_from("<QQQ", b, 49) == (2, n, L)
    assert struct.unpack_from("<d", b, 73)[0] == 1.0  # scale_ (CKKS member)
    # nested IntArray stream: own header, then word count, then words
    assert struct.unpack_from("<H", b, 81)[0] == 0xA15E
    assert struct.unpack_from("<Q", b, 89)[0] == 16 + 8 + 8 * 2 * L * n
    assert struct.unpack_from("<Q", b, 97)[0] == 2 * L * n
    data = np.frombuffer(b, dtype="<u8", offset=105)
    np.testing.assert_array_equal(data, ct.ravel())  # [poly][limb][coeff]
    assert len(b) == 105 + 8 * 2 * L * n


def test_kswitch_stream_byte_layout():
    """Pin the KSwitchKeys framing: header, key-level parms_id, u64 row
    count, then per row a u64 count and nested full PublicKey streams."""
    ep = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64).encryption_params
    Lp = len(ep.coeff_modulus)
    L = Lp - 1
    n = ep.poly_modulus_degree
    key_ct = np.ones((2, Lp, n), dtype=np.uint64)
    rows = [[], [key_ct, key_ct * 2], [key_ct * 3]]
    b = seal_compat.save_kswitch_keys(rows, ep)

    assert struct.unpack_from("<Q", b, 8)[0] == len(b)
    # key level = full chain parms_id
    assert struct.unpack_from("<4Q", b, 16) == seal_compat.parms_id_for(ep)
    assert struct.unpack_from("<Q", b, 48)[0] == 3  # rows
    off = 56
    counts = []
    for _ in range(3):
        (count,) = struct.unpack_from("<Q", b, off)
        off += 8
        counts.append(count)
        for _ in range(count):
            hdr = seal_compat.parse_header(b[off:])
            # nested stream: full-chain parms_id, NTT form, Lp limbs
            assert struct.unpack_from("<4Q", b, off + 16) == (
                seal_compat.parms_id_for(ep)
            )
            assert b[off + 48] == 1  # keys are stored in NTT form
            assert struct.unpack_from("<QQQ", b, off + 49) == (2, n, Lp)
            off += hdr["size"]
    assert counts == [0, 2, 1]
    assert off == len(b)

    back = seal_compat.load_kswitch_keys(b, ep)
    assert [len(r) for r in back] == [0, 2, 1]
    np.testing.assert_array_equal(back[1][1], key_ct * 2)


def test_encryption_params_stream_byte_layout():
    """Pin the EncryptionParameters stream: scheme byte, u64 degree, u64
    modulus count, then nested 24-byte SmallModulus streams for each
    coefficient modulus and the plain modulus (parameters.cpp:99-100;
    SEAL saves SmallModulus objects through Serialization::Save, so each
    carries its own SEALHeader — SEAL_STREAM.md)."""
    ep = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64).encryption_params
    b = seal_compat.save_encryption_params(ep)
    assert b[16] == 1  # BFV
    assert struct.unpack_from("<Q", b, 17)[0] == ep.poly_modulus_degree
    count = struct.unpack_from("<Q", b, 25)[0]
    assert count == len(ep.coeff_modulus)
    off = 33
    for expect in ep.coeff_modulus + (ep.plain_modulus,):
        assert struct.unpack_from("<H", b, off)[0] == 0xA15E
        assert struct.unpack_from("<Q", b, off + 8)[0] == 24
        assert struct.unpack_from("<Q", b, off + 16)[0] == expect
        off += 24
    assert len(b) == off


def test_data_level_parms_id_differs_from_key_level():
    ep = tiny_pir_params(dbsize=10, bytes_per_item=8, n=64).encryption_params
    full = seal_compat.parms_id_for(ep)
    data = seal_compat.parms_id_for(ep, len(ep.coeff_modulus) - 1)
    assert full != data
    assert seal_compat.parms_id_for(ep, len(ep.coeff_modulus)) == full
